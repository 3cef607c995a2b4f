"""Generic backbone×detector swap (reference `mmdet/models/builder.py:20`
`build_backbone` + the zoo's cross-product configs, e.g.
`configs/res2net/faster_rcnn_r2_101_fpn_2x_coco.py`,
`configs/resnest/*`, `configs/regnet/*`).

Any registered trunk can be dropped into any detector family through
`model.backbone_cfg` (or a reference-style nested `model.backbone` dict);
aliases map reference type names onto parametrized modules (ResNeXt →
ResNet+groups, ResNetV1d → deep_stem+avg_down)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.backbones.build import (
    build_trunk, freeze_trunk_cfg)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.backbones.resnet import ResNet
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.builder import build_detector


def _batch(b=1, s=64, n=4):
    return dict(image=jnp.zeros((b, s, s, 3)),
                gt_bboxes=jnp.zeros((b, n, 4)),
                gt_labels=jnp.zeros((b, n), jnp.int32),
                gt_valid=jnp.zeros((b, n), bool),
                img_shape=jnp.tile(jnp.array([[float(s), float(s)]]), (b, 1)))


def _n_params(model, batch):
    shapes = jax.eval_shape(lambda: model.init(
        {'params': jax.random.PRNGKey(0), 'sampler': jax.random.PRNGKey(1)},
        batch))
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))


@pytest.mark.parametrize('det,bb', [
    ('RetinaNet', dict(type='Res2Net', depth=50)),
    ('FasterRCNNFPN', dict(type='ResNeXt', depth=50)),
    ('FCOS', dict(type='HRNet')),
    ('ATSS', dict(type='RegNet')),
])
def test_swap_builds(det, bb):
    model = build_detector(dict(type=det, num_classes=3, backbone_cfg=bb))
    assert _n_params(model, _batch()) > 1e6


def test_nested_reference_style_backbone_dict():
    # reference configs carry model.backbone=dict(type=..., ...) — the
    # nested translation path must route non-ResNet types through the swap
    model = build_detector(dict(
        type='FasterRCNN',
        backbone=dict(type='ResNeXt', depth=50, groups=32, base_width=4,
                      norm_cfg=dict(type='BN'), style='pytorch'),
        rpn_head=dict(anchor_generator=dict(scales=[8], ratios=[0.5, 1, 2])),
        roi_head=dict(bbox_head=dict(num_classes=3))))
    bb = model.backbone_cfg
    assert isinstance(bb, tuple)          # frozen → hashable for jit
    assert dict(bb)['groups'] == 32
    # torch-only keys (norm_cfg/style) are dropped silently at build time
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        trunk = build_trunk(bb, dtype=jnp.float32)
    assert trunk.groups == 32 and trunk.depth == 50


def test_v1d_stem_and_avg_down():
    # ResNetV1d (reference `mmdet/models/backbones/resnet.py:ResNetV1d`):
    # 3×3×3 deep stem + avg-pool shortcut downsample
    trunk = build_trunk(freeze_trunk_cfg(dict(type='ResNetV1d', depth=50)),
                        dtype=jnp.float32, out_indices=(3,))
    assert trunk.deep_stem and trunk.avg_down
    shapes = jax.eval_shape(
        lambda: trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    params = shapes['params']
    assert 'stem0' in params and 'stem2' in params and 'conv1' not in params
    # stride-2 downsample conv must be 1×1 stride-1 (stride moved to avgpool)
    y = trunk.apply(trunk.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3))),
                    jnp.ones((1, 64, 64, 3)))
    assert y[0].shape == (1, 2, 2, 2048)


def test_swap_forward_interface():
    # every trunk honours __call__(x) -> tuple + stage_channels()
    trunk = build_trunk(freeze_trunk_cfg(dict(type='Res2Net', depth=50)),
                        dtype=jnp.float32)
    v = trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    outs = trunk.apply(v, jnp.zeros((1, 64, 64, 3)))
    chans = trunk.stage_channels()
    assert len(outs) == len(chans) or outs[-1].shape[-1] == chans[-1]


def test_unknown_keys_warn_not_crash():
    with pytest.warns(UserWarning, match='ignoring backbone config'):
        build_trunk(freeze_trunk_cfg(dict(type='ResNet', depth=50,
                                          bogus_knob=1)),
                    dtype=jnp.float32)


def test_v1d_avg_down_odd_dims():
    """torch ceil_mode=True semantics: the avg-pool shortcut must match the
    main path's pad-1 stride-2 conv shape for ODD stage-input dims (e.g.
    keep-ratio canvases); VALID-padding floor pooling crashes the residual
    add."""
    trunk = build_trunk(freeze_trunk_cfg(dict(type='ResNetV1d', depth=18)),
                        dtype=jnp.float32, out_indices=(3,))
    x = jnp.ones((1, 66, 110, 3))  # stage inputs go odd: 17x28 -> 9x14 ...
    v = trunk.init(jax.random.PRNGKey(0), x)
    (y,) = trunk.apply(v, x)
    assert y.shape[0] == 1 and y.shape[-1] == 512
    # stem stride 4 -> 17x28 (ceil), stages stride 2 -> 9x14 -> 5x7 -> 3x4
    assert y.shape[1:3] == (3, 4)
    # valid-count divisor: pooled edge windows must average only real
    # pixels — constant input stays exactly constant through avg_down
    import numpy as np
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.backbones.resnet import (
        _avg_down_pool)
    z = jnp.ones((1, 5, 7, 2))
    out = _avg_down_pool(z, 2)
    assert out.shape == (1, 3, 4, 2)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


@pytest.mark.parametrize('det,extra', [
    ('FasterRCNNFPN', dict(neck_type='PAFPN', roi_extractor_type='groie')),
    ('FasterRCNNFPN', dict(
        neck_type='BFP',
        backbone_cfg=dict(type='ResNet', depth=18,
                          conv_cfg=dict(type='ConvWS'),
                          norm_cfg=dict(type='GN', num_groups=32)))),
    ('FasterRCNNFPN', dict(
        backbone_cfg=dict(type='ResNet', depth=50,
                          dcn=dict(type='DCNv2'),
                          stage_with_dcn=(False, True, True, True)))),
    ('MaskRCNN', dict(loss_cls='seesaw')),
    ('MaskRCNN', dict(
        backbone_cfg=dict(
            type='ResNet', depth=50,
            plugins=[dict(cfg=dict(type='ContextBlock', ratio=0.25),
                          stages=(False, True, True, True),
                          position='after_conv3')]))),
    ('RetinaNet', dict(neck_type='NASFPN', train_cfg=dict(loss_cls='ghm'))),
    ('RetinaNet', dict(
        backbone_cfg=dict(
            type='ResNet', depth=50,
            plugins=[dict(cfg=dict(type='GeneralizedAttention',
                                   num_heads=8, attention_type='0010',
                                   kv_stride=2),
                          stages=(False, False, True, True),
                          position='after_conv2')]))),
])
def test_round2_trunk_neck_loss_options_build(det, extra):
    """Round-2 config surface (dcn/gcnet/empirical_attention/gn+ws/pafpn/
    nas_fpn/libra/groie/ghm/seesaw families) constructs and shape-checks
    through the builder without compiling."""
    model = build_detector(dict(type=det, num_classes=3, **extra))
    batch = _batch()
    if det == 'MaskRCNN':
        batch = dict(batch, gt_masks=jnp.zeros((1, 4, 64, 64)))
    assert _n_params(model, batch) > 1e6


def test_remat_matches_plain_in_value_and_grad():
    """`remat=True` (and mmdet `with_cp=True` via the translator) must be
    numerically invisible: same outputs, same grads, only the backward
    memory/FLOP trade changes."""
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    plain = ResNet(depth=18, frozen_stages=-1)
    rem = ResNet(depth=18, frozen_stages=-1, remat=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    y0 = plain.apply(variables, x)
    y1 = rem.apply(variables, x)
    for a, b in zip(y0, y1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def loss(params, mod):
        out = mod.apply({'params': params, **{k: variables[k]
                                              for k in variables
                                              if k != 'params'}}, x)
        return sum(jnp.sum(o ** 2) for o in out)

    g0 = jax.grad(loss)(variables['params'], plain)
    g1 = jax.grad(loss)(variables['params'], rem)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_with_cp_translates_to_remat():
    trunk = build_trunk({'type': 'ResNet', 'depth': 18, 'with_cp': True},
                        dtype=jnp.float32)
    assert trunk.remat is True
