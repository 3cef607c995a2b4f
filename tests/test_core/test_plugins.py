"""Backbone plugin bricks + neck selector (reference `configs/gcnet`,
`configs/empirical_attention`, `configs/gn+ws`, `configs/dcn`,
`configs/pafpn`/`nas_fpn`/`carafe`/`fpg`/`libra_rcnn`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.layers.plugins import (  # noqa: E501
    ContextBlock, DeformConv, GeneralizedAttention, WSConv)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.backbones.build import (  # noqa: E501
    build_trunk)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.necks.build import (  # noqa: E501
    FPN_NECK_TYPES, make_fpn_neck)


def test_wsconv_standardizes_kernel():
    m = WSConv(features=8, kernel_size=(3, 3))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 6, 6, 4), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    k = params['params']['kernel']
    std_k = (k - k.mean(axis=(0, 1, 2), keepdims=True)) / (
        k.std(axis=(0, 1, 2), keepdims=True) + 1e-5)
    want = jax.lax.conv_general_dilated(
        x, std_k, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    got = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_context_block_att_pool_matches_avg_when_uniform():
    """With a zeroed conv_mask the softmax attention is uniform — the
    attention-pooled context must equal plain average pooling."""
    x = jnp.asarray(np.random.RandomState(1).randn(2, 5, 7, 16), jnp.float32)
    att = ContextBlock(in_channels=16, ratio=0.25, pooling_type='att')
    avg = ContextBlock(in_channels=16, ratio=0.25, pooling_type='avg')
    p = att.init(jax.random.PRNGKey(0), x)
    p = jax.tree_util.tree_map(lambda a: a, p)
    flat = dict(p['params'])
    flat['conv_mask'] = jax.tree_util.tree_map(jnp.zeros_like,
                                               flat['conv_mask'])
    out_att = att.apply({'params': flat}, x)
    p_avg = {'params': {k: v for k, v in flat.items() if k != 'conv_mask'}}
    out_avg = avg.apply(p_avg, x)
    np.testing.assert_allclose(np.asarray(out_att), np.asarray(out_avg),
                               rtol=1e-5, atol=1e-5)
    assert out_att.shape == x.shape


def test_context_block_channel_mul():
    x = jnp.ones((1, 4, 4, 8), jnp.float32)
    m = ContextBlock(in_channels=8, ratio=0.5,
                     fusion_types=('channel_add', 'channel_mul'))
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize('attention_type', ['0010', '1111', '1000', '0001'])
def test_generalized_attention_types(attention_type):
    x = jnp.asarray(np.random.RandomState(2).randn(1, 6, 8, 32), jnp.float32)
    m = GeneralizedAttention(in_channels=32, num_heads=2, kv_stride=2,
                             attention_type=attention_type)
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x,
                  rngs={'params': jax.random.PRNGKey(1)})
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_generalized_attention_local_range_masks():
    """spatial_range=0 keeps only the same-position key — with kv_stride 1
    every query attends to exactly one key, so softmax weight is 1 and the
    output equals x + proj(value(x))."""
    x = jnp.asarray(np.random.RandomState(3).randn(1, 4, 4, 16), jnp.float32)
    m = GeneralizedAttention(in_channels=16, num_heads=2, kv_stride=1,
                             spatial_range=0, attention_type='0010')
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    vk = params['params']['value_conv']['kernel']
    pk = params['params']['proj_conv']['kernel']
    pb = params['params']['proj_conv']['bias']
    v = jax.lax.conv_general_dilated(x, vk, (1, 1), 'SAME',
                                     dimension_numbers=('NHWC', 'HWIO',
                                                        'NHWC'))
    want = x + (jax.lax.conv_general_dilated(
        v, pk, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + pb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_deform_conv_zero_offsets_is_plain_conv():
    x = jnp.asarray(np.random.RandomState(4).randn(2, 6, 6, 4), jnp.float32)
    off = jnp.zeros((2, 6, 6, 18), jnp.float32)
    m = DeformConv(features=8, kernel_size=3)
    params = m.init(jax.random.PRNGKey(0), x, off)
    got = m.apply(params, x, off)
    k = params['params']['kernel']
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_build_trunk_translates_mmdet_keys():
    cfg = dict(type='ResNet', depth=50,
               norm_cfg=dict(type='GN', num_groups=32, requires_grad=True),
               conv_cfg=dict(type='ConvWS'),
               dcn=dict(type='DCNv2', deform_groups=1,
                        fallback_on_stride=False),
               stage_with_dcn=(False, True, True, True),
               plugins=[dict(cfg=dict(type='ContextBlock', ratio=0.25),
                             stages=(False, True, True, True),
                             position='after_conv3')])
    m = build_trunk(cfg, dtype=jnp.float32)
    assert m.norm == 'gn' and m.conv_ws and m.dcn == 'dcnv2'
    assert m.stage_with_dcn == (False, True, True, True)
    assert isinstance(m.plugins, tuple) and len(m.plugins) == 1


def test_gn_trunk_has_no_batch_stats():
    cfg = dict(type='ResNet', depth=50, num_stages=1, out_indices=(0,),
               strides=(1,), dilations=(1,),
               stage_with_dcn=(False,),
               norm_cfg=dict(type='GN', num_groups=32))
    m = build_trunk(cfg, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.ones((1, 16, 16, 3)))
    assert 'batch_stats' not in variables


@pytest.mark.parametrize('neck_type', FPN_NECK_TYPES)
def test_fpn_neck_selector_output_contract(neck_type):
    chans = (16, 32, 64, 128)
    feats = tuple(jnp.ones((1, 32 // 2**i, 32 // 2**i, c), jnp.float32)
                  for i, c in enumerate(chans))
    m = make_fpn_neck(neck_type, in_channels=chans, out_channels=16,
                      num_outs=5, dtype=jnp.float32)
    outs = m.apply(m.init(jax.random.PRNGKey(0), feats), feats)
    assert len(outs) == 5
    assert all(o.shape[-1] == 16 for o in outs)
    # strictly halving pyramid
    for a, b in zip(outs, outs[1:]):
        assert a.shape[-3] == 2 * b.shape[-3] or a.shape[-3] == b.shape[-3]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_seesaw_cls_losses_and_activation():
    """Seesaw RoI losses (configs/seesaw_loss): rare-class mitigation
    weakens the penalty on rare negatives, activation reproduces
    softmax(classes)·p_fg / p_bg."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.roi_heads.standard_roi_head import (  # noqa: E501
        SampledRoIs, seesaw_activation, seesaw_cls_losses)
    num_classes = 3
    rs = np.random.RandomState(0)
    b, s = 2, 8
    labels = jnp.asarray(rs.randint(0, num_classes + 1, (b, s)))
    sampled = SampledRoIs(
        rois=jnp.zeros((b, s, 4)), labels=labels,
        label_valid=jnp.ones((b, s), bool),
        is_pos=labels < num_classes,
        reg_targets=jnp.zeros((b, s, 4)),
        matched_gt=jnp.zeros((b, s), jnp.int32))
    cls = jnp.asarray(rs.randn(b, s, num_classes + 2), jnp.float32)
    cum = jnp.zeros((num_classes,), jnp.float32)
    losses, new_cum = seesaw_cls_losses(cls, sampled, num_classes, cum)
    assert np.isfinite(float(losses['loss_cls']))
    assert np.isfinite(float(losses['loss_cls_objectness']))
    # cum counts exactly the foreground labels
    fg = np.asarray(labels) < num_classes
    want = np.bincount(np.asarray(labels)[fg], minlength=num_classes)
    np.testing.assert_array_equal(np.asarray(new_cum), want)
    # activation: softmax of the pseudo-logits == mmdet get_activation
    act = jax.nn.softmax(seesaw_activation(cls, num_classes), axis=-1)
    cls_p = jax.nn.softmax(cls[..., :num_classes], axis=-1)
    obj_p = jax.nn.softmax(cls[..., num_classes:], axis=-1)
    np.testing.assert_allclose(np.asarray(act[..., :num_classes]),
                               np.asarray(cls_p * obj_p[..., :1]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(act[..., num_classes]),
                               np.asarray(obj_p[..., 1]),
                               rtol=1e-4, atol=1e-5)
