"""mmdet-checkpoint converter (tools/model_converters/mmdet_to_udaod.py):
reference `.pth` state_dicts load onto our flax trees with correct layout
transposes (reference naming per `mmdet/models/detectors/two_stage.py`)."""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

_spec = importlib.util.spec_from_file_location(
    'mmdet_to_udaod',
    os.path.join(os.path.dirname(__file__), '..', '..', 'tools',
                 'model_converters', 'mmdet_to_udaod.py'))
conv = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(conv)

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.builder import (  # noqa: E402
    build_detector)


def _init_fpn(num_classes=3):
    model = build_detector(dict(type='FasterRCNNFPN',
                                num_classes=num_classes,
                                backbone_depth=18))
    batch = dict(image=jnp.zeros((1, 64, 64, 3)),
                 gt_bboxes=jnp.zeros((1, 4, 4)),
                 gt_labels=jnp.zeros((1, 4), jnp.int32),
                 gt_valid=jnp.zeros((1, 4), bool),
                 img_shape=jnp.array([[64., 64.]]))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'sampler': jax.random.PRNGKey(1)}, batch)
    return model, variables


def _fake_mmdet_sd(variables):
    """Synthesize an mmdet-style state_dict covering our tree: every leaf
    gets a random tensor in TORCH layout under the reference key."""
    import jax.tree_util as jtu
    rng = np.random.RandomState(0)
    sd = {}
    for collection in ('params', 'batch_stats'):
        for path, leaf in jtu.tree_leaves_with_path(variables[collection]):
            keys = tuple(k.key for k in path)
            prefix, kind = conv._mmdet_key(keys)
            tk = f'{prefix}.{conv._SUFFIX[kind]}'
            shape = np.asarray(leaf).shape
            if kind == 'first_fc':
                tshape = (shape[1], shape[0])
            elif kind == 'conv' and len(shape) == 4:
                tshape = (shape[3], shape[2], shape[0], shape[1])
            elif kind == 'conv' and len(shape) == 2:
                tshape = (shape[1], shape[0])
            else:
                tshape = shape
            w = rng.randn(*tshape).astype(np.float32)
            if kind == 'bn_v':       # variance must be positive
                w = np.abs(w) + 0.5
            sd[tk] = torch.tensor(w)
    return sd


def test_mmdet_key_golden_names():
    """Key construction against REAL mmdet state_dict names (written from
    `mmdet/models/backbones/resnet.py` + `two_stage.py` conventions) — the
    synthesized-roundtrip test below cannot catch naming bugs."""
    cases = {
        ('backbone', 'conv1', 'kernel'): 'backbone.conv1.weight',
        ('backbone', 'bn1', 'scale'): 'backbone.bn1.weight',
        ('backbone', 'bn1', 'mean'): 'backbone.bn1.running_mean',
        ('backbone', 'layer1/0', 'conv1', 'kernel'):
            'backbone.layer1.0.conv1.weight',
        ('backbone', 'layer2/0', 'downsample_conv', 'kernel'):
            'backbone.layer2.0.downsample.0.weight',
        ('backbone', 'layer2/0', 'downsample_bn', 'scale'):
            'backbone.layer2.0.downsample.1.weight',
        ('backbone', 'layer4/2', 'bn3', 'var'):
            'backbone.layer4.2.bn3.running_var',
        ('backbone', 'stem0', 'kernel'): 'backbone.stem.0.weight',
        ('backbone', 'stem_bn1', 'scale'): 'backbone.stem.4.weight',
        ('neck', 'lateral_2', 'kernel'): 'neck.lateral_convs.2.conv.weight',
        ('neck', 'fpn_conv_0', 'bias'): 'neck.fpn_convs.0.conv.bias',
        ('rpn_head', 'rpn_cls', 'kernel'): 'rpn_head.rpn_cls.weight',
        ('bbox_head', 'shared_fc1', 'kernel'):
            'roi_head.bbox_head.shared_fcs.0.weight',
        ('bbox_head', 'shared_fc2', 'bias'):
            'roi_head.bbox_head.shared_fcs.1.bias',
        ('bbox_head', 'fc_cls', 'kernel'): 'roi_head.bbox_head.fc_cls.weight',
    }
    for path, want in cases.items():
        prefix, kind = conv._mmdet_key(path)
        got = f'{prefix}.{conv._SUFFIX[kind]}'
        assert got == want, f'{path}: {got} != {want}'


def test_full_tree_fills_without_missing():
    _, variables = _init_fpn()
    sd = _fake_mmdet_sd(variables)
    out, missing = conv.convert_mmdet_state(sd, variables)
    assert missing == []
    # guard against self-consistent-but-wrong key synthesis: real mmdet
    # block naming must appear in the synthesized dict
    assert 'backbone.layer1.0.conv1.weight' in sd
    assert 'backbone.layer2.0.downsample.0.weight' in sd
    # BN running stats land in batch_stats with the right values
    bn_mean = out['batch_stats']['backbone']['bn1']['mean']
    np.testing.assert_allclose(
        bn_mean, sd['backbone.bn1.running_mean'].numpy())
    # conv kernels transposed OIHW→HWIO
    k = out['params']['backbone']['conv1']['kernel']
    np.testing.assert_allclose(
        k, sd['backbone.conv1.weight'].numpy().transpose(2, 3, 1, 0))


def test_first_fc_permutation_is_functional():
    """torch: y = W @ flatten(CHW). ours: y = flatten(HWC) @ K. The
    converted K must give identical y for the same RoI feature map."""
    rng = np.random.RandomState(1)
    C, S, O = 16, 7, 8
    W = rng.randn(O, C * S * S).astype(np.float32)
    feat_chw = rng.randn(C, S, S).astype(np.float32)
    y_torch = torch.nn.functional.linear(
        torch.tensor(feat_chw.reshape(-1)), torch.tensor(W)).numpy()
    K = conv._first_fc(W, roi_size=S)
    # our flatten is x-major (W, H, C) — ops/roi_align.py flatten note
    feat_whc = np.transpose(feat_chw, (2, 1, 0))
    y_ours = feat_whc.reshape(-1) @ K
    np.testing.assert_allclose(y_ours, y_torch, atol=1e-4)


@pytest.mark.slow
def test_loaded_model_runs_predict():
    model, variables = _init_fpn()
    sd = _fake_mmdet_sd(variables)
    out, _ = conv.convert_mmdet_state(sd, variables)
    out = jax.tree_util.tree_map(jnp.asarray, out)
    batch = dict(image=jnp.ones((1, 64, 64, 3)),
                 img_shape=jnp.array([[64., 64.]]))
    res = model.apply(out, batch, train=False,
                      rngs={'sampler': jax.random.PRNGKey(0)})
    assert res['dets'].shape[-1] == 5
    assert np.isfinite(np.asarray(res['dets'])).all()
