"""paramwise_cfg optimizer groups (reference mmcv
`runner/optimizer/default_constructor.py` via `optimizer.paramwise_cfg` in
e.g. `configs/detr/detr_r50_8x2_150e_coco.py`: backbone lr_mult=0.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis.train_state import (
    OptimizerSpec, make_optimizer, paramwise_labels)


def _params():
    return {
        'backbone': {
            'conv1': {'kernel': jnp.ones((3, 3))},
            'bn1': {'scale': jnp.ones(3), 'bias': jnp.zeros(3)},
        },
        'bbox_head': {
            'fc': {'kernel': jnp.ones((3, 3)), 'bias': jnp.zeros(3)},
        },
    }


def test_custom_keys_lr_mult():
    params = _params()
    pw = dict(custom_keys={'backbone': dict(lr_mult=0.1)})
    labels, mults = paramwise_labels(params, pw)
    assert mults[labels['backbone']['conv1']['kernel']] == (0.1, 1.0)
    assert mults[labels['backbone']['bn1']['scale']] == (0.1, 1.0)
    assert mults[labels['bbox_head']['fc']['kernel']] == (1.0, 1.0)

    # SGD w/o momentum: update = -lr * (g + wd*p); with lr_mult the
    # backbone update must be exactly 0.1× the head update
    spec = OptimizerSpec(lr=1.0, momentum=0.0, weight_decay=0.0,
                         warmup_iters=0, paramwise=pw)
    tx = make_optimizer(spec, params)
    st = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update(g, st, params)
    np.testing.assert_allclose(upd['backbone']['conv1']['kernel'], -0.1)
    np.testing.assert_allclose(upd['bbox_head']['fc']['kernel'], -1.0)


def test_norm_and_bias_decay_mult():
    params = _params()
    pw = dict(norm_decay_mult=0.0, bias_decay_mult=0.0)
    labels, mults = paramwise_labels(params, pw)
    # norm scale AND norm bias: decay off; conv kernel: decay on
    assert mults[labels['backbone']['bn1']['scale']] == (1.0, 0.0)
    assert mults[labels['backbone']['bn1']['bias']] == (1.0, 0.0)
    assert mults[labels['bbox_head']['fc']['bias']] == (1.0, 0.0)
    assert mults[labels['backbone']['conv1']['kernel']] == (1.0, 1.0)

    spec = OptimizerSpec(lr=1.0, momentum=0.0, weight_decay=0.5,
                         warmup_iters=0, paramwise=pw)
    tx = make_optimizer(spec, params)
    st = tx.init(params)
    g = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd, _ = tx.update(g, st, params)
    # zero grad → update is pure decay: -lr*wd*p for kernels, 0 for norms
    np.testing.assert_allclose(upd['backbone']['conv1']['kernel'], -0.5)
    np.testing.assert_allclose(upd['backbone']['bn1']['scale'], 0.0)


def test_custom_keys_longest_match_wins():
    params = {'backbone': {'layer1': {'kernel': jnp.ones(2)},
                           'layer2': {'kernel': jnp.ones(2)}}}
    pw = dict(custom_keys={'backbone': dict(lr_mult=0.1),
                           'backbone.layer2': dict(lr_mult=0.5)})
    labels, mults = paramwise_labels(params, pw)
    assert mults[labels['backbone']['layer1']['kernel']] == (0.1, 1.0)
    assert mults[labels['backbone']['layer2']['kernel']] == (0.5, 1.0)


def test_paramwise_composes_with_frozen_stages():
    # real trunk naming: stage blocks are single keys 'layer1/0', ...
    params = {'backbone': {'conv1': {'kernel': jnp.ones(2)},
                           'layer1/0': {'c': {'kernel': jnp.ones(2)}},
                           'layer2/0': {'c': {'kernel': jnp.ones(2)}}},
              'head': {'kernel': jnp.ones(2)}}
    pw = dict(custom_keys={'backbone': dict(lr_mult=0.1)})
    spec = OptimizerSpec(lr=1.0, momentum=0.0, weight_decay=0.0,
                         warmup_iters=0, paramwise=pw)
    tx = make_optimizer(spec, params, frozen_stages=1)
    st = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update(g, st, params)
    np.testing.assert_allclose(upd['backbone']['conv1']['kernel'], 0.0)
    np.testing.assert_allclose(upd['backbone']['layer1/0']['c']['kernel'], 0.0)
    np.testing.assert_allclose(upd['backbone']['layer2/0']['c']['kernel'], -0.1)
    np.testing.assert_allclose(upd['head']['kernel'], -1.0)


def test_adamw_groups_match_torch_param_groups():
    """Two AdamW groups with lr_mult 0.1 must match torch.optim.AdamW with
    two param groups (the reference's actual construction)."""
    torch = __import__('torch')
    rng = np.random.RandomState(0)
    w_bb = rng.randn(4).astype(np.float32)
    w_hd = rng.randn(4).astype(np.float32)
    g_bb = rng.randn(4).astype(np.float32)
    g_hd = rng.randn(4).astype(np.float32)

    lr, wd = 1e-3, 1e-2
    t_bb = torch.tensor(w_bb, requires_grad=True)
    t_hd = torch.tensor(w_hd, requires_grad=True)
    opt = torch.optim.AdamW([
        {'params': [t_bb], 'lr': lr * 0.1},
        {'params': [t_hd], 'lr': lr}], lr=lr, weight_decay=wd)
    for _ in range(3):
        t_bb.grad = torch.tensor(g_bb)
        t_hd.grad = torch.tensor(g_hd)
        opt.step()

    params = {'backbone': {'kernel': jnp.asarray(w_bb)},
              'head': {'kernel': jnp.asarray(w_hd)}}
    spec = OptimizerSpec(lr=lr, weight_decay=wd, warmup_iters=0,
                         opt_type='adamw',
                         paramwise=dict(custom_keys={
                             'backbone': dict(lr_mult=0.1)}))
    tx = make_optimizer(spec, params)
    st = tx.init(params)
    g = {'backbone': {'kernel': jnp.asarray(g_bb)},
         'head': {'kernel': jnp.asarray(g_hd)}}
    for _ in range(3):
        upd, st = tx.update(g, st, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    np.testing.assert_allclose(params['backbone']['kernel'],
                               t_bb.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(params['head']['kernel'],
                               t_hd.detach().numpy(), atol=1e-6)
