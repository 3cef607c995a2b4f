"""_FusedSGD must be bit-near the optax chain it replaces
(`clip_by_global_norm? → add_decayed_weights → sgd(momentum)` under
multi_transform grouping) — same updates, same momentum evolution, same
frozen-leaf and paramwise-multiplier behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis.train_state import (  # noqa: E501
    OptimizerSpec, _FusedSGD, frozen_mask, make_lr_schedule,
    paramwise_labels)


def _params():
    rng = np.random.RandomState(0)
    return {
        'trunk': {
            'conv1': {'kernel': jnp.asarray(rng.randn(3, 3, 4, 8),
                                            jnp.float32)},
            # real trunk keys are flat 'layer1/0' style (resnet.py:302)
            'layer1/0': {'kernel': jnp.asarray(rng.randn(8, 8),
                                               jnp.float32)},
            'layer2/0': {'kernel': jnp.asarray(rng.randn(8, 8),
                                               jnp.float32),
                         'bias': jnp.asarray(rng.randn(8), jnp.float32)},
        },
        'head': {'fc': {'kernel': jnp.asarray(rng.randn(8, 4), jnp.float32),
                        'bias': jnp.asarray(rng.randn(4), jnp.float32)}},
    }


def _grads(params, seed):
    rng = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params)


def _optax_reference(spec, params, frozen_stages):
    schedule = make_lr_schedule(spec)

    def group_tx(lr_mult=1.0, decay_mult=1.0):
        lr = schedule if lr_mult == 1.0 else \
            (lambda step, m=lr_mult: schedule(step) * m)
        return optax.chain(
            optax.add_decayed_weights(spec.weight_decay * decay_mult),
            optax.sgd(learning_rate=lr, momentum=spec.momentum))

    if spec.paramwise:
        labels, mults = paramwise_labels(params, spec.paramwise)
    else:
        labels = jax.tree_util.tree_map(lambda _: 'g0', params)
        mults = {'g0': (1.0, 1.0)}
    if frozen_stages >= 0:
        mask = frozen_mask(params, frozen_stages)
        labels = jax.tree_util.tree_map(
            lambda lab, t: lab if t else 'freeze', labels, mask)
    transforms = {lab: group_tx(*ms) for lab, ms in mults.items()}
    transforms['freeze'] = optax.set_to_zero()
    chain = []
    if spec.grad_clip:
        chain.append(optax.clip_by_global_norm(spec.grad_clip))
    chain.append(optax.multi_transform(transforms, labels))
    return optax.chain(*chain)


@pytest.mark.parametrize('spec', [
    OptimizerSpec(lr=0.02, momentum=0.9, weight_decay=1e-4,
                  warmup_iters=3, decay_steps=(5,)),
    OptimizerSpec(lr=0.02, momentum=0.9, weight_decay=1e-4,
                  warmup_iters=0, grad_clip=0.5),
    OptimizerSpec(lr=0.01, momentum=0.8, weight_decay=5e-4, warmup_iters=0,
                  paramwise=dict(custom_keys={'head': dict(lr_mult=0.1)},
                                 bias_decay_mult=0.0)),
])
def test_fused_sgd_matches_optax(spec):
    params = _params()
    frozen = 1
    fused = _FusedSGD(spec, *_labels_mults(spec, params, frozen))
    ref = _optax_reference(spec, params, frozen)

    fp, fs = params, fused.init(params)
    rp, rs = params, ref.init(params)
    for step in range(8):
        g = _grads(params, step)
        fu, fs = fused.update(g, fs, fp)
        fp = optax.apply_updates(fp, fu)
        ru, rs = ref.update(g, rs, rp)
        rp = optax.apply_updates(rp, ru)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6), fp, rp)
    # frozen leaves never moved
    np.testing.assert_allclose(np.asarray(fp['trunk']['conv1']['kernel']),
                               np.asarray(params['trunk']['conv1']['kernel']))
    np.testing.assert_allclose(
        np.asarray(fp['trunk']['layer1/0']['kernel']),
        np.asarray(params['trunk']['layer1/0']['kernel']))


def _labels_mults(spec, params, frozen_stages):
    if spec.paramwise:
        labels, mults = paramwise_labels(params, spec.paramwise)
    else:
        labels = jax.tree_util.tree_map(lambda _: 'g0', params)
        mults = {'g0': (1.0, 1.0)}
    if frozen_stages >= 0:
        mask = frozen_mask(params, frozen_stages)
        labels = jax.tree_util.tree_map(
            lambda lab, t: lab if t else 'freeze', labels, mask)
    return labels, mults


def test_fused_apply_equals_update_plus_apply():
    spec = OptimizerSpec(lr=0.05, momentum=0.9, weight_decay=1e-4,
                         warmup_iters=0)
    params = _params()
    fused = _FusedSGD(spec, *_labels_mults(spec, params, 1))
    s1 = fused.init(params)
    g = _grads(params, 3)
    u, s_a = fused.update(g, s1, params)
    p_a = optax.apply_updates(params, u)
    p_b, s_b = fused.fused_apply(g, fused.init(params), params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-7),
        p_a, p_b)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-7),
        s_a.momentum, s_b.momentum)


def test_make_optimizer_returns_fused_for_sgd():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis.train_state import (  # noqa: E501
        make_optimizer)
    params = _params()
    tx = make_optimizer(OptimizerSpec(), params, frozen_stages=1)
    assert hasattr(tx, 'fused_apply')
    tx2 = make_optimizer(OptimizerSpec(opt_type='adamw'), params, 1)
    assert not hasattr(tx2, 'fused_apply')
