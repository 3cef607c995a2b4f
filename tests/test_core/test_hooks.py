"""Functional hook tests: EMA ramp + NaN guard (reference
`mmdet/core/hook/ema.py:8,104`, `checkloss_hook.py`)."""

import numpy as np

import jax
import jax.numpy as jnp

from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis.hooks import (
    ema_update, guard_nonfinite_update)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis.train_state import (
    OptimizerSpec, TrainState, create_train_state, make_train_step)


def test_ema_warmup_tracks_then_smooths():
    ema = {'w': jnp.zeros((3,))}
    params = {'w': jnp.ones((3,))}
    # step 0: decay ≈ d0/gamma — the EMA nearly copies the raw params
    early = ema_update(ema, params, momentum=0.9998, step=0, gamma=2000.0)
    assert float(early['w'][0]) > 0.999
    # large step: decay ≈ d0 — the EMA moves only (1-d0) toward the params
    late = ema_update(ema, params, momentum=0.9998, step=10**7, gamma=2000.0)
    np.testing.assert_allclose(float(late['w'][0]), 1 - 0.9998, rtol=1e-3)
    # no-step variant uses the flat decay
    flat = ema_update(ema, params, momentum=0.9)
    np.testing.assert_allclose(np.asarray(flat['w']), 0.1, rtol=1e-5)


def test_guard_nonfinite_update():
    old = {'w': jnp.zeros((2,))}
    new = {'w': jnp.ones((2,))}
    kept, skipped = guard_nonfinite_update(old, new, jnp.asarray(jnp.nan))
    assert bool(skipped) and float(kept['w'][0]) == 0.0
    kept, skipped = guard_nonfinite_update(old, new, jnp.asarray(1.0))
    assert not bool(skipped) and float(kept['w'][0]) == 1.0
    # finite loss but non-finite UPDATE (overflowing backward) must also
    # skip — checking only the loss would poison the params permanently
    bad = {'w': jnp.asarray([jnp.nan, 1.0])}
    kept, skipped = guard_nonfinite_update(old, bad, jnp.asarray(1.0))
    assert bool(skipped) and float(kept['w'][0]) == 0.0


def test_train_step_updates_ema_params():
    """End-to-end: a toy flax model trained with ema_momentum keeps an EMA
    shadow that lags the raw params."""
    import flax.linen as nn

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, batch, train=True):
            y = nn.Dense(1)(batch['x'])
            return {'mse': jnp.mean((y - batch['y']) ** 2)}

    model = Toy()
    batch = {'x': jnp.ones((4, 3)), 'y': jnp.zeros((4, 1))}
    variables = model.init(jax.random.PRNGKey(0), batch)
    # small lr keeps the trajectory monotone so the EMA genuinely lags
    # (at high lr SGD+momentum oscillates and the lag inequality flips)
    state, tx = create_train_state(model, variables,
                                   OptimizerSpec(lr=0.01, warmup_iters=0),
                                   ema=True)
    assert state.ema_params is not None
    step = jax.jit(make_train_step(model, tx, ema_momentum=0.9))
    s1, _ = step(state, batch, jax.random.PRNGKey(1))
    for _ in range(5):
        s1, _ = step(s1, batch, jax.random.PRNGKey(1))
    raw = s1.params['Dense_0']['kernel']
    ema = s1.ema_params['Dense_0']['kernel']
    init = state.params['Dense_0']['kernel']
    # EMA moved off the init, but less than the raw params did
    assert float(jnp.linalg.norm(ema - init)) > 0.0
    assert float(jnp.linalg.norm(ema - init)) < \
        float(jnp.linalg.norm(raw - init))


def test_optimizer_types():
    """OptimizerSpec.opt_type selects SGD/Adam/AdamW (reference DETR-family
    configs train with AdamW, `configs/detr/detr_r50_8x2_150e_coco.py`)."""
    import optax
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis.train_state import (
        OptimizerSpec, make_optimizer)
    params = {'w': jnp.ones((4,))}
    grads = {'w': jnp.full((4,), 0.5)}
    for kind in ('sgd', 'adam', 'adamw'):
        tx = make_optimizer(OptimizerSpec(lr=1e-2, warmup_iters=0,
                                          opt_type=kind))
        st = tx.init(params)
        upd, _ = tx.update(grads, st, params)
        new = optax.apply_updates(params, upd)
        assert float(new['w'][0]) < 1.0, kind
