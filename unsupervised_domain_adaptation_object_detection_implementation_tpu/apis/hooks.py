"""Functional training hooks.

Equivalents of the reference's `mmdet/core/hook/` subsystem re-expressed as
pure functions composed into the train step / loop:

- `ema_update` — `ExpMomentumEMAHook`/`LinearMomentumEMAHook`
  (`core/hook/ema.py:8,104,119`);
- `guard_nonfinite_update` — `CheckInvalidLossHook`
  (`core/hook/checkloss_hook.py`), upgraded from "raise on NaN" to
  "skip the update" (the useful behavior inside a jitted step);
- `grad_norm` — the DistOptimizerHook grad-clip observability.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, momentum: float = 0.9998,
               step=None, gamma: float = 2000.0):
    """EMA of params; `momentum` is the DECAY (old-weight coefficient).

    With `step`, applies the exp-momentum warmup ramp of the reference
    (`core/hook/ema.py:104`, whose `momentum` is the new-weight coefficient
    m0 = 1-decay): new_coef(t) = (1-m0)·exp(-(t+1)/gamma) + m0, i.e. early
    steps copy the raw params almost exactly and the decay relaxes to
    `momentum` with time constant gamma."""
    if step is not None:
        d0 = momentum
        m = d0 * (1.0 - jnp.exp(-(step + 1.0) / gamma))
    else:
        m = momentum
    return jax.tree_util.tree_map(
        lambda e, p: e * m + p * (1.0 - m), ema_params, params)


def grad_norm(grads) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in leaves))


def guard_nonfinite_update(old_params, new_params, loss) -> Tuple:
    """Keep the old params when the step produced non-finite loss OR params.

    Returns (params, skipped_flag). Composable inside the jitted step —
    a NaN batch then costs one wasted step instead of a dead run.

    Checking only the loss is not enough: a step can have a finite loss but
    overflowing GRADIENTS (observed on SOLO: dice+focal backward spikes),
    which would poison the params permanently while every later loss prints
    NaN. The sum of all new params is one cheap fused reduction and is
    non-finite iff any update was.
    """
    leaves = jax.tree_util.tree_leaves(new_params)
    tot = sum(jnp.sum(p.astype(jnp.float32)) for p in leaves)
    ok = jnp.isfinite(loss) & jnp.isfinite(tot)
    params = jax.tree_util.tree_map(
        lambda o, n: jnp.where(ok, n, o), old_params, new_params)
    return params, ~ok
