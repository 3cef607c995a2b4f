"""Gradient reversal/scaling — the adversarial min-max primitive.

Equivalent of the reference `_GradientScalarLayer`
(`mmdet/models/layers/gradient_scalar_layer.py:4`, re-inlined in every DA
file, e.g. `mmdet/models/backbones/resnet_da_cbam.py:15-40`): identity
forward, cotangent multiplied by `weight` on the backward pass (weight = -1.0
gives full reversal). In JAX this is a `custom_vjp`, which composes with jit/
vmap/shard_map and costs nothing at runtime (XLA sees identity + a scalar
multiply in the backward graph).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gradient_scalar(x: jnp.ndarray, weight: float) -> jnp.ndarray:
    return x


def _fwd(x, weight):
    return x, weight


def _bwd(weight, g):
    return (jax.tree_util.tree_map(lambda t: t * weight, g), None)


gradient_scalar.defvjp(_fwd, _bwd)


def gradient_reverse(x: jnp.ndarray, weight: float = -1.0) -> jnp.ndarray:
    """GRL: identity forward, `weight * grad` backward."""
    return gradient_scalar(x, weight)
