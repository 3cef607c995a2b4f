"""Corner pooling (mmcv `CornerPool` CUDA op — used by the reference's
CornerNet/CentripetalNet heads, SURVEY.md §2.6).

The CUDA kernel is a directional running max; on TPU this is exactly a
reversed `cummax` along one spatial axis — a single XLA scan, no gathers.
Layout NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cummax(x: jnp.ndarray, axis: int, reverse: bool) -> jnp.ndarray:
    return jax.lax.associative_scan(jnp.maximum, x, axis=axis,
                                    reverse=reverse)


def top_pool(x: jnp.ndarray) -> jnp.ndarray:
    """max over rows i..H-1 (scan upward): NHWC axis 1, reversed."""
    return _cummax(x, axis=1, reverse=True)


def bottom_pool(x: jnp.ndarray) -> jnp.ndarray:
    return _cummax(x, axis=1, reverse=False)


def left_pool(x: jnp.ndarray) -> jnp.ndarray:
    return _cummax(x, axis=2, reverse=True)


def right_pool(x: jnp.ndarray) -> jnp.ndarray:
    return _cummax(x, axis=2, reverse=False)


def corner_pool(x: jnp.ndarray, mode: str) -> jnp.ndarray:
    return {'top': top_pool, 'bottom': bottom_pool,
            'left': left_pool, 'right': right_pool}[mode](x)
