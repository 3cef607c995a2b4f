"""Merge cells (mmcv `GlobalPoolingCell`/`SumCell`/`ConcatCell` — used by
the reference's NAS-FPN and FPG necks, SURVEY.md §2.6).

Each cell resizes two inputs to a common target size (bilinear up /
max-pool down, matching mmcv `_resize`) and fuses them. The learned
out-conv that mmcv wraps around the fusion lives in the caller's flax
module; these are the pure fusion ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_to(x: jnp.ndarray, size) -> jnp.ndarray:
    """mmcv BaseMergeCell._resize: bilinear upsample; max-pool downsample
    by integer factor. NHWC."""
    h, w = x.shape[1], x.shape[2]
    th, tw = size
    if (th, tw) == (h, w):
        return x
    if th > h:
        return jax.image.resize(x, (x.shape[0], th, tw, x.shape[3]),
                                method='nearest')
    # downsample: pad to multiple then max-pool with kernel=stride=factor
    kh, kw = h // th, w // tw
    ph, pw = -h % kh, -w % kw
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, kh, kw, 1), (1, kh, kw, 1), 'VALID')


def sum_cell(a: jnp.ndarray, b: jnp.ndarray, out_size) -> jnp.ndarray:
    return resize_to(a, out_size) + resize_to(b, out_size)


def concat_cell(a: jnp.ndarray, b: jnp.ndarray, out_size) -> jnp.ndarray:
    return jnp.concatenate([resize_to(a, out_size),
                            resize_to(b, out_size)], axis=-1)


def global_pooling_cell(a: jnp.ndarray, b: jnp.ndarray,
                        out_size) -> jnp.ndarray:
    """a gated by global-pooled sigmoid attention of b, then summed."""
    a = resize_to(a, out_size)
    b = resize_to(b, out_size)
    gate = jax.nn.sigmoid(jnp.mean(b, axis=(1, 2), keepdims=True))
    return a * gate + b
