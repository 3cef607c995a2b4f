"""Multi-scale deformable attention core (mmcv
`MultiScaleDeformableAttention` CUDA op — the reference's DeformableDETR
path, `mmdet/models/utils/transformer.py`; SURVEY.md §2.6).

The CUDA kernel bilinearly samples `num_points` locations per head per
level from a concatenated multi-level value tensor and blends them with
softmaxed attention weights. TPU shape: per level a 4-tap flat gather
(same addressing pattern as `deform_conv`), then one weighted sum —
the surrounding projections (value/output/query) are the caller's matmuls.

Grid convention matches the CUDA kernel: sampling locations are normalized
to [0, 1] per level and map to pixel space as `p · size − 0.5`
(align_corners=False), out-of-range taps read 0.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def ms_deform_attn_core(value: jnp.ndarray,
                        spatial_shapes: Sequence[Tuple[int, int]],
                        sampling_locations: jnp.ndarray,
                        attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Sample-and-blend.

    Args:
        value: (B, sum(H·W), M, D) multi-level values, levels concatenated
            in `spatial_shapes` order. M = heads, D = head dim.
        spatial_shapes: static python list of (H, W) per level.
        sampling_locations: (B, Q, M, L, P, 2) normalized (x, y) in [0,1].
        attention_weights: (B, Q, M, L, P), already softmaxed over L·P.
    Returns:
        (B, Q, M·D)
    """
    b, _, m, d = value.shape
    _, q, _, L, P, _ = sampling_locations.shape

    out = jnp.zeros((b, q, m, d), value.dtype)
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, offset:offset + h * w]                 # (B, HW, M, D)
        offset += h * w
        v = v.transpose(0, 2, 1, 3).reshape(b * m, h * w, d)

        loc = sampling_locations[:, :, :, lvl]              # (B, Q, M, P, 2)
        xs = loc[..., 0] * w - 0.5
        ys = loc[..., 1] * h - 0.5
        xs = xs.transpose(0, 2, 1, 3).reshape(b * m, q, P)
        ys = ys.transpose(0, 2, 1, 3).reshape(b * m, q, P)

        y0 = jnp.floor(ys)
        x0 = jnp.floor(xs)
        wy1 = ys - y0
        wx1 = xs - x0

        def tap(yi, xi, wgt, v=v):
            inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            vals = jnp.take_along_axis(
                v[:, :, None, :],
                idx.reshape(b * m, q * P, 1, 1).astype(jnp.int32), axis=1)
            vals = vals.reshape(b * m, q, P, d)
            return vals * (wgt * inside)[..., None]

        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        sampled = (tap(y0i, x0i, (1 - wy1) * (1 - wx1))
                   + tap(y0i, x0i + 1, (1 - wy1) * wx1)
                   + tap(y0i + 1, x0i, wy1 * (1 - wx1))
                   + tap(y0i + 1, x0i + 1, wy1 * wx1))       # (BM, Q, P, D)

        aw = attention_weights[:, :, :, lvl]                 # (B, Q, M, P)
        aw = aw.transpose(0, 2, 1, 3).reshape(b * m, q, P)
        blended = jnp.sum(sampled * aw[..., None], axis=2)   # (BM, Q, D)
        out = out + blended.reshape(b, m, q, d).transpose(0, 2, 1, 3)

    return out.reshape(b, q, m * d)
