"""MaskedConv2d (mmcv CUDA op — the reference's guided-anchor head,
`mmdet/models/dense_heads/guided_anchor_head.py:10`; SURVEY.md §2.6).

The CUDA kernel gathers masked positions, runs im2col conv on just those,
and scatters back into a zero tensor — a sparsity optimization. On TPU the
dense conv IS the fast path (MXU), so the mathematically identical form is
`conv(x) * mask`: positions outside the mask read 0 exactly like the
scatter into zeros.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def masked_conv2d(x: jnp.ndarray,
                  mask: jnp.ndarray,
                  weight: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None,
                  padding: int = 1) -> jnp.ndarray:
    """Args:
        x: (B, H, W, Cin).
        mask: (B, H, W) bool/float — output positions to keep.
        weight: (kh, kw, Cin, Cout).
    Returns:
        (B, H, W, Cout) with zeros where mask is off.
    """
    out = jax.lax.conv_general_dilated(
        x, weight, (1, 1), [(padding, padding), (padding, padding)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if bias is not None:
        out = out + bias
    return out * (mask > 0).astype(out.dtype)[..., None]
