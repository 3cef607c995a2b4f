"""Deformable convolution v1/v2 for TPU (mmcv `DeformConv2d` /
`ModulatedDeformConv2d` equivalents — used by the reference's VFNet /
RepPoints / guided-anchor heads, SURVEY.md §2.6).

TPU-first shape: the CUDA kernel's per-sample im2col becomes
  1. bilinear sampling of the input at `p0 + p_k + Δp(p, k)` — four
     flat `jnp.take` gathers (the only data-dependent addressing);
  2. one dense einsum `(..., K·C) × (K·C, Co)` — the FLOP-heavy part lands
     on the MXU as a single matmul, exactly like XLA's own im2col conv.

Offset convention matches mmcv/torchvision: `offsets[..., 2k] = Δy_k`,
`offsets[..., 2k+1] = Δx_k`, taps ordered row-major over the kernel window;
v2 adds a per-tap sigmoid-free modulation mask multiplied after sampling.
Out-of-image samples read as 0 (zero padding).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _bilinear_gather(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
                     ) -> jnp.ndarray:
    """Sample (H, W, C) at float (..., ) coords with zero padding.

    Returns (..., C)."""
    h, w, c = x.shape
    valid = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    flat = x.reshape(h * w, c)

    def tap(yi, xi, wgt):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(flat, idx.reshape(-1).astype(jnp.int32), axis=0)
        vals = vals.reshape(idx.shape + (c,))
        return vals * (wgt * inside * valid)[..., None]

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    return (tap(y0i, x0i, (1 - wy1) * (1 - wx1))
            + tap(y0i, x0i + 1, (1 - wy1) * wx1)
            + tap(y0i + 1, x0i, wy1 * (1 - wx1))
            + tap(y0i + 1, x0i + 1, wy1 * wx1))


def deform_conv2d(x: jnp.ndarray,
                  offsets: jnp.ndarray,
                  weight: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None,
                  stride: int = 1,
                  padding: Optional[int] = None,
                  dilation: int = 1,
                  mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Single image. x: (H, W, C); offsets: (Ho, Wo, 2K); weight:
    (kh, kw, C, Co); mask (v2 modulation): (Ho, Wo, K) or None.

    Returns (Ho, Wo, Co) with Ho = (H + 2p − d·(kh−1) − 1)//s + 1.
    """
    h, w, c = x.shape
    kh, kw, wc, co = weight.shape
    assert wc == c, f'weight in_channels {wc} != input {c}'
    k = kh * kw
    if padding is None:
        padding = (dilation * (kh - 1)) // 2
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    assert offsets.shape == (ho, wo, 2 * k), \
        f'offsets {offsets.shape} != {(ho, wo, 2 * k)}'

    # base sampling grid: p0 + p_k (row-major taps)
    oy = jnp.arange(ho) * stride - padding
    ox = jnp.arange(wo) * stride - padding
    ky, kx = jnp.meshgrid(jnp.arange(kh) * dilation,
                          jnp.arange(kw) * dilation, indexing='ij')
    base_y = oy[:, None, None] + ky.reshape(-1)[None, None, :]  # (Ho,1,K)
    base_x = ox[None, :, None] + kx.reshape(-1)[None, None, :]  # (1,Wo,K)
    off = offsets.reshape(ho, wo, k, 2)
    ys = base_y + off[..., 0]
    xs = base_x + off[..., 1]

    sampled = _bilinear_gather(x, ys, xs)                       # (Ho,Wo,K,C)
    if mask is not None:
        sampled = sampled * mask[..., None]
    return jnp.einsum(
        'hwkc,kco->hwo', sampled.astype(jnp.float32),
        weight.reshape(k, c, co).astype(jnp.float32),
        preferred_element_type=jnp.float32
    ).astype(x.dtype) + (0.0 if bias is None else bias)


def batched_deform_conv2d(x, offsets, weight, bias=None, stride: int = 1,
                          padding: Optional[int] = None, dilation: int = 1,
                          mask=None):
    """vmap over batch: (B,H,W,C) × (B,Ho,Wo,2K) → (B,Ho,Wo,Co)."""
    fn = lambda xi, oi, mi: deform_conv2d(  # noqa: E731
        xi, oi, weight, bias, stride, padding, dilation, mi)
    if mask is None:
        return jax.vmap(lambda xi, oi: fn(xi, oi, None))(x, offsets)
    return jax.vmap(fn)(x, offsets, mask)
