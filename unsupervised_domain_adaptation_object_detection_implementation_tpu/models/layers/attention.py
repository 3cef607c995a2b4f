"""Attention blocks used by the DA alignment heads.

- `CBAM`: channel + spatial attention (reference `CBAMLayer`,
  `mmdet/models/backbones/resnet_da_cbam.py:227`).
- `NonLocalBlock`: embedded-gaussian non-local over a token axis (reference
  `mmdet/models/roi_heads/instance_da.py:150`), re-expressed as plain
  batched matmuls over (N, D) token sets — no 1×k conv gymnastics.
- `MHSA`: multi-head self-attention with 2D relative position encodings
  (reference `mmdet/models/backbones/resnet_da_deep.py:368`).
- `SELayer`: squeeze-excitation (reference `resnet_da.py` SRM/SE variants).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class CBAM(nn.Module):
    channels: int
    reduction: int = 16
    spatial_kernel: int = 7

    @nn.compact
    def __call__(self, x):
        """x: (..., H, W, C)."""
        c = self.channels
        mlp_in = nn.Conv(c // self.reduction, (1, 1), use_bias=False,
                         name='mlp_reduce')
        mlp_out = nn.Conv(c, (1, 1), use_bias=False, name='mlp_expand')
        max_pool = jnp.max(x, axis=(-3, -2), keepdims=True)
        avg_pool = jnp.mean(x, axis=(-3, -2), keepdims=True)
        ch_att = nn.sigmoid(
            mlp_out(nn.relu(mlp_in(max_pool))) +
            mlp_out(nn.relu(mlp_in(avg_pool))))
        x = x * ch_att
        sp_max = jnp.max(x, axis=-1, keepdims=True)
        sp_avg = jnp.mean(x, axis=-1, keepdims=True)
        sp = jnp.concatenate([sp_max, sp_avg], axis=-1)
        sp_att = nn.sigmoid(nn.Conv(
            1, (self.spatial_kernel, self.spatial_kernel), use_bias=False,
            name='spatial')(sp))
        return x * sp_att


class NonLocalBlock(nn.Module):
    """Non-local over token sets: (N, C) → (N, C) with residual."""

    channels: int

    @nn.compact
    def __call__(self, x):
        inter = self.channels // 2
        phi = nn.Dense(inter, use_bias=False, name='phi')(x)      # (N, I)
        theta = nn.Dense(inter, use_bias=False, name='theta')(x)  # (N, I)
        g = nn.Dense(inter, use_bias=False, name='g')(x)          # (N, I)
        attn = nn.softmax(theta @ phi.T, axis=-1)                 # (N, N)
        y = attn @ g                                              # (N, I)
        y = nn.Dense(self.channels, use_bias=False, name='out')(y)
        return x + y


class MHSA(nn.Module):
    """Multi-head self-attention on a (H, W, C) map with relative 2D PE."""

    channels: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x):
        h, w, c = x.shape[-3:]
        heads = self.num_heads
        dh = c // heads
        q = nn.Conv(c, (1, 1), name='q')(x)
        k = nn.Conv(c, (1, 1), name='k')(x)
        v = nn.Conv(c, (1, 1), name='v')(x)
        rel_h = self.param('rel_h', nn.initializers.normal(0.02), (h, 1, c))
        rel_w = self.param('rel_w', nn.initializers.normal(0.02), (1, w, c))
        pos = (rel_h + rel_w).reshape(h * w, heads, dh)

        def split(t):
            return t.reshape(*t.shape[:-3], h * w, heads, dh)

        qs, ks, vs = split(q), split(k), split(v)
        logits = jnp.einsum('...qhd,...khd->...hqk', qs, ks)
        logits = logits + jnp.einsum('...qhd,khd->...hqk', qs, pos)
        attn = nn.softmax(logits / jnp.sqrt(dh).astype(x.dtype), axis=-1)
        out = jnp.einsum('...hqk,...khd->...qhd', attn, vs)
        return out.reshape(*x.shape[:-3], h, w, c)


class SELayer(nn.Module):
    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = nn.relu(nn.Dense(self.channels // self.reduction)(s))
        s = nn.sigmoid(nn.Dense(self.channels)(s))
        return x * s
