"""Pyramid Vision Transformer v1/v2 (reference
`mmdet/models/backbones/pvt.py`), NHWC flax.

Four stages of transformer blocks with spatial-reduction attention (SRA):
K/V are computed on an `sr_ratio`-downsampled token grid, so attention cost
is linear in the pyramid level. v2 differences implemented: overlapping
patch embeds (3x3-padded convs), depth-wise conv in the MLP, and
average-pool linear SRA.

TPU notes: attention runs as dense (Q·Kᵀ)V matmuls on the MXU in one einsum
per block; token grids stay in NHWC and only reshape at block boundaries,
which XLA elides.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import BACKBONES


class SRAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int = 1
    linear: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        h, w = hw
        b, n, c = x.shape
        heads = self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name='q')(x)

        kv_in = x
        if self.linear:
            # v2 linear SRA: adaptive-avg-pool to 7x7 + GELU
            grid = x.reshape(b, h, w, c)
            ph, pw = max(h // 7, 1), max(w // 7, 1)
            grid = nn.avg_pool(grid, (ph, pw), (ph, pw))
            kv_in = nn.gelu(nn.LayerNorm(name='sr_norm')(
                nn.Conv(c, (1, 1), dtype=self.dtype, name='sr')(
                    grid).reshape(b, -1, c)))
        elif self.sr_ratio > 1:
            grid = x.reshape(b, h, w, c)
            r = self.sr_ratio
            grid = nn.Conv(c, (r, r), strides=(r, r), dtype=self.dtype,
                           name='sr')(grid)
            kv_in = nn.LayerNorm(name='sr_norm')(grid.reshape(b, -1, c))

        k = nn.Dense(c, dtype=self.dtype, name='k')(kv_in)
        v = nn.Dense(c, dtype=self.dtype, name='v')(kv_in)
        m = kv_in.shape[1]
        q = q.reshape(b, n, heads, c // heads)
        k = k.reshape(b, m, heads, c // heads)
        v = v.reshape(b, m, heads, c // heads)
        attn = jnp.einsum('bnhd,bmhd->bhnm', q, k) / jnp.sqrt(c // heads)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum('bhnm,bmhd->bnhd', attn, v).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name='proj')(out)


class PVTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    sr_ratio: int = 1
    linear: bool = False
    use_dwconv: bool = False     # v2 MLP has a depthwise 3x3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        x = x + SRAttention(self.dim, self.num_heads, self.sr_ratio,
                            self.linear, self.dtype, name='attn')(
            nn.LayerNorm(name='norm1')(x), hw)
        y = nn.LayerNorm(name='norm2')(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype,
                     name='fc1')(y)
        if self.use_dwconv:
            h, w = hw
            b, n, c = y.shape
            g = y.reshape(b, h, w, c)
            g = nn.Conv(c, (3, 3), padding=[(1, 1)] * 2,
                        feature_group_count=c, dtype=self.dtype,
                        name='dwconv')(g)
            y = g.reshape(b, n, c)
        y = nn.gelu(y, approximate=False)  # exact erf: matches torch GELU
        y = nn.Dense(self.dim, dtype=self.dtype, name='fc2')(y)
        return x + y


@BACKBONES.register_module()
class PVT(nn.Module):
    """PVT-Tiny/Small by `depths`; PVTv2 via `v2=True`."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (2, 2, 2, 2)          # tiny; small = (3,4,6,3)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    v2: bool = False
    linear: bool = False
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    def stage_channels(self) -> Tuple[int, ...]:
        return tuple(self.embed_dims)

    @nn.compact
    def __call__(self, x, return_all_stages: bool = False):
        outs = []
        for i, (dim, depth) in enumerate(zip(self.embed_dims, self.depths)):
            if self.v2:
                # overlapping patch embed: 7x7/s4 then 3x3/s2
                k, s = (7, 4) if i == 0 else (3, 2)
                pad = k // 2
                x = nn.Conv(dim, (k, k), strides=(s, s),
                            padding=[(pad, pad)] * 2, dtype=self.dtype,
                            name=f'patch_embed{i}')(x)
            else:
                k = 4 if i == 0 else 2
                x = nn.Conv(dim, (k, k), strides=(k, k), dtype=self.dtype,
                            name=f'patch_embed{i}')(x)
            b, h, w, _ = x.shape
            t = nn.LayerNorm(name=f'embed_norm{i}')(x.reshape(b, h * w, dim))
            if not self.v2:
                # stored as a (1, h, w, dim) grid so pretrained tables
                # (224-input grids) can be bilinearly resized on load
                # (reference resizes in forward, mmdet pvt.py
                # AbsolutePositionEmbedding.resize_pos_embed)
                pos = self.param(f'pos_embed{i}',
                                 nn.initializers.truncated_normal(0.02),
                                 (1, h, w, dim))
                t = t + pos.reshape(1, h * w, dim)
            for d in range(depth):
                t = PVTBlock(dim, self.num_heads[i], self.mlp_ratios[i],
                             self.sr_ratios[i], self.linear and self.v2,
                             use_dwconv=self.v2, dtype=self.dtype,
                             name=f'stage{i}/block{d}')(t, (h, w))
            t = nn.LayerNorm(name=f'out_norm{i}')(t)
            x = t.reshape(b, h, w, dim)
            outs.append(x)
        if return_all_stages:
            return tuple(outs)
        return tuple(outs[i] for i in self.out_indices)
