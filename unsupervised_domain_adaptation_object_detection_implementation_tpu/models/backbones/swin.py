"""Swin Transformer backbone (reference `mmdet/models/backbones/swin.py:763`,
used by the "DeepAlign on Swin-T" target config in BASELINE.json).

TPU-first implementation notes:
- window partition/merge are pure reshapes/transposes on static shapes;
- shifted windows use `jnp.roll` + a precomputed (numpy, trace-time) additive
  attention mask — no dynamic slicing;
- relative position bias tables are gathered once per block with a static
  index map;
- all attention is batched einsum over (windows, heads, tokens) — MXU-shaped.

Feature maps return NHWC at strides 4/8/16/32 like ResNet, so FPN and the DA
alignment taps compose unchanged.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.registry import BACKBONES


def _rel_pos_index(ws: int) -> np.ndarray:
    """(ws², ws²) indices into the (2ws-1)² relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing='ij')).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Additive attention mask for shifted windows: (nW, ws², ws²)."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wslice in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wslice] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    mask = (win[:, :, None] != win[:, None, :]).astype(np.float32) * -100.0
    return mask


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (nW, T, C) window tokens; mask: (nW0, T, T) or None."""
        ws = self.window_size
        t = ws * ws
        heads = self.num_heads
        dh = self.dim // heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name='qkv')(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(a):
            return a.reshape(*a.shape[:-1], heads, dh)

        q, k, v = map(split_heads, (q, k, v))
        attn = jnp.einsum('...qhd,...khd->...hqk', q, k) * (dh ** -0.5)
        table = self.param(
            'rel_bias', nn.initializers.normal(0.02),
            ((2 * ws - 1) ** 2, heads))
        idx = _rel_pos_index(ws)
        bias = table[idx.reshape(-1)].reshape(t, t, heads)
        attn = attn + bias.transpose(2, 0, 1).astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(-1, nw, heads, t, t) + \
                mask[None, :, None, :, :].astype(attn.dtype)
            attn = attn.reshape(-1, heads, t, t)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum('...hqk,...khd->...qhd', attn, v)
        out = out.reshape(*x.shape[:-1], self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name='proj')(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C); H, W divisible by window_size."""
        b, h, w, c = x.shape
        ws = self.window_size
        res = x
        x = nn.LayerNorm(dtype=self.dtype, name='norm1')(x)
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(h, w, ws, self.shift))
        else:
            mask = None
        # window partition: (B*nW, ws*ws, C)
        xw = x.reshape(b, h // ws, ws, w // ws, ws, c)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        xw = WindowAttention(self.dim, self.num_heads, ws,
                             dtype=self.dtype, name='attn')(xw, mask)
        x = xw.reshape(b, h // ws, w // ws, ws, ws, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
        if self.shift:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = res + x
        res = x
        x = nn.LayerNorm(dtype=self.dtype, name='norm2')(x)
        hidden = int(self.dim * self.mlp_ratio)
        x = nn.Dense(hidden, dtype=self.dtype, name='mlp_fc1')(x)
        x = nn.gelu(x, approximate=False)  # exact erf: matches torch GELU

        x = nn.Dense(self.dim, dtype=self.dtype, name='mlp_fc2')(x)
        return res + x


@BACKBONES.register_module()
class SwinTransformer(nn.Module):
    """Swin-T defaults (embed 96, depths 2/2/6/2, heads 3/6/12/24)."""

    embed_dims: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    dtype: Any = jnp.float32

    def stage_channels(self) -> Tuple[int, ...]:
        return tuple(self.embed_dims * 2**i for i in range(len(self.depths)))

    @nn.compact
    def __call__(self, x, return_all_stages: bool = False):
        """x: (B, H, W, 3); H, W must be divisible by 4*window_size... padded
        inputs from the static canvas satisfy this by construction."""
        b, h, w, _ = x.shape
        ws = self.window_size
        x = nn.Conv(self.embed_dims, (4, 4), strides=(4, 4),
                    dtype=self.dtype, name='patch_embed')(x)
        x = nn.LayerNorm(dtype=self.dtype, name='patch_norm')(x)
        outs = []
        dim = self.embed_dims
        for i, depth in enumerate(self.depths):
            # pad to window multiple (static)
            hh, ww = x.shape[1], x.shape[2]
            ph = (-hh) % ws
            pw = (-ww) % ws
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            for d in range(depth):
                x = SwinBlock(dim=dim, num_heads=self.num_heads[i],
                              window_size=ws,
                              shift=0 if d % 2 == 0 else ws // 2,
                              dtype=self.dtype, name=f'stage{i}/block{d}')(x)
            x = x[:, :hh, :ww]
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)
            outs.append(nn.LayerNorm(dtype=self.dtype,
                                     name=f'out_norm{i}')(x))
            if i < len(self.depths) - 1:
                # patch merging: 2x2 concat + linear reduce
                hh2, ww2 = x.shape[1] // 2 * 2, x.shape[2] // 2 * 2
                xm = x[:, :hh2, :ww2]
                xm = xm.reshape(b, hh2 // 2, 2, ww2 // 2, 2, dim)
                xm = xm.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, hh2 // 2, ww2 // 2, 4 * dim)
                xm = nn.LayerNorm(dtype=self.dtype, name=f'merge_norm{i}')(xm)
                x = nn.Dense(2 * dim, use_bias=False, dtype=self.dtype,
                             name=f'merge_reduce{i}')(xm)
                dim *= 2
        if return_all_stages:
            return tuple(outs)
        return tuple(outs[i] for i in self.out_indices)
