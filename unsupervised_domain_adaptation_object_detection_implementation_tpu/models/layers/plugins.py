"""Backbone plugin bricks (reference zoo families `configs/gcnet`,
`configs/empirical_attention`, `configs/gn+ws`).

The reference injects these through the external mmcv brick registry
(`mmdet/models/backbones/resnet.py` `plugins=`/`conv_cfg=` options; no
implementation in-tree — SURVEY.md §2.6 places mmcv bricks on the
capability surface). TPU-first notes per brick below.

- `ContextBlock` — GCNet global-context block
  (`configs/gcnet/README.md` family; mmcv `ops/context_block.py`
  semantics): softmax-attention global pooling + bottleneck channel
  transform, fused residual add. One (HW,C)x(HW,1) matmul + two 1x1
  convs — all MXU work, no gathers.
- `GeneralizedAttention` — "An Empirical Study of Spatial Attention"
  factored attention (`configs/empirical_attention/*` plugin cfg:
  attention_type '0010'/'1111', kv_stride 2, num_heads 8). The four
  energy terms (query⋅key, query⋅position, bias⋅key, bias⋅position)
  are built as separable x/y relative-position terms so the whole
  block is batched matmuls over (HW, HW_kv) — no dynamic shapes.
- `WSConv` — weight-standardized convolution (`configs/gn+ws/*`,
  mmcv `ConvWS2d`): kernel is standardized over its fan-in at call
  time; XLA constant-folds the standardization into the weight when
  jitted for inference.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


class ContextBlock(nn.Module):
    """GCNet global context block (mmcv ContextBlock semantics).

    pooling_type 'att': per-pixel logit from a 1x1 conv, softmax over
    H*W, context = attention-weighted sum of features. fusion_types may
    include 'channel_add' (default in the reference's gcnet configs,
    e.g. ``mask_rcnn_r50_fpn_r4_gcb_c3-c5_1x_coco.py`` ratio=1/4) and
    'channel_mul'.
    """

    in_channels: int
    ratio: float = 1. / 4
    pooling_type: str = 'att'
    fusion_types: Tuple[str, ...] = ('channel_add',)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        planes = max(int(self.in_channels * self.ratio), 1)
        flat = x.reshape(b, h * w, c)
        if self.pooling_type == 'att':
            logits = nn.Conv(1, (1, 1), dtype=self.dtype,
                             name='conv_mask')(x).reshape(b, h * w, 1)
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
            context = jnp.einsum('bnc,bno->boc', flat.astype(jnp.float32),
                                 attn).astype(x.dtype)      # (B,1,C)
        else:  # 'avg'
            context = jnp.mean(flat, axis=1, keepdims=True)
        context = context.reshape(b, 1, 1, c)

        def transform(name):
            t = nn.Conv(planes, (1, 1), dtype=self.dtype,
                        name=f'{name}_conv1')(context)
            # mmcv uses LayerNorm([planes,1,1]) between the two convs
            t = nn.LayerNorm(name=f'{name}_ln')(t)
            t = nn.relu(t)
            return nn.Conv(c, (1, 1), dtype=self.dtype,
                           name=f'{name}_conv2')(t)

        out = x
        if 'channel_mul' in self.fusion_types:
            out = out * jax.nn.sigmoid(transform('channel_mul'))
        if 'channel_add' in self.fusion_types:
            out = out + transform('channel_add')
        return out


def _axis_position_embedding(q_len: int, kv_len: int, kv_stride: int,
                             feat_dim: int, dtype) -> jnp.ndarray:
    """Sine/cosine embedding of relative positions q - k·stride along one
    spatial axis. Returns (q_len, kv_len, feat_dim)."""
    q_pos = jnp.arange(q_len, dtype=jnp.float32)[:, None]
    k_pos = (jnp.arange(kv_len, dtype=jnp.float32) * kv_stride)[None, :]
    rel = q_pos - k_pos                                     # (Q, KV)
    half = feat_dim // 2
    freqs = 1.0 / (100.0 ** (jnp.arange(half, dtype=jnp.float32) / half))
    ang = rel[..., None] * freqs                            # (Q, KV, half)
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)],
                           axis=-1).astype(dtype)


class GeneralizedAttention(nn.Module):
    """Factored spatial self-attention (empirical-attention plugin).

    `attention_type` is a 4-char '0'/'1' string enabling the energy
    terms, matching the mmcv brick the reference configs select
    (``configs/empirical_attention/faster_rcnn_r50_fpn_attention_0010_1x_coco.py``):
      [0] query-content × key-content
      [1] query-content × relative-position
      [2] learned-bias  × key-content
      [3] learned-bias  × relative-position
    Position terms are separable over x/y: each axis contributes an
    energy matrix built from sine relative-position embeddings passed
    through a per-head linear map, added into the (HW, HW_kv) energy
    before one softmax — the same factorization mmcv uses, and ideal
    for the MXU (everything is a batched matmul over static shapes).
    """

    in_channels: int
    spatial_range: int = -1          # -1 = global (the zoo configs' value)
    num_heads: int = 8
    position_embedding_dim: int = -1
    kv_stride: int = 2
    q_stride: int = 1
    attention_type: str = '1111'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = self.num_heads
        at = [t == '1' for t in self.attention_type]
        qk_dim = max(c // heads, 16)
        v_dim = max(c // heads, 16)
        pe_dim = (self.position_embedding_dim
                  if self.position_embedding_dim > 0 else c)

        kv = x[:, ::self.kv_stride, ::self.kv_stride, :]
        hk, wk = kv.shape[1], kv.shape[2]
        nq, nk = h * w, hk * wk

        energy = jnp.zeros((b, heads, nq, nk), jnp.float32)

        if at[0] or at[1]:
            q = nn.Conv(qk_dim * heads, (1, 1), use_bias=False,
                        dtype=self.dtype, name='query_conv')(x)
            q = q.reshape(b, nq, heads, qk_dim).transpose(0, 2, 1, 3)
        if at[0] or at[2]:
            k = nn.Conv(qk_dim * heads, (1, 1), use_bias=False,
                        dtype=self.dtype, name='key_conv')(kv)
            k = k.reshape(b, nk, heads, qk_dim).transpose(0, 2, 1, 3)
        if at[0]:
            energy += jnp.einsum('bhqd,bhkd->bhqk', q, k,
                                 preferred_element_type=jnp.float32)
        if at[2]:
            appr_bias = self.param('appr_bias', nn.initializers.normal(0.01),
                                   (heads, qk_dim))
            energy += jnp.einsum('hd,bhkd->bhk', appr_bias.astype(k.dtype),
                                 k, preferred_element_type=jnp.float32
                                 )[:, :, None, :]

        if at[1] or at[3]:
            # separable x/y relative-position embeddings → per-head keys
            emb_y = _axis_position_embedding(h, hk, self.kv_stride,
                                             pe_dim, self.dtype)
            emb_x = _axis_position_embedding(w, wk, self.kv_stride,
                                             pe_dim, self.dtype)
            geom_y = nn.Dense(qk_dim * heads, use_bias=False,
                              name='geom_fc_y')(emb_y)     # (h,hk,D*heads)
            geom_x = nn.Dense(qk_dim * heads, use_bias=False,
                              name='geom_fc_x')(emb_x)
            geom_y = geom_y.reshape(h, hk, heads, qk_dim)
            geom_x = geom_x.reshape(w, wk, heads, qk_dim)
            if at[1]:
                qg = q.reshape(b, heads, h, w, qk_dim)
                # e_y: (B,heads,h,w,hk) ; e_x: (B,heads,h,w,wk)
                e_y = jnp.einsum('bnywd,yknd->bnywk', qg, geom_y,
                                 preferred_element_type=jnp.float32)
                e_x = jnp.einsum('bnywd,wknd->bnywk', qg, geom_x,
                                 preferred_element_type=jnp.float32)
                energy += (e_y[..., :, None] + e_x[..., None, :]).reshape(
                    b, heads, nq, nk)
            if at[3]:
                geom_bias = self.param('geom_bias',
                                       nn.initializers.normal(0.01),
                                       (heads, qk_dim))
                gb = geom_bias.astype(geom_y.dtype)
                be_y = jnp.einsum('nd,yknd->nyk', gb, geom_y,
                                  preferred_element_type=jnp.float32)
                be_x = jnp.einsum('nd,wknd->nwk', gb, geom_x,
                                  preferred_element_type=jnp.float32)
                bias_e = (be_y[:, :, None, :, None]
                          + be_x[:, None, :, None, :])      # (n,h,w,hk,wk)
                energy += bias_e.reshape(1, heads, nq, nk)

        if self.spatial_range >= 0:
            qy, qx = jnp.meshgrid(jnp.arange(h), jnp.arange(w),
                                  indexing='ij')
            ky, kx = jnp.meshgrid(jnp.arange(hk) * self.kv_stride,
                                  jnp.arange(wk) * self.kv_stride,
                                  indexing='ij')
            local = ((jnp.abs(qy.reshape(-1, 1) - ky.reshape(1, -1))
                      <= self.spatial_range)
                     & (jnp.abs(qx.reshape(-1, 1) - kx.reshape(1, -1))
                        <= self.spatial_range))
            energy = jnp.where(local[None, None], energy, -1e9)

        attn = jax.nn.softmax(energy, axis=-1)
        v = nn.Conv(v_dim * heads, (1, 1), use_bias=False,
                    dtype=self.dtype, name='value_conv')(kv)
        v = v.reshape(b, nk, heads, v_dim).transpose(0, 2, 1, 3)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, heads * v_dim)
        out = nn.Conv(c, (1, 1), dtype=self.dtype,
                      name='proj_conv')(out.astype(x.dtype))
        return x + out


class WSConv(nn.Module):
    """Weight-standardized conv (mmcv `ConvWS2d`, `configs/gn+ws/*`):
    kernel is zero-mean / unit-std over (kh, kw, in) per output channel
    before the convolution."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = 'SAME'
    kernel_dilation: Tuple[int, int] = (1, 1)
    feature_group_count: int = 1
    use_bias: bool = False
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1] // self.feature_group_count
        kernel = self.param('kernel', nn.initializers.he_normal(),
                            (kh, kw, in_ch, self.features))
        k32 = kernel.astype(jnp.float32)
        mean = jnp.mean(k32, axis=(0, 1, 2), keepdims=True)
        std = jnp.std(k32, axis=(0, 1, 2), keepdims=True)
        kernel = ((k32 - mean) / (std + self.eps)).astype(self.dtype)
        pad = self.padding
        if not isinstance(pad, str):
            pad = tuple(tuple(p) for p in pad)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel,
            window_strides=self.strides, padding=pad,
            rhs_dilation=self.kernel_dilation,
            feature_group_count=self.feature_group_count,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            out = out + self.param('bias', nn.initializers.zeros,
                                   (self.features,)).astype(self.dtype)
        return out


class DeformConv(nn.Module):
    """DCN v1/v2 conv layer over `ops.deform_conv` (mmcv `DeformConv2d`/
    `ModulatedDeformConv2d` module form — the reference's
    `configs/dcn/*` backbone option `dcn=dict(type='DCN'|'DCNv2')`).
    The offset (and v2 modulation-mask) conv lives in the caller so the
    parameter tree matches mmdet's `conv2_offset` naming."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, offsets, mask=None):
        from ...ops.deform_conv import batched_deform_conv2d
        k = self.kernel_size
        kernel = self.param('kernel', nn.initializers.he_normal(),
                            (k, k, x.shape[-1], self.features))
        return batched_deform_conv2d(
            x, offsets, kernel.astype(self.dtype), None,
            stride=self.strides,
            padding=(self.dilation * (k - 1)) // 2,
            dilation=self.dilation, mask=mask)


PLUGIN_TYPES = {
    'ContextBlock': ContextBlock,
    'GeneralizedAttention': GeneralizedAttention,
}


def build_plugin(cfg, in_channels: int, dtype, name: str) -> Optional[nn.Module]:
    """cfg: frozen tuple-of-pairs or dict with 'type' + kwargs."""
    cfg = dict(cfg) if not isinstance(cfg, dict) else dict(cfg)
    typ = cfg.pop('type')
    cls = PLUGIN_TYPES.get(typ)
    if cls is None:
        return None
    return cls(in_channels=in_channels, dtype=dtype, name=name, **cfg)
