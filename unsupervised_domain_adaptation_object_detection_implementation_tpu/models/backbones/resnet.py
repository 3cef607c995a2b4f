"""ResNet trunk (reference `mmdet/models/backbones/resnet.py`), NHWC flax.

Supports the DA configs' DC5 shape — `strides=(1,2,2,1)`,
`dilations=(1,1,1,2)`, `out_indices=(3,)` (stride-16, dilated stage 4,
`da_configs/_base_/models/faster_rcnn_r50_torch_daf.py:9-14`) — plus the
standard FPN shape `out_indices=(0,1,2,3)`.

TPU-first choices:
- NHWC layout end-to-end (TPU conv native layout).
- `FrozenBatchNorm` folds into the convs (norm_eval=True semantics).
- `frozen_stages` is realized as `lax.stop_gradient` at the stage boundary —
  exactly equivalent for leading stages and free at runtime (the optimizer
  additionally masks those params; see `apis/train.make_optimizer`).
- parameter tree mirrors torchvision naming (`conv1`, `layer1/0/conv2`, ...)
  so the pretrained-weight converter is a pure renaming.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import BACKBONES
from ..layers.norm import FrozenBatchNorm
from ..layers.plugins import DeformConv, WSConv, build_plugin


def _norm(kind: str, features: int, name: str):
    """Trunk norm selector: 'frozen_bn' (norm_eval=True semantics,
    reference default) or 'gn' (`configs/gn/*`, `configs/gn+ws/*` —
    norm_cfg=dict(type='GN', num_groups=32))."""
    if kind == 'gn':
        return nn.GroupNorm(num_groups=32, name=name)
    return FrozenBatchNorm(features, name=name)


def _conv(conv_ws: bool, features, kernel_size, *, dtype, name,
          strides=(1, 1), padding='SAME', kernel_dilation=(1, 1),
          feature_group_count=1):
    """Conv selector: plain conv or weight-standardized conv
    (`configs/gn+ws/*` conv_cfg=dict(type='ConvWS'))."""
    cls = WSConv if conv_ws else nn.Conv
    return cls(features, kernel_size, strides=strides, padding=padding,
               kernel_dilation=kernel_dilation,
               feature_group_count=feature_group_count,
               use_bias=False, dtype=dtype, name=name)


def _as_dict(cfg):
    """Frozen tuple-of-pairs (from freeze_trunk_cfg) → dict, one level."""
    if isinstance(cfg, tuple):
        return dict(cfg)
    return dict(cfg)


def _freeze(v):
    """Recursively hashable (flax module fields must hash for jit)."""
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    return v


def _avg_down_pool(x, stride: int):
    """V1d shortcut avg-pool with torch `ceil_mode=True` semantics: odd
    dims keep a trailing window whose mean counts only VALID pixels
    (torch excludes ceil-overhang from the divisor). Matches the main
    path's pad-1 stride-2 conv output shape for any input size."""
    h, w = x.shape[-3], x.shape[-2]
    ph, pw = (-h) % stride, (-w) % stride
    win = (stride, stride)
    pads = ((0, ph), (0, pw))
    summed = nn.pool(x, 0.0, jax.lax.add, win, win, pads)
    counts = nn.pool(jnp.ones(x.shape[-3:-1] + (1,), x.dtype), 0.0,
                     jax.lax.add, win, win, pads)
    return summed / counts


class Bottleneck(nn.Module):
    """1x1 → 3x3(stride/dilation[/groups]) → 1x1 with residual — 'pytorch'
    style (stride on the 3x3, reference resnet.py Bottleneck). With
    `groups`/`base_width` set this is the ResNeXt bottleneck
    (reference `mmdet/models/backbones/resnext.py`)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 4
    avg_down: bool = False   # V1d: avgpool shortcut (resnet.py ResNetV1d)
    norm: str = 'frozen_bn'
    conv_ws: bool = False
    dcn: str = ''            # '' | 'dcn' | 'dcnv2' on conv2 (configs/dcn)
    plugins: Tuple = ()      # ((position, frozen_cfg), ...)
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    def _apply_plugins(self, out, position: str):
        for idx, (pos, cfg) in enumerate(self.plugins):
            if pos != position:
                continue
            mod = build_plugin(_as_dict(cfg), out.shape[-1], self.dtype,
                               f'plugin_{position}_{idx}')
            if mod is not None:
                out = mod(out)
        return out

    @nn.compact
    def __call__(self, x):
        identity = x
        if self.groups == 1:
            width = self.planes
        else:
            width = int(self.planes * (self.base_width / 64)) * self.groups
        out = _conv(self.conv_ws, width, (1, 1), dtype=self.dtype,
                    name='conv1')(x)
        out = _norm(self.norm, width, 'bn1')(out)
        out = nn.relu(out)
        out = self._apply_plugins(out, 'after_conv1')
        if self.dcn:
            k = 27 if self.dcn == 'dcnv2' else 18
            off = nn.Conv(k, (3, 3), strides=(self.stride, self.stride),
                          kernel_dilation=(self.dilation, self.dilation),
                          padding=[(self.dilation, self.dilation)] * 2,
                          kernel_init=nn.initializers.zeros,
                          dtype=self.dtype, name='conv2_offset')(out)
            mask = None
            if self.dcn == 'dcnv2':
                off, mask = off[..., :18], jax.nn.sigmoid(off[..., 18:])
            out = DeformConv(width, 3, strides=self.stride,
                             dilation=self.dilation, dtype=self.dtype,
                             name='conv2')(out, off, mask)
        else:
            out = _conv(self.conv_ws, width, (3, 3),
                        strides=(self.stride, self.stride),
                        kernel_dilation=(self.dilation, self.dilation),
                        padding=[(self.dilation, self.dilation)] * 2,
                        feature_group_count=self.groups,
                        dtype=self.dtype, name='conv2')(out)
        out = _norm(self.norm, width, 'bn2')(out)
        out = nn.relu(out)
        out = self._apply_plugins(out, 'after_conv2')
        out = _conv(self.conv_ws, self.planes * self.expansion, (1, 1),
                    dtype=self.dtype, name='conv3')(out)
        out = _norm(self.norm, self.planes * self.expansion, 'bn3')(out)
        out = self._apply_plugins(out, 'after_conv3')
        if self.downsample:
            identity = x
            ds_stride = self.stride
            if self.avg_down and self.stride > 1:
                identity = _avg_down_pool(identity, self.stride)
                ds_stride = 1
            identity = _conv(self.conv_ws, self.planes * self.expansion,
                             (1, 1), strides=(ds_stride, ds_stride),
                             dtype=self.dtype,
                             name='downsample_conv')(identity)
            identity = _norm(self.norm, self.planes * self.expansion,
                             'downsample_bn')(identity)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    """3x3 → 3x3 residual block (ResNet-18/34)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    avg_down: bool = False
    norm: str = 'frozen_bn'
    conv_ws: bool = False
    dtype: jnp.dtype = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.conv_ws, self.planes, (3, 3),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=[(self.dilation, self.dilation)] * 2,
                    dtype=self.dtype, name='conv1')(x)
        out = _norm(self.norm, self.planes, 'bn1')(out)
        out = nn.relu(out)
        out = _conv(self.conv_ws, self.planes, (3, 3),
                    padding=[(1, 1)] * 2, dtype=self.dtype,
                    name='conv2')(out)
        out = _norm(self.norm, self.planes, 'bn2')(out)
        if self.downsample:
            identity = x
            ds_stride = self.stride
            if self.avg_down and self.stride > 1:
                identity = _avg_down_pool(identity, self.stride)
                ds_stride = 1
            identity = _conv(self.conv_ws, self.planes, (1, 1),
                             strides=(ds_stride, ds_stride),
                             dtype=self.dtype,
                             name='downsample_conv')(identity)
            identity = _norm(self.norm, self.planes,
                             'downsample_bn')(identity)
        return nn.relu(out + identity)


ARCH_SETTINGS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


@BACKBONES.register_module()
class ResNet(nn.Module):
    depth: int = 50
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    groups: int = 1          # >1 + base_width → ResNeXt
    base_width: int = 4
    deep_stem: bool = False  # V1d: 3x 3x3 stem (reference ResNetV1d)
    avg_down: bool = False   # V1d: avgpool in downsample shortcuts
    norm: str = 'frozen_bn'  # 'gn' → configs/gn*, norm_cfg=dict(type='GN')
    conv_ws: bool = False    # configs/gn+ws, conv_cfg=dict(type='ConvWS')
    dcn: str = ''            # 'dcn'|'dcnv2' → configs/dcn backbone option
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    # ((('cfg', frozen_cfg), ('position', ...), ('stages', ...)), ...) —
    # the reference's `plugins=[dict(cfg=..., stages=..., position=...)]`
    plugins: Tuple = ()
    # rematerialize each residual block's activations in the backward pass
    # (jax.checkpoint): trades ~1/3 extra trunk FLOPs for dropping the
    # per-block activation HBM — the TPU lever for large canvases/batches
    # (no reference counterpart; torch equivalent is checkpoint_sequential)
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def stage_channels(self) -> Tuple[int, ...]:
        block, _ = ARCH_SETTINGS[self.depth]
        exp = 4 if block is Bottleneck else 1
        return tuple(self.base_channels * exp * 2**i
                     for i in range(self.num_stages))

    @nn.compact
    def __call__(self, x, return_all_stages: bool = False):
        """x: (..., H, W, 3) normalized. Returns tuple of feature maps at
        `out_indices` (or all 4 stages if `return_all_stages`)."""
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        if self.deep_stem:
            widths = (self.base_channels // 2, self.base_channels // 2,
                      self.base_channels)
            for i, w in enumerate(widths):
                x = _conv(self.conv_ws, w, (3, 3),
                          strides=(2, 2) if i == 0 else (1, 1),
                          padding=[(1, 1)] * 2, dtype=self.dtype,
                          name=f'stem{i}')(x)
                x = _norm(self.norm, w, f'stem_bn{i}')(x)
                x = nn.relu(x)
        else:
            x = _conv(self.conv_ws, self.base_channels, (7, 7),
                      strides=(2, 2), padding=[(3, 3)] * 2,
                      dtype=self.dtype, name='conv1')(x)
            x = _norm(self.norm, self.base_channels, 'bn1')(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        stage_outs = []
        for i in range(self.num_stages):
            planes = self.base_channels * 2**i
            for b in range(stage_blocks[i]):
                first = b == 0
                in_ch = x.shape[-1]
                out_ch = planes * (4 if block_cls is Bottleneck else 1)
                kwargs = dict(avg_down=self.avg_down, norm=self.norm,
                              conv_ws=self.conv_ws)
                if block_cls is Bottleneck:
                    stage_plugins = []
                    for p in self.plugins:
                        pd = _as_dict(p)
                        stages = pd.get('stages')
                        if stages is None or stages[i]:
                            cfg = pd['cfg']
                            stage_plugins.append(
                                (pd.get('position', 'after_conv3'),
                                 _freeze(cfg) if not isinstance(cfg, tuple)
                                 else cfg))
                    kwargs.update(
                        groups=self.groups, base_width=self.base_width,
                        dcn=self.dcn if self.stage_with_dcn[i] else '',
                        plugins=tuple(stage_plugins))
                cls = nn.remat(block_cls) if self.remat else block_cls
                x = cls(
                    planes=planes,
                    stride=self.strides[i] if first else 1,
                    dilation=self.dilations[i],
                    downsample=first and (self.strides[i] != 1 or
                                          in_ch != out_ch),
                    dtype=self.dtype,
                    name=f'layer{i + 1}/{b}', **kwargs)(x)
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)
            stage_outs.append(x)

        if return_all_stages:
            return tuple(stage_outs)
        return tuple(stage_outs[i] for i in self.out_indices)
