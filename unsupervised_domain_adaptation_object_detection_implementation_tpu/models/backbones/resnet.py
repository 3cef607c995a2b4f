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
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        identity = x
        if self.groups == 1:
            width = self.planes
        else:
            width = int(self.planes * (self.base_width / 64)) * self.groups
        out = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                      name='conv1')(x)
        out = FrozenBatchNorm(width, name='bn1')(out)
        out = nn.relu(out)
        out = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                      kernel_dilation=(self.dilation, self.dilation),
                      padding=[(self.dilation, self.dilation)] * 2,
                      feature_group_count=self.groups,
                      use_bias=False, dtype=self.dtype, name='conv2')(out)
        out = FrozenBatchNorm(width, name='bn2')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype, name='conv3')(out)
        out = FrozenBatchNorm(self.planes * self.expansion, name='bn3')(out)
        if self.downsample:
            identity = x
            ds_stride = self.stride
            if self.avg_down and self.stride > 1:
                identity = _avg_down_pool(identity, self.stride)
                ds_stride = 1
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(ds_stride, ds_stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample_conv')(identity)
            identity = FrozenBatchNorm(self.planes * self.expansion,
                                       name='downsample_bn')(identity)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    """3x3 → 3x3 residual block (ResNet-18/34)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    avg_down: bool = False
    dtype: jnp.dtype = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      kernel_dilation=(self.dilation, self.dilation),
                      padding=[(self.dilation, self.dilation)] * 2,
                      use_bias=False, dtype=self.dtype, name='conv1')(x)
        out = FrozenBatchNorm(self.planes, name='bn1')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=[(1, 1)] * 2,
                      use_bias=False, dtype=self.dtype, name='conv2')(out)
        out = FrozenBatchNorm(self.planes, name='bn2')(out)
        if self.downsample:
            identity = x
            ds_stride = self.stride
            if self.avg_down and self.stride > 1:
                identity = _avg_down_pool(identity, self.stride)
                ds_stride = 1
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(ds_stride, ds_stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample_conv')(identity)
            identity = FrozenBatchNorm(self.planes, name='downsample_bn')(identity)
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
                x = nn.Conv(w, (3, 3), strides=(2, 2) if i == 0 else (1, 1),
                            padding=[(1, 1)] * 2, use_bias=False,
                            dtype=self.dtype, name=f'stem{i}')(x)
                x = FrozenBatchNorm(w, name=f'stem_bn{i}')(x)
                x = nn.relu(x)
        else:
            x = nn.Conv(self.base_channels, (7, 7), strides=(2, 2),
                        padding=[(3, 3)] * 2, use_bias=False,
                        dtype=self.dtype, name='conv1')(x)
            x = FrozenBatchNorm(self.base_channels, name='bn1')(x)
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
                kwargs = dict(avg_down=self.avg_down)
                if block_cls is Bottleneck:
                    kwargs.update(groups=self.groups,
                                  base_width=self.base_width)
                x = block_cls(
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
