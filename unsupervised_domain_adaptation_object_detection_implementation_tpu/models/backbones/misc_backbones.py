"""Additional backbones (reference `mmdet/models/backbones/`):

- `MobileNetV2` (`mobilenet_v2.py`) — inverted residuals, width multiplier.
- `Darknet53` (`darknet.py`) — YOLOv3 trunk.
- `ResNeXt` is `ResNet(groups=32, base_width=4)` (see resnet.py).

All NHWC, live BN variants replaced with FrozenBatchNorm (detection trunks
train with frozen stats), stage outputs at strides 8/16/32 (+4 where
applicable) for FPN compatibility.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import BACKBONES
from ..layers.norm import FrozenBatchNorm


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int = 1
    expand_ratio: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        h = x
        if self.expand_ratio != 1:
            h = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        name='expand')(h)
            h = nn.relu6(FrozenBatchNorm(hidden, name='expand_bn')(h))
        h = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1)] * 2, feature_group_count=hidden,
                    use_bias=False, dtype=self.dtype, name='dw')(h)
        h = nn.relu6(FrozenBatchNorm(hidden, name='dw_bn')(h))
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name='project')(h)
        h = FrozenBatchNorm(self.out_ch, name='project_bn')(h)
        if self.stride == 1 and in_ch == self.out_ch:
            return x + h
        return h


@BACKBONES.register_module()
class MobileNetV2(nn.Module):
    """Stages end at strides 4/8/16/32 (out_indices 1/2/4/6 of the reference
    setting); returns 4 maps like ResNet for FPN reuse."""

    widen_factor: float = 1.0
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = jnp.float32

    # t (expand), c (channels), n (blocks), s (stride of first block)
    ARCH = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    def stage_channels(self) -> Tuple[int, ...]:
        w = self.widen_factor
        return tuple(int(c * w) for c in (24, 32, 96, 320))

    @nn.compact
    def __call__(self, x, return_all_stages: bool = False):
        w = self.widen_factor
        h = nn.Conv(int(32 * w), (3, 3), strides=(2, 2),
                    padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype,
                    name='stem')(x)
        h = nn.relu6(FrozenBatchNorm(int(32 * w), name='stem_bn')(h))
        outs = []
        # collect after arch stages 1 (s4), 2 (s8), 4 (s16), 6 (s32)
        collect_after = {1, 2, 4, 6}
        for si, (t, c, n, s) in enumerate(self.ARCH):
            for b in range(n):
                h = InvertedResidual(int(c * w), s if b == 0 else 1, t,
                                     dtype=self.dtype,
                                     name=f'stage{si}/block{b}')(h)
            if si in collect_after:
                outs.append(h)
        if return_all_stages:
            return tuple(outs)
        return tuple(outs[i] for i in self.out_indices)


class DarkBlock(nn.Module):
    ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch // 2, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        h = nn.leaky_relu(FrozenBatchNorm(self.ch // 2, name='bn1')(h), 0.1)
        h = nn.Conv(self.ch, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name='conv2')(h)
        h = nn.leaky_relu(FrozenBatchNorm(self.ch, name='bn2')(h), 0.1)
        return x + h


@BACKBONES.register_module()
class Darknet53(nn.Module):
    """YOLOv3 trunk (reference `darknet.py`): returns C3/C4/C5
    (256/512/1024 ch at strides 8/16/32)."""

    out_indices: Sequence[int] = (0, 1, 2)
    dtype: Any = jnp.float32

    STAGE_BLOCKS = (1, 2, 8, 8, 4)
    STAGE_CH = (64, 128, 256, 512, 1024)

    def stage_channels(self) -> Tuple[int, ...]:
        return (256, 512, 1024)

    @nn.compact
    def __call__(self, x, return_all_stages: bool = False):
        h = nn.Conv(32, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name='stem')(x)
        h = nn.leaky_relu(FrozenBatchNorm(32, name='stem_bn')(h), 0.1)
        outs = []
        for si, (n, c) in enumerate(zip(self.STAGE_BLOCKS, self.STAGE_CH)):
            h = nn.Conv(c, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                        use_bias=False, dtype=self.dtype,
                        name=f'down{si}')(h)
            h = nn.leaky_relu(FrozenBatchNorm(c, name=f'down{si}_bn')(h), 0.1)
            for b in range(n):
                h = DarkBlock(c, dtype=self.dtype,
                              name=f'stage{si}/block{b}')(h)
            if si >= 2:
                outs.append(h)
        if return_all_stages:
            return tuple(outs)
        return tuple(outs[i] for i in self.out_indices)
