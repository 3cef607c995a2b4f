"""Stacked Hourglass backbone (reference
`mmdet/models/backbones/hourglass.py` — CornerNet / CentripetalNet).

HourglassNet-104: stem at stride 4, then `num_stacks` hourglass modules of
recursive down-up residual towers with skip connections, inter-stack
residual links, and per-stack output convs. The reference's recursive
`HourglassModule` maps directly to a python recursion here — depth is
static, so the whole tower unrolls into one XLA graph.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...utils.registry import BACKBONES
from ..layers.norm import FrozenBatchNorm


def _cbr(x, ch, k, s=1, name='', dtype=jnp.float32, relu=True):
    pad = (k - 1) // 2
    x = nn.Conv(ch, (k, k), strides=(s, s), padding=[(pad, pad)] * 2,
                use_bias=False, dtype=dtype, name=f'{name}_conv')(x)
    x = FrozenBatchNorm(ch, name=f'{name}_bn')(x)
    return nn.relu(x) if relu else x


class HGResidual(nn.Module):
    out_ch: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ident = x
        out = _cbr(x, self.out_ch, 3, s=self.stride, name='c1',
                   dtype=self.dtype)
        out = _cbr(out, self.out_ch, 3, name='c2', dtype=self.dtype,
                   relu=False)
        if self.stride != 1 or x.shape[-1] != self.out_ch:
            ident = _cbr(x, self.out_ch, 1, s=self.stride, name='skip',
                         dtype=self.dtype, relu=False)
        return nn.relu(out + ident)


class HourglassModule(nn.Module):
    depth: int
    stage_channels: Sequence[int]
    stage_blocks: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cur_ch = self.stage_channels[0]
        next_ch = self.stage_channels[1]
        cur_blocks = self.stage_blocks[0]

        up1 = x
        for b in range(cur_blocks):
            up1 = HGResidual(cur_ch, dtype=self.dtype, name=f'up1/{b}')(up1)

        low1 = x
        for b in range(cur_blocks):
            low1 = HGResidual(next_ch, stride=2 if b == 0 else 1,
                              dtype=self.dtype, name=f'low1/{b}')(low1)

        if self.depth > 1:
            low2 = HourglassModule(self.depth - 1, self.stage_channels[1:],
                                   self.stage_blocks[1:], self.dtype,
                                   name='low2')(low1)
        else:
            low2 = low1
            for b in range(self.stage_blocks[1]):
                low2 = HGResidual(next_ch, dtype=self.dtype,
                                  name=f'low2/{b}')(low2)

        low3 = low2
        for b in range(cur_blocks):
            last = b == cur_blocks - 1
            low3 = HGResidual(cur_ch if last else next_ch, dtype=self.dtype,
                              name=f'low3/{b}')(low3)

        b_, h_, w_, c_ = low3.shape
        up2 = jnp.repeat(jnp.repeat(low3, 2, axis=1), 2, axis=2)
        return up1 + up2


@BACKBONES.register_module()
class HourglassNet(nn.Module):
    downsample_times: int = 5
    num_stacks: int = 2
    stage_channels: Sequence[int] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Sequence[int] = (2, 2, 2, 2, 2, 4)
    feat_channel: int = 256
    dtype: jnp.dtype = jnp.float32

    def out_channels(self) -> Tuple[int, ...]:
        return tuple([self.stage_channels[0]] * self.num_stacks)

    @nn.compact
    def __call__(self, x, return_all_stages: bool = False):
        ch0 = self.stage_channels[0]
        # stem: 7x7/s2 128 + residual s2 to ch0 (stride 4 total)
        x = _cbr(x, 128, 7, s=2, name='stem1', dtype=self.dtype)
        x = HGResidual(ch0, stride=2, dtype=self.dtype, name='stem2')(x)

        outs = []
        inter = x
        for s in range(self.num_stacks):
            hg = HourglassModule(self.downsample_times, self.stage_channels,
                                 self.stage_blocks, self.dtype,
                                 name=f'hg{s}')(inter)
            feat = _cbr(hg, self.feat_channel, 3, name=f'out{s}',
                        dtype=self.dtype)
            outs.append(feat)
            if s < self.num_stacks - 1:
                # inter-stack link: 1x1 on input + 1x1 on feature, relu, res
                a = _cbr(inter, ch0, 1, name=f'remap_in{s}',
                         dtype=self.dtype, relu=False)
                b = _cbr(feat, ch0, 1, name=f'remap_out{s}',
                         dtype=self.dtype, relu=False)
                inter = HGResidual(ch0, dtype=self.dtype,
                                   name=f'inter{s}')(nn.relu(a + b))
        return tuple(outs)
