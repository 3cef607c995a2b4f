"""HRNet (reference `mmdet/models/backbones/hrnet.py`), NHWC flax.

High-resolution net: parallel multi-resolution branches with repeated
exchange (fuse) units. The reference's nested ModuleList machinery becomes
a flat pair of loops over (stage, module, branch); fuse units are
1x1-conv + nearest-upsample going up and chained stride-2 3x3s going down,
exactly the reference topology.

Stage schedule (hrnetv2p_w18/32/40): stage1 = 4 Bottlenecks at stride 4;
stages 2/3/4 have (1, 4, 3) modules of 4 BasicBlocks per branch with
(2, 3, 4) branches. Outputs all four branch maps (strides 4/8/16/32).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import BACKBONES
from ..layers.norm import FrozenBatchNorm


def _gn_groups(ch: int) -> int:
    """Largest divisor of ch that is <= 32 (HRNet widths 18/36/... are not
    32-divisible)."""
    for g in range(min(32, ch), 0, -1):
        if ch % g == 0:
            return g
    return 1


def _cbr(x, ch, k, s=1, name='', dtype=jnp.float32, relu=True,
         norm='frozen_bn'):
    pad = (k - 1) // 2
    x = nn.Conv(ch, (k, k), strides=(s, s), padding=[(pad, pad)] * 2,
                use_bias=False, dtype=dtype, name=f'{name}_conv')(x)
    if norm == 'gn':
        # from-scratch recipe: FrozenBatchNorm is an identity without
        # pretrained stats, and HRNet's multi-branch fusion sums blow up
        # without live normalization (measured: AP50 0.0/0.06 on the synth
        # trunk wave at lr 1e-2/2.5e-3); GN trains (r5)
        x = nn.GroupNorm(num_groups=_gn_groups(ch), name=f'{name}_bn')(x)
    else:
        x = FrozenBatchNorm(ch, name=f'{name}_bn')(x)
    return nn.relu(x) if relu else x


class HRBasicBlock(nn.Module):
    planes: int
    downsample: bool = False
    norm: str = 'frozen_bn'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ident = x
        out = _cbr(x, self.planes, 3, name='c1', dtype=self.dtype, norm=self.norm)
        out = _cbr(out, self.planes, 3, name='c2', dtype=self.dtype,
                   relu=False, norm=self.norm)
        if self.downsample:
            ident = _cbr(x, self.planes, 1, name='down', dtype=self.dtype,
                         relu=False, norm=self.norm)
        return nn.relu(out + ident)


class HRBottleneck(nn.Module):
    planes: int
    downsample: bool = False
    norm: str = 'frozen_bn'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ident = x
        out = _cbr(x, self.planes, 1, name='c1', dtype=self.dtype, norm=self.norm)
        out = _cbr(out, self.planes, 3, name='c2', dtype=self.dtype, norm=self.norm)
        out = _cbr(out, self.planes * 4, 1, name='c3', dtype=self.dtype,
                   relu=False, norm=self.norm)
        if self.downsample:
            ident = _cbr(x, self.planes * 4, 1, name='down',
                         dtype=self.dtype, relu=False, norm=self.norm)
        return nn.relu(out + ident)


@BACKBONES.register_module()
class HRNet(nn.Module):
    base_width: int = 32      # w18 / w32 / w40
    num_modules: Sequence[int] = (1, 4, 3)      # stages 2/3/4
    blocks_per_branch: int = 4
    frozen_stages: int = -1
    norm: str = 'frozen_bn'   # 'gn' for from-scratch training (see _cbr)
    dtype: jnp.dtype = jnp.float32

    def stage_channels(self) -> Tuple[int, ...]:
        w = self.base_width
        return (w, w * 2, w * 4, w * 8)

    @nn.compact
    def __call__(self, x, return_all_stages: bool = False):
        w = self.base_width
        widths = [w, w * 2, w * 4, w * 8]

        # stem: two stride-2 3x3s
        x = _cbr(x, 64, 3, s=2, name='stem1', dtype=self.dtype, norm=self.norm)
        x = _cbr(x, 64, 3, s=2, name='stem2', dtype=self.dtype, norm=self.norm)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        # stage 1: 4 bottlenecks at stride 4
        for b in range(4):
            x = HRBottleneck(planes=64, downsample=(b == 0),
                             norm=self.norm,
                             dtype=self.dtype, name=f'layer1/{b}')(x)

        # transition to 2 branches
        branches = [
            _cbr(x, widths[0], 3, name='trans1_0', dtype=self.dtype, norm=self.norm),
            _cbr(x, widths[1], 3, s=2, name='trans1_1', dtype=self.dtype, norm=self.norm),
        ]

        for stage, (n_mod, n_br) in enumerate(
                zip(self.num_modules, (2, 3, 4)), start=2):
            # add a new branch from the lowest-resolution one
            if len(branches) < n_br:
                branches.append(
                    _cbr(branches[-1], widths[n_br - 1], 3, s=2,
                         name=f'trans{stage - 1}_{n_br - 1}',
                         dtype=self.dtype, norm=self.norm))
            for m in range(n_mod):
                # per-branch residual blocks
                for bi in range(n_br):
                    for blk in range(self.blocks_per_branch):
                        branches[bi] = HRBasicBlock(
                            planes=widths[bi], norm=self.norm,
                            downsample=False, dtype=self.dtype,
                            name=f's{stage}m{m}b{bi}/{blk}')(branches[bi])
                # fuse: every branch receives every other, resized
                fused = []
                for i in range(n_br):
                    acc = branches[i]
                    for j in range(n_br):
                        if j == i:
                            continue
                        src = branches[j]
                        if j > i:        # lower res -> upsample + 1x1
                            src = _cbr(src, widths[i], 1,
                                       name=f's{stage}m{m}f{i}_{j}',
                                       dtype=self.dtype, relu=False, norm=self.norm)
                            factor = 2 ** (j - i)
                            b_, h_, w_, c_ = src.shape
                            src = jax.image.resize(
                                src, (b_, h_ * factor, w_ * factor, c_),
                                method='nearest')
                        else:            # higher res -> chained stride-2 3x3
                            for step in range(i - j):
                                last = step == i - j - 1
                                src = _cbr(
                                    src, widths[i] if last else widths[j],
                                    3, s=2,
                                    name=f's{stage}m{m}f{i}_{j}_{step}',
                                    dtype=self.dtype, relu=not last, norm=self.norm)
                        acc = acc + src
                    fused.append(nn.relu(acc))
                branches = fused
            if self.frozen_stages >= stage:
                branches = [jax.lax.stop_gradient(b) for b in branches]

        return tuple(branches)
