"""TridentResNet (reference `mmdet/models/backbones/trident_resnet.py`).

C4-style ResNet whose LAST stage (res4 / layer3 at num_stages=3) is a
trident stage: every block runs `num_branch` parallel paths with SHARED
weights but different 3x3 dilations (1, 2, 3). Outputs either all branches
stacked along the batch axis (train) or only `test_branch_idx` (test).

TPU-first: weight sharing is expressed by owning the conv kernels as
`self.param` and applying `lax.conv_general_dilated` per branch with a
different `rhs_dilation` — one traced conv per branch, identical weights,
so XLA sees three static convs over the same kernel (no runtime dispatch).
BatchNorm (frozen) modules are plain reused submodules.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import BACKBONES
from ..layers.norm import FrozenBatchNorm
from .resnet import ARCH_SETTINGS, Bottleneck


def _conv(x, w, stride=1, dilation=1):
    pad = dilation * (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(pad, pad)] * 2, rhs_dilation=(dilation, dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class TridentBlock(nn.Module):
    """One bottleneck with shared weights applied across dilated branches."""

    planes: int
    in_channels: int
    stride: int = 1
    downsample: bool = False
    dilations: Tuple[int, ...] = (1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, branches):
        """branches: list of (B, H, W, C) — one tensor per dilation."""
        width = self.planes
        out_ch = self.planes * 4
        w1 = self.param('conv1_w', nn.initializers.he_normal(),
                        (1, 1, self.in_channels, width), self.dtype)
        w2 = self.param('conv2_w', nn.initializers.he_normal(),
                        (3, 3, width, width), self.dtype)
        w3 = self.param('conv3_w', nn.initializers.he_normal(),
                        (1, 1, width, out_ch), self.dtype)
        bn1 = FrozenBatchNorm(width, name='bn1')
        bn2 = FrozenBatchNorm(width, name='bn2')
        bn3 = FrozenBatchNorm(out_ch, name='bn3')
        if self.downsample:
            wd = self.param('downsample_w', nn.initializers.he_normal(),
                            (1, 1, self.in_channels, out_ch), self.dtype)
            bnd = FrozenBatchNorm(out_ch, name='downsample_bn')

        outs = []
        for x, d in zip(branches, self.dilations):
            identity = x
            h = nn.relu(bn1(_conv(x, w1)))
            h = nn.relu(bn2(_conv(h, w2, stride=self.stride, dilation=d)))
            h = bn3(_conv(h, w3))
            if self.downsample:
                identity = bnd(_conv(x, wd, stride=self.stride))
            outs.append(nn.relu(h + identity))
        return outs


@BACKBONES.register_module()
class TridentResNet(nn.Module):
    depth: int = 50
    num_stages: int = 3                 # C4: stem + layer1..layer3
    trident_dilations: Tuple[int, ...] = (1, 2, 3)
    test_branch_idx: int = 1
    frozen_stages: int = 1
    base_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @property
    def num_branch(self) -> int:
        return len(self.trident_dilations)

    def out_channels(self) -> int:
        return self.base_channels * 4 * 2 ** (self.num_stages - 1)

    @nn.compact
    def __call__(self, x, all_branches: bool = True):
        """Returns (B*num_branch, H/16, W/16, C) when `all_branches`, else
        the single test branch (B, ...)."""
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        assert block_cls is Bottleneck, 'TridentResNet requires depth>=50'
        x = nn.Conv(self.base_channels, (7, 7), strides=(2, 2),
                    padding=[(3, 3)] * 2, use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        x = FrozenBatchNorm(self.base_channels, name='bn1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        # plain stages up to the trident stage
        for i in range(self.num_stages - 1):
            planes = self.base_channels * 2**i
            for b in range(stage_blocks[i]):
                first = b == 0
                in_ch = x.shape[-1]
                x = Bottleneck(
                    planes=planes, stride=2 if (first and i > 0) else 1,
                    downsample=first and (i > 0 or in_ch != planes * 4),
                    dtype=self.dtype, name=f'layer{i + 1}/{b}')(x)
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)

        # trident stage (stride 2 on its first block, C4 → stride 16)
        ti = self.num_stages - 1
        planes = self.base_channels * 2**ti
        branches = [x] * self.num_branch
        for b in range(stage_blocks[ti]):
            first = b == 0
            in_ch = branches[0].shape[-1]
            branches = TridentBlock(
                planes=planes, in_channels=in_ch,
                stride=2 if first else 1, downsample=first,
                dilations=self.trident_dilations, dtype=self.dtype,
                name=f'layer{ti + 1}/{b}')(branches)
        if all_branches:
            return jnp.concatenate(branches, axis=0)
        return branches[self.test_branch_idx]
