"""CSPDarknet backbone for YOLOX (reference
`mmdet/models/backbones/csp_darknet.py:169` arch P5, `models/utils/csp_layer.py`).

NHWC / flax. Unlike the detection trunks (FrozenBatchNorm — pretrained,
norm_eval), YOLOX trains from scratch with live BN (momentum 0.03,
eps 1e-3), so these modules thread a `train` flag into `nn.BatchNorm`
(`batch_stats` updates happen inside the jitted train step via `mutable`).
The Focus stem is a space-to-depth reshape (layout change only — XLA fuses
it into the following conv) instead of the reference's four strided slices.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...utils.registry import BACKBONES

# P5: (in, out, num_blocks, add_identity, use_spp) per stage
P5_ARCH = ((64, 128, 3, True, False), (128, 256, 9, True, False),
           (256, 512, 9, True, False), (512, 1024, 3, False, True))


class ConvBN(nn.Module):
    """Conv + BN(momentum .03, eps 1e-3) + SiLU — mmcv ConvModule with the
    YOLOX norm/act config."""
    out_ch: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        p = self.kernel // 2
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p)] * 2, use_bias=False, dtype=self.dtype,
                    name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name='bn')(x)
        return nn.silu(x)


class DarknetBottleneck(nn.Module):
    """1×1 reduce → 3×3 expand (+identity) (`csp_layer.py:32`)."""
    out_ch: int
    add_identity: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        hidden = self.out_ch // 2
        out = ConvBN(hidden, 1, dtype=self.dtype, name='conv1')(x, train)
        out = ConvBN(self.out_ch, 3, dtype=self.dtype, name='conv2')(out,
                                                                     train)
        if self.add_identity and x.shape[-1] == self.out_ch:
            return out + x
        return out


class CSPLayer(nn.Module):
    """Cross-stage-partial block (`csp_layer.py:75`): split into main
    (bottleneck chain) + shortcut 1×1 paths, concat, fuse 1×1."""
    out_ch: int
    num_blocks: int = 1
    add_identity: bool = True
    expand_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = int(self.out_ch * self.expand_ratio)
        main = ConvBN(mid, 1, dtype=self.dtype, name='main_conv')(x, train)
        short = ConvBN(mid, 1, dtype=self.dtype, name='short_conv')(x, train)
        for i in range(self.num_blocks):
            main = DarknetBottleneck(mid, self.add_identity,
                                     dtype=self.dtype,
                                     name=f'block{i}')(main, train)
        out = jnp.concatenate([main, short], axis=-1)
        return ConvBN(self.out_ch, 1, dtype=self.dtype,
                      name='final_conv')(out, train)


class SPPBottleneck(nn.Module):
    """SPP: parallel max-pools at kernel sizes (5, 9, 13)
    (`csp_darknet.py:67`)."""
    out_ch: int
    kernel_sizes: Sequence[int] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = x.shape[-1] // 2
        x = ConvBN(mid, 1, dtype=self.dtype, name='conv1')(x, train)
        pools = [x] + [
            nn.max_pool(x, (k, k), strides=(1, 1),
                        padding=[(k // 2, k // 2)] * 2)
            for k in self.kernel_sizes]
        x = jnp.concatenate(pools, axis=-1)
        return ConvBN(self.out_ch, 1, dtype=self.dtype, name='conv2')(x,
                                                                      train)


@BACKBONES.register_module()
class CSPDarknet(nn.Module):
    """P5 CSPDarknet (`csp_darknet.py:169`). Returns stages at
    `out_indices` (default (2, 3, 4): strides 8/16/32)."""
    deepen_factor: float = 0.33      # YOLOX-s defaults
    widen_factor: float = 0.5
    out_indices: Sequence[int] = (2, 3, 4)
    dtype: Any = jnp.float32

    def stage_channels(self) -> Tuple[int, ...]:
        chans = [int(P5_ARCH[0][0] * self.widen_factor)] + [
            int(c_out * self.widen_factor) for _, c_out, _, _, _ in P5_ARCH]
        return tuple(chans[i] for i in self.out_indices)

    @nn.compact
    def __call__(self, x, train: bool = True):
        # Focus stem: space-to-depth (2×2 → channels) then 3×3 conv.
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = ConvBN(int(P5_ARCH[0][0] * self.widen_factor), 3,
                   dtype=self.dtype, name='stem')(x, train)

        outs = [x]
        for i, (_, c_out, n_blocks, add_id, use_spp) in enumerate(P5_ARCH):
            c_out = int(c_out * self.widen_factor)
            n_blocks = max(round(n_blocks * self.deepen_factor), 1)
            x = ConvBN(c_out, 3, stride=2, dtype=self.dtype,
                       name=f'stage{i + 1}_down')(x, train)
            if use_spp:
                x = SPPBottleneck(c_out, dtype=self.dtype,
                                  name=f'stage{i + 1}_spp')(x, train)
            x = CSPLayer(c_out, n_blocks, add_identity=add_id,
                         dtype=self.dtype, name=f'stage{i + 1}_csp')(x, train)
            outs.append(x)
        return tuple(outs[i] for i in self.out_indices)
