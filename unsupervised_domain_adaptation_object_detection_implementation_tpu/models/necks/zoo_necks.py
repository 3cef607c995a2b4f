"""Second-wave necks: BFP, ChannelMapper, HRFPN, DilatedEncoder, SSDNeck,
CTResNetNeck, NASFCOS_FPN, FPN_CARAFE, NASFPN.

References: `mmdet/models/necks/bfp.py` (Libra balanced feature pyramid),
`channel_mapper.py` (DETR-family), `hrfpn.py` (HRNet pyramid),
`dilated_encoder.py` (YOLOF), `ssd_neck.py`, `ct_resnet_neck.py`
(CenterNet upsampling; deform conv), `nasfcos_fpn.py`, `fpn_carafe.py`,
`nas_fpn.py` (merge-cell search result).

All are flax NHWC modules taking `tuple(features)` → `tuple(features)`
like `FPN`. Resizes use nearest interpolation (the reference default) so
the up/down paths stay gather-free.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import NECKS
from ...ops import (carafe_normalized, batched_deform_conv2d, sum_cell,
                    global_pooling_cell)
from ..layers.norm import FrozenBatchNorm


def _resize(x, hw, method='nearest'):
    return jax.image.resize(
        x, (*x.shape[:-3], hw[0], hw[1], x.shape[-1]), method=method)


@NECKS.register_module()
class ChannelMapper(nn.Module):
    """Per-level 1x1(+GN) projection (`channel_mapper.py:11`), used by
    DETR-family heads; optional extra stride-2 convs like its config."""

    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    kernel_size: int = 1
    num_outs: int = 0           # 0 -> len(in_channels)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        pad = (self.kernel_size - 1) // 2
        outs = [
            nn.GroupNorm(num_groups=32, name=f'gn_{i}')(
                nn.Conv(self.out_channels,
                        (self.kernel_size, self.kernel_size),
                        padding=[(pad, pad)] * 2, dtype=self.dtype,
                        name=f'conv_{i}')(x))
            for i, x in enumerate(inputs)
        ]
        extra = (self.num_outs or len(outs)) - len(outs)
        src = inputs[-1]
        for i in range(extra):
            src = nn.GroupNorm(num_groups=32, name=f'extra_gn_{i}')(
                nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=[(1, 1)] * 2, dtype=self.dtype,
                        name=f'extra_conv_{i}')(src))
            outs.append(src)
        return tuple(outs)


@NECKS.register_module()
class BFP(nn.Module):
    """Balanced Feature Pyramid (`bfp.py:12`, Libra R-CNN): resize all
    levels to the `refine_level`, average, refine (conv or non-local),
    scatter the residual back to every level."""

    in_channels: int = 256
    num_levels: int = 5
    refine_level: int = 2
    refine_type: str = 'conv'    # 'conv' | 'non_local' | 'none'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == self.num_levels
        target_hw = inputs[self.refine_level].shape[-3:-1]
        gathered = [x if i == self.refine_level else _resize(x, target_hw)
                    for i, x in enumerate(inputs)]
        bsf = sum(gathered) / self.num_levels

        if self.refine_type == 'conv':
            bsf = nn.Conv(self.in_channels, (3, 3), padding=[(1, 1)] * 2,
                          dtype=self.dtype, name='refine')(bsf)
        elif self.refine_type == 'non_local':
            b, h, w, c = bsf.shape
            q = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name='nl_q')(bsf)
            k = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name='nl_k')(bsf)
            v = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name='nl_v')(bsf)
            att = jax.nn.softmax(
                jnp.einsum('bijc,bklc->bijkl', q, k).reshape(b, h, w, h * w),
                axis=-1)
            o = jnp.einsum('bijn,bnc->bijc', att,
                           v.reshape(b, h * w, c // 2))
            bsf = bsf + nn.Conv(c, (1, 1), dtype=self.dtype,
                                name='nl_out')(o)

        return tuple(x + _resize(bsf, x.shape[-3:-1])
                     for x in inputs)


@NECKS.register_module()
class HRFPN(nn.Module):
    """HRNet pyramid (`hrfpn.py:11`): concat all branches at the highest
    resolution, 1x1 reduce, then avg-pool to `num_outs` levels with a 3x3
    per level."""

    in_channels: Sequence[int] = (18, 36, 72, 144)
    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        hw = inputs[0].shape[-3:-1]
        cat = jnp.concatenate(
            [inputs[0]] + [_resize(x, hw, 'bilinear') for x in inputs[1:]],
            axis=-1)
        feat = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name='reduce')(cat)
        outs = []
        for i in range(self.num_outs):
            p = feat if i == 0 else nn.avg_pool(
                feat, (2**i, 2**i), (2**i, 2**i))
            outs.append(nn.Conv(self.out_channels, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name=f'fpn_conv_{i}')(p))
        return tuple(outs)


@NECKS.register_module()
class DilatedEncoder(nn.Module):
    """YOLOF neck (`dilated_encoder.py:10`): project C5 then stack 4
    dilated residual bottlenecks — one level out."""

    in_channels: int = 2048
    out_channels: int = 512
    block_mid_channels: int = 128
    block_dilations: Sequence[int] = (2, 4, 6, 8)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        x = inputs[-1]
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name='lateral')(x)
        x = FrozenBatchNorm(self.out_channels, name='lateral_bn')(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name='fpn_conv')(x)
        x = FrozenBatchNorm(self.out_channels, name='fpn_bn')(x)
        for i, d in enumerate(self.block_dilations):
            ident = x
            h = nn.relu(FrozenBatchNorm(self.block_mid_channels,
                                        name=f'b{i}_bn1')(
                nn.Conv(self.block_mid_channels, (1, 1), dtype=self.dtype,
                        name=f'b{i}_c1')(x)))
            h = nn.relu(FrozenBatchNorm(self.block_mid_channels,
                                        name=f'b{i}_bn2')(
                nn.Conv(self.block_mid_channels, (3, 3),
                        kernel_dilation=(d, d), padding=[(d, d)] * 2,
                        dtype=self.dtype, name=f'b{i}_c2')(h)))
            h = nn.relu(FrozenBatchNorm(self.out_channels,
                                        name=f'b{i}_bn3')(
                nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name=f'b{i}_c3')(h)))
            x = ident + h
        return (x,)


@NECKS.register_module()
class SSDNeck(nn.Module):
    """SSD extra-layer tower as a standalone neck (`ssd_neck.py:10`) for
    backbones that don't inline it (e.g. MobileNetV2 SSDLite)."""

    in_channels: Sequence[int] = (96, 1280)
    out_channels: Sequence[int] = (96, 1280, 512, 256, 256, 128)
    level_strides: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        outs = list(inputs)
        x = inputs[-1]
        for i, (c, s) in enumerate(zip(self.out_channels[len(inputs):],
                                       self.level_strides)):
            mid = c // 2
            x = nn.relu(nn.Conv(mid, (1, 1), dtype=self.dtype,
                                name=f'extra{i}_1')(x))
            x = nn.relu(nn.Conv(c, (3, 3), strides=(s, s),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name=f'extra{i}_2')(x))
            outs.append(x)
        return tuple(outs)


@NECKS.register_module()
class CTResNetNeck(nn.Module):
    """CenterNet neck (`ct_resnet_neck.py:10`): three deform-conv +
    nearest-upsample steps from C5 to stride 4."""

    in_channels: int = 2048
    num_deconv_filters: Sequence[int] = (256, 128, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        x = inputs[-1]
        for i, ch in enumerate(self.num_deconv_filters):
            # deform conv: offsets predicted by a 3x3
            off = nn.Conv(18, (3, 3), padding=[(1, 1)] * 2,
                          dtype=self.dtype, name=f'off{i}')(x)
            w = self.param(f'dcn{i}_w', nn.initializers.he_normal(),
                           (3, 3, x.shape[-1], ch))
            x = batched_deform_conv2d(x, off, w)
            x = nn.relu(FrozenBatchNorm(ch, name=f'dcn{i}_bn')(x))
            b, h, ww, c = x.shape
            x = jax.image.resize(x, (b, h * 2, ww * 2, c), method='nearest')
            x = nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                        name=f'up{i}')(x)
            x = nn.relu(FrozenBatchNorm(ch, name=f'up{i}_bn')(x))
        return (x,)


@NECKS.register_module()
class NASFCOS_FPN(nn.Module):
    """NAS-FCOS searched FPN cell (`nasfcos_fpn.py:12`) — simplified to the
    published cell: deformable-free lateral convs + searched top-down
    mixes expressed with sum/GP cells."""

    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        lats = [nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name=f'lateral_{i}')(x)
                for i, x in enumerate(inputs)]
        c3, c4, c5 = lats[-3], lats[-2], lats[-1]
        hw3, hw4 = c3.shape[-3:-1], c4.shape[-3:-1]
        # searched cell: gp/sum mixes
        f4 = global_pooling_cell(c4, sum_cell(c3, c4, hw4), hw4)
        f3 = sum_cell(c3, f4, hw3)
        f4b = global_pooling_cell(f4, f3, hw4)
        f5 = global_pooling_cell(c5, f4b, c5.shape[-3:-1])
        outs = [f3, f4b, f5]
        outs = [nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f'out_{i}')(o)
                for i, o in enumerate(outs)]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)


@NECKS.register_module()
class FPN_CARAFE(nn.Module):
    """FPN with CARAFE upsampling in the top-down path
    (`fpn_carafe.py:11`)."""

    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    up_kernel: int = 5
    compressed_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        lats = [nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name=f'lateral_{i}')(x)
                for i, x in enumerate(inputs)]
        for i in range(len(lats) - 1, 0, -1):
            src = lats[i]
            th, tw = lats[i - 1].shape[-3:-1]
            # CARAFE kernel prediction: compress + encode + pixel shuffle
            comp = nn.Conv(self.compressed_channels, (1, 1),
                           dtype=self.dtype, name=f'comp_{i}')(src)
            k2 = self.up_kernel * self.up_kernel
            masks = nn.Conv(k2 * 4, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name=f'enc_{i}')(comp)
            b, h, w, _ = masks.shape
            masks = masks.reshape(b, h, w, 2, 2, k2).transpose(
                0, 1, 3, 2, 4, 5).reshape(b, h * 2, w * 2, k2)
            up = carafe_normalized(src, masks, self.up_kernel, 2)
            up = up[:, :th, :tw]
            lats[i - 1] = lats[i - 1] + up
        outs = [nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f'fpn_conv_{i}')(l)
                for i, l in enumerate(lats)]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)


@NECKS.register_module()
class NASFPN(nn.Module):
    """NAS-FPN (`nas_fpn.py:11`): `stack_times` repetitions of the searched
    merging cell over 5 levels, built from GP/sum merge cells."""

    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        # build 5 base levels P3..P7
        feats = [nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                         name=f'lateral_{i}')(x)
                 for i, x in enumerate(inputs)]
        while len(feats) < self.num_outs:
            feats.append(nn.max_pool(feats[-1], (1, 1), strides=(2, 2)))
        p3, p4, p5, p6, p7 = feats

        def rcb(x, name):
            return nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype, name=name)(nn.relu(x))

        for s in range(self.stack_times):
            hw = lambda t: t.shape[-3:-1]
            # the published NAS-FPN cell topology (nas_fpn.py forward)
            p4_1 = rcb(global_pooling_cell(p6, p4, hw(p4)), f's{s}_gp64_4')
            p4_2 = rcb(sum_cell(p4_1, p4, hw(p4)), f's{s}_sum44_4')
            p3 = rcb(sum_cell(p4_2, p3, hw(p3)), f's{s}_sum43_3')
            p4 = rcb(sum_cell(p3, p4_2, hw(p4)), f's{s}_sum34_4')
            p5_tmp = global_pooling_cell(p4, p3, hw(p5))
            p5 = rcb(sum_cell(p5_tmp, p5, hw(p5)), f's{s}_sum55_5')
            p7_tmp = global_pooling_cell(p5, p4_2, hw(p7))
            p7 = rcb(sum_cell(p7_tmp, p7, hw(p7)), f's{s}_sum77_7')
            p6 = rcb(global_pooling_cell(p7, p5, hw(p6)), f's{s}_gp75_6')
        return (p3, p4, p5, p6, p7)


@NECKS.register_module()
class FPG(nn.Module):
    """Feature Pyramid Grids (reference `mmdet/models/necks/fpg.py`) —
    a grid of `stack_times` pyramid stages; each cell fuses same-level,
    top-down (2x up) and bottom-up (stride-2) neighbors with convs. The
    reference's per-edge toggle dicts collapse to the standard published
    grid (across_lateral + across_down + across_up + same_up_trans)."""

    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        c = self.out_channels
        # entry laterals (+ extra coarse level by stride-2 conv)
        levels = [nn.Conv(c, (1, 1), dtype=self.dtype,
                          name=f'lateral{i}')(x)
                  for i, x in enumerate(inputs)]
        while len(levels) < self.num_outs:
            levels.append(nn.Conv(c, (3, 3), strides=(2, 2),
                                  padding=[(1, 1)] * 2, dtype=self.dtype,
                                  name=f'extra{len(levels)}')(levels[-1]))

        for s in range(self.stack_times):
            new = []
            for i in range(self.num_outs):
                acc = nn.Conv(c, (3, 3), padding=[(1, 1)] * 2,
                              dtype=self.dtype,
                              name=f's{s}_same{i}')(levels[i])
                if i + 1 < self.num_outs:          # top-down from coarser
                    hi = levels[i + 1]
                    hi = jax.image.resize(
                        hi, (hi.shape[0], levels[i].shape[1],
                             levels[i].shape[2], c), method='nearest')
                    acc = acc + nn.Conv(c, (3, 3), padding=[(1, 1)] * 2,
                                        dtype=self.dtype,
                                        name=f's{s}_down{i}')(hi)
                if i > 0:                          # bottom-up from finer
                    lo = nn.Conv(c, (3, 3), strides=(2, 2),
                                 padding=[(1, 1)] * 2, dtype=self.dtype,
                                 name=f's{s}_up{i}')(levels[i - 1])
                    if lo.shape[1:3] != acc.shape[1:3]:
                        lo = jax.image.resize(
                            lo, (lo.shape[0], acc.shape[1], acc.shape[2],
                                 c), method='nearest')
                    acc = acc + lo
                new.append(nn.relu(acc))
            levels = new
        return tuple(levels)
