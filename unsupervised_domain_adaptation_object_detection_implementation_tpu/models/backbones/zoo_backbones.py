"""Second-wave CNN backbones: Res2Net, RegNet, ResNeSt, SSDVGG.

References: `mmdet/models/backbones/res2net.py` (Bottle2neck hierarchical
splits), `regnet.py` (quantized-width anystage design), `resnest.py`
(split-attention bottleneck), `ssd_vgg.py` (VGG16 + dilated fc6/fc7 +
extra feature layers + L2Norm).

All NHWC flax modules following the `ResNet` conventions: FrozenBatchNorm
trunks, `stage_channels()`, `__call__ -> tuple(feature maps)`. Channel-last
keeps every conv on the native TPU layout; the hierarchical Res2Net splits
and ResNeSt radix math are static reshapes, so XLA fuses them into the
surrounding convs.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.registry import BACKBONES
from ..layers.norm import FrozenBatchNorm


def _conv_bn_relu(x, ch, k, s=1, d=1, name='', dtype=jnp.float32, relu=True,
                  groups=1):
    pad = (k - 1) // 2 * d
    x = nn.Conv(ch, (k, k), strides=(s, s), kernel_dilation=(d, d),
                padding=[(pad, pad)] * 2, feature_group_count=groups,
                use_bias=False, dtype=dtype, name=f'{name}_conv')(x)
    x = FrozenBatchNorm(ch, name=f'{name}_bn')(x)
    return nn.relu(x) if relu else x


class Bottle2neck(nn.Module):
    """Res2Net block (`res2net.py:18`): the middle 3x3 becomes `scales`
    hierarchical small convs over channel splits; stage-entry blocks break
    the additive cascade and average-pool the last split."""

    planes: int
    scales: int = 4
    base_width: int = 26
    stride: int = 1
    downsample: bool = False
    stage_type: bool = False     # True at stage entry (stype='stage')
    dcn: str = ''                # ''|'dcn'|'dcnv2' on the scale convs
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        width = int(np.floor(self.planes * (self.base_width / 64)))
        mid = width * self.scales
        out = _conv_bn_relu(x, mid, 1, name='conv1', dtype=self.dtype)

        splits = jnp.split(out, self.scales, axis=-1)
        outs = []
        sp = None
        for i in range(self.scales - 1):
            inp = splits[i] if (i == 0 or self.stage_type) else sp + splits[i]
            if self.dcn:
                # reference res2net.py Bottle2neck dcn: each scale conv is
                # deformable in the configured stages (vfnet r2-101 mdconv
                # row, configs/vfnet)
                from ..layers.plugins import DeformConv
                k = 27 if self.dcn == 'dcnv2' else 18
                off = nn.Conv(k, (3, 3), strides=(self.stride, self.stride),
                              padding=[(1, 1)] * 2,
                              kernel_init=nn.initializers.zeros,
                              dtype=self.dtype,
                              name=f'convs{i}_offset')(inp)
                mask = None
                if self.dcn == 'dcnv2':
                    off, mask = off[..., :18], jax.nn.sigmoid(off[..., 18:])
                sp = DeformConv(width, 3, strides=self.stride,
                                dtype=self.dtype,
                                name=f'convs{i}_dcn')(inp, off, mask)
                sp = nn.relu(FrozenBatchNorm(width,
                                             name=f'convs{i}_bn')(sp))
            else:
                sp = _conv_bn_relu(inp, width, 3, s=self.stride,
                                   name=f'convs{i}', dtype=self.dtype)
            outs.append(sp)
        last = splits[-1]
        if self.stage_type and self.stride > 1:
            last = nn.avg_pool(last, (3, 3), (self.stride, self.stride),
                               padding=[(1, 1)] * 2)
        elif self.stride > 1:
            last = last[:, ::self.stride, ::self.stride]
        outs.append(last)
        out = jnp.concatenate(outs, axis=-1)

        out = _conv_bn_relu(out, self.planes * 4, 1, name='conv3',
                            dtype=self.dtype, relu=False)
        if self.downsample:
            identity = nn.avg_pool(x, (self.stride, self.stride),
                                   (self.stride, self.stride)) \
                if self.stride > 1 else x
            identity = _conv_bn_relu(identity, self.planes * 4, 1,
                                     name='downsample', dtype=self.dtype,
                                     relu=False)
        return nn.relu(out + identity)


RES2NET_DEPTHS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


@BACKBONES.register_module()
class Res2Net(nn.Module):
    depth: int = 50
    scales: int = 4
    base_width: int = 26
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    dcn: str = ''                # configs/vfnet r2-101 mdconv row
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    dtype: jnp.dtype = jnp.float32

    def stage_channels(self) -> Tuple[int, ...]:
        return tuple(256 * 2**i for i in range(4))

    @nn.compact
    def __call__(self, x, return_all_stages: bool = False):
        # mmdet res2net uses the deep 3-conv stem
        x = _conv_bn_relu(x, 32, 3, s=2, name='stem0', dtype=self.dtype)
        x = _conv_bn_relu(x, 32, 3, name='stem1', dtype=self.dtype)
        x = _conv_bn_relu(x, 64, 3, name='stem2', dtype=self.dtype)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1)] * 2)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        for i, blocks in enumerate(RES2NET_DEPTHS[self.depth]):
            planes = 64 * 2**i
            for b in range(blocks):
                first = b == 0
                x = Bottle2neck(planes=planes, scales=self.scales,
                                base_width=self.base_width,
                                stride=(1 if i == 0 else 2) if first else 1,
                                downsample=first,
                                dcn=self.dcn if self.stage_with_dcn[i]
                                else '',
                                stage_type=first, dtype=self.dtype,
                                name=f'layer{i + 1}/{b}')(x)
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)
            outs.append(x)
        if return_all_stages:
            return tuple(outs)
        return tuple(outs[i] for i in self.out_indices)


def regnet_widths(w0: float, wa: float, wm: float, depth: int,
                  group_width: int):
    """Quantized per-stage widths/depths (`regnet.py:utils`, pycls recipe)."""
    ws_cont = w0 + wa * np.arange(depth)
    ks = np.round(np.log(ws_cont / w0) / np.log(wm))
    ws = w0 * np.power(wm, ks)
    ws = np.round(ws / 8) * 8
    # adjust to group width compatibility
    ws = [int(min(w, group_width) * round(w / min(w, group_width)))
          for w in ws]
    stage_widths, stage_depths = np.unique(ws, return_counts=True)
    order = np.argsort([ws.index(int(sw)) for sw in stage_widths])
    return ([int(w) for w in stage_widths[order]],
            [int(d) for d in stage_depths[order]])


REGNET_ARCH = {
    # name: (w0, wa, wm, depth, group_width)
    'regnetx_400mf': (24, 24.48, 2.54, 22, 16),
    'regnetx_800mf': (56, 35.73, 2.28, 16, 16),
    'regnetx_1.6gf': (80, 34.01, 2.25, 18, 24),
    'regnetx_3.2gf': (88, 26.31, 2.25, 25, 48),
    'regnetx_4.0gf': (96, 38.65, 2.43, 23, 40),
    'regnetx_6.4gf': (184, 60.83, 2.07, 17, 56),
    'regnetx_8.0gf': (80, 49.56, 2.88, 23, 120),
    'regnetx_12gf': (168, 73.36, 2.37, 19, 112),
}


@BACKBONES.register_module()
class RegNet(nn.Module):
    """RegNetX (`regnet.py:11`): anystage design of group-conv residual
    bottlenecks with bottleneck ratio 1."""

    arch: str = 'regnetx_3.2gf'
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    dcn: str = ''                # configs/regnet mdconv row
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    dtype: jnp.dtype = jnp.float32

    def _design(self):
        w0, wa, wm, depth, gw = REGNET_ARCH[self.arch]
        widths, depths = regnet_widths(w0, wa, wm, depth, gw)
        return widths, depths, gw

    def stage_channels(self) -> Tuple[int, ...]:
        widths, _, _ = self._design()
        return tuple(widths)

    @nn.compact
    def __call__(self, x, return_all_stages: bool = False):
        widths, depths, gw = self._design()
        x = _conv_bn_relu(x, 32, 3, s=2, name='stem', dtype=self.dtype)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        outs = []
        for i, (w_out, d) in enumerate(zip(widths, depths)):
            groups = w_out // min(gw, w_out)
            for b in range(d):
                first = b == 0
                ident = x
                stride = 2 if first else 1
                h = _conv_bn_relu(x, w_out, 1, name=f's{i}b{b}_1',
                                  dtype=self.dtype)
                if self.dcn and self.stage_with_dcn[i]:
                    # reference regnet.py routes dcn into the group conv
                    # (mask_rcnn_regnetx-3.2GF mdconv row, configs/regnet)
                    from ..layers.plugins import DeformConv
                    k = 27 if self.dcn == 'dcnv2' else 18
                    off = nn.Conv(k, (3, 3), strides=(stride, stride),
                                  padding=[(1, 1)] * 2,
                                  kernel_init=nn.initializers.zeros,
                                  dtype=self.dtype,
                                  name=f's{i}b{b}_2_offset')(h)
                    mask = None
                    if self.dcn == 'dcnv2':
                        off, mask = (off[..., :18],
                                     jax.nn.sigmoid(off[..., 18:]))
                    h = DeformConv(w_out, 3, strides=stride,
                                   dtype=self.dtype,
                                   name=f's{i}b{b}_2_dcn')(h, off, mask)
                    h = nn.relu(FrozenBatchNorm(
                        w_out, name=f's{i}b{b}_2_bn')(h))
                else:
                    h = _conv_bn_relu(h, w_out, 3, s=stride, groups=groups,
                                      name=f's{i}b{b}_2', dtype=self.dtype)
                h = _conv_bn_relu(h, w_out, 1, name=f's{i}b{b}_3',
                                  dtype=self.dtype, relu=False)
                if first:
                    ident = _conv_bn_relu(x, w_out, 1, s=stride,
                                          name=f's{i}b{b}_down',
                                          dtype=self.dtype, relu=False)
                x = nn.relu(h + ident)
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)
            outs.append(x)
        if return_all_stages:
            return tuple(outs)
        return tuple(outs[i] for i in self.out_indices)


class SplitAttentionConv(nn.Module):
    """ResNeSt split-attention 3x3 (`resnest.py:SplitAttentionConv2d`)."""

    channels: int
    radix: int = 2
    groups: int = 1
    reduction: int = 4
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        r = self.radix
        out = _conv_bn_relu(x, c * r, 3, s=self.stride,
                            groups=self.groups * r, name='conv',
                            dtype=self.dtype)
        b, h, w, _ = out.shape
        splits = out.reshape(b, h, w, r, c)
        gap = jnp.mean(jnp.sum(splits, axis=3), axis=(1, 2))      # (B, C)
        inter = max(c * r // self.reduction, 32)
        gap = nn.Dense(inter, dtype=self.dtype, name='fc1')(gap)
        gap = FrozenBatchNorm(inter, name='fc1_bn')(gap)
        gap = nn.relu(gap)
        att = nn.Dense(c * r, dtype=self.dtype, name='fc2')(gap)
        att = jax.nn.softmax(att.reshape(b, r, c), axis=1) if r > 1 \
            else jax.nn.sigmoid(att.reshape(b, 1, c))
        return jnp.sum(splits * att[:, None, None], axis=3)


@BACKBONES.register_module()
class ResNeSt(nn.Module):
    """ResNeSt-50/101 (`resnest.py:Bottleneck`): deep stem, avg-down
    shortcuts, split-attention 3x3s."""

    depth: int = 50
    radix: int = 2
    groups: int = 1
    base_width: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    dtype: jnp.dtype = jnp.float32

    def stage_channels(self) -> Tuple[int, ...]:
        return tuple(256 * 2**i for i in range(4))

    @nn.compact
    def __call__(self, x, return_all_stages: bool = False):
        depths = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        x = _conv_bn_relu(x, 32, 3, s=2, name='stem0', dtype=self.dtype)
        x = _conv_bn_relu(x, 32, 3, name='stem1', dtype=self.dtype)
        x = _conv_bn_relu(x, 64, 3, name='stem2', dtype=self.dtype)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1)] * 2)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        outs = []
        for i, blocks in enumerate(depths):
            planes = 64 * 2**i
            for b in range(blocks):
                first = b == 0
                stride = (1 if i == 0 else 2) if first else 1
                ident = x
                # `resnest.py:186-190`: width = planes when groups == 1
                width = planes if self.groups == 1 else \
                    int(planes * (self.base_width / 64)) * self.groups
                h = _conv_bn_relu(x, width, 1, name=f'l{i}b{b}_1',
                                  dtype=self.dtype)
                if stride > 1:
                    # avd: 3x3 avg pool before the unit-stride SA conv
                    h = nn.avg_pool(h, (3, 3), (stride, stride),
                                    padding=[(1, 1)] * 2)
                h = SplitAttentionConv(channels=width, radix=self.radix,
                                       groups=self.groups, dtype=self.dtype,
                                       name=f'l{i}b{b}_sa')(h)
                h = _conv_bn_relu(h, planes * 4, 1, name=f'l{i}b{b}_3',
                                  dtype=self.dtype, relu=False)
                if first:
                    # avg_down shortcut
                    if stride > 1:
                        ident = nn.avg_pool(ident, (stride, stride),
                                            (stride, stride))
                    ident = _conv_bn_relu(ident, planes * 4, 1,
                                          name=f'l{i}b{b}_down',
                                          dtype=self.dtype, relu=False)
                x = nn.relu(h + ident)
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)
            outs.append(x)
        if return_all_stages:
            return tuple(outs)
        return tuple(outs[i] for i in self.out_indices)


@BACKBONES.register_module()
class VGG(nn.Module):
    """Plain multi-stage VGG-16 trunk for two-stage detectors (the fork's
    VGG16 Faster R-CNN baseline, reference
    `configs/_base_/models/faster_rcnn_vgg16.py` + mmcv `vgg.py:VGG`).
    Returns post-pool features of conv2..conv5 (strides 4/8/16/32,
    channels 128/256/512/512) so FPN composes via `stage_channels()`."""

    depth: int = 16
    frozen_stages: int = 1
    with_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    def stage_channels(self) -> Tuple[int, ...]:
        return (128, 256, 512, 512)

    @nn.compact
    def __call__(self, x):
        blocks = {11: (1, 1, 2, 2, 2), 13: (2, 2, 2, 2, 2),
                  16: (2, 2, 3, 3, 3), 19: (2, 2, 4, 4, 4)}[self.depth]
        chans = (64, 128, 256, 512, 512)
        outs = []
        for si, (n, ch) in enumerate(zip(blocks, chans)):
            for bi in range(n):
                x = nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype,
                            name=f'conv{si + 1}_{bi + 1}')(x)
                if self.with_bn:
                    x = nn.BatchNorm(use_running_average=True,
                                     dtype=self.dtype,
                                     name=f'bn{si + 1}_{bi + 1}')(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), (2, 2))
            if self.frozen_stages >= si + 1:
                x = jax.lax.stop_gradient(x)
            if si >= 1:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register_module()
class SSDVGG(nn.Module):
    """VGG-16 SSD backbone (`ssd_vgg.py:13`): conv1_1..conv5_3 with the
    SSD modifications (pool5 3x3/s1, dilated fc6, fc7), L2-normalized
    conv4_3 output, and the extra downsampling tower.

    Outputs (SSD300): conv4_3 (38x38, L2Norm), fc7 (19), extra1 (10),
    extra2 (5), extra3 (3), extra4 (1).
    """

    depth: int = 16
    out_feature_channels: Sequence[int] = (512, 1024, 512, 256, 256, 256)
    l2_scale: float = 20.0
    # 4 → six levels (SSD300 tower); 5 → seven (SSD512, extra stride-2
    # stage in place of the two valid-conv stages)
    num_extras: int = 4
    dtype: jnp.dtype = jnp.float32

    def stage_channels(self) -> Tuple[int, ...]:
        return tuple(self.out_feature_channels)

    @nn.compact
    def __call__(self, x, return_all_stages: bool = False):
        cfg = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]
        outs = []
        for si, (n, ch) in enumerate(cfg):
            for bi in range(n):
                x = nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype,
                            name=f'conv{si + 1}_{bi + 1}')(x)
                x = nn.relu(x)
            if si == 3:
                scale = self.param('l2_norm_scale',
                                   nn.initializers.constant(self.l2_scale),
                                   (ch,))
                norm = jnp.sqrt(
                    jnp.sum(jnp.square(x), -1, keepdims=True)) + 1e-10
                outs.append(x / norm * scale)
            if si < 4:
                # VOC-SSD uses ceil_mode pooling; pad odd maps on the right
                ph = x.shape[1] % 2
                pw = x.shape[2] % 2
                if ph or pw:
                    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                constant_values=-jnp.inf)
                x = nn.max_pool(x, (2, 2), (2, 2))
        x = nn.max_pool(x, (3, 3), (1, 1), padding=[(1, 1)] * 2)
        x = nn.relu(nn.Conv(1024, (3, 3), kernel_dilation=(6, 6),
                            padding=[(6, 6)] * 2, dtype=self.dtype,
                            name='fc6')(x))
        x = nn.relu(nn.Conv(1024, (1, 1), dtype=self.dtype, name='fc7')(x))
        outs.append(x)

        # extras: (1x1 reduce, 3x3) pairs; first two stride 2, rest valid
        if self.num_extras == 5:       # SSD512 tower: all stride-2
            extra_cfg = [(256, 512, 2, 1), (128, 256, 2, 1),
                         (128, 256, 2, 1), (128, 256, 2, 1),
                         (128, 256, 2, 1)]
        else:
            extra_cfg = [(256, 512, 2, 1), (128, 256, 2, 1),
                         (128, 256, 1, 0), (128, 256, 1, 0)]
        for i, (c1, c2, s, p) in enumerate(extra_cfg):
            x = nn.relu(nn.Conv(c1, (1, 1), dtype=self.dtype,
                                name=f'extra{i}_1')(x))
            x = nn.relu(nn.Conv(c2, (3, 3), strides=(s, s),
                                padding=[(p, p)] * 2 if s == 2 or p else
                                'VALID',
                                dtype=self.dtype, name=f'extra{i}_2')(x))
            outs.append(x)
        return tuple(outs)
