"""DetectoRS ResNet (reference `mmdet/models/backbones/detectors_resnet.py`)
with SAC (Switchable Atrous Convolution) and RFP feedback inputs.

SAC runs the SAME 3x3 kernel at dilation 1 and 3 and blends the two
responses with a spatial switch `S = sigmoid(conv1x1(avgpool(x)))`:
`y = S * conv(x, d=1) + (1 - S) * conv(x + gp, d=3)` (global-context
terms folded; weight-diff trick omitted — documented deviation, the
switch + shared kernel is the capability core). RFP feedback: when
`rfp_feats` is given, each stage input adds a 1x1 projection of the
corresponding pyramid level (reference `rfp_inplanes` path).

Weight sharing across the two RFP steps is automatic: the same bound
module instance is called twice by the `RFP` neck.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import BACKBONES
from ..layers.norm import FrozenBatchNorm
from .resnet import ARCH_SETTINGS, Bottleneck


def _conv(x, w, stride=1, dilation=1):
    pad = dilation * (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(pad, pad)] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class SACBottleneck(nn.Module):
    """Bottleneck whose 3x3 is a switchable atrous conv
    (`detectors_resnet.py` Bottleneck with sac=dict())."""

    planes: int
    in_channels: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        width = self.planes
        out_ch = self.planes * 4
        identity = x
        h = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        h = nn.relu(FrozenBatchNorm(width, name='bn1')(h))
        # SAC: shared kernel, two dilations, spatial switch
        w2 = self.param('conv2_w', nn.initializers.he_normal(),
                        (3, 3, width, width), self.dtype)
        switch = nn.Conv(1, (1, 1), dtype=self.dtype,
                         bias_init=nn.initializers.ones,
                         name='sac_switch')(
            nn.avg_pool(h, (5, 5), strides=(1, 1), padding=[(2, 2)] * 2))
        s = jax.nn.sigmoid(switch.astype(jnp.float32)).astype(h.dtype)
        y1 = _conv(h, w2, stride=self.stride, dilation=1)
        y3 = _conv(h, w2, stride=self.stride, dilation=3)
        if self.stride > 1:
            s = s[:, ::self.stride, ::self.stride]
        h = s * y1 + (1 - s) * y3
        h = nn.relu(FrozenBatchNorm(width, name='bn2')(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv3')(h)
        h = FrozenBatchNorm(out_ch, name='bn3')(h)
        if self.downsample:
            identity = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample_conv')(x)
            identity = FrozenBatchNorm(out_ch, name='downsample_bn')(
                identity)
        return nn.relu(h + identity)


@BACKBONES.register_module()
class DetectoRSResNet(nn.Module):
    depth: int = 50
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    frozen_stages: int = 1
    sac_stages: Tuple[int, ...] = (1, 2, 3)     # SAC in stages 2-4 (ref cfg)
    rfp_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    def stage_channels(self) -> Tuple[int, ...]:
        return tuple(self.base_channels * 4 * 2**i
                     for i in range(self.num_stages))

    @nn.compact
    def __call__(self, x, rfp_feats: Optional[Sequence] = None):
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        assert block_cls is Bottleneck, 'DetectoRS requires depth >= 50'
        x = nn.Conv(self.base_channels, (7, 7), strides=(2, 2),
                    padding=[(3, 3)] * 2, use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        x = nn.relu(FrozenBatchNorm(self.base_channels, name='bn1')(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        for i in range(self.num_stages):
            planes = self.base_channels * 2**i
            if rfp_feats is not None and i > 0:
                fb = rfp_feats[i - 1]
                fb = jax.image.resize(fb, (fb.shape[0], x.shape[1],
                                           x.shape[2], fb.shape[-1]),
                                      method='bilinear')
                x = x + nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                                name=f'rfp_conv{i}')(fb.astype(self.dtype))
            for b in range(stage_blocks[i]):
                first = b == 0
                in_ch = x.shape[-1]
                if i in self.sac_stages:
                    x = SACBottleneck(
                        planes=planes, in_channels=in_ch,
                        stride=self.strides[i] if first else 1,
                        downsample=first and (self.strides[i] != 1
                                              or in_ch != planes * 4),
                        dtype=self.dtype, name=f'layer{i + 1}/{b}')(x)
                else:
                    x = Bottleneck(
                        planes=planes,
                        stride=self.strides[i] if first else 1,
                        downsample=first and (self.strides[i] != 1
                                              or in_ch != planes * 4),
                        dtype=self.dtype, name=f'layer{i + 1}/{b}')(x)
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)
            outs.append(x)
        return tuple(outs)
