"""NAS-FCOS (reference `mmdet/models/detectors/nasfcos.py` +
`configs/nas_fcos/`): FCOS detector over the searched NASFCOS-FPN cell.

Two head spellings, matching the two config rows:
- `head_type='fcos'` → the standard FCOS tower
  (`nas_fcos_fcoshead_..._coco.py`);
- `head_type='nas'` → the searched NASFCOSHead branch structure
  (`nas_fcos_nashead_..._coco.py`; reference `nasfcos_head.py:40-61`:
  per branch [DCNv2 3×3, conv 3×3, DCNv2 3×3, conv 1×1], each followed by
  GN(32) + ReLU, then 3×3 cls/reg/centerness predictors with per-level
  scales on reg).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import DETECTORS, HEADS
from ..backbones.build import build_trunk
from ..layers.plugins import DeformConv
from ..necks.zoo_necks import NASFCOS_FPN
from .fcos import FCOS, FCOSHead


class _SearchedOp(nn.Module):
    """One searched ConvModule: dconv3x3 (DCNv2) | conv3x3 | conv1x1,
    followed by GroupNorm(32) + ReLU."""

    kind: str                      # 'dconv3x3' | 'conv3x3' | 'conv1x1'
    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.kind == 'dconv3x3':
            off = nn.Conv(27, (3, 3), padding=[(1, 1)] * 2,
                          kernel_init=nn.initializers.zeros,
                          dtype=self.dtype, name='offset')(x)
            o, m = off[..., :18], jax.nn.sigmoid(off[..., 18:])
            x = DeformConv(self.features, 3, dtype=self.dtype,
                           name='dconv')(x, o, m)
        elif self.kind == 'conv3x3':
            x = nn.Conv(self.features, (3, 3), padding=[(1, 1)] * 2,
                        use_bias=False, dtype=self.dtype, name='conv')(x)
        else:
            x = nn.Conv(self.features, (1, 1), use_bias=False,
                        dtype=self.dtype, name='conv')(x)
        x = nn.GroupNorm(num_groups=32, dtype=self.dtype, name='gn')(x)
        return nn.relu(x)


ARCH = ('dconv3x3', 'conv3x3', 'dconv3x3', 'conv1x1')


@HEADS.register_module()
class NASFCOSHead(nn.Module):
    """Searched NAS-FCOS head (reference `nasfcos_head.py`). Same output
    contract as FCOSHead: (cls, reg, centerness) per level, reg through
    exp(scale·x)."""

    num_classes: int = 80
    feat_channels: int = 256
    centerness_on_reg: bool = False   # reference FCOSHead default
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_tower = [_SearchedOp(kind=k, features=self.feat_channels,
                                 dtype=self.dtype, name=f'cls_op{i}')
                     for i, k in enumerate(ARCH)]
        reg_tower = [_SearchedOp(kind=k, features=self.feat_channels,
                                 dtype=self.dtype, name=f'reg_op{i}')
                     for i, k in enumerate(ARCH)]
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                          bias_init=nn.initializers.constant(-4.595),
                          dtype=self.dtype, name='conv_cls')
        reg_out = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name='conv_reg')
        ctr_out = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name='conv_centerness')
        cls_s, reg_s, ctr_s = [], [], []
        for lvl, f in enumerate(feats):
            c, r = f, f
            for op in cls_tower:
                c = op(c)
            for op in reg_tower:
                r = op(r)
            scale = self.param(f'scale_{lvl}', nn.initializers.ones, ())
            cls_s.append(cls_out(c))
            reg_s.append(jnp.exp(reg_out(r).astype(jnp.float32) *
                                 scale.astype(jnp.float32)))
            ctr_s.append(ctr_out(r if self.centerness_on_reg else c))
        return tuple(cls_s), tuple(reg_s), tuple(ctr_s)


@DETECTORS.register_module()
class NASFCOS(FCOS):
    head_type: str = 'fcos'    # 'fcos' | 'nas' (searched NASFCOSHead)

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = NASFCOS_FPN(
            in_channels=self.backbone.stage_channels()[-3:],
            out_channels=256, num_outs=5, dtype=self.dtype)
        if self.head_type == 'nas':
            self.bbox_head = NASFCOSHead(num_classes=self.num_classes,
                                         dtype=self.dtype)
        else:
            self.bbox_head = FCOSHead(num_classes=self.num_classes,
                                      dtype=self.dtype)
