"""NAS-FCOS (reference `mmdet/models/detectors/nasfcos.py` +
`configs/nas_fcos/`): FCOS detector over the searched NASFCOS-FPN cell.
The head is the standard FCOS tower (the reference's NASFCOSHead swaps
conv order found by search; the loss/assignment path is identical)."""

from __future__ import annotations

import jax.numpy as jnp

from ...utils.registry import DETECTORS
from ..backbones.build import build_trunk
from ..necks.zoo_necks import NASFCOS_FPN
from .fcos import FCOS, FCOSHead


@DETECTORS.register_module()
class NASFCOS(FCOS):
    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = NASFCOS_FPN(
            in_channels=self.backbone.stage_channels()[-3:],
            out_channels=256, num_outs=5, dtype=self.dtype)
        self.bbox_head = FCOSHead(num_classes=self.num_classes,
                                  dtype=self.dtype)
