"""RFP — Recursive Feature Pyramid (reference `mmdet/models/necks/rfp.py`)
and the DetectoRS detector assembly (`configs/detectors/`).

The backbone runs `rfp_steps` times with SHARED weights; from step 2 on,
each stage input receives a projection of the previous pyramid level
(`DetectoRSResNet(rfp_feats=...)`). Successive pyramids are fused with a
learned per-pixel sigmoid gate (reference `rfp_weight` conv).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import DETECTORS, NECKS
from ..backbones.detectors_resnet import DetectoRSResNet
from .fpn import FPN


@NECKS.register_module()
class RFP(nn.Module):
    """Backbone+FPN combo applied recursively. Owns both submodules so the
    second unrolled step reuses their parameters."""

    depth: int = 50
    rfp_steps: int = 2
    out_channels: int = 256
    num_outs: int = 5
    frozen_stages: int = 1
    # () → plain-conv trunk: the reference's rfp-only ablation rows
    # (`configs/detectors/cascade_rcnn_r50_rfp_1x_coco.py`)
    sac_stages: Any = (1, 2, 3)
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = DetectoRSResNet(depth=self.depth,
                                        frozen_stages=self.frozen_stages,
                                        sac_stages=tuple(self.sac_stages),
                                        dtype=self.dtype)
        self.fpn = FPN(in_channels=self.backbone.stage_channels(),
                       out_channels=self.out_channels,
                       num_outs=self.num_outs, dtype=self.dtype)
        self.weight_convs = [
            nn.Conv(1, (1, 1), kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, name=f'rfp_weight{i}')
            for i in range(self.num_outs)]

    def __call__(self, image):
        feats = self.backbone(image.astype(self.dtype))
        p = self.fpn(feats)
        for _ in range(1, self.rfp_steps):
            feats2 = self.backbone(image.astype(self.dtype),
                                   rfp_feats=list(p)[:len(feats)])
            p2 = self.fpn(feats2)
            fused = []
            for i, (a, b) in enumerate(zip(p, p2)):
                w = jax.nn.sigmoid(
                    self.weight_convs[i](b).astype(jnp.float32)
                ).astype(a.dtype)
                fused.append(w * b + (1 - w) * a)
            p = tuple(fused)
        return p


from ..detectors.htc import HTC  # noqa: E402  (consumer lives with neck)


@DETECTORS.register_module()
class DetectoRSHTC(HTC):
    """DetectoRS = HTC + RFP + SAC (reference
    `configs/detectors/detectors_htc_r50_1x_coco.py`; the rfp-only
    `htc_r50_rfp_1x_coco.py` row sets `sac_stages=()`)."""

    sac_stages: Any = (1, 2, 3)

    def setup(self):
        super().setup()
        self.rfp = RFP(depth=self.backbone_depth,
                       sac_stages=tuple(self.sac_stages),
                       frozen_stages=self.frozen_stages, dtype=self.dtype)

    def _flat_rpn(self, image):
        import numpy as np
        from ...core.anchors.anchor_generator import AnchorGenerator
        from ..dense_heads.anchor_head import flatten_level_preds
        feats = self.rfp(image)
        cls_levels, reg_levels = self.rpn_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        gen = AnchorGenerator(strides=list(self.rpn_strides),
                              ratios=[0.5, 1.0, 2.0], scales=[8])
        anchors = jnp.asarray(np.concatenate(gen.grid_priors(sizes),
                                             axis=0))
        cls = flatten_level_preds(cls_levels, 1)[..., 0]
        reg = flatten_level_preds(reg_levels, 4)
        return feats, cls, reg, anchors


from ..detectors.cascade_rcnn import CascadeRCNN  # noqa: E402


@DETECTORS.register_module()
class DetectoRSCascadeRCNN(CascadeRCNN):
    """DetectoRS cascade variant (reference
    `configs/detectors/detectors_cascade_rcnn_r50_1x_coco.py`; the
    rfp-only ablation row sets `sac_stages=()`)."""

    sac_stages: Any = (1, 2, 3)

    def setup(self):
        super().setup()
        self.rfp = RFP(depth=self.backbone_depth,
                       frozen_stages=self.frozen_stages,
                       sac_stages=tuple(self.sac_stages), dtype=self.dtype)

    def _flat_rpn(self, image):
        import numpy as np
        from ...core.anchors.anchor_generator import AnchorGenerator
        from ..dense_heads.anchor_head import flatten_level_preds
        feats = self.rfp(image)
        cls_levels, reg_levels = self.rpn_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        gen = AnchorGenerator(strides=list(self.rpn_strides),
                              ratios=[0.5, 1.0, 2.0], scales=[8])
        anchors = jnp.asarray(np.concatenate(gen.grid_priors(sizes),
                                             axis=0))
        cls = flatten_level_preds(cls_levels, 1)[..., 0]
        reg = flatten_level_preds(reg_levels, 4)
        return feats, cls, reg, anchors
