"""Faster R-CNN detector (reference `mmdet/models/detectors/two_stage.py:11`
+ `faster_rcnn.py`), single-level DC5 trunk.

The whole train computation — backbone, RPN loss, proposal generation,
RoI sampling, RoIAlign, bbox head, losses — lives in one module method so the
entire step jits into a single XLA program (no runner/hook layer between).

Batch contract (produced by `data.pipelines.PackDetInputs`):
    image (B, H, W, 3) · img_shape (B, 2) · gt_bboxes (B, G, 4) ·
    gt_labels (B, G) · gt_valid (B, G) · domain (B,)
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors.anchor_generator import AnchorGenerator
from ...utils.registry import DETECTORS
from ..backbones.build import build_trunk
from ..dense_heads.rpn_head import (ProposalConfig, RPNHead, RPNTrainConfig,
                                    rpn_loss, rpn_proposals)
from ..roi_heads.bbox_head import Shared2FCBBoxHead
from ..roi_heads.standard_roi_head import (RoITestConfig, RoITrainConfig,
                                           bbox_loss, extract_roi_feats,
                                           roi_head_predict, sample_rois)


class AnchorConfig(NamedTuple):
    """Reference `da_configs/_base_/models/faster_rcnn_r50_torch_daf.py:27-31`."""
    scales: Tuple[float, ...] = (2, 4, 8, 16, 32)
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    stride: int = 16

    @property
    def num_anchors(self) -> int:
        return len(self.scales) * len(self.ratios)

    def grid_anchors(self, feat_h: int, feat_w: int) -> np.ndarray:
        gen = AnchorGenerator(strides=[self.stride], ratios=list(self.ratios),
                              scales=list(self.scales))
        return gen.grid_priors([(feat_h, feat_w)])[0]


@DETECTORS.register_module()
class FasterRCNN(nn.Module):
    num_classes: int = 8
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    anchor_cfg: AnchorConfig = AnchorConfig()
    rpn_train_cfg: RPNTrainConfig = RPNTrainConfig()
    rpn_proposal_cfg: ProposalConfig = ProposalConfig()
    rpn_test_cfg: ProposalConfig = ProposalConfig(nms_pre=4096,
                                                 max_per_img=1000)
    roi_train_cfg: RoITrainConfig = RoITrainConfig()
    roi_test_cfg: RoITestConfig = RoITestConfig()
    featmap_stride: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 1),
            dilations=(1, 1, 1, 2), out_indices=(3,),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.rpn_head = RPNHead(
            feat_channels=2048, num_anchors=self.anchor_cfg.num_anchors,
            dtype=self.dtype)
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes, dtype=self.dtype)

    # ---- shared pieces -------------------------------------------------
    def extract_feat(self, image: jnp.ndarray) -> jnp.ndarray:
        (feat,) = self.backbone(image.astype(self.dtype))
        return feat

    def _anchors_for(self, feat: jnp.ndarray) -> jnp.ndarray:
        h, w = feat.shape[-3], feat.shape[-2]
        return jnp.asarray(self.anchor_cfg.grid_anchors(h, w))

    # ---- training ------------------------------------------------------
    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feat = self.extract_feat(batch['image'])
        return self._det_losses(feat, batch, loss_weight_mask=None)[0]

    def _det_losses(self, feat, batch, loss_weight_mask):
        """Supervised RPN+RoI losses; returns (losses, roi extras for DA)."""
        anchors = self._anchors_for(feat)
        rpn_cls, rpn_reg = self.rpn_head(feat)
        rng_rpn = self.make_rng('sampler')
        losses = rpn_loss(rpn_cls, rpn_reg, anchors, batch['gt_bboxes'],
                          batch['gt_valid'], batch['img_shape'], rng_rpn,
                          self.rpn_train_cfg, loss_weight_mask)
        proposals, _, prop_valid = rpn_proposals(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_reg),
            anchors, batch['img_shape'], self.rpn_proposal_cfg)
        rng_roi = self.make_rng('sampler')
        sampled = sample_rois(proposals, prop_valid, batch['gt_bboxes'],
                              batch['gt_labels'], batch['gt_valid'], rng_roi,
                              self.num_classes, self.roi_train_cfg)
        roi_feats = extract_roi_feats(feat, sampled.rois, self.featmap_stride,
                                      flatten=True)
        cls, reg, shared_feat = self.bbox_head(roi_feats)
        losses.update(bbox_loss(cls, reg, sampled, self.num_classes,
                                self.roi_train_cfg, loss_weight_mask))
        extras = dict(sampled=sampled, cls_scores=cls,
                      shared_feats=shared_feat)
        return losses, extras

    # ---- inference -----------------------------------------------------
    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """simple_test flow (reference `two_stage.py:173`): RPN proposals →
        RoI head → per-class NMS. Returns padded dets/labels/valid."""
        feat = self.extract_feat(batch['image'])
        anchors = self._anchors_for(feat)
        rpn_cls, rpn_reg = self.rpn_head(feat)
        proposals, _, prop_valid = rpn_proposals(
            rpn_cls, rpn_reg, anchors, batch['img_shape'], self.rpn_test_cfg)
        return roi_head_predict(
            self.bbox_head, feat, proposals, prop_valid, batch['img_shape'],
            self.num_classes, self.featmap_stride,
            reg_class_agnostic=False,
            target_stds=self.roi_train_cfg.target_stds,
            use_sigmoid_cls=self.roi_train_cfg.use_sigmoid_cls,
            cfg=self.roi_test_cfg)

    def __call__(self, batch, train: bool = True):
        """Dispatch for init/tracing."""
        if train:
            return self.loss(batch)
        return self.predict(batch)
