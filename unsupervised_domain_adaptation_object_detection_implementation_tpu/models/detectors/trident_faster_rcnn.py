"""TridentFasterRCNN (reference `mmdet/models/detectors/trident_faster_rcnn.py`
+ `configs/tridentnet/tridentnet_r50_caffe_1x_coco.py`).

C4 Faster R-CNN over a TridentResNet: at train time the three shared-weight
dilated branches are folded into the batch axis (B→3B) and gts are tiled,
exactly the reference's `trident_img_metas = img_metas * num_branch`
semantics; at test only `test_branch_idx` runs. The RoI head is our
Shared2FC bbox head on 1024-ch C4 RoI features (the reference uses a res5
shared head — documented deviation, same capacity class).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import DETECTORS
from ..backbones.trident_resnet import TridentResNet
from ..dense_heads.rpn_head import (ProposalConfig, RPNHead, RPNTrainConfig,
                                    rpn_loss, rpn_proposals)
from ..roi_heads.bbox_head import Shared2FCBBoxHead
from ..roi_heads.standard_roi_head import (RoITestConfig, RoITrainConfig,
                                           bbox_loss, extract_roi_feats,
                                           roi_head_predict, sample_rois)
from .faster_rcnn import AnchorConfig


@DETECTORS.register_module()
class TridentFasterRCNN(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    frozen_stages: int = 1
    num_branch: int = 3
    test_branch_idx: int = 1
    anchor_cfg: AnchorConfig = AnchorConfig()
    rpn_train_cfg: RPNTrainConfig = RPNTrainConfig()
    rpn_proposal_cfg: ProposalConfig = ProposalConfig(max_per_img=500)
    rpn_test_cfg: ProposalConfig = ProposalConfig(nms_pre=4096,
                                                  max_per_img=1000)
    roi_train_cfg: RoITrainConfig = RoITrainConfig(
        num_samples=128, pos_fraction=0.5, add_gt_as_proposals=False)
    roi_test_cfg: RoITestConfig = RoITestConfig()
    featmap_stride: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        dil = tuple(range(1, self.num_branch + 1))
        self.backbone = TridentResNet(
            depth=self.backbone_depth, trident_dilations=dil,
            test_branch_idx=self.test_branch_idx,
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.rpn_head = RPNHead(
            feat_channels=1024, num_anchors=self.anchor_cfg.num_anchors,
            dtype=self.dtype)
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes, dtype=self.dtype)

    def _anchors_for(self, feat):
        h, w = feat.shape[-3], feat.shape[-2]
        return jnp.asarray(self.anchor_cfg.grid_anchors(h, w))

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feat = self.backbone(batch['image'].astype(self.dtype),
                             all_branches=True)          # (nb*B, h, w, C)
        nb = self.num_branch
        tile = lambda t: jnp.concatenate([t] * nb, axis=0)  # noqa: E731
        gt_bboxes = tile(batch['gt_bboxes'])
        gt_labels = tile(batch['gt_labels'])
        gt_valid = tile(batch['gt_valid'])
        img_shape = tile(batch['img_shape'])

        anchors = self._anchors_for(feat)
        rpn_cls, rpn_reg = self.rpn_head(feat)
        losses = rpn_loss(rpn_cls, rpn_reg, anchors, gt_bboxes, gt_valid,
                          img_shape, self.make_rng('sampler'),
                          self.rpn_train_cfg)
        proposals, _, prop_valid = rpn_proposals(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_reg),
            anchors, img_shape, self.rpn_proposal_cfg)
        sampled = sample_rois(proposals, prop_valid, gt_bboxes, gt_labels,
                              gt_valid, self.make_rng('sampler'),
                              self.num_classes, self.roi_train_cfg)
        roi_feats = extract_roi_feats(feat, sampled.rois,
                                      self.featmap_stride)
        cls, reg, _ = self.bbox_head(roi_feats)
        losses.update(bbox_loss(cls, reg, sampled, self.num_classes,
                                self.roi_train_cfg))
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feat = self.backbone(batch['image'].astype(self.dtype),
                             all_branches=False)         # test branch only
        anchors = self._anchors_for(feat)
        rpn_cls, rpn_reg = self.rpn_head(feat)
        proposals, _, prop_valid = rpn_proposals(
            rpn_cls, rpn_reg, anchors, batch['img_shape'],
            self.rpn_test_cfg)
        return roi_head_predict(
            self.bbox_head, feat, proposals, prop_valid, batch['img_shape'],
            self.num_classes, self.featmap_stride,
            reg_class_agnostic=False,
            target_stds=self.roi_train_cfg.target_stds,
            use_sigmoid_cls=self.roi_train_cfg.use_sigmoid_cls,
            cfg=self.roi_test_cfg)

    def __call__(self, batch, train: bool = True):
        return self.loss(batch) if train else self.predict(batch)
