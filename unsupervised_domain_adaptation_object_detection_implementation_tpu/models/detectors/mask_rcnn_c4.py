"""Mask R-CNN C4 — the shared-res5 RoI-trunk assembly (reference
`configs/_base_/models/mask_rcnn_r50_caffe_c4.py:37-48`: `roi_head.
shared_head=dict(type='ResLayer', stage=3, stride=2)` with
`bbox_roi_extractor` at 14×14/stride-16 and a num_convs=0 FCN mask head on
the SAME shared features; `mmdet/models/roi_heads/shared_heads/
res_layer.py`).

Layout: the backbone stops at C4 (3 stages, stride 16); RoIAlign crops
14×14 C4 features; ResNet stage 4 (res5, stride 2) runs per-RoI as the
shared head → 7×7×2048; the bbox head is avg-pool + linear (the reference's
`BBoxHead(with_avg_pool=True)`, NOT Shared2FC), and the mask branch reuses
the res5 output (`mask_roi_extractor=None` in the reference config).

TPU shape: RoIs fold into the batch axis for the res5 stage — one big
(B·R, 14, 14, 1024) conv stack on the MXU instead of per-RoI loops.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import DETECTORS
from ..backbones.build import build_trunk
from ..backbones.resnet import ARCH_SETTINGS
from ..dense_heads.rpn_head import (ProposalConfig, RPNHead, RPNTrainConfig,
                                    rpn_loss, rpn_proposals)
from ..roi_heads.mask_head import (FCNMaskHead, mask_loss,
                                   mask_targets_from_box_frame)
from ..roi_heads.standard_roi_head import (RoITestConfig, RoITrainConfig,
                                           bbox_loss, extract_roi_feats,
                                           roi_head_predict, sample_rois)
from .faster_rcnn import AnchorConfig


class ResLayerSharedHead(nn.Module):
    """res5 as a shared RoI head (reference `shared_heads/res_layer.py`):
    ResNet stage 3 (stride 2) applied to folded (B·R, s, s, C) crops."""

    depth: int = 50
    stride: int = 2
    norm: str = 'frozen_bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, R, s, s, C) → (B, R, s/stride, s/stride, C_out)."""
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        b, r = x.shape[:2]
        y = x.reshape((b * r,) + x.shape[2:])
        for i in range(stage_blocks[3]):
            y = block_cls(planes=512, stride=self.stride if i == 0 else 1,
                          downsample=i == 0, norm=self.norm,
                          dtype=self.dtype, name=f'res5_block{i}')(y)
        return y.reshape((b, r) + y.shape[1:])


class C4BBoxHead(nn.Module):
    """`BBoxHead(with_avg_pool=True)` — global-avg-pool the res5 output,
    then sibling linear cls/reg (no hidden FCs)."""

    num_classes: int = 80
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        feat = roi_feats.mean(axis=(-3, -2))          # (B, R, C)
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       name='fc_cls')(feat)
        reg = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                       name='fc_reg')(feat)
        return cls, reg, feat


@DETECTORS.register_module()
class MaskRCNNC4(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None
    frozen_stages: int = 1
    anchor_cfg: AnchorConfig = AnchorConfig()
    rpn_train_cfg: RPNTrainConfig = RPNTrainConfig()
    rpn_proposal_cfg: ProposalConfig = ProposalConfig()
    rpn_test_cfg: ProposalConfig = ProposalConfig(nms_pre=4096,
                                                 max_per_img=1000)
    roi_train_cfg: RoITrainConfig = RoITrainConfig(use_sigmoid_cls=False)
    roi_test_cfg: RoITestConfig = RoITestConfig()
    featmap_stride: int = 16
    roi_size: int = 14          # reference: RoIAlign output_size=14
    mask_size: int = 14         # C4 mask head trains/tests at 14×14
    with_mask: bool = True      # False → the rpn/faster C4 spelling's trunk
    dtype: Any = jnp.float32

    def setup(self):
        # C1–C4 only (num_stages=3 in the reference config): res5 moves
        # into the RoI head below.
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, num_stages=3,
            strides=(1, 2, 2), dilations=(1, 1, 1), out_indices=(2,),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.rpn_head = RPNHead(feat_channels=1024,
                                num_anchors=self.anchor_cfg.num_anchors,
                                dtype=self.dtype)
        self.shared_head = ResLayerSharedHead(depth=self.backbone_depth,
                                              dtype=self.dtype)
        self.bbox_head = C4BBoxHead(num_classes=self.num_classes,
                                    dtype=self.dtype)
        if self.with_mask:
            self.mask_head = FCNMaskHead(num_classes=self.num_classes,
                                         num_convs=0, dtype=self.dtype)

    def _anchors_for(self, feat):
        h, w = feat.shape[-3], feat.shape[-2]
        return jnp.asarray(self.anchor_cfg.grid_anchors(h, w))

    def _roi_trunk(self, feat, rois):
        """14×14 RoIAlign on C4 → shared res5 → (B, R, 7, 7, C_out)."""
        crops = extract_roi_feats(feat, rois, self.featmap_stride,
                                  out_size=self.roi_size)
        return self.shared_head(crops)

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        (feat,) = self.backbone(batch['image'].astype(self.dtype))
        anchors = self._anchors_for(feat)
        rpn_cls, rpn_reg = self.rpn_head(feat)
        losses = rpn_loss(rpn_cls, rpn_reg, anchors, batch['gt_bboxes'],
                          batch['gt_valid'], batch['img_shape'],
                          self.make_rng('sampler'), self.rpn_train_cfg)
        proposals, _, prop_valid = rpn_proposals(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_reg),
            anchors, batch['img_shape'], self.rpn_proposal_cfg)
        sampled = sample_rois(proposals, prop_valid, batch['gt_bboxes'],
                              batch['gt_labels'], batch['gt_valid'],
                              self.make_rng('sampler'), self.num_classes,
                              self.roi_train_cfg)
        res5 = self._roi_trunk(feat, sampled.rois)
        cls, reg, _ = self.bbox_head(res5)
        losses.update(bbox_loss(cls, reg, sampled, self.num_classes,
                                self.roi_train_cfg))
        if self.with_mask:
            # mask branch on the SAME shared res5 feats (reference
            # `mask_roi_extractor=None` → reuse bbox feats), positives only
            mask_logits = self.mask_head(res5)
            targets = mask_targets_from_box_frame(
                batch['gt_masks'], batch['gt_bboxes'], sampled.rois,
                sampled.matched_gt, self.mask_size)
            pos_w = (sampled.is_pos & sampled.label_valid).astype(
                jnp.float32)
            losses.update(mask_loss(mask_logits, targets, sampled.labels,
                                    pos_w))
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        (feat,) = self.backbone(batch['image'].astype(self.dtype))
        anchors = self._anchors_for(feat)
        rpn_cls, rpn_reg = self.rpn_head(feat)
        proposals, _, prop_valid = rpn_proposals(
            rpn_cls, rpn_reg, anchors, batch['img_shape'], self.rpn_test_cfg)
        out = roi_head_predict(
            self.bbox_head, feat, proposals, prop_valid, batch['img_shape'],
            self.num_classes, self.featmap_stride,
            reg_class_agnostic=False,
            target_stds=self.roi_train_cfg.target_stds,
            use_sigmoid_cls=self.roi_train_cfg.use_sigmoid_cls,
            cfg=self.roi_test_cfg,
            roi_extractor=lambda f, r: self._roi_trunk(f, r))
        if self.with_mask:
            det_boxes = out['dets'][..., :4]
            mask_logits = self.mask_head(self._roi_trunk(feat, det_boxes))
            lbl = jnp.clip(out['labels'], 0, self.num_classes - 1)
            sel = jnp.take_along_axis(
                mask_logits, lbl[..., None, None, None], axis=-1)[..., 0]
            out['masks'] = jax.nn.sigmoid(sel.astype(jnp.float32))
        return out

    def __call__(self, batch, train: bool = True):
        return self.loss(batch) if train else self.predict(batch)
