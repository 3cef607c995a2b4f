"""Cascade R-CNN (reference `mmdet/models/detectors/cascade_rcnn.py` +
`mmdet/models/roi_heads/cascade_roi_head.py`).

Three bbox stages with rising IoU thresholds (0.5/0.6/0.7) and tightening
delta stds; each stage re-assigns and refines the previous stage's decoded
boxes. Test time decodes sequentially and averages the per-stage class
scores (mmdet semantics). Structure is three applications of the same
functional sample/align/loss machinery — no runner/loop abstractions.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors.anchor_generator import AnchorGenerator
from ...core.bbox.transforms import clip_boxes, delta2bbox
from ...utils.registry import DETECTORS
from ..backbones.build import build_trunk
from ..dense_heads.anchor_head import flatten_level_preds
from ..dense_heads.rpn_head import (ProposalConfig, RPNTrainConfig, rpn_loss,
                                    rpn_proposals)
from ..necks.fpn import FPN
from ..roi_heads.bbox_head import Shared2FCBBoxHead
from ..roi_heads.standard_roi_head import (RoITestConfig, RoITrainConfig,
                                           bbox_loss, extract_roi_feats_fpn,
                                           roi_head_predict, sample_rois)
from .faster_rcnn_fpn import FPNRPNHead

STAGE_IOUS = (0.5, 0.6, 0.7)
STAGE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
              (0.033, 0.033, 0.067, 0.067))
STAGE_WEIGHTS = (1.0, 0.5, 0.25)


@DETECTORS.register_module()
class CascadeRCNN(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    rpn_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    rpn_train_cfg: RPNTrainConfig = RPNTrainConfig()
    rpn_proposal_cfg: ProposalConfig = ProposalConfig(nms_pre=4096,
                                                      max_per_img=1000)
    rpn_test_cfg: ProposalConfig = ProposalConfig(nms_pre=4096,
                                                  max_per_img=1000)
    num_samples: int = 512
    roi_test_cfg: RoITestConfig = RoITestConfig()
    # 'softmax' | 'seesaw' — configs/seesaw_loss cascade_mask rows
    # (reference cascade_mask_rcnn_*_seesaw_loss_*_lvis_v1.py): per-stage
    # NormedLinear K+2 heads, per-stage running class counts
    loss_cls: str = 'softmax'
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = FPN(in_channels=self.backbone.stage_channels(),
                        out_channels=256, num_outs=5, dtype=self.dtype)
        self.rpn_head = FPNRPNHead(dtype=self.dtype)
        self.bbox_heads = [
            Shared2FCBBoxHead(num_classes=self.num_classes, in_channels=256,
                              reg_class_agnostic=True,
                              seesaw=self.loss_cls == 'seesaw',
                              dtype=self.dtype,
                              name=f'bbox_head_{i}')
            for i in range(3)
        ]
        if self.loss_cls == 'seesaw':
            self.seesaw_cums = [
                self.variable('batch_stats', f'seesaw_cum_samples_{i}',
                              lambda: jnp.zeros((self.num_classes,),
                                                jnp.float32))
                for i in range(3)
            ]

    def _stage_bbox_losses(self, i, cls_s, reg_s, sampled, cfg):
        """bbox_loss, with the cls entry swapped for seesaw CE +
        objectness CE when `loss_cls='seesaw'` (MaskRCNN's seesaw path,
        per cascade stage)."""
        if self.loss_cls != 'seesaw':
            return bbox_loss(cls_s, reg_s, sampled, self.num_classes, cfg)
        from ..roi_heads.standard_roi_head import seesaw_cls_losses
        det = bbox_loss(cls_s[..., :self.num_classes + 1], reg_s, sampled,
                        self.num_classes, cfg)
        ss, new_cum = seesaw_cls_losses(cls_s, sampled, self.num_classes,
                                        self.seesaw_cums[i].value)
        self.seesaw_cums[i].value = new_cum
        det.update(ss)
        return det

    def _stage_cfg(self, i: int) -> RoITrainConfig:
        return RoITrainConfig(
            pos_iou_thr=STAGE_IOUS[i], neg_iou_thr=STAGE_IOUS[i],
            min_pos_iou=STAGE_IOUS[i], match_low_quality=False,
            num_samples=self.num_samples, pos_fraction=0.25,
            add_gt_as_proposals=True, target_stds=STAGE_STDS[i],
            use_sigmoid_cls=False)

    def _flat_rpn(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        cls_levels, reg_levels = self.rpn_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        gen = AnchorGenerator(strides=list(self.rpn_strides),
                              ratios=[0.5, 1.0, 2.0], scales=[8])
        anchors = jnp.asarray(np.concatenate(gen.grid_priors(sizes), axis=0))
        cls = flatten_level_preds(cls_levels, 1)[..., 0]
        reg = flatten_level_preds(reg_levels, 4)
        return feats, cls, reg, anchors

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feats, cls, reg, anchors = self._flat_rpn(batch['image'])
        b, n = cls.shape
        losses = rpn_loss(cls.reshape(b, n, 1, 1), reg.reshape(b, n, 1, 4),
                          anchors, batch['gt_bboxes'], batch['gt_valid'],
                          batch['img_shape'], self.make_rng('sampler'),
                          self.rpn_train_cfg)
        proposals, _, prop_valid = rpn_proposals(
            jax.lax.stop_gradient(cls).reshape(b, n, 1, 1),
            jax.lax.stop_gradient(reg).reshape(b, n, 1, 4),
            anchors, batch['img_shape'], self.rpn_proposal_cfg)

        boxes, box_valid = proposals, prop_valid
        for i, head in enumerate(self.bbox_heads):
            cfg = self._stage_cfg(i)
            sampled = sample_rois(boxes, box_valid, batch['gt_bboxes'],
                                  batch['gt_labels'], batch['gt_valid'],
                                  self.make_rng('sampler'), self.num_classes,
                                  cfg)
            roi_feats = extract_roi_feats_fpn(feats, sampled.rois)
            cls_s, reg_s, _ = head(roi_feats)
            stage_losses = self._stage_bbox_losses(i, cls_s, reg_s, sampled,
                                                   cfg)
            for k, v in stage_losses.items():
                losses[f's{i}.{k}'] = v * STAGE_WEIGHTS[i]
            # refine boxes for the next stage (class-agnostic regression)
            refined = delta2bbox(sampled.rois,
                                 jax.lax.stop_gradient(reg_s).astype(
                                     jnp.float32),
                                 stds=cfg.target_stds)
            refined = clip_boxes(
                refined, batch['img_shape'][:, None, :].astype(jnp.float32))
            boxes, box_valid = refined, sampled.label_valid
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feats, cls, reg, anchors = self._flat_rpn(batch['image'])
        b, n = cls.shape
        boxes, _, box_valid = rpn_proposals(
            cls.reshape(b, n, 1, 1), reg.reshape(b, n, 1, 4), anchors,
            batch['img_shape'], self.rpn_test_cfg)
        score_sum = 0.0
        for i, head in enumerate(self.bbox_heads):
            roi_feats = extract_roi_feats_fpn(feats, boxes)
            cls_s, reg_s, _ = head(roi_feats)
            if self.loss_cls == 'seesaw':
                from ..roi_heads.standard_roi_head import seesaw_activation
                cls_s = seesaw_activation(cls_s, self.num_classes)
            score_sum = score_sum + jax.nn.softmax(
                cls_s.astype(jnp.float32), axis=-1)
            if i < 2:   # refine for next stage
                boxes = delta2bbox(boxes, reg_s.astype(jnp.float32),
                                   stds=STAGE_STDS[i])
                boxes = clip_boxes(
                    boxes,
                    batch['img_shape'][:, None, :].astype(jnp.float32))
        avg_scores = score_sum / 3.0
        # final decode with stage-2 regression via the shared predict helper
        return roi_head_predict(
            lambda rf: (jnp.log(jnp.maximum(avg_scores, 1e-9)),
                        self.bbox_heads[2](rf)[1], None),
            feats, boxes, box_valid, batch['img_shape'], self.num_classes,
            featmap_stride=0, reg_class_agnostic=True,
            target_stds=STAGE_STDS[2], use_sigmoid_cls=False,
            cfg=self.roi_test_cfg,
            roi_extractor=lambda f, r: extract_roi_feats_fpn(f, r))

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)


@DETECTORS.register_module()
class CascadeMaskRCNN(CascadeRCNN):
    """Cascade Mask R-CNN (reference `configs/cascade_rcnn/
    cascade_mask_rcnn_*`, `mmdet/models/roi_heads/cascade_roi_head.py`
    with mask_head list): the three-stage bbox cascade plus one FCN mask
    head per stage. Each stage's mask head trains on that stage's sampled
    RoIs (positives weighted); at test time the three heads run on the
    final detections and their sigmoid maps are averaged (mmdet
    `CascadeRoIHead.simple_test_mask` semantics)."""

    mask_size: int = 28
    # seesaw `*_normed_mask_*` rows: NormedConv2d mask predictors
    normed_mask: bool = False

    def setup(self):
        super().setup()
        from ..roi_heads.mask_head import FCNMaskHead
        self.mask_heads = [
            FCNMaskHead(num_classes=self.num_classes,
                        normed_predictor=self.normed_mask,
                        dtype=self.dtype, name=f'mask_head_{i}')
            for i in range(3)
        ]

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        from ..roi_heads.mask_head import (mask_loss,
                                           mask_targets_from_box_frame)
        feats, cls, reg, anchors = self._flat_rpn(batch['image'])
        b, n = cls.shape
        losses = rpn_loss(cls.reshape(b, n, 1, 1), reg.reshape(b, n, 1, 4),
                          anchors, batch['gt_bboxes'], batch['gt_valid'],
                          batch['img_shape'], self.make_rng('sampler'),
                          self.rpn_train_cfg)
        proposals, _, prop_valid = rpn_proposals(
            jax.lax.stop_gradient(cls).reshape(b, n, 1, 1),
            jax.lax.stop_gradient(reg).reshape(b, n, 1, 4),
            anchors, batch['img_shape'], self.rpn_proposal_cfg)

        boxes, box_valid = proposals, prop_valid
        for i, head in enumerate(self.bbox_heads):
            cfg = self._stage_cfg(i)
            sampled = sample_rois(boxes, box_valid, batch['gt_bboxes'],
                                  batch['gt_labels'], batch['gt_valid'],
                                  self.make_rng('sampler'), self.num_classes,
                                  cfg)
            roi_feats = extract_roi_feats_fpn(feats, sampled.rois)
            cls_s, reg_s, _ = head(roi_feats)
            stage_losses = self._stage_bbox_losses(i, cls_s, reg_s, sampled,
                                                   cfg)
            mask_feats = extract_roi_feats_fpn(feats, sampled.rois,
                                               out_size=self.mask_size // 2)
            mask_logits = self.mask_heads[i](mask_feats)
            targets = mask_targets_from_box_frame(
                batch['gt_masks'], batch['gt_bboxes'], sampled.rois,
                sampled.matched_gt, self.mask_size)
            pos_w = (sampled.is_pos & sampled.label_valid).astype(jnp.float32)
            stage_losses.update(mask_loss(mask_logits, targets,
                                          sampled.labels, pos_w))
            for k, v in stage_losses.items():
                losses[f's{i}.{k}'] = v * STAGE_WEIGHTS[i]
            refined = delta2bbox(sampled.rois,
                                 jax.lax.stop_gradient(reg_s).astype(
                                     jnp.float32),
                                 stds=cfg.target_stds)
            refined = clip_boxes(
                refined, batch['img_shape'][:, None, :].astype(jnp.float32))
            boxes, box_valid = refined, sampled.label_valid
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = super().predict(batch)
        feats = self.neck(self.backbone(batch['image'].astype(self.dtype)))
        det_boxes = out['dets'][..., :4]
        mask_feats = extract_roi_feats_fpn(feats, det_boxes,
                                           out_size=self.mask_size // 2)
        prob_sum = 0.0
        for head in self.mask_heads:
            prob_sum = prob_sum + jax.nn.sigmoid(
                head(mask_feats).astype(jnp.float32))
        probs = prob_sum / 3.0                          # (B, D, 2s, 2s, C)
        lbl = jnp.clip(out['labels'], 0, self.num_classes - 1)
        out['masks'] = jnp.take_along_axis(
            probs, lbl[..., None, None, None], axis=-1)[..., 0]
        return out
