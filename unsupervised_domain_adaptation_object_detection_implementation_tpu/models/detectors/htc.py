"""Hybrid Task Cascade (reference `mmdet/models/detectors/htc.py` +
`mmdet/models/roi_heads/htc_roi_head.py`).

Cascade R-CNN interleaved with per-stage mask heads plus the two HTC
information flows: (1) mask info flow — each stage's mask head consumes
the previous stage's mask features through a 1x1 adapter; (2) a semantic
segmentation branch (`FusedSemanticHead`) whose per-RoI pooled features are
added to both box and mask RoI features.

All stages run on the same static (B, S) sampled-RoI layout; positives are
weighted, never gathered.
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
from ..dense_heads.rpn_head import (ProposalConfig, RPNTrainConfig,
                                    rpn_loss, rpn_proposals)
from ..necks.fpn import FPN
from ..roi_heads.bbox_head import Shared2FCBBoxHead
from ..roi_heads.mask_head import mask_loss, mask_targets_from_box_frame
from ..roi_heads.standard_roi_head import (RoITestConfig, RoITrainConfig,
                                           bbox_loss,
                                           extract_roi_feats_fpn,
                                           roi_head_predict, sample_rois)
from .faster_rcnn_fpn import FPNRPNHead

STAGE_IOUS = (0.5, 0.6, 0.7)
STAGE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
              (0.033, 0.033, 0.067, 0.067))
STAGE_WEIGHTS = (1.0, 0.5, 0.25)


class HTCMaskHead(nn.Module):
    """FCN mask head with an info-flow input adapter
    (`htc_mask_head.py`)."""

    num_classes: int = 80
    conv_out: int = 256
    num_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, last_feat=None):
        if last_feat is not None:
            x = x + nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                            name='info_flow')(last_feat)
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name=f'conv{i}')(x))
        feat = x
        b, s, hh, ww, c = x.shape
        x = jax.image.resize(x, (b, s, hh * 2, ww * 2, c), method='nearest')
        x = nn.relu(nn.Conv(self.conv_out, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name='upsample_conv')(x))
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name='logits')(x)
        return logits.astype(jnp.float32), feat


class FusedSemanticHead(nn.Module):
    """Semantic branch (`fused_semantic_head.py`): fuse all FPN levels at
    stride 8, 4 convs, per-pixel class logits + a feature map for RoI
    fusion."""

    num_classes: int = 183
    conv_out: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        target_hw = feats[1].shape[1:3]
        acc = 0.
        for i, f in enumerate(feats):
            h = nn.Conv(self.conv_out, (1, 1), dtype=self.dtype,
                        name=f'lateral{i}')(f)
            acc = acc + jax.image.resize(
                h, (h.shape[0], *target_hw, h.shape[-1]), method='nearest')
        x = acc
        for i in range(4):
            x = nn.relu(nn.Conv(self.conv_out, (3, 3), padding=[(1, 1)] * 2,
                                dtype=self.dtype, name=f'conv{i}')(x))
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name='logits')(x)
        return logits.astype(jnp.float32), x


@DETECTORS.register_module()
class HTC(nn.Module):
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
    mask_size: int = 28
    with_semantic: bool = True
    semantic_classes: int = 183
    roi_test_cfg: RoITestConfig = RoITestConfig()
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
                              reg_class_agnostic=True, dtype=self.dtype,
                              name=f'bbox_head_{i}') for i in range(3)]
        self.mask_heads = [
            HTCMaskHead(num_classes=self.num_classes, dtype=self.dtype,
                        name=f'mask_head_{i}') for i in range(3)]
        if self.with_semantic:
            self.semantic_head = FusedSemanticHead(
                num_classes=self.semantic_classes, dtype=self.dtype)

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
        anchors = jnp.asarray(np.concatenate(gen.grid_priors(sizes),
                                             axis=0))
        cls = flatten_level_preds(cls_levels, 1)[..., 0]
        reg = flatten_level_preds(reg_levels, 4)
        return feats, cls, reg, anchors

    def _semantic_roi(self, sem_feat, rois):
        """Pool the stride-8 semantic feature for each roi (7x7 → mean to
        match the box FC input; 14x14 for masks handled by caller)."""
        return extract_roi_feats_fpn((sem_feat,) * 5, rois)

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

        sem_feat = None
        if self.with_semantic:
            sem_logits, sem_feat = self.semantic_head(feats)
            if 'gt_semantic_seg' in batch:
                tgt = jax.image.resize(
                    batch['gt_semantic_seg'].astype(jnp.int32),
                    (b, *sem_logits.shape[1:3]), method='nearest')
                valid = tgt < self.semantic_classes
                onehot = jax.nn.one_hot(jnp.clip(tgt, 0,
                                                 self.semantic_classes - 1),
                                        self.semantic_classes)
                ce = -jnp.sum(onehot * jax.nn.log_softmax(sem_logits), -1)
                losses['loss_semantic'] = 0.2 * jnp.sum(
                    ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)

        boxes, box_valid = proposals, prop_valid
        last_mask_feat = None
        for i in range(3):
            cfg = self._stage_cfg(i)
            sampled = sample_rois(boxes, box_valid, batch['gt_bboxes'],
                                  batch['gt_labels'], batch['gt_valid'],
                                  self.make_rng('sampler'),
                                  self.num_classes, cfg)
            roi_feats = extract_roi_feats_fpn(feats, sampled.rois)
            if sem_feat is not None:
                roi_feats = roi_feats + self._semantic_roi(sem_feat,
                                                           sampled.rois)
            cls_s, reg_s, _ = self.bbox_heads[i](roi_feats)
            for k, v in bbox_loss(cls_s, reg_s, sampled, self.num_classes,
                                  cfg).items():
                losses[f's{i}.{k}'] = v * STAGE_WEIGHTS[i]

            # interleaved mask branch with info flow
            mfeats = extract_roi_feats_fpn(feats, sampled.rois,
                                           out_size=self.mask_size // 2)
            if sem_feat is not None:
                mfeats = mfeats + extract_roi_feats_fpn(
                    (sem_feat,) * 5, sampled.rois,
                    out_size=self.mask_size // 2)
            mask_logits, last_mask_feat = self.mask_heads[i](
                mfeats, last_mask_feat)
            targets = mask_targets_from_box_frame(
                batch['gt_masks'], batch['gt_bboxes'], sampled.rois,
                sampled.matched_gt, self.mask_size)
            pos_w = (sampled.is_pos & sampled.label_valid).astype(
                jnp.float32)
            for k, v in mask_loss(mask_logits, targets, sampled.labels,
                                  pos_w).items():
                losses[f's{i}.{k}'] = v * STAGE_WEIGHTS[i]

            refined = delta2bbox(
                sampled.rois,
                jax.lax.stop_gradient(reg_s).astype(jnp.float32),
                stds=cfg.target_stds)
            refined = clip_boxes(
                refined,
                batch['img_shape'][:, None, :].astype(jnp.float32))
            boxes, box_valid = refined, sampled.label_valid
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feats, cls, reg, anchors = self._flat_rpn(batch['image'])
        b, n = cls.shape
        boxes, _, box_valid = rpn_proposals(
            cls.reshape(b, n, 1, 1), reg.reshape(b, n, 1, 4), anchors,
            batch['img_shape'], self.rpn_test_cfg)
        sem_feat = None
        if self.with_semantic:
            _, sem_feat = self.semantic_head(feats)

        score_sum = 0.0
        for i in range(3):
            roi_feats = extract_roi_feats_fpn(feats, boxes)
            if sem_feat is not None:
                roi_feats = roi_feats + self._semantic_roi(sem_feat, boxes)
            cls_s, reg_s, _ = self.bbox_heads[i](roi_feats)
            score_sum = score_sum + jax.nn.softmax(
                cls_s.astype(jnp.float32), axis=-1)
            if i < 2:
                boxes = delta2bbox(boxes, reg_s.astype(jnp.float32),
                                   stds=STAGE_STDS[i])
                boxes = clip_boxes(
                    boxes,
                    batch['img_shape'][:, None, :].astype(jnp.float32))
        avg_scores = score_sum / 3.0
        out = roi_head_predict(
            lambda rf: (jnp.log(jnp.maximum(avg_scores, 1e-9)),
                        self.bbox_heads[2](rf)[1], None),
            feats, boxes, box_valid, batch['img_shape'], self.num_classes,
            featmap_stride=0, reg_class_agnostic=True,
            target_stds=STAGE_STDS[2], use_sigmoid_cls=False,
            cfg=self.roi_test_cfg,
            roi_extractor=lambda f, r: extract_roi_feats_fpn(f, r))

        # ensemble mask over the three stages on final detections
        det_boxes = out['dets'][..., :4]
        mfeats = extract_roi_feats_fpn(feats, det_boxes,
                                       out_size=self.mask_size // 2)
        if sem_feat is not None:
            mfeats = mfeats + extract_roi_feats_fpn(
                (sem_feat,) * 5, det_boxes, out_size=self.mask_size // 2)
        probs = 0.0
        last = None
        for i in range(3):
            logits, last = self.mask_heads[i](mfeats, last)
            probs = probs + jax.nn.sigmoid(logits)
        probs = probs / 3.0
        lbl = jnp.clip(out['labels'], 0, self.num_classes - 1)
        out['masks'] = jnp.take_along_axis(
            probs, lbl[..., None, None, None], axis=-1)[..., 0]
        return out

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
