"""Two-stage RoI-head variants: Mask Scoring R-CNN, Double-Head R-CNN,
Dynamic R-CNN, Grid R-CNN, PointRend.

References: `mmdet/models/detectors/mask_scoring_rcnn.py` +
`roi_heads/mask_scoring_roi_head.py` + `mask_heads/maskiou_head.py`;
`roi_heads/double_roi_head.py` + `bbox_heads/double_bbox_head.py`;
`roi_heads/dynamic_roi_head.py`; `detectors/grid_rcnn.py` +
`roi_heads/grid_roi_head.py` + `mask_heads/grid_head.py`;
`detectors/point_rend.py` + `roi_heads/point_rend_roi_head.py`.

Each reuses the shared static-shape FasterRCNN-FPN trunk pieces
(`rpn_proposals` → `sample_rois` → `extract_roi_feats_fpn`); the variant
logic is the head + loss, as in the reference.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors.anchor_generator import AnchorGenerator
from ...core.bbox.transforms import clip_boxes, delta2bbox
from ...ops import batched_point_sample, rel_roi_point_to_rel_img_point
from ...utils.registry import DETECTORS, HEADS
from ..backbones.build import build_trunk
from ..dense_heads.anchor_head import flatten_level_preds
from ..dense_heads.rpn_head import (ProposalConfig, RPNTrainConfig,
                                    rpn_loss, rpn_proposals)
from ..necks.fpn import FPN
from ..roi_heads.bbox_head import Shared2FCBBoxHead
from ..roi_heads.mask_head import (FCNMaskHead, mask_loss,
                                   mask_targets_from_box_frame)
from ..roi_heads.standard_roi_head import (RoITestConfig, RoITrainConfig,
                                           bbox_loss,
                                           extract_roi_feats_fpn,
                                           roi_head_predict, sample_rois)
from ..losses import smooth_l1_loss
from ..losses.cross_entropy_loss import (binary_cross_entropy,
                                         softmax_cross_entropy)
from .faster_rcnn_fpn import FPNRPNHead


class _TwoStageBase(nn.Module):
    """Shared RPN/neck scaffolding for the variants below."""

    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    rpn_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    # 'single' | 'groie' (configs/groie grid_rcnn_*_groie row)
    roi_extractor_type: str = 'single'
    rpn_train_cfg: RPNTrainConfig = RPNTrainConfig()
    rpn_proposal_cfg: ProposalConfig = ProposalConfig(nms_pre=4096,
                                                      max_per_img=1000)
    rpn_test_cfg: ProposalConfig = ProposalConfig(nms_pre=4096,
                                                  max_per_img=1000)
    roi_train_cfg: RoITrainConfig = RoITrainConfig(use_sigmoid_cls=False)
    roi_test_cfg: RoITestConfig = RoITestConfig()
    dtype: Any = jnp.float32

    @property
    def _roi_extract(self):
        from ..roi_heads.standard_roi_head import (extract_roi_feats_fpn,
                                                   extract_roi_feats_groie)
        return (extract_roi_feats_groie
                if self.roi_extractor_type == 'groie'
                else extract_roi_feats_fpn)

    def _setup_trunk(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = FPN(in_channels=self.backbone.stage_channels(),
                        out_channels=256, num_outs=5, dtype=self.dtype)
        self.rpn_head = FPNRPNHead(dtype=self.dtype)

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

    def _rpn_and_sample(self, batch):
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
        sampled = sample_rois(proposals, prop_valid, batch['gt_bboxes'],
                              batch['gt_labels'], batch['gt_valid'],
                              self.make_rng('sampler'), self.num_classes,
                              self.roi_train_cfg)
        return feats, losses, sampled

    def _rpn_test(self, batch):
        feats, cls, reg, anchors = self._flat_rpn(batch['image'])
        b, n = cls.shape
        proposals, _, prop_valid = rpn_proposals(
            cls.reshape(b, n, 1, 1), reg.reshape(b, n, 1, 4), anchors,
            batch['img_shape'], self.rpn_test_cfg)
        return feats, proposals, prop_valid


@HEADS.register_module()
class MaskIoUHead(nn.Module):
    """`maskiou_head.py:12`: conv stack over [roi_feat, mask_pred] → FCs →
    per-class mask IoU."""

    num_classes: int = 80
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mask_feats, mask_probs):
        # mask_probs (B, S, 2m, 2m, C->selected 1) downsampled to feat size
        b, s, h, w, c = mask_feats.shape
        mp = jax.image.resize(mask_probs, (b, s, h, w, 1), method='nearest')
        x = jnp.concatenate([mask_feats, mp.astype(mask_feats.dtype)], -1)
        for i in range(4):
            stride = 2 if i == 3 else 1
            x = nn.relu(nn.Conv(256, (3, 3), strides=(stride, stride),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name=f'conv{i}')(x))
        x = x.reshape(b, s, -1)
        for i in range(2):
            x = nn.relu(nn.Dense(1024, dtype=self.dtype,
                                 name=f'fc{i}')(x))
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name='iou_out')(x).astype(jnp.float32)


@DETECTORS.register_module()
class MaskScoringRCNN(_TwoStageBase):
    """Mask R-CNN + MaskIoU head; test score = cls score · mask IoU."""

    mask_size: int = 28

    def setup(self):
        self._setup_trunk()
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes, in_channels=256,
            dtype=self.dtype)
        self.mask_head = FCNMaskHead(num_classes=self.num_classes,
                                     dtype=self.dtype)
        self.mask_iou_head = MaskIoUHead(num_classes=self.num_classes,
                                         dtype=self.dtype)

    def loss(self, batch):
        feats, losses, sampled = self._rpn_and_sample(batch)
        roi_feats = self._roi_extract(feats, sampled.rois)
        cls_s, reg_s, _ = self.bbox_head(roi_feats)
        losses.update(bbox_loss(cls_s, reg_s, sampled, self.num_classes,
                                self.roi_train_cfg))
        mask_feats = self._roi_extract(feats, sampled.rois,
                                           out_size=self.mask_size // 2)
        mask_logits = self.mask_head(mask_feats)
        targets = mask_targets_from_box_frame(
            batch['gt_masks'], batch['gt_bboxes'], sampled.rois,
            sampled.matched_gt, self.mask_size)
        pos_w = (sampled.is_pos & sampled.label_valid).astype(jnp.float32)
        losses.update(mask_loss(mask_logits, targets, sampled.labels,
                                pos_w))
        # mask IoU target: IoU between thresholded predicted mask and gt
        lbl = jnp.clip(sampled.labels, 0, self.num_classes - 1)
        sel = jnp.take_along_axis(mask_logits,
                                  lbl[..., None, None, None], -1)[..., 0]
        pred_bin = jax.lax.stop_gradient(jax.nn.sigmoid(sel)) > 0.5
        inter = jnp.sum(pred_bin & (targets > 0.5), axis=(-2, -1))
        union = jnp.sum(pred_bin | (targets > 0.5), axis=(-2, -1))
        iou_t = inter / jnp.maximum(union, 1.0)
        iou_p = self.mask_iou_head(mask_feats,
                                   jax.nn.sigmoid(sel)[..., None])
        iou_sel = jnp.take_along_axis(iou_p, lbl[..., None], -1)[..., 0]
        losses['loss_mask_iou'] = 0.5 * jnp.sum(
            (iou_sel - iou_t) ** 2 * pos_w) / jnp.maximum(jnp.sum(pos_w),
                                                          1.0)
        return losses

    def predict(self, batch):
        feats, proposals, prop_valid = self._rpn_test(batch)
        out = roi_head_predict(
            self.bbox_head, feats, proposals, prop_valid,
            batch['img_shape'], self.num_classes, featmap_stride=0,
            reg_class_agnostic=False,
            target_stds=self.roi_train_cfg.target_stds,
            use_sigmoid_cls=False, cfg=self.roi_test_cfg,
            roi_extractor=lambda f, r: self._roi_extract(f, r))
        det_boxes = out['dets'][..., :4]
        mask_feats = self._roi_extract(feats, det_boxes,
                                           out_size=self.mask_size // 2)
        mask_logits = self.mask_head(mask_feats)
        lbl = jnp.clip(out['labels'], 0, self.num_classes - 1)
        sel = jnp.take_along_axis(mask_logits,
                                  lbl[..., None, None, None], -1)[..., 0]
        probs = jax.nn.sigmoid(sel.astype(jnp.float32))
        out['masks'] = probs
        iou_p = self.mask_iou_head(mask_feats, probs[..., None])
        iou_sel = jnp.take_along_axis(iou_p, lbl[..., None], -1)[..., 0]
        scores = out['dets'][..., 4] * jnp.clip(iou_sel, 0, 1)
        out['dets'] = jnp.concatenate(
            [det_boxes, scores[..., None]], axis=-1)
        return out

    def __call__(self, batch, train: bool = True):
        return self.loss(batch) if train else self.predict(batch)


@HEADS.register_module()
class DoubleBBoxHead(nn.Module):
    """`double_bbox_head.py:54`: conv branch (residual bottlenecks) for
    regression, fc branch for classification."""

    num_classes: int = 80
    num_convs: int = 4
    num_fcs: int = 2
    conv_out: int = 1024
    fc_out: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        b, s, h, w, c = roi_feats.shape
        # conv branch → reg
        x = nn.Conv(self.conv_out, (1, 1), dtype=self.dtype,
                    name='res_in')(roi_feats)
        for i in range(self.num_convs):
            ident = x
            h_ = nn.relu(nn.Conv(self.conv_out // 4, (1, 1),
                                 dtype=self.dtype, name=f'res{i}_1')(x))
            h_ = nn.relu(nn.Conv(self.conv_out // 4, (3, 3),
                                 padding=[(1, 1)] * 2, dtype=self.dtype,
                                 name=f'res{i}_2')(h_))
            h_ = nn.Conv(self.conv_out, (1, 1), dtype=self.dtype,
                         name=f'res{i}_3')(h_)
            x = nn.relu(ident + h_)
        x = jnp.mean(x, axis=(2, 3))                     # GAP
        reg = nn.Dense(4 * self.num_classes, dtype=self.dtype,
                       name='fc_reg')(x).astype(jnp.float32)

        # fc branch → cls
        y = roi_feats.reshape(b, s, -1)
        for i in range(self.num_fcs):
            y = nn.relu(nn.Dense(self.fc_out, dtype=self.dtype,
                                 name=f'fc{i}')(y))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       name='fc_cls')(y).astype(jnp.float32)
        return cls, reg, y


@DETECTORS.register_module()
class DoubleHeadRCNN(_TwoStageBase):
    def setup(self):
        self._setup_trunk()
        self.bbox_head = DoubleBBoxHead(num_classes=self.num_classes,
                                        dtype=self.dtype)

    def loss(self, batch):
        feats, losses, sampled = self._rpn_and_sample(batch)
        roi_feats = self._roi_extract(feats, sampled.rois)
        cls_s, reg_s, _ = self.bbox_head(roi_feats)
        # reference weights: cls 2.0, reg 2.0 (double_roi_head defaults 1)
        for k, v in bbox_loss(cls_s, reg_s, sampled, self.num_classes,
                              self.roi_train_cfg).items():
            losses[k] = v * 2.0
        return losses

    def predict(self, batch):
        feats, proposals, prop_valid = self._rpn_test(batch)
        return roi_head_predict(
            self.bbox_head, feats, proposals, prop_valid,
            batch['img_shape'], self.num_classes, featmap_stride=0,
            reg_class_agnostic=False,
            target_stds=self.roi_train_cfg.target_stds,
            use_sigmoid_cls=False, cfg=self.roi_test_cfg,
            roi_extractor=lambda f, r: self._roi_extract(f, r))

    def __call__(self, batch, train: bool = True):
        return self.loss(batch) if train else self.predict(batch)


@DETECTORS.register_module()
class DynamicRCNN(_TwoStageBase):
    """`dynamic_roi_head.py:16`: the assignment IoU threshold and the
    SmoothL1 beta adapt to the training distribution. The reference keeps
    a rolling history across iterations; here both statistics come from
    the current batch (the KI-th largest proposal IoU / KE-th smallest
    regression error percentile), which is the same estimator evaluated
    on a window of one step — documented deviation."""

    iou_topk: int = 75
    beta_topk: int = 10

    def setup(self):
        self._setup_trunk()
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes, in_channels=256,
            dtype=self.dtype)

    def loss(self, batch):
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

        # dynamic IoU: per image, the iou_topk-th best proposal IoU
        from ...core.bbox.iou import bbox_overlaps

        def dyn_thr(props, gt, gtv):
            ious = bbox_overlaps(gt, props)
            ious = jnp.where(gtv[:, None], ious, 0.0)
            best = jnp.max(ious, axis=0)
            k = min(self.iou_topk, best.shape[0])
            top, _ = jax.lax.top_k(best, k)
            return top[-1]

        thr = jnp.mean(jax.vmap(dyn_thr)(
            proposals, batch['gt_bboxes'], batch['gt_valid']))
        thr = jnp.clip(thr, 0.35, 0.75)
        # sample_rois takes static thresholds; fold the dynamic threshold
        # in by masking: sample at base 0.5 then re-label positives whose
        # IoU < thr as background
        sampled = sample_rois(proposals, prop_valid, batch['gt_bboxes'],
                              batch['gt_labels'], batch['gt_valid'],
                              self.make_rng('sampler'), self.num_classes,
                              self.roi_train_cfg)
        ious = jax.vmap(lambda r, g, gv: jnp.max(
            jnp.where(gv[:, None], bbox_overlaps(g, r), 0.0), axis=0))(
            sampled.rois, batch['gt_bboxes'], batch['gt_valid'])
        demote = sampled.is_pos & (ious < thr)
        labels = jnp.where(demote, self.num_classes, sampled.labels)
        sampled = sampled._replace(labels=labels,
                                   is_pos=sampled.is_pos & ~demote)

        roi_feats = self._roi_extract(feats, sampled.rois)
        cls_s, reg_s, _ = self.bbox_head(roi_feats)
        # dynamic beta: beta_topk-th smallest |error| among positives
        err = jnp.abs(reg_s.astype(jnp.float32) - jnp.tile(
            sampled.reg_targets, (1, 1, self.num_classes)))
        lbl = jnp.clip(sampled.labels, 0, self.num_classes - 1)
        err_sel = jnp.take_along_axis(
            err.reshape(*err.shape[:2], self.num_classes, 4),
            lbl[..., None, None], axis=2)[:, :, 0]
        mean_err = jnp.mean(jnp.where(sampled.is_pos[..., None],
                                      err_sel, jnp.inf), axis=-1)
        k = min(self.beta_topk, mean_err.shape[1])
        small, _ = jax.lax.top_k(-mean_err.reshape(-1),
                                 k * mean_err.shape[0])
        beta = jnp.clip(jnp.where(jnp.isfinite(-small[-1]), -small[-1],
                                  1.0), 0.01, 1.0)

        cls_t = sampled.labels
        w = sampled.label_valid.astype(jnp.float32)
        loss_cls = jnp.sum(softmax_cross_entropy(cls_s, cls_t) * w) / \
            jnp.maximum(jnp.sum(w), 1.0)
        pos_w = sampled.is_pos.astype(jnp.float32)
        diff = jnp.abs(err_sel)
        sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                        diff - 0.5 * beta)
        loss_reg = jnp.sum(jnp.sum(sl1, -1) * pos_w) / \
            jnp.maximum(jnp.sum(pos_w), 1.0)
        losses['loss_cls'] = loss_cls
        losses['loss_bbox'] = loss_reg
        return losses

    def predict(self, batch):
        feats, proposals, prop_valid = self._rpn_test(batch)
        return roi_head_predict(
            self.bbox_head, feats, proposals, prop_valid,
            batch['img_shape'], self.num_classes, featmap_stride=0,
            reg_class_agnostic=False,
            target_stds=self.roi_train_cfg.target_stds,
            use_sigmoid_cls=False, cfg=self.roi_test_cfg,
            roi_extractor=lambda f, r: self._roi_extract(f, r))

    def __call__(self, batch, train: bool = True):
        return self.loss(batch) if train else self.predict(batch)


@HEADS.register_module()
class GridHead(nn.Module):
    """`grid_head.py:10`: 8 convs + group-norm → 2 deconvs → 9 point
    heatmaps at 56x56 (fusion convs between neighbor points omitted none —
    first-order fusion included)."""

    grid_points: int = 9
    conv_out: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        b, s, h, w, c = roi_feats.shape
        x = roi_feats
        for i in range(8):
            x = nn.relu(nn.GroupNorm(num_groups=8, name=f'gn{i}')(
                nn.Conv(self.conv_out, (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f'conv{i}')(x)))
        # first-order fusion: each point's map gets a conv of neighbors
        fused = nn.relu(nn.Conv(self.conv_out, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name='fusion')(x)) + x
        up = jax.image.resize(fused, (b, s, h * 2, w * 2, self.conv_out),
                              method='nearest')
        up = nn.relu(nn.Conv(self.conv_out, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name='up1')(up))
        up = jax.image.resize(up, (b, s, h * 4, w * 4, self.conv_out),
                              method='nearest')
        logits = nn.Conv(self.grid_points, (3, 3), padding=[(1, 1)] * 2,
                         dtype=self.dtype, name='logits')(up)
        return logits.astype(jnp.float32)


@DETECTORS.register_module()
class GridRCNN(_TwoStageBase):
    """Grid R-CNN: classification via the standard head; localization via
    9-point grid heatmaps decoded from argmax positions."""

    grid_size: int = 56

    def setup(self):
        self._setup_trunk()
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes, in_channels=256,
            dtype=self.dtype)
        self.grid_head = GridHead(dtype=self.dtype)

    @staticmethod
    def _expand2x(boxes):
        """2x-expanded roi frame (reference `grid_head.py:232-237`): grid
        targets/decodes live in this frame so gt corners of an imperfect
        proposal still fall inside the heatmap."""
        w = boxes[..., 2] - boxes[..., 0]
        h = boxes[..., 3] - boxes[..., 1]
        return jnp.stack([boxes[..., 0] - w / 2, boxes[..., 1] - h / 2,
                          boxes[..., 2] + w / 2, boxes[..., 3] + h / 2], -1)

    def _grid_targets(self, rois, gt_boxes):
        """Heatmap targets: 9 grid points of the matched gt box inside the
        2x-expanded roi frame, radius-1 circle (5 px) per point — reference
        `grid_head.py:257-281` (pos_radius=1). The reference's
        `w <= grid_size` skip-gate is intentionally dropped: it zeroes all
        targets for rois narrower than 56 px, which is every roi on smoke
        canvases."""
        gs = self.grid_size
        rois = self._expand2x(rois)
        x1, y1 = rois[..., 0], rois[..., 1]
        w = jnp.maximum(rois[..., 2] - rois[..., 0], 1e-3)
        h = jnp.maximum(rois[..., 3] - rois[..., 1], 1e-3)
        gx = jnp.stack([gt_boxes[..., 0],
                        (gt_boxes[..., 0] + gt_boxes[..., 2]) / 2,
                        gt_boxes[..., 2]], -1)               # (B,S,3)
        gy = jnp.stack([gt_boxes[..., 1],
                        (gt_boxes[..., 1] + gt_boxes[..., 3]) / 2,
                        gt_boxes[..., 3]], -1)
        # 9 points row-major (yi, xi)
        px = jnp.tile(gx, (1, 1, 3))                          # x0x1x2 x3
        py = jnp.repeat(gy, 3, axis=-1)
        u = (px - x1[..., None]) / w[..., None] * gs
        v = (py - y1[..., None]) / h[..., None] * gs
        ui = jnp.clip(jnp.floor(u), 0, gs - 1)
        vi = jnp.clip(jnp.floor(v), 0, gs - 1)
        ys = jnp.arange(gs)
        xs = jnp.arange(gs)
        d2 = (ys[None, None, None, :, None] - vi[..., None, None]) ** 2 + \
             (xs[None, None, None, None, :] - ui[..., None, None]) ** 2
        heat = (d2 <= 1.0).astype(jnp.float32)                # (B,S,9,G,G)
        return heat.transpose(0, 1, 3, 4, 2)                  # (B,S,G,G,9)

    def loss(self, batch):
        feats, losses, sampled = self._rpn_and_sample(batch)
        roi_feats = self._roi_extract(feats, sampled.rois)
        cls_s, reg_s, _ = self.bbox_head(roi_feats)
        # classification only from the bbox head (grid does localization)
        w = sampled.label_valid.astype(jnp.float32)
        losses['loss_cls'] = jnp.sum(
            softmax_cross_entropy(cls_s, sampled.labels) * w) / \
            jnp.maximum(jnp.sum(w), 1.0)

        grid_feats = self._roi_extract(feats, sampled.rois,
                                           out_size=14)
        logits = self.grid_head(grid_feats)                   # (B,S,56,56,9)
        gt_m = jnp.take_along_axis(batch['gt_bboxes'],
                                   sampled.matched_gt[..., None], axis=1)
        targets = self._grid_targets(sampled.rois, gt_m)
        pos_w = (sampled.is_pos & sampled.label_valid).astype(jnp.float32)
        bce = binary_cross_entropy(logits, targets, reduction='none')
        # reference grid loss_weight=15 (`grid_head.py:24-26`): without it
        # the ~5 positive px per 56x56 map drown in the background mean and
        # the head collapses to all-negative (argmax noise, AP 0)
        losses['loss_grid'] = 15.0 * jnp.sum(
            jnp.mean(bce, axis=(-3, -2, -1)) * pos_w) / \
            jnp.maximum(jnp.sum(pos_w), 1.0)
        return losses

    def predict(self, batch):
        feats, proposals, prop_valid = self._rpn_test(batch)
        # the grid variant trains NO reg branch (reference grid_rcnn
        # config: bbox_head with_reg=False) — score raw proposals, then
        # localize purely from the grid head
        out = roi_head_predict(
            self.bbox_head, feats, proposals, prop_valid,
            batch['img_shape'], self.num_classes, featmap_stride=0,
            reg_class_agnostic=False,
            target_stds=self.roi_train_cfg.target_stds,
            use_sigmoid_cls=False, cfg=self.roi_test_cfg,
            roi_extractor=lambda f, r: extract_roi_feats_fpn(f, r),
            with_reg=False)
        # refine boxes from grid point argmaxes
        det = out['dets'][..., :4]
        gfeats = extract_roi_feats_fpn(feats, det, out_size=14)
        logits = self.grid_head(gfeats)
        gs = logits.shape[2]
        b, s = logits.shape[:2]
        flat = logits.reshape(b, s, gs * gs, 9)
        idx = jnp.argmax(flat, axis=2)
        vi = (idx // gs).astype(jnp.float32) + 0.5
        ui = (idx % gs).astype(jnp.float32) + 0.5
        # decode in the same 2x-expanded frame the targets were built in
        # (reference `grid_head.py:326-333`)
        exp = self._expand2x(det)
        x1, y1 = exp[..., 0], exp[..., 1]
        w = jnp.maximum(exp[..., 2] - exp[..., 0], 1e-3)
        h = jnp.maximum(exp[..., 3] - exp[..., 1], 1e-3)
        px = x1[..., None] + ui / gs * w[..., None]          # (B,S,9)
        py = y1[..., None] + vi / gs * h[..., None]
        # x edges from columns {0,1,2}: left = mean of col 0 points, etc.
        nx1 = jnp.mean(px[..., 0::3], -1)
        nx2 = jnp.mean(px[..., 2::3], -1)
        ny1 = jnp.mean(py[..., 0:3], -1)
        ny2 = jnp.mean(py[..., 6:9], -1)
        new_boxes = jnp.stack([nx1, ny1, nx2, ny2], -1)
        new_boxes = clip_boxes(
            new_boxes, batch['img_shape'][:, None, :].astype(jnp.float32))
        out['dets'] = jnp.concatenate([new_boxes, out['dets'][..., 4:]],
                                      -1)
        return out

    def __call__(self, batch, train: bool = True):
        return self.loss(batch) if train else self.predict(batch)


@HEADS.register_module()
class PointHead(nn.Module):
    """PointRend point head (`mask_point_head.py:15`): MLP over
    [fine-grained point feats, coarse mask point logits]."""

    num_classes: int = 80
    num_fcs: int = 3
    dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fine, coarse):
        x = jnp.concatenate([fine, coarse], axis=-1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.dim, dtype=self.dtype,
                                 name=f'fc{i}')(x))
            x = jnp.concatenate([x, coarse], axis=-1)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name='logits')(x).astype(jnp.float32)


@DETECTORS.register_module()
class PointRend(_TwoStageBase):
    """PointRend on Mask R-CNN: train adds a point loss on the most
    uncertain mask points; test refines the coarse mask at those points
    (one subdivision pass; the reference iterates)."""

    mask_size: int = 28
    num_points: int = 196

    def setup(self):
        self._setup_trunk()
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes, in_channels=256,
            dtype=self.dtype)
        self.mask_head = FCNMaskHead(num_classes=self.num_classes,
                                     dtype=self.dtype)
        self.point_head = PointHead(num_classes=self.num_classes,
                                    dtype=self.dtype)

    def _point_coords(self, mask_logits, labels):
        """Most-uncertain point selection: |logit| smallest on the own
        class channel → normalized (x, y) in the roi frame."""
        b, s, h, w, _ = mask_logits.shape
        lbl = jnp.clip(labels, 0, self.num_classes - 1)
        sel = jnp.take_along_axis(mask_logits,
                                  lbl[..., None, None, None], -1)[..., 0]
        unc = -jnp.abs(sel).reshape(b, s, h * w)
        k = min(self.num_points, h * w)
        _, idx = jax.lax.top_k(unc, k)
        ys = (idx // w).astype(jnp.float32)
        xs = (idx % w).astype(jnp.float32)
        pts = jnp.stack([(xs + 0.5) / w, (ys + 0.5) / h], -1)  # (B,S,K,2)
        return pts, idx

    def _point_feats(self, feats, rois, pts):
        """Fine-grained features: sample P2 at the roi points."""
        b, s, k, _ = pts.shape
        # per-roi points differ (unlike rel_roi_point_to_rel_img_point's
        # shared grid), so map roi-relative → image-normalized directly:
        x = rois[..., 0:1] + pts[..., 0] * (rois[..., 2:3] - rois[..., 0:1])
        y = rois[..., 1:2] + pts[..., 1] * (rois[..., 3:4] - rois[..., 1:2])
        fh, fw = feats[0].shape[1:3]
        norm = jnp.stack([x * 0.25 / fw, y * 0.25 / fh], -1)
        flat = norm.reshape(b, s * k, 2)
        sampled = batched_point_sample(feats[0], flat)
        return sampled.reshape(b, s, k, -1)

    def loss(self, batch):
        feats, losses, sampled = self._rpn_and_sample(batch)
        roi_feats = self._roi_extract(feats, sampled.rois)
        cls_s, reg_s, _ = self.bbox_head(roi_feats)
        losses.update(bbox_loss(cls_s, reg_s, sampled, self.num_classes,
                                self.roi_train_cfg))
        mask_feats = self._roi_extract(feats, sampled.rois,
                                           out_size=self.mask_size // 2)
        mask_logits = self.mask_head(mask_feats)
        targets = mask_targets_from_box_frame(
            batch['gt_masks'], batch['gt_bboxes'], sampled.rois,
            sampled.matched_gt, self.mask_size)
        pos_w = (sampled.is_pos & sampled.label_valid).astype(jnp.float32)
        losses.update(mask_loss(mask_logits, targets, sampled.labels,
                                pos_w))

        # point loss at uncertain points
        pts, _ = self._point_coords(jax.lax.stop_gradient(mask_logits),
                                    sampled.labels)
        fine = self._point_feats(feats, sampled.rois, pts)
        b, s, k, _ = pts.shape
        coarse = jax.vmap(jax.vmap(
            lambda m, p: batched_point_sample(m[None], p[None])[0]))(
            mask_logits, pts)
        pt_logits = self.point_head(fine, coarse)
        # point targets: bilinear sample of the (B,S,m,m) target mask
        t = jax.vmap(jax.vmap(
            lambda m, p: batched_point_sample(m[None, :, :, None],
                                              p[None])[0]))(
            targets, pts)[..., 0]
        lbl = jnp.clip(sampled.labels, 0, self.num_classes - 1)
        pl = jnp.take_along_axis(pt_logits, lbl[..., None, None],
                                 -1)[..., 0]
        bce = binary_cross_entropy(pl, t, reduction='none')
        losses['loss_point'] = jnp.sum(
            jnp.mean(bce, -1) * pos_w) / jnp.maximum(jnp.sum(pos_w), 1.0)
        return losses

    def predict(self, batch):
        feats, proposals, prop_valid = self._rpn_test(batch)
        out = roi_head_predict(
            self.bbox_head, feats, proposals, prop_valid,
            batch['img_shape'], self.num_classes, featmap_stride=0,
            reg_class_agnostic=False,
            target_stds=self.roi_train_cfg.target_stds,
            use_sigmoid_cls=False, cfg=self.roi_test_cfg,
            roi_extractor=lambda f, r: self._roi_extract(f, r))
        det_boxes = out['dets'][..., :4]
        mask_feats = self._roi_extract(feats, det_boxes,
                                           out_size=self.mask_size // 2)
        mask_logits = self.mask_head(mask_feats)
        pts, idx = self._point_coords(mask_logits, out['labels'])
        fine = self._point_feats(feats, det_boxes, pts)
        coarse = jax.vmap(jax.vmap(
            lambda m, p: batched_point_sample(m[None], p[None])[0]))(
            mask_logits, pts)
        pt_logits = self.point_head(fine, coarse)
        lbl = jnp.clip(out['labels'], 0, self.num_classes - 1)
        sel = jnp.take_along_axis(mask_logits,
                                  lbl[..., None, None, None], -1)[..., 0]
        b, s, h, w = sel.shape
        flat = sel.reshape(b, s, h * w)
        repl = jnp.take_along_axis(pt_logits, lbl[..., None, None],
                                   -1)[..., 0]
        flat = jax.vmap(jax.vmap(lambda f, i, r: f.at[i].set(r)))(
            flat, idx, repl)
        out['masks'] = jax.nn.sigmoid(flat.reshape(b, s, h, w))
        return out

    def __call__(self, batch, train: bool = True):
        return self.loss(batch) if train else self.predict(batch)
