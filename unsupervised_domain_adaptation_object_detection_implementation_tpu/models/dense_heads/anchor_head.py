"""Multi-level anchor-head machinery (reference `AnchorHead`,
`mmdet/models/dense_heads/anchor_head.py:17`: get_anchors :171,
get_targets :299, loss :453, get_bboxes).

Because every level has a static shape, the per-level lists collapse into one
flat anchor tensor: predictions from all levels are reshaped/concatenated to
(B, N, ·) and the single-level assign/sample/loss machinery applies
unchanged. Supports sampled BCE losses (RPN-style) and dense focal loss
(RetinaNet-style: no sampling, avg by positive count).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors.anchor_generator import (AnchorGenerator,
                                              anchor_inside_flags)
from ...core.bbox.assigners import max_iou_assign
from ...core.bbox.samplers import random_sample
from ...core.bbox.transforms import bbox2delta, clip_boxes, delta2bbox
from ...core.post.nms import NEG_INF, batched_nms
from ..losses import sigmoid_focal_loss, smooth_l1_loss


class MultiAnchorConfig(NamedTuple):
    """Multi-level anchors (e.g. RetinaNet: octave_base_scale=4,
    scales_per_octave=3, ratios [0.5,1,2], strides [8..128])."""
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    octave_base_scale: int = 4
    scales_per_octave: int = 3

    @property
    def num_anchors(self) -> int:
        return len(self.ratios) * self.scales_per_octave

    def generator(self) -> AnchorGenerator:
        return AnchorGenerator(
            strides=list(self.strides), ratios=list(self.ratios),
            octave_base_scale=self.octave_base_scale,
            scales_per_octave=self.scales_per_octave)

    def flat_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]
                     ) -> np.ndarray:
        levels = self.generator().grid_priors(list(featmap_sizes))
        return np.concatenate(levels, axis=0)


def flatten_level_preds(preds: Sequence[jnp.ndarray], channels: int
                        ) -> jnp.ndarray:
    """[(B, Hi, Wi, A*channels)] → (B, ΣNi, channels)."""
    b = preds[0].shape[0]
    return jnp.concatenate(
        [p.reshape(b, -1, channels) for p in preds], axis=1)


class DenseAnchorTrainConfig(NamedTuple):
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0
    match_low_quality: bool = True
    allowed_border: int = -1
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    target_means: Tuple[float, ...] = (0., 0., 0., 0.)
    target_stds: Tuple[float, ...] = (1., 1., 1., 1.)
    # 'focal' (RetinaNet default) | 'ghm' (GHM-C, reference configs/ghm/
    # retinanet_ghm_r50_fpn_1x_coco.py — cls re-weighted by inverse
    # gradient density; GHM's own total-count normalization applies)
    loss_cls: str = 'focal'


def dense_focal_anchor_loss(cls_logits: jnp.ndarray,
                            reg_preds: jnp.ndarray,
                            anchors: jnp.ndarray,
                            gt_bboxes: jnp.ndarray,
                            gt_labels: jnp.ndarray,
                            gt_valid: jnp.ndarray,
                            img_shape: jnp.ndarray,
                            num_classes: int,
                            cfg: DenseAnchorTrainConfig =
                            DenseAnchorTrainConfig()
                            ) -> Dict[str, jnp.ndarray]:
    """RetinaNet-style loss: focal on ALL valid anchors, smooth-L1 on
    positives, both normalized by the positive count."""

    def per_image(cls_i, reg_i, gt_i, gtl_i, gtv_i, shape_i):
        inside = anchor_inside_flags(anchors, shape_i, cfg.allowed_border)
        assign = max_iou_assign(
            anchors, gt_i, gtv_i, gtl_i,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=cfg.min_pos_iou,
            match_low_quality=cfg.match_low_quality, prior_valid=inside)
        pos = assign.assigned_gt_inds > 0
        neg = assign.assigned_gt_inds == 0
        labels = jnp.where(pos, assign.labels, num_classes)
        weight = (pos | neg).astype(jnp.float32)
        if cfg.loss_cls == 'ghm':
            from ..losses.focal_loss import ghm_classification_loss
            cls_loss = ghm_classification_loss(cls_i, labels, weight > 0)
        else:
            cls_loss = sigmoid_focal_loss(
                cls_i, labels, weight=weight, gamma=cfg.focal_gamma,
                alpha=cfg.focal_alpha, reduction='sum')
        matched_gt = gt_i[jnp.clip(assign.assigned_gt_inds - 1, 0,
                                   gt_i.shape[0] - 1)]
        targets = bbox2delta(anchors, matched_gt, cfg.target_means,
                             cfg.target_stds)
        reg_loss = smooth_l1_loss(
            reg_i, targets, weight=pos[:, None].astype(jnp.float32),
            beta=1.0 / 9.0, reduction='sum')
        return cls_loss, reg_loss, jnp.sum(pos)

    cls_l, reg_l, n_pos = jax.vmap(per_image)(
        cls_logits, reg_preds, gt_bboxes, gt_labels, gt_valid, img_shape)
    denom = jnp.maximum(jnp.sum(n_pos), 1.0)
    # GHM normalizes internally by valid-anchor count — mean over images
    loss_cls = (jnp.mean(cls_l) if cfg.loss_cls == 'ghm'
                else jnp.sum(cls_l) / denom)
    return dict(loss_cls=loss_cls, loss_bbox=jnp.sum(reg_l) / denom)


class DensePredictConfig(NamedTuple):
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou_threshold: float = 0.5
    max_per_img: int = 100
    nms_tile: int = 256
    target_stds: Tuple[float, ...] = (1., 1., 1., 1.)


def dense_anchor_predict(cls_logits: jnp.ndarray,
                         reg_preds: jnp.ndarray,
                         anchors: jnp.ndarray,
                         img_shape: jnp.ndarray,
                         num_classes: int,
                         cfg: DensePredictConfig = DensePredictConfig()):
    """Single-stage test path: per-image top-k over anchor×class scores,
    decode, class-aware NMS (reference `AnchorHead.get_bboxes` +
    `multiclass_nms`)."""

    def per_image(cls_i, reg_i, shape_i):
        probs = jax.nn.sigmoid(cls_i.astype(jnp.float32))      # (N, C)
        flat = probs.reshape(-1)
        flat = jnp.where(flat > cfg.score_thr, flat, NEG_INF)
        k = min(cfg.nms_pre, flat.shape[0])
        top, idx = jax.lax.top_k(flat, k)
        a_idx = idx // num_classes
        labels = (idx % num_classes).astype(jnp.int32)
        boxes = delta2bbox(anchors[a_idx], reg_i[a_idx].astype(jnp.float32),
                           stds=cfg.target_stds)
        boxes = clip_boxes(boxes, shape_i.astype(boxes.dtype))
        keep, _ = batched_nms(boxes, top, labels, cfg.nms_iou_threshold,
                              cfg.nms_tile)
        kept = jnp.where(keep, top, NEG_INF)
        m = min(cfg.max_per_img, k)
        sc, sel = jax.lax.top_k(kept, m)
        valid = sc > NEG_INF / 2
        dets = jnp.concatenate(
            [boxes[sel] * valid[:, None], jnp.where(valid, sc, 0.0)[:, None]],
            axis=-1)
        return dets, jnp.where(valid, labels[sel], 0), valid

    dets, labels, valid = jax.vmap(per_image)(cls_logits, reg_preds,
                                              img_shape)
    return dict(dets=dets, labels=labels, valid=valid)
