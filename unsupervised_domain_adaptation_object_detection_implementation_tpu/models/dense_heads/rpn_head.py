"""RPN head: forward module + batched loss/proposal functions.

Covers the reference `RPNHead` (`mmdet/models/dense_heads/rpn_head.py`) and
the fork's `RPNHeadDA` (`mmdet/models/dense_heads/rpn_head_da.py:15`): the
DA variant's "supervised loss only on source images" python branching
(`rpn_head_da.py:117-168`) becomes a per-image `domain == 0` weight mask —
one batched code path, any batch size (removes the reference's hard batch-2
assumption, SURVEY.md §2.1 quirks).

Single feature level (the DA trunk is DC5/stride-16, no FPN); the module
accepts a list of maps for future FPN use.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.anchors.anchor_generator import AnchorGenerator, anchor_inside_flags
from ...core.bbox.assigners import max_iou_assign
from ...core.bbox.samplers import random_sample
from ...core.bbox.transforms import bbox2delta, clip_boxes, delta2bbox
from ...core.post.nms import NEG_INF, nms
from ...utils.registry import HEADS
from ..losses import binary_cross_entropy, smooth_l1_loss


@HEADS.register_module()
class RPNHead(nn.Module):
    """3x3 conv + sibling 1x1 cls/reg heads (reference `rpn_head.py` fwd)."""

    in_channels: int = 2048
    feat_channels: int = 2048
    num_anchors: int = 15
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, H, W, C) → cls (B, H, W, A), reg (B, H, W, A*4)."""
        t = nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                    dtype=self.dtype, name='rpn_conv')(x)
        t = nn.relu(t)
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      name='rpn_cls')(t)
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      name='rpn_reg')(t)
        return cls, reg


class RPNTrainConfig(NamedTuple):
    """Static training hyperparams (values from
    `da_configs/_base_/models/faster_rcnn_r50_torch_daf.py:60-97`)."""
    pos_iou_thr: float = 0.7
    neg_iou_thr: float = 0.3
    min_pos_iou: float = 0.3
    match_low_quality: bool = True
    num_samples: int = 256
    pos_fraction: float = 0.5
    allowed_border: int = 0
    target_means: Tuple[float, ...] = (0., 0., 0., 0.)
    target_stds: Tuple[float, ...] = (1., 1., 1., 1.)


class ProposalConfig(NamedTuple):
    """nms_pre/max_per_img per reference `rpn_proposal`/`test_cfg.rpn`."""
    nms_pre: int = 4096
    max_per_img: int = 2000
    nms_iou_threshold: float = 0.7
    min_bbox_size: float = 0.0
    nms_tile: int = 512


def rpn_loss(cls_logits: jnp.ndarray,
             reg_preds: jnp.ndarray,
             anchors: jnp.ndarray,
             gt_bboxes: jnp.ndarray,
             gt_valid: jnp.ndarray,
             img_shape: jnp.ndarray,
             rng: jax.Array,
             cfg: RPNTrainConfig = RPNTrainConfig(),
             loss_weight_mask: jnp.ndarray = None) -> Dict[str, jnp.ndarray]:
    """Batched RPN loss (reference `AnchorHead.loss`, `anchor_head.py:453`).

    Args:
        cls_logits: (B, H, W, A) objectness logits.
        reg_preds: (B, H, W, A*4) deltas.
        anchors: (N, 4) flat anchors for the (H, W) grid, N = H*W*A,
            location-major/anchor-minor — matching the (B, H, W, A) reshape.
        gt_*: padded gt blocks. img_shape: (B, 2) valid (h, w).
        loss_weight_mask: (B,) per-image loss weight — pass
            `(domain == 0)` for DA source-only supervision.

    Returns:
        dict(loss_rpn_cls, loss_rpn_bbox).
    """
    b = cls_logits.shape[0]
    n = anchors.shape[0]
    cls_flat = cls_logits.reshape(b, n)
    reg_flat = reg_preds.reshape(b, n, 4)

    def per_image(cls_i, reg_i, gt_i, gtv_i, shape_i, rng_i):
        inside = anchor_inside_flags(anchors, shape_i, cfg.allowed_border)
        assign = max_iou_assign(
            anchors, gt_i, gtv_i, None,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=cfg.min_pos_iou,
            match_low_quality=cfg.match_low_quality,
            prior_valid=inside)
        sample = random_sample(rng_i, assign.assigned_gt_inds,
                               cfg.num_samples, cfg.pos_fraction)
        pos = sample.pos_mask
        neg = sample.neg_mask
        chosen = pos | neg
        labels = pos.astype(jnp.int32)          # 1 = object
        # cls: BCE on sampled anchors. mmdet uses label 0 for positives with
        # sigmoid single-logit head: one-hot of class-0 → target 1.
        cls_target = labels.astype(cls_i.dtype)
        cls_loss = binary_cross_entropy(
            cls_i, cls_target, weight=chosen.astype(cls_i.dtype),
            reduction='sum')
        # reg: deltas to matched gt on positives
        matched_gt = gt_i[jnp.clip(assign.assigned_gt_inds - 1, 0,
                                   gt_i.shape[0] - 1)]
        targets = bbox2delta(anchors, matched_gt, cfg.target_means,
                             cfg.target_stds)
        reg_loss = smooth_l1_loss(
            reg_i, targets, weight=pos[:, None].astype(reg_i.dtype),
            beta=1.0, reduction='sum')
        return cls_loss, reg_loss, jnp.sum(chosen)

    rngs = jax.random.split(rng, b)
    cls_l, reg_l, counts = jax.vmap(per_image)(
        cls_flat, reg_flat, gt_bboxes, gt_valid, img_shape, rngs)
    if loss_weight_mask is None:
        loss_weight_mask = jnp.ones((b,), cls_l.dtype)
    w = loss_weight_mask.astype(cls_l.dtype)
    avg = jnp.maximum(jnp.sum(counts * w), 1.0)
    return dict(loss_rpn_cls=jnp.sum(cls_l * w) / avg,
                loss_rpn_bbox=jnp.sum(reg_l * w) / avg)


def rpn_proposals(cls_logits: jnp.ndarray,
                  reg_preds: jnp.ndarray,
                  anchors: jnp.ndarray,
                  img_shape: jnp.ndarray,
                  cfg: ProposalConfig = ProposalConfig()
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched proposal generation (reference `RPNHead._get_bboxes_single`,
    `rpn_head_da.py:172-305`): top-`nms_pre` by score → decode → clip →
    min-size filter → NMS → top-`max_per_img`.

    Returns (proposals (B, P, 4), scores (B, P), valid (B, P)).
    """

    b = cls_logits.shape[0]
    n = anchors.shape[0]
    cls_flat = cls_logits.reshape(b, n).astype(jnp.float32)
    reg_flat = reg_preds.reshape(b, n, 4).astype(jnp.float32)

    def per_image(cls_i, reg_i, shape_i):
        k = min(cfg.nms_pre, n)
        scores, idx = jax.lax.top_k(cls_i, k)
        boxes = delta2bbox(anchors[idx], reg_i[idx])
        boxes = clip_boxes(boxes, shape_i.astype(boxes.dtype))
        if cfg.min_bbox_size >= 0:
            w = boxes[:, 2] - boxes[:, 0]
            h = boxes[:, 3] - boxes[:, 1]
            ok = (w > cfg.min_bbox_size) & (h > cfg.min_bbox_size)
            scores = jnp.where(ok, scores, NEG_INF)
        keep, _ = nms(boxes, scores, cfg.nms_iou_threshold, cfg.nms_tile)
        kept_scores = jnp.where(keep, scores, NEG_INF)
        p = min(cfg.max_per_img, k)
        top_scores, top_idx = jax.lax.top_k(kept_scores, p)
        valid = top_scores > NEG_INF / 2
        out_boxes = boxes[top_idx] * valid[:, None]
        # objectness as probability for downstream consumers
        out_scores = jnp.where(valid, jax.nn.sigmoid(top_scores), 0.0)
        return out_boxes, out_scores, valid

    return jax.vmap(per_image)(cls_flat, reg_flat, img_shape)
