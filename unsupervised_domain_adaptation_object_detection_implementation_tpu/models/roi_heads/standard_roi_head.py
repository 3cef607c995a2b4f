"""RoI head train/test logic as batched pure functions.

Covers the reference `StandardRoIHead` (`mmdet/models/roi_heads/
standard_roi_head.py`) and the live DA variant `StandardRoIHeadDA_v5`
(`standard_roi_head_da_v5.py:36`): assignment + sampling + RoIAlign + bbox
head + loss, with the v5 extras — the post-shared-FC features and cls scores
of ALL sampled RoIs are returned for the detector-level grouped instance DA
loss, and supervised losses are masked to source images.

Static-shape redesign of the ragged reference flow:
- `bbox2roi`/`bbox2roi_train` (per-image roi lists,
  `standard_roi_head_da_v5.py:12-33`) disappear: RoIs stay a (B, S, 4)
  tensor; per-domain splits are boolean masks.
- `add_gt_as_proposals=True` = concat of the padded gt block.
- per-image python loops = vmap.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ...core.bbox.assigners import max_iou_assign
from ...core.bbox.samplers import ohem_sample, random_sample
from ...core.bbox.transforms import bbox2delta, delta2bbox
from ...core.post.nms import multiclass_nms
from ...ops.roi_align import batched_roi_align, batched_roi_align_fpn
from ..losses import binary_cross_entropy, cross_entropy, smooth_l1_loss


class RoITrainConfig(NamedTuple):
    """Values from `da_configs/_base_/models/faster_rcnn_r50_torch_daf.py:
    77-97` (rcnn train_cfg) and the bbox_head block."""
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.5
    match_low_quality: bool = False
    num_samples: int = 512
    pos_fraction: float = 0.25
    add_gt_as_proposals: bool = True
    target_means: Tuple[float, ...] = (0., 0., 0., 0.)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    use_sigmoid_cls: bool = True
    # 'random' | 'ohem' — reference `sampler=dict(type='OHEMSampler')`
    # (configs/faster_rcnn/faster_rcnn_r50_fpn_ohem_1x_coco.py); 'ohem'
    # needs the detector to pass `score_fn` to :func:`sample_rois`.
    sampler_type: str = 'random'
    # RoI regression loss family (reference roi_head.bbox_head.loss_bbox
    # type + reg_decoded_bbox=True rows: configs/faster_rcnn/
    # faster_rcnn_r50_fpn_{iou,giou,ciou,bounded_iou}_1x_coco.py):
    # 'l1' (smooth-L1 on deltas) | 'iou' | 'giou' | 'ciou' | 'bounded_iou'
    # (on decoded boxes).
    reg_loss: str = 'l1'
    reg_loss_weight: float = 1.0


class RoITestConfig(NamedTuple):
    score_thr: float = 0.05
    nms_iou_threshold: float = 0.5
    max_per_img: int = 100
    nms_pre: int = 1024
    nms_tile: int = 256
    # reference nms_cfg type dispatch ('nms' | 'soft_nms'), see
    # `configs/faster_rcnn/faster_rcnn_r50_fpn_soft_nms_1x_coco.py:2-6`
    nms_type: str = 'nms'
    soft_sigma: float = 0.5
    soft_min_score: float = 1e-3
    soft_method: str = 'linear'


class SampledRoIs(NamedTuple):
    rois: jnp.ndarray          # (B, S, 4)
    labels: jnp.ndarray        # (B, S) gt class or num_classes (bg)
    label_valid: jnp.ndarray   # (B, S) slot holds a real sample
    is_pos: jnp.ndarray        # (B, S)
    reg_targets: jnp.ndarray   # (B, S, 4)
    matched_gt: jnp.ndarray    # (B, S) index of matched gt (0 if none)


def sample_rois(proposals: jnp.ndarray,
                prop_valid: jnp.ndarray,
                gt_bboxes: jnp.ndarray,
                gt_labels: jnp.ndarray,
                gt_valid: jnp.ndarray,
                rng: jax.Array,
                num_classes: int,
                cfg: RoITrainConfig = RoITrainConfig(),
                score_fn=None) -> SampledRoIs:
    """Assign+sample fixed-size RoI sets per image (vmapped).

    `cfg.sampler_type='ohem'` + `score_fn` enables hard-example mining
    (reference `core/bbox/samplers/ohem_sampler.py`): `score_fn(rois)` runs
    a preliminary bbox-head forward over ALL candidates — (B, N, 4) →
    (B, N, C[+1]) class scores, gradient-stopped here — and the per-candidate
    classification loss against the assigned label ranks hardness; the
    hardest positives/negatives replace the random draw. mmdet pays the
    same extra forward (`ohem_sampler.py:31` hard_mining)."""
    b = proposals.shape[0]

    def assign_image(props, pv, gt, gtl, gtv):
        if cfg.add_gt_as_proposals:
            cands = jnp.concatenate([gt, props], axis=0)
            cand_valid = jnp.concatenate([gtv, pv], axis=0)
        else:
            cands, cand_valid = props, pv
        assign = max_iou_assign(
            cands, gt, gtv, gtl,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=cfg.min_pos_iou,
            match_low_quality=cfg.match_low_quality,
            prior_valid=cand_valid)
        return cands, cand_valid, assign.assigned_gt_inds

    cands, cand_valid, agi = jax.vmap(assign_image)(
        proposals, prop_valid, gt_bboxes, gt_labels, gt_valid)

    use_ohem = cfg.sampler_type == 'ohem' and score_fn is not None
    if use_ohem:
        scores = jax.lax.stop_gradient(score_fn(cands))  # (B, N, C[+1])
        matched_all = jnp.clip(agi - 1, 0, gt_bboxes.shape[1] - 1)
        labels_all = jnp.where(
            agi > 0,
            jnp.take_along_axis(gt_labels, matched_all, axis=1),
            num_classes)
        if cfg.use_sigmoid_cls:
            onehot = jax.nn.one_hot(labels_all, scores.shape[-1],
                                    dtype=scores.dtype)
            per_cand = jnp.sum(
                optax.sigmoid_binary_cross_entropy(scores, onehot), axis=-1)
        else:
            per_cand = optax.softmax_cross_entropy_with_integer_labels(
                scores, jnp.clip(labels_all, 0, scores.shape[-1] - 1))
        sample = jax.vmap(
            lambda a, l: ohem_sample(a, l, cfg.num_samples,
                                     cfg.pos_fraction))(agi, per_cand)
    else:
        rngs = jax.random.split(rng, b)
        sample = jax.vmap(
            lambda r, a: random_sample(r, a, cfg.num_samples,
                                       cfg.pos_fraction))(rngs, agi)

    def gather_image(cands_i, agi_i, gt, gtl, s):
        rois = cands_i[s.inds]
        matched = jnp.clip(agi_i[s.inds] - 1, 0, gt.shape[0] - 1)
        labels = jnp.where(s.is_pos, gtl[matched], num_classes)
        reg_targets = bbox2delta(rois, gt[matched], cfg.target_means,
                                 cfg.target_stds)
        return SampledRoIs(rois, labels.astype(jnp.int32), s.valid,
                           s.is_pos, reg_targets, matched.astype(jnp.int32))

    return jax.vmap(gather_image)(cands, agi, gt_bboxes, gt_labels, sample)


def bbox_loss(cls_scores: jnp.ndarray,
              reg_preds: jnp.ndarray,
              sampled: SampledRoIs,
              num_classes: int,
              cfg: RoITrainConfig = RoITrainConfig(),
              loss_weight_mask: jnp.ndarray = None
              ) -> Dict[str, jnp.ndarray]:
    """Reference `BBoxHead.loss`: CE over sampled RoIs (avg over all
    samples), smooth-L1 over positives (avg over all samples).

    loss_weight_mask: (B,) — `(domain == 0)` masks supervision to source.
    """
    b, s = sampled.labels.shape
    w_img = jnp.ones((b,), cls_scores.dtype) if loss_weight_mask is None \
        else loss_weight_mask.astype(cls_scores.dtype)
    w = sampled.label_valid.astype(cls_scores.dtype) * w_img[:, None]

    if cfg.use_sigmoid_cls:
        cls_l = binary_cross_entropy(cls_scores, sampled.labels,
                                     weight=w[..., None], reduction='sum')
        # mmdet BCE averages over classes too via elementwise mean; here we
        # sum and normalize by count * C for the same scale
        cls_l = cls_l / jnp.maximum(jnp.sum(w) * cls_scores.shape[-1], 1.0)
    else:
        cls_l = cross_entropy(cls_scores, sampled.labels, weight=w,
                              reduction='sum')
        cls_l = cls_l / jnp.maximum(jnp.sum(w), 1.0)

    if reg_preds.shape[-1] == 4:
        reg_sel = reg_preds
    else:
        reg_per_cls = reg_preds.reshape(b, s, num_classes, 4)
        lbl = jnp.clip(sampled.labels, 0, num_classes - 1)
        reg_sel = jnp.take_along_axis(
            reg_per_cls, lbl[..., None, None].repeat(4, -1), axis=2)[..., 0, :]
    pos_w = (sampled.is_pos & sampled.label_valid).astype(reg_preds.dtype) * \
        w_img[:, None]
    if cfg.reg_loss == 'l1':
        reg_l = smooth_l1_loss(reg_sel, sampled.reg_targets,
                               weight=pos_w[..., None], reduction='sum')
    else:
        # decoded-box IoU-family losses (reference reg_decoded_bbox=True):
        # decode both prediction and target deltas against the same RoIs —
        # the decoded target IS the matched gt box.
        from ..losses.iou_loss import (bounded_iou_loss, ciou_loss,
                                       giou_loss, iou_loss)
        pred_boxes = delta2bbox(sampled.rois.reshape(-1, 4),
                                reg_sel.reshape(-1, 4).astype(jnp.float32),
                                cfg.target_means, cfg.target_stds)
        tgt_boxes = delta2bbox(sampled.rois.reshape(-1, 4),
                               sampled.reg_targets.reshape(-1, 4)
                               .astype(jnp.float32),
                               cfg.target_means, cfg.target_stds)
        fn = {'iou': lambda p, t, wgt: iou_loss(p, t, wgt, linear=True,
                                                reduction='sum'),
              'giou': lambda p, t, wgt: giou_loss(p, t, wgt,
                                                  reduction='sum'),
              'ciou': lambda p, t, wgt: ciou_loss(p, t, wgt,
                                                  reduction='sum'),
              'bounded_iou': lambda p, t, wgt: bounded_iou_loss(
                  p, t, wgt, reduction='sum')}[cfg.reg_loss]
        reg_l = fn(pred_boxes, tgt_boxes,
                   pos_w.reshape(-1).astype(jnp.float32)) \
            * cfg.reg_loss_weight
    reg_l = reg_l / jnp.maximum(jnp.sum(w), 1.0)
    return dict(loss_cls=cls_l, loss_bbox=reg_l)


def extract_roi_feats(feats: jnp.ndarray, rois: jnp.ndarray,
                      featmap_stride: int = 16, out_size: int = 7,
                      sampling_ratio: int = 2,
                      flatten: bool = False) -> jnp.ndarray:
    """`SingleRoIExtractor` equivalent for the single-level DC5 trunk.

    `flatten=True` returns (B, R, o·o·C) with the repack fused into the
    RoIAlign scan (saves two ~800 MB HBM copies per step; see
    `ops/roi_align.py:batched_roi_align`) — use when feeding an FC head.
    """
    return batched_roi_align(feats, rois, 1.0 / featmap_stride, out_size,
                             sampling_ratio, flatten=flatten)


def extract_roi_feats_fpn(feats, rois: jnp.ndarray,
                          strides=(4, 8, 16, 32), out_size: int = 7,
                          sampling_ratio: int = 2,
                          finest_scale: int = 56) -> jnp.ndarray:
    """Multi-level `SingleRoIExtractor` (reference
    `single_level_roi_extractor.py:10` map_roi_levels): RoIs are assigned to
    pyramid levels by scale — level = floor(log2(sqrt(area)/finest_scale)),
    clamped — then each level's RoIAlign output is selected per RoI.

    Static-shape approach: RoIAlign runs on EVERY level for every RoI with
    the level one-hot folded into the x weights. Delegates to
    `ops/roi_align.py:batched_roi_align_fpn` (pre-transposed x-interp rhs;
    see its docstring for the measured design trade-offs).

    Backend: on TPU the default is the fused lane-legal Pallas kernel
    (`roi_align_fpn_fused_v2`, r5 — keeps the x-interp intermediate in
    VMEM; measured fwd+bwd 15.7 vs 20.3 ms and FPN train step
    89.3 → 95.0 img/s at bench shapes, docs/RESULTS.md r5 kernel
    closure). `UDAOD_FPN_ROI_BACKEND=xla|pallas` overrides; non-TPU
    backends (CPU tests) keep the XLA separable form — Pallas-on-CPU
    compiles are pathologically slow and interpret mode is test-only.
    """
    import os
    backend = os.environ.get('UDAOD_FPN_ROI_BACKEND')
    if backend is None:
        import jax
        # default pallas only for the hardware-verified envelope: bbox
        # shape (o=7) AND bf16 feats — f32 doubles the kernel's result
        # footprint past the 16 MB scoped-vmem limit (measured stack-OOM
        # at synth shapes: f32 out 25.7 MB vs bf16 bench 12.8 MB); the
        # o=14 mask path stays XLA until measured
        backend = 'pallas' if (out_size <= 7
                               and feats[0].dtype == jnp.bfloat16
                               and jax.default_backend()
                               not in ('cpu',)) else 'xla'
    if backend == 'pallas':
        from ...ops.roi_align_pallas import roi_align_fpn_fused_v2
        # (roi_chunk=64, h_block=16): the measured-best legal tile
        # (v5e sweep in docs/RESULTS.md r5 kernel closure; larger blocks
        # exceed VMEM and fail remote-compile)
        return roi_align_fpn_fused_v2(tuple(feats), rois, tuple(strides),
                                      out_size, sampling_ratio, True,
                                      finest_scale, 64, 16)
    return batched_roi_align_fpn(feats, rois, strides, out_size,
                                 sampling_ratio, finest_scale=finest_scale)


def seesaw_cls_losses(cls_scores: jnp.ndarray,
                      sampled: 'SampledRoIs',
                      num_classes: int,
                      cum_samples: jnp.ndarray,
                      loss_weight_mask: jnp.ndarray = None):
    """Seesaw RoI classification (reference `mmdet/models/losses/
    seesaw_loss.py` SeesawLoss.forward): the (K+2)-logit head splits into
    K object-class logits (seesaw CE over foreground samples) and 2
    fg/bg objectness logits (plain CE over all samples). `cum_samples`
    is the running per-class positive count — accumulated batch-first
    like the reference's buffer. Returns (losses, new_cum_samples)."""
    b, s = sampled.labels.shape
    w_img = jnp.ones((b,), jnp.float32) if loss_weight_mask is None \
        else loss_weight_mask.astype(jnp.float32)
    valid = sampled.label_valid.astype(jnp.float32) * w_img[:, None]
    labels = sampled.labels
    fg = (labels < num_classes).astype(jnp.float32) * valid

    flat_cls = cls_scores[..., :num_classes].reshape(
        b * s, num_classes).astype(jnp.float32)
    flat_obj = cls_scores[..., num_classes:].reshape(
        b * s, 2).astype(jnp.float32)
    flat_lbl = jnp.clip(labels.reshape(-1), 0, num_classes - 1)
    flat_fg = fg.reshape(-1)

    hist = jnp.sum(jax.nn.one_hot(flat_lbl, num_classes)
                   * flat_fg[:, None], axis=0)
    new_cum = cum_samples + hist

    from ..losses.extra_losses import seesaw_ce_loss
    per = seesaw_ce_loss(flat_cls, flat_lbl, new_cum)
    loss_cls = jnp.sum(per * flat_fg) / jnp.maximum(jnp.sum(flat_fg), 1.0)

    obj_lbl = (labels >= num_classes).astype(jnp.int32).reshape(-1)  # 1 = bg
    logp = jax.nn.log_softmax(flat_obj, axis=-1)
    obj_ce = -jnp.take_along_axis(logp, obj_lbl[:, None], axis=1)[:, 0]
    flat_valid = valid.reshape(-1)
    loss_obj = (jnp.sum(obj_ce * flat_valid)
                / jnp.maximum(jnp.sum(flat_valid), 1.0))
    return dict(loss_cls=loss_cls, loss_cls_objectness=loss_obj), new_cum


def seesaw_activation(cls_scores: jnp.ndarray, num_classes: int
                      ) -> jnp.ndarray:
    """(..., K+2) seesaw logits → (..., K+1) pseudo-logits whose softmax
    reproduces SeesawLoss.get_activation: per-class scores =
    softmax(classes)·p_fg, background = p_bg."""
    cls_p = jax.nn.softmax(cls_scores[..., :num_classes].astype(jnp.float32),
                           axis=-1)
    obj_p = jax.nn.softmax(cls_scores[..., num_classes:].astype(jnp.float32),
                           axis=-1)
    scores = jnp.concatenate([cls_p * obj_p[..., :1], obj_p[..., 1:]],
                             axis=-1)
    return jnp.log(scores + 1e-12).astype(cls_scores.dtype)


def roi_head_predict(bbox_head_apply,
                     feats,
                     proposals: jnp.ndarray,
                     prop_valid: jnp.ndarray,
                     img_shape: jnp.ndarray,
                     num_classes: int,
                     featmap_stride: int = 16,
                     reg_class_agnostic: bool = False,
                     target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2),
                     use_sigmoid_cls: bool = True,
                     cfg: RoITestConfig = RoITestConfig(),
                     roi_extractor=None,
                     with_reg: bool = True):
    """Reference `StandardRoIHead.simple_test` → `multiclass_nms` flow.

    `bbox_head_apply`: callable (roi_feats) → (cls, reg, feat).
    `roi_extractor`: optional (feats, rois) → roi_feats override (FPN
    multi-level extraction); defaults to the single-level extractor.
    `with_reg=False`: score the raw proposals without delta decoding —
    the reference's `bbox_head(with_reg=False)` mode (Grid R-CNN trains
    no reg branch; localization comes from the grid head afterwards).
    Returns dict(dets (B, max, 5), labels (B, max), valid (B, max)).
    """
    if roi_extractor is None:
        roi_feats = extract_roi_feats(feats, proposals, featmap_stride,
                                      flatten=True)
    else:
        roi_feats = roi_extractor(feats, proposals)
    cls, reg, _ = bbox_head_apply(roi_feats)
    cls = cls.astype(jnp.float32)
    reg = reg.astype(jnp.float32)
    if use_sigmoid_cls:
        # sigmoid head: per-class prob, synthesize a bg column of zeros
        probs = jax.nn.sigmoid(cls)[..., :num_classes]
        scores = jnp.concatenate(
            [probs, jnp.zeros_like(probs[..., :1])], axis=-1)
    else:
        scores = jax.nn.softmax(cls, axis=-1)
    # suppress padded proposals
    scores = scores * prop_valid[..., None]

    b, p = proposals.shape[:2]
    if not with_reg:
        boxes = jnp.broadcast_to(proposals[:, :, None, :],
                                 (b, p, num_classes, 4))
    elif reg_class_agnostic:
        dec = delta2bbox(proposals, reg.reshape(b, p, 4), stds=target_stds)
        boxes = jnp.broadcast_to(dec[:, :, None, :], (b, p, num_classes, 4))
    else:
        reg_per_cls = reg.reshape(b, p, num_classes, 4)
        boxes = delta2bbox(
            jnp.broadcast_to(proposals[:, :, None, :],
                             (b, p, num_classes, 4)),
            reg_per_cls, stds=target_stds)
    boxes = jnp.clip(
        boxes,
        0.0,
        jnp.stack([img_shape[:, 1], img_shape[:, 0],
                   img_shape[:, 1], img_shape[:, 0]],
                  axis=-1).astype(boxes.dtype)[:, None, None, :])

    def per_image(boxes_i, scores_i):
        return multiclass_nms(
            boxes_i.reshape(p, num_classes * 4), scores_i,
            cfg.score_thr, cfg.nms_iou_threshold, cfg.max_per_img,
            cfg.nms_tile, cfg.nms_pre, nms_type=cfg.nms_type,
            soft_sigma=cfg.soft_sigma, soft_min_score=cfg.soft_min_score,
            soft_method=cfg.soft_method)

    dets, labels, valid = jax.vmap(per_image)(boxes, scores)
    return dict(dets=dets, labels=labels, valid=valid)


def extract_roi_feats_groie(feats, rois: jnp.ndarray,
                            strides=(4, 8, 16, 32), out_size: int = 7,
                            sampling_ratio: int = 2) -> jnp.ndarray:
    """Generic RoI Extractor (reference
    `mmdet/models/roi_heads/roi_extractors/generic_roi_extractor.py`,
    GRoIE): instead of assigning each RoI to ONE pyramid level, aggregate
    the aligned features from ALL levels by summation (the reference's
    `aggregation='sum'` with identity pre/post modules — its default)."""
    out = None
    for i, s in enumerate(strides):
        aligned = batched_roi_align(feats[i], rois, 1.0 / s, out_size,
                                    sampling_ratio)
        out = aligned if out is None else out + aligned
    return out
