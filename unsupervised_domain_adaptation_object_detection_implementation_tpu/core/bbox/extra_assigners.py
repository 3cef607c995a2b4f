"""Remaining reference assigners as dense, static-shape JAX.

Covers the reference inventory rows not yet present
(`mmdet/core/bbox/assigners/`): GridAssigner (`grid_assigner.py:14`),
PointAssigner (`point_assigner.py:9`), UniformAssigner
(`uniform_assigner.py:12`, YOLOF), ApproxMaxIoUAssigner
(`approx_max_iou_assigner.py:10`, guided-anchor/SABL) and
CenterRegionAssigner (`center_region_assigner.py:32`, FSAF).

All ragged per-gt python loops in the reference become masked reductions
over a padded (G, N) matrix; "later gt overwrites earlier" sequential
semantics become argmax/scatter-max reductions with explicit tie keys so the
result is identical to the reference's loop order.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from .assigners import AssignResult
from .iou import bbox_overlaps


def _labels_for(assigned: jnp.ndarray, gt_labels: Optional[jnp.ndarray],
                num_gt: int) -> jnp.ndarray:
    if gt_labels is None:
        return jnp.full(assigned.shape, -1, jnp.int32)
    matched = jnp.clip(assigned - 1, 0, num_gt - 1)
    return jnp.where(assigned > 0, gt_labels[matched], -1).astype(jnp.int32)


def grid_assign(bboxes: jnp.ndarray,
                responsible: jnp.ndarray,
                gt_bboxes: jnp.ndarray,
                gt_valid: jnp.ndarray,
                gt_labels: Optional[jnp.ndarray] = None,
                pos_iou_thr: float = 0.5,
                neg_iou_thr: float = 0.5,
                min_pos_iou: float = 0.0) -> AssignResult:
    """YOLO grid assignment (`grid_assigner.py:44`): MaxIoU constrained to
    the responsible cell of each gt.

    Args:
        bboxes: (N, 4) anchors.
        responsible: (N,) bool — anchor's cell contains some gt center.
        gt_bboxes/gt_valid/gt_labels: padded gt block.
    """
    n = bboxes.shape[0]
    g = gt_bboxes.shape[0]
    ious = bbox_overlaps(gt_bboxes, bboxes)                    # (G, N)
    ious = jnp.where(gt_valid[:, None], ious, 0.0)

    max_overlaps = jnp.max(ious, axis=0)
    assigned = jnp.full((n,), -1, jnp.int32)
    # step 2: negatives
    assigned = jnp.where(max_overlaps <= neg_iou_thr, 0, assigned)

    # step 3: positives among responsible cells only
    resp_ious = jnp.where(responsible[None, :], ious, -1.0)
    resp_max = jnp.max(resp_ious, axis=0)
    resp_arg = jnp.argmax(resp_ious, axis=0).astype(jnp.int32)
    pos = (resp_max > pos_iou_thr) & responsible
    assigned = jnp.where(pos, resp_arg + 1, assigned)

    # step 4: per-gt best responsible anchor claims (gt_max_assign_all);
    # later gt wins, matching the python loop order.
    gt_best = jnp.max(resp_ious, axis=1, keepdims=True)        # (G, 1)
    claims = (resp_ious == gt_best) & (gt_best > min_pos_iou) & \
        gt_valid[:, None] & responsible[None, :]
    g_idx = jnp.arange(g, dtype=jnp.int32)[:, None]
    last_claim = jnp.max(jnp.where(claims, g_idx + 1, 0), axis=0)
    assigned = jnp.where(last_claim > 0, last_claim, assigned)

    labels = _labels_for(assigned, gt_labels, g)
    return AssignResult(assigned, max_overlaps, labels)


def point_assign(points: jnp.ndarray,
                 gt_bboxes: jnp.ndarray,
                 gt_valid: jnp.ndarray,
                 gt_labels: Optional[jnp.ndarray] = None,
                 scale: float = 4.0,
                 pos_num: int = 3) -> AssignResult:
    """RepPoints point assignment (`point_assigner.py:23`).

    Each gt claims its `pos_num` nearest same-level points; a point claimed
    by several gts keeps the closest one (the reference's sequential
    "strictly closer than recorded" update == min-distance with first-gt
    tie-break, reproduced here via a composite (dist, gt_idx) key).

    Args:
        points: (N, 3) — (x, y, stride).
    """
    n = points.shape[0]
    g = gt_bboxes.shape[0]
    xy = points[:, :2]
    lvl = jnp.floor(jnp.log2(points[:, 2])).astype(jnp.int32)   # (N,)
    lvl_min = jnp.min(lvl)
    lvl_max = jnp.max(lvl)

    gt_xy = (gt_bboxes[:, :2] + gt_bboxes[:, 2:]) / 2
    gt_wh = jnp.maximum(gt_bboxes[:, 2:] - gt_bboxes[:, :2], 1e-6)
    gt_lvl = ((jnp.log2(gt_wh[:, 0] / scale)
               + jnp.log2(gt_wh[:, 1] / scale)) / 2).astype(jnp.int32)
    gt_lvl = jnp.clip(gt_lvl, lvl_min, lvl_max)

    # (G, N) normalized center distance; off-level or padded pairs -> inf
    d = jnp.linalg.norm((xy[None] - gt_xy[:, None]) / gt_wh[:, None], axis=-1)
    same_lvl = gt_lvl[:, None] == lvl[None, :]
    d = jnp.where(same_lvl & gt_valid[:, None], d, jnp.inf)

    # per-gt rank of each point (ascending distance); claim = rank < pos_num
    ranks = jnp.argsort(jnp.argsort(d, axis=1), axis=1)
    claims = (ranks < pos_num) & jnp.isfinite(d)

    # each point keeps the claiming gt with min distance (ties -> lower idx)
    key = jnp.where(claims, d, jnp.inf)
    best_gt = jnp.argmin(key, axis=0).astype(jnp.int32)
    has_claim = jnp.any(claims, axis=0)
    assigned = jnp.where(has_claim, best_gt + 1, 0)

    labels = _labels_for(assigned, gt_labels, g)
    return AssignResult(assigned, jnp.zeros((n,), d.dtype), labels)


def uniform_assign(bbox_pred: jnp.ndarray,
                   anchors: jnp.ndarray,
                   gt_bboxes: jnp.ndarray,
                   gt_valid: jnp.ndarray,
                   gt_labels: Optional[jnp.ndarray] = None,
                   match_times: int = 4,
                   pos_ignore_thr: float = 0.15,
                   neg_ignore_thr: float = 0.7) -> AssignResult:
    """YOLOF uniform matching (`uniform_assigner.py:12`).

    Top-`match_times` boxes per gt by L1 cdist in cxcywh space, for both
    predicted boxes and anchors; positives whose anchor IoU < pos_ignore_thr
    are ignored; negatives whose predicted IoU > neg_ignore_thr are ignored.
    The reference's sequential scatter (`assigned_gt_inds[indexes] = ...`)
    is last-write-wins; reproduced with a scatter-max over write positions.
    """
    n = bbox_pred.shape[0]
    g = gt_bboxes.shape[0]

    def to_cxcywh(b):
        return jnp.concatenate([(b[:, :2] + b[:, 2:]) / 2,
                                b[:, 2:] - b[:, :2]], axis=-1)

    p = to_cxcywh(bbox_pred)
    a = to_cxcywh(anchors)
    gt_c = to_cxcywh(gt_bboxes)
    cost_p = jnp.sum(jnp.abs(p[:, None] - gt_c[None]), axis=-1)   # (N, G)
    cost_a = jnp.sum(jnp.abs(a[:, None] - gt_c[None]), axis=-1)
    big = jnp.float32(1e9)
    cost_p = jnp.where(gt_valid[None, :], cost_p, big)
    cost_a = jnp.where(gt_valid[None, :], cost_a, big)

    # top-k smallest per gt → (match_times, G) box indices
    idx_p = jnp.argsort(cost_p, axis=0)[:match_times]
    idx_a = jnp.argsort(cost_a, axis=0)[:match_times]
    # reference ordering: cat along gt axis then row-major flatten
    indexes = jnp.concatenate([idx_p, idx_a], axis=1).reshape(-1)  # (2*mt*G,)
    pos_gt = jnp.tile(jnp.arange(g, dtype=jnp.int32), 2 * match_times)

    anchor_iou = bbox_overlaps(anchors, gt_bboxes)                # (N, G)
    anchor_iou = jnp.where(gt_valid[None, :], anchor_iou, 0.0)
    pred_iou = bbox_overlaps(bbox_pred, gt_bboxes)
    pred_iou = jnp.where(gt_valid[None, :], pred_iou, 0.0)

    pos_ious = anchor_iou[indexes, pos_gt]
    write_val = jnp.where(pos_ious < pos_ignore_thr, -1, pos_gt + 1)

    assigned = jnp.zeros((n,), jnp.int32)
    # neg-ignore first (matches reference step 3 preceding the scatter)
    assigned = jnp.where(jnp.max(pred_iou, axis=1) > neg_ignore_thr,
                         -1, assigned)
    # last-write-wins scatter: keep the entry with max sequence position;
    # padded-gt entries do not exist in the reference, so they never write
    m = indexes.shape[0]
    pos_seq = jnp.where(gt_valid[pos_gt],
                        jnp.arange(1, m + 1, dtype=jnp.int32), 0)
    winner = jnp.zeros((n,), jnp.int32).at[indexes].max(pos_seq)
    written = winner > 0
    win_val = write_val[jnp.clip(winner - 1, 0, m - 1)]
    assigned = jnp.where(written, win_val, assigned)

    labels = _labels_for(assigned, gt_labels, g)
    return AssignResult(assigned, jnp.max(anchor_iou, axis=1), labels)


def approx_max_iou_assign(approxs: jnp.ndarray,
                          squares: jnp.ndarray,
                          gt_bboxes: jnp.ndarray,
                          gt_valid: jnp.ndarray,
                          gt_labels: Optional[jnp.ndarray] = None,
                          **max_iou_kwargs) -> AssignResult:
    """Guided-anchor/SABL assignment (`approx_max_iou_assigner.py:10`):
    IoU of a location = max over its approx anchors, then standard MaxIoU
    thresholds on that matrix.

    Args:
        approxs: (N, A, 4) approx anchors per square.
        squares: (N, 4) square anchors (unused beyond shape, kept for parity).
    """
    from .assigners import max_iou_assign
    n, a, _ = approxs.shape
    flat = approxs.reshape(n * a, 4)
    ious = bbox_overlaps(gt_bboxes, flat).reshape(-1, n, a)     # (G, N, A)
    ious = jnp.max(ious, axis=2)                                 # (G, N)
    # Re-run the dense MaxIoU logic on the aggregated matrix by expressing
    # each square as a degenerate box whose overlap row we substitute: the
    # shared implementation accepts precomputed overlaps via `_overlaps`.
    return _max_iou_from_overlaps(ious, gt_valid, gt_labels, **max_iou_kwargs)


def _max_iou_from_overlaps(ious: jnp.ndarray,
                           gt_valid: jnp.ndarray,
                           gt_labels: Optional[jnp.ndarray] = None,
                           pos_iou_thr: float = 0.7,
                           neg_iou_thr: float = 0.3,
                           min_pos_iou: float = 0.3,
                           match_low_quality: bool = True) -> AssignResult:
    """MaxIoU decision rules over a precomputed (G, N) overlap matrix."""
    g, n = ious.shape
    ious = jnp.where(gt_valid[:, None], ious, 0.0)
    any_gt = jnp.any(gt_valid)
    max_overlaps = jnp.max(ious, axis=0)
    argmax_overlaps = jnp.argmax(ious, axis=0)

    assigned = jnp.full((n,), -1, jnp.int32)
    assigned = jnp.where(max_overlaps < neg_iou_thr, 0, assigned)
    assigned = jnp.where(max_overlaps >= pos_iou_thr,
                         argmax_overlaps.astype(jnp.int32) + 1, assigned)
    if match_low_quality:
        gt_best = jnp.max(ious, axis=1, keepdims=True)
        claims = (ious == gt_best) & (gt_best >= min_pos_iou) & \
            gt_valid[:, None] & (gt_best > 0)
        g_idx = jnp.arange(g, dtype=jnp.int32)[:, None]
        last_claim = jnp.max(jnp.where(claims, g_idx + 1, 0), axis=0)
        assigned = jnp.where(last_claim > 0, last_claim, assigned)
    assigned = jnp.where(any_gt, assigned,
                         jnp.where(assigned == -1, assigned, 0))
    labels = _labels_for(assigned, gt_labels, g)
    return AssignResult(assigned, max_overlaps, labels)


def center_region_assign(bboxes: jnp.ndarray,
                         gt_bboxes: jnp.ndarray,
                         gt_valid: jnp.ndarray,
                         gt_labels: Optional[jnp.ndarray] = None,
                         pos_scale: float = 0.2,
                         neg_scale: float = 0.2,
                         min_pos_iof: float = 1e-2) -> AssignResult:
    """FSAF effective/ignore region assignment
    (`center_region_assigner.py:32`).

    A prior is positive for a gt if it lies inside the gt's scaled core
    (effective) region; between core and shadow (neg_scale) regions it is
    ignored. When several gts claim a prior, the **smallest-area** gt wins
    (`center_region_assigner.py:210-220`).

    Here `bboxes` are priors interpreted by their center points, matching the
    reference's is_located_in on prior centers.
    """
    n = bboxes.shape[0]
    g = gt_bboxes.shape[0]
    cx = (bboxes[:, 0] + bboxes[:, 2]) / 2
    cy = (bboxes[:, 1] + bboxes[:, 3]) / 2

    def scaled(gt, s):
        ctr = (gt[:, :2] + gt[:, 2:]) / 2
        half = (gt[:, 2:] - gt[:, :2]) / 2 * s
        return jnp.concatenate([ctr - half, ctr + half], axis=-1)

    core = scaled(gt_bboxes, pos_scale)
    shadow = scaled(gt_bboxes, neg_scale)

    def inside(region):                                         # (G, N)
        return ((cx[None] >= region[:, 0:1]) & (cx[None] <= region[:, 2:3])
                & (cy[None] >= region[:, 1:2]) & (cy[None] <= region[:, 3:4]))

    in_core = inside(core) & gt_valid[:, None]
    in_shadow = inside(shadow) & gt_valid[:, None]

    area = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * \
        (gt_bboxes[:, 3] - gt_bboxes[:, 1])
    area = jnp.where(gt_valid, area, jnp.inf)
    key = jnp.where(in_core, area[:, None], jnp.inf)            # (G, N)
    best_gt = jnp.argmin(key, axis=0).astype(jnp.int32)
    is_pos = jnp.any(in_core, axis=0)
    is_ign = jnp.any(in_shadow, axis=0) & ~is_pos

    assigned = jnp.where(is_pos, best_gt + 1,
                         jnp.where(is_ign, -1, 0))
    labels = _labels_for(assigned, gt_labels, g)
    iof = bbox_overlaps(gt_bboxes, bboxes, mode='iof') \
        if min_pos_iof > 0 else jnp.zeros((g, n))
    return AssignResult(assigned.astype(jnp.int32),
                        jnp.max(jnp.where(gt_valid[:, None], iof, 0.0),
                                axis=0), labels)
