"""Dense, static-shape MaxIoU assignment.

Equivalent of the reference `MaxIoUAssigner.assign`
(`mmdet/core/bbox/assigners/max_iou_assigner.py:11`), re-expressed as dense
masked tensor ops: ragged gt lists become a padded (G, 4) block with a
validity mask; the per-gt "low quality match" python loop becomes a dense
claims matrix reduced along the gt axis. Vectorizes over the batch with vmap.

Assignment encoding (mmdet convention): -1 = unassigned/ignored,
0 = negative (background), g+1 = assigned to gt index g.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from .iou import bbox_overlaps


class AssignResult(NamedTuple):
    assigned_gt_inds: jnp.ndarray   # (N,) int32 in {-1, 0, 1..G}
    max_overlaps: jnp.ndarray       # (N,) float
    labels: jnp.ndarray             # (N,) int32 class of matched gt (or -1)


def max_iou_assign(priors: jnp.ndarray,
                   gt_bboxes: jnp.ndarray,
                   gt_valid: jnp.ndarray,
                   gt_labels: Optional[jnp.ndarray] = None,
                   pos_iou_thr: float = 0.7,
                   neg_iou_thr: float = 0.3,
                   min_pos_iou: float = 0.3,
                   match_low_quality: bool = True,
                   prior_valid: Optional[jnp.ndarray] = None) -> AssignResult:
    """Assign each prior to a gt / background / ignore.

    Args:
        priors: (N, 4) anchors or proposals.
        gt_bboxes: (G, 4) padded gt boxes.
        gt_valid: (G,) bool — padding rows are False.
        gt_labels: (G,) int32 class ids (optional).
        prior_valid: (N,) bool — invalid priors stay at -1 (equivalent of
            `anchor_inside_flags` filtering in `AnchorHead._get_targets_single`).
    """
    n = priors.shape[0]
    ious = bbox_overlaps(gt_bboxes, priors)              # (G, N)
    ious = jnp.where(gt_valid[:, None], ious, 0.0)

    any_gt = jnp.any(gt_valid)
    max_overlaps = jnp.max(ious, axis=0)                 # (N,)
    argmax_overlaps = jnp.argmax(ious, axis=0)           # (N,)

    assigned = jnp.full((n,), -1, jnp.int32)
    # negatives: 0 <= max < neg_thr  (mmdet treats [0, neg) as background)
    assigned = jnp.where(max_overlaps < neg_iou_thr, 0, assigned)
    # positives
    assigned = jnp.where(max_overlaps >= pos_iou_thr,
                         argmax_overlaps.astype(jnp.int32) + 1, assigned)

    if match_low_quality:
        # For each gt, priors achieving that gt's best IoU (>= min_pos_iou)
        # are claimed by it; later gts overwrite earlier ones, mirroring the
        # reference's sequential loop (gt_max_assign_all=True semantics).
        gt_best = jnp.max(ious, axis=1, keepdims=True)   # (G, 1)
        claims = (ious == gt_best) & (gt_best >= min_pos_iou) & \
            gt_valid[:, None] & (gt_best > 0)
        g_idx = jnp.arange(gt_bboxes.shape[0], dtype=jnp.int32)[:, None]
        claim_rank = jnp.where(claims, g_idx + 1, 0)
        last_claim = jnp.max(claim_rank, axis=0)          # (N,) 0 or g+1
        assigned = jnp.where(last_claim > 0, last_claim, assigned)

    # no gt at all → everything that isn't ignored is background
    assigned = jnp.where(any_gt, assigned,
                         jnp.where(assigned == -1, assigned, 0))
    if prior_valid is not None:
        assigned = jnp.where(prior_valid, assigned, -1)

    if gt_labels is not None:
        matched = jnp.clip(assigned - 1, 0, gt_bboxes.shape[0] - 1)
        labels = jnp.where(assigned > 0, gt_labels[matched], -1)
    else:
        labels = jnp.full((n,), -1, jnp.int32)
    return AssignResult(assigned, max_overlaps, labels.astype(jnp.int32))
