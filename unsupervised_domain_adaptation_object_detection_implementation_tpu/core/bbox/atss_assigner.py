"""ATSS assigner (reference `mmdet/core/bbox/assigners/atss_assigner.py`).

Adaptive sample selection: per gt, the top-k closest anchors per level are
candidates; the IoU threshold is mean+std of the candidates' IoUs; positives
additionally need their center inside the gt. The reference's per-gt python
loops become dense (G, N) masks with per-level rank computations (levels are
static slices, so ranks come from one argsort per level).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .assigners import AssignResult
from .iou import bbox_overlaps


def atss_assign(anchors: jnp.ndarray,
                num_level_anchors: Sequence[int],
                gt_bboxes: jnp.ndarray,
                gt_valid: jnp.ndarray,
                gt_labels: jnp.ndarray = None,
                topk: int = 9) -> AssignResult:
    """Args mirror `max_iou_assign`; `num_level_anchors` gives the static
    per-level slice sizes of the flat anchor tensor."""
    n = anchors.shape[0]
    g = gt_bboxes.shape[0]
    ious = bbox_overlaps(gt_bboxes, anchors)                  # (G, N)
    ious = jnp.where(gt_valid[:, None], ious, 0.0)

    ax = (anchors[:, 0] + anchors[:, 2]) * 0.5
    ay = (anchors[:, 1] + anchors[:, 3]) * 0.5
    gx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
    gy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
    dist = jnp.sqrt((ax[None, :] - gx[:, None])**2 +
                    (ay[None, :] - gy[:, None])**2)           # (G, N)

    # top-k per level by distance → candidate mask
    cand = jnp.zeros((g, n), bool)
    start = 0
    for n_l in num_level_anchors:
        d_l = dist[:, start:start + n_l]
        k = min(topk, n_l)
        # rank within level: positions of the k smallest distances
        thresh = -jax.lax.top_k(-d_l, k)[0][:, -1:]           # (G, 1)
        cand = cand.at[:, start:start + n_l].set(d_l <= thresh)
        start += n_l

    # adaptive threshold = mean + std of candidate IoUs per gt
    cnt = jnp.maximum(jnp.sum(cand, axis=1), 1)
    mean = jnp.sum(ious * cand, axis=1) / cnt
    var = jnp.sum((ious - mean[:, None])**2 * cand, axis=1) / cnt
    thr = mean + jnp.sqrt(var)                                # (G,)

    inside = ((ax[None, :] > gt_bboxes[:, 0:1]) &
              (ax[None, :] < gt_bboxes[:, 2:3]) &
              (ay[None, :] > gt_bboxes[:, 1:2]) &
              (ay[None, :] < gt_bboxes[:, 3:4]))
    pos = cand & (ious >= thr[:, None]) & inside & gt_valid[:, None]

    # resolve multi-claims by IoU
    claimed = jnp.any(pos, axis=0)
    best_gt = jnp.argmax(jnp.where(pos, ious, -1.0), axis=0)
    assigned = jnp.where(claimed, best_gt.astype(jnp.int32) + 1, 0)
    max_overlaps = jnp.max(jnp.where(pos, ious, 0.0), axis=0)
    if gt_labels is not None:
        matched = jnp.clip(assigned - 1, 0, g - 1)
        labels = jnp.where(assigned > 0, gt_labels[matched], -1)
    else:
        labels = jnp.full((n,), -1, jnp.int32)
    return AssignResult(assigned, max_overlaps, labels.astype(jnp.int32))
