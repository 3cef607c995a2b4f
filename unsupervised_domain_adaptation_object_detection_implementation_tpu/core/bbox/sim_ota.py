"""SimOTA assigner (reference `mmdet/core/bbox/assigners/sim_ota_assigner.py:10`).

TPU-first reformulation: the reference filters priors with boolean indexing
(`decoded_bboxes[valid_mask]`) and loops `for gt_idx in range(num_gt)` taking
a data-dependent `topk(k=dynamic_k)` per gt. Here everything is dense and
static-shape:

- candidate/center masks are (N, G) boolean tensors;
- invalid pairs get +INF cost instead of being compacted away;
- dynamic-k selection = one static `top_k(candidate_topk)` per gt followed by
  a rank < dynamic_k mask — identical selection set, no host sync;
- the "prior matched to multiple gts → keep the cheapest" fix-up is an
  argmin over the masked cost row.

All padded gts (gt_valid False) cost +INF so they can never match.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .iou import bbox_overlaps

INF = 1e8


class SimOTAResult(NamedTuple):
    fg_mask: jnp.ndarray       # (N,) bool — prior is a positive
    matched_gt: jnp.ndarray    # (N,) int32 — gt index (0 where negative)
    matched_iou: jnp.ndarray   # (N,) f32 — IoU with the matched gt (0 at neg)


def sim_ota_assign(pred_scores: jnp.ndarray,
                   priors: jnp.ndarray,
                   decoded_bboxes: jnp.ndarray,
                   gt_bboxes: jnp.ndarray,
                   gt_labels: jnp.ndarray,
                   gt_valid: jnp.ndarray,
                   center_radius: float = 2.5,
                   candidate_topk: int = 10,
                   iou_weight: float = 3.0,
                   cls_weight: float = 1.0,
                   eps: float = 1e-7) -> SimOTAResult:
    """One image. pred_scores: (N, C) joint cls·obj probabilities (already
    sigmoided, as the reference passes `cls.sigmoid()*obj.sigmoid()`);
    priors: (N, 4) [cx, cy, stride_x, stride_y]; gt_bboxes: (G, 4) xyxy
    (padded); gt_valid: (G,) bool."""
    n, c = pred_scores.shape
    g = gt_bboxes.shape[0]
    px, py = priors[:, 0], priors[:, 1]
    sx, sy = priors[:, 2], priors[:, 3]

    # --- center priors ------------------------------------------------ (N,G)
    in_gt = jnp.stack([
        px[:, None] - gt_bboxes[None, :, 0],
        py[:, None] - gt_bboxes[None, :, 1],
        gt_bboxes[None, :, 2] - px[:, None],
        gt_bboxes[None, :, 3] - py[:, None],
    ], -1).min(-1) > 0
    gt_cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
    gt_cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
    in_ct = jnp.stack([
        px[:, None] - (gt_cx[None, :] - center_radius * sx[:, None]),
        py[:, None] - (gt_cy[None, :] - center_radius * sy[:, None]),
        (gt_cx[None, :] + center_radius * sx[:, None]) - px[:, None],
        (gt_cy[None, :] + center_radius * sy[:, None]) - py[:, None],
    ], -1).min(-1) > 0
    in_gt = in_gt & gt_valid[None, :]
    in_ct = in_ct & gt_valid[None, :]
    valid_prior = jnp.any(in_gt | in_ct, axis=1)          # (N,)
    in_both = in_gt & in_ct                               # (N, G)

    # --- cost ---------------------------------------------------------
    ious = bbox_overlaps(decoded_bboxes, gt_bboxes)       # (N, G)
    ious = ious * (valid_prior[:, None] & gt_valid[None, :])
    iou_cost = -jnp.log(ious + eps)
    # reference: BCE(sqrt(p), onehot) summed over classes
    p = jnp.sqrt(jnp.clip(pred_scores, eps, 1.0))         # (N, C)
    onehot = jax.nn.one_hot(gt_labels, c)                 # (G, C)
    # sum_c BCE = -[onehot·log p + (1-onehot)·log(1-p)] summed over C
    log_p = jnp.log(p)
    log_np = jnp.log(jnp.clip(1.0 - p, eps, 1.0))
    cls_cost = -(log_p @ onehot.T + log_np @ (1.0 - onehot).T)   # (N, G)

    # Two penalty tiers: `in_both` violations keep the reference's +INF —
    # such priors can still match when a gt has NO in-both candidate (the
    # reference's topk picks them; mirrored here). Padded gts / priors
    # outside every candidate region get +BIG and are excluded outright.
    BIG = 1e12
    cost = (cls_cost * cls_weight + iou_cost * iou_weight
            + (~in_both) * INF
            + (~valid_prior[:, None]) * BIG
            + (~gt_valid[None, :]) * BIG)

    # --- dynamic-k matching --------------------------------------------
    k = min(candidate_topk, n)
    topk_ious = jax.lax.top_k(ious.T, k)[0]               # (G, k)
    dynamic_ks = jnp.clip(topk_ious.sum(-1).astype(jnp.int32), 1, None)

    neg_cost, cand_idx = jax.lax.top_k(-cost.T, k)        # (G, k) cheapest
    rank_ok = jnp.arange(k)[None, :] < dynamic_ks[:, None]
    # exclude padding-tier candidates only (see BIG above)
    rank_ok &= (-neg_cost) < BIG / 2
    # scatter (G, k) picks into the (N, G) matching matrix
    matching = jnp.zeros((g, n), bool).at[
        jnp.arange(g)[:, None], cand_idx].set(rank_ok).T   # (N, G)

    # resolve priors claimed by several gts: keep the min-cost column
    multi = matching.sum(-1) > 1
    best = jnp.argmin(jnp.where(matching, cost, BIG), axis=-1)
    only_best = jax.nn.one_hot(best, g, dtype=bool) & matching
    matching = jnp.where(multi[:, None], only_best, matching)

    fg = matching.any(-1)
    matched_gt = jnp.argmax(matching, -1).astype(jnp.int32)
    matched_iou = jnp.where(
        fg, ious[jnp.arange(n), matched_gt], 0.0)
    return SimOTAResult(fg, jnp.where(fg, matched_gt, 0), matched_iou)
