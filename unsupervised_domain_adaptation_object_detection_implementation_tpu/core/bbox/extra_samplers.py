"""Remaining reference samplers as static-shape masked selection.

Covers `mmdet/core/bbox/samplers/`: IoUBalancedNegSampler
(`iou_balanced_neg_sampler.py:10`, Libra R-CNN), InstanceBalancedPosSampler
(`instance_balanced_pos_sampler.py:10`), ScoreHLRSampler
(`score_hlr_sampler.py:12`, PISA), PseudoSampler (`pseudo_sampler.py:8`)
and CombinedSampler (`combined_sampler.py:8`).

All follow the rank-based static pattern of `samplers.py`: each candidate
gets a priority, per-group ranks come from double argsort, and selection is
`rank < quota` — no ragged gathers, fully jittable.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .iou import bbox_overlaps
from .samplers import SampleResult, _rank_among


def _pack(pos_sel: jnp.ndarray, neg_sel: jnp.ndarray, r: jnp.ndarray,
          num: int) -> SampleResult:
    """Fixed-size index extraction shared by all samplers."""
    n = pos_sel.shape[0]
    selected = pos_sel | neg_sel
    sort_key = jnp.where(pos_sel, 3.0, jnp.where(neg_sel, 2.0, 0.0)) + r
    k = min(num, n)
    _, inds = jax.lax.top_k(sort_key, k)
    inds = inds.astype(jnp.int32)
    is_pos = pos_sel[inds]
    valid = selected[inds]
    if k < num:
        pad = num - k
        inds = jnp.concatenate([inds, jnp.zeros((pad,), inds.dtype)])
        is_pos = jnp.concatenate([is_pos, jnp.zeros((pad,), bool)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return SampleResult(inds, is_pos, valid, pos_sel, neg_sel)


def instance_balanced_pos_select(rng: jax.Array,
                                 assigned_gt_inds: jnp.ndarray,
                                 num_expected_pos: int,
                                 num_gt: int) -> jnp.ndarray:
    """Positive-selection mask with an equal per-instance quota
    (`instance_balanced_pos_sampler.py:14`): quota per gt =
    round(expected / num_live_gts) + 1, shortfall refilled randomly.
    """
    n = assigned_gt_inds.shape[0]
    pos = assigned_gt_inds > 0
    r = jax.random.uniform(rng, (n,))

    # number of distinct gts that own at least one positive
    gt_ids = jnp.arange(1, num_gt + 1)
    gt_has_pos = jnp.any(assigned_gt_inds[None, :] == gt_ids[:, None], axis=1)
    num_live = jnp.maximum(jnp.sum(gt_has_pos), 1)
    per_gt = (jnp.round(num_expected_pos / num_live) + 1).astype(jnp.int32)

    # rank each positive within its gt group: composite sort key pushes
    # same-group members together, random priority orders inside the group
    grp = jnp.where(pos, assigned_gt_inds, 0)
    within = jnp.argsort(jnp.argsort(
        jnp.where(pos, grp.astype(jnp.float32) * 2.0 - r, jnp.inf)))
    # rank inside group = within-rank minus rank of the group's first member
    first_of_group = jnp.full((num_gt + 2,), jnp.iinfo(jnp.int32).max,
                              within.dtype).at[grp].min(
        jnp.where(pos, within, jnp.iinfo(jnp.int32).max))
    in_grp_rank = within - first_of_group[grp]
    quota_sel = pos & (in_grp_rank < per_gt)

    # refill shortfall uniformly from unselected positives
    shortfall = num_expected_pos - jnp.sum(quota_sel)
    extra_rank = _rank_among(pos & ~quota_sel, r)
    extra_sel = pos & ~quota_sel & (extra_rank < shortfall)
    sel = quota_sel | extra_sel
    # trim overshoot uniformly (reference random_choice down to expected)
    over_rank = _rank_among(sel, r)
    return sel & (over_rank < num_expected_pos)


def iou_balanced_neg_select(rng: jax.Array,
                            assigned_gt_inds: jnp.ndarray,
                            max_overlaps: jnp.ndarray,
                            num_expected_neg,
                            floor_thr: float = -1.0,
                            floor_fraction: float = 0.0,
                            num_bins: int = 3) -> jnp.ndarray:
    """Negative-selection mask binned evenly by IoU
    (`iou_balanced_neg_sampler.py:47`): `num_bins` equal IoU intervals over
    [floor_thr, max_iou]; an even quota per bin; shortfall refilled randomly
    from all negatives.
    """
    n = assigned_gt_inds.shape[0]
    neg = assigned_gt_inds == 0
    r = jax.random.uniform(rng, (n,))
    floor = 0.0 if floor_thr < 0 else floor_thr

    max_iou = jnp.max(jnp.where(neg, max_overlaps, 0.0))
    width = jnp.maximum((max_iou - floor) / num_bins, 1e-6)

    if floor_thr >= 0:
        floor_set = neg & (max_overlaps < floor_thr)
        iou_set = neg & (max_overlaps >= floor_thr)
        num_floor = jnp.floor(num_expected_neg * floor_fraction).astype(
            jnp.int32)
    else:
        floor_set = jnp.zeros_like(neg)
        iou_set = neg
        num_floor = jnp.int32(0)

    num_iou = num_expected_neg - num_floor
    per_bin = (num_iou // num_bins).astype(jnp.int32)

    sel = jnp.zeros_like(neg)
    for b in range(num_bins):
        lo = floor + b * width
        hi = floor + (b + 1) * width
        in_bin = iou_set & (max_overlaps >= lo) & (max_overlaps < hi)
        rank = _rank_among(in_bin, r)
        sel = sel | (in_bin & (rank < per_bin))

    floor_rank = _rank_among(floor_set, r)
    sel = sel | (floor_set & (floor_rank < num_floor))

    # refill from all remaining negatives
    shortfall = num_expected_neg - jnp.sum(sel)
    extra_rank = _rank_among(neg & ~sel, r)
    return sel | (neg & ~sel & (extra_rank < shortfall))


def iou_balanced_sample(rng: jax.Array,
                        assigned_gt_inds: jnp.ndarray,
                        max_overlaps: jnp.ndarray,
                        num: int,
                        pos_fraction: float,
                        floor_thr: float = -1.0,
                        floor_fraction: float = 0.0,
                        num_bins: int = 3) -> SampleResult:
    """Random positives + IoU-balanced negatives (Libra R-CNN sampler)."""
    rng_p, rng_n, rng_k = jax.random.split(rng, 3)
    n = assigned_gt_inds.shape[0]
    pos = assigned_gt_inds > 0
    r = jax.random.uniform(rng_k, (n,))

    num_expected_pos = int(num * pos_fraction)
    pos_rank = _rank_among(pos, jax.random.uniform(rng_p, (n,)))
    pos_sel = pos & (pos_rank < num_expected_pos)
    neg_sel = iou_balanced_neg_select(
        rng_n, assigned_gt_inds, max_overlaps, num - jnp.sum(pos_sel),
        floor_thr, floor_fraction, num_bins)
    return _pack(pos_sel, neg_sel, r, num)


def combined_sample(rng: jax.Array,
                    assigned_gt_inds: jnp.ndarray,
                    max_overlaps: jnp.ndarray,
                    num: int,
                    pos_fraction: float,
                    num_gt: int,
                    floor_thr: float = -1.0,
                    floor_fraction: float = 0.0,
                    num_bins: int = 3) -> SampleResult:
    """CombinedSampler (`combined_sampler.py:8`) in its canonical Libra
    configuration: InstanceBalanced positives + IoUBalanced negatives.
    """
    rng_p, rng_n, rng_k = jax.random.split(rng, 3)
    n = assigned_gt_inds.shape[0]
    r = jax.random.uniform(rng_k, (n,))
    num_expected_pos = int(num * pos_fraction)
    pos_sel = instance_balanced_pos_select(
        rng_p, assigned_gt_inds, num_expected_pos, num_gt)
    neg_sel = iou_balanced_neg_select(
        rng_n, assigned_gt_inds, max_overlaps, num - jnp.sum(pos_sel),
        floor_thr, floor_fraction, num_bins)
    return _pack(pos_sel, neg_sel, r, num)


def pseudo_sample(assigned_gt_inds: jnp.ndarray) -> SampleResult:
    """PseudoSampler (`pseudo_sampler.py:8`): keep everything, sample
    nothing — used by dense single-stage heads. Returns full-length masks;
    `inds` is the identity (the static-shape caller never gathers).
    """
    n = assigned_gt_inds.shape[0]
    pos = assigned_gt_inds > 0
    neg = assigned_gt_inds == 0
    inds = jnp.arange(n, dtype=jnp.int32)
    return SampleResult(inds, pos, pos | neg, pos, neg)


class ScoreHLRResult(NamedTuple):
    sample: SampleResult
    neg_label_weights: jnp.ndarray   # (num,) weight per sampled slot


def score_hlr_sample(rng: jax.Array,
                     assigned_gt_inds: jnp.ndarray,
                     bboxes: jnp.ndarray,
                     neg_max_scores: jnp.ndarray,
                     num: int,
                     pos_fraction: float,
                     k: float = 0.5,
                     bias: float = 0.0,
                     score_thr: float = 0.05,
                     iou_thr: float = 0.5) -> ScoreHLRResult:
    """ScoreHLRSampler (`score_hlr_sampler.py:12`, PISA ISR-N).

    Negatives are ranked by Score Hierarchical Local Rank: valid negatives
    (max positive-class score > score_thr) are grouped by NMS-match at
    `iou_thr`, ranked by score within each group, then across groups at the
    same local rank; the HLR maps linearly to per-sample label weights
    `(bias + (1-bias) * (1 - hlr/n_valid)) ** k`.

    `neg_max_scores` is the max positive-class score per candidate from the
    preliminary bbox-head forward (the reference does the same extra pass).
    The O(N^2) greedy NMS-match runs as a fori_loop over candidates — sized
    for RoI sampling pools (N ≈ 512–2000), not dense anchor sets.
    """
    n = assigned_gt_inds.shape[0]
    pos = assigned_gt_inds > 0
    neg = assigned_gt_inds == 0
    r = jax.random.uniform(rng, (n,))

    num_expected_pos = int(num * pos_fraction)
    pos_rank = _rank_among(pos, r)
    pos_sel = pos & (pos_rank < num_expected_pos)
    num_neg_quota = num - jnp.sum(pos_sel)

    valid = neg & (neg_max_scores > score_thr)
    # --- NMS-match grouping: greedy over descending score; every box
    # suppressed by a keeper joins that keeper's group.
    order = jnp.argsort(jnp.where(valid, -neg_max_scores, jnp.inf))
    sboxes = bboxes[order]
    svalid = valid[order]
    iou = bbox_overlaps(sboxes, sboxes)                      # (N, N)

    def body(i, group):
        # if i is still its own keeper, it claims all later un-grouped boxes
        is_keeper = group[i] == i
        claim = (jnp.arange(n) > i) & (iou[i] >= iou_thr) & \
            (group == jnp.arange(n)) & svalid & svalid[i] & is_keeper
        return jnp.where(claim, i, group)

    group = jax.lax.fori_loop(0, n, body, jnp.arange(n))

    # local rank: position among same-group members by descending score
    # (already score-sorted, so local rank = order of appearance in group)
    eye_lt = jnp.tril(jnp.ones((n, n), bool), k=-1)
    same_grp = group[None, :] == group[:, None]
    local_rank = jnp.sum(eye_lt & same_grp & svalid[None, :], axis=1)
    # hierarchical: sort by (local_rank, score desc) → HLR
    hlr_key = jnp.where(svalid,
                        local_rank.astype(jnp.float32) * 1e4
                        + jnp.arange(n, dtype=jnp.float32), jnp.inf)
    hlr = jnp.argsort(jnp.argsort(hlr_key)).astype(jnp.float32)

    n_valid = jnp.maximum(jnp.sum(svalid), 1).astype(jnp.float32)
    weights_sorted = jnp.where(
        svalid, (bias + (1.0 - bias) * (1.0 - hlr / n_valid)) ** k, 1.0)
    # unsort back to candidate order
    weights = jnp.zeros((n,)).at[order].set(weights_sorted)

    # selection: valid negatives first by HLR, then random invalid ones
    hlr_unsorted = jnp.zeros((n,)).at[order].set(hlr)
    neg_key = jnp.where(valid, -hlr_unsorted,
                        jnp.where(neg, -1e6 - r * 1e3, -jnp.inf))
    neg_rank = _rank_among(neg, neg_key)   # rank by key desc
    neg_sel = neg & (neg_rank < num_neg_quota)

    res = _pack(pos_sel, neg_sel, r, num)
    slot_w = jnp.where(res.is_pos, 1.0,
                       jnp.where(res.valid, weights[res.inds], 0.0))
    return ScoreHLRResult(res, slot_w)
