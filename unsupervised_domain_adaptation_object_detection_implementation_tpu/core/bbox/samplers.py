"""Static-shape random pos/neg sampling.

Equivalent of the reference `RandomSampler`
(`mmdet/core/bbox/samplers/random_sampler.py:9`): sample up to
`num * pos_fraction` positives and fill the rest with negatives. The ragged
index lists become rank-based masks: every candidate gets a random priority,
per-group ranks are computed with two argsorts, and selection is a comparison
against the (traced) group quota — fully static shapes, exact quota semantics.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SampleResult(NamedTuple):
    inds: jnp.ndarray        # (num,) int32 indices into candidates
    is_pos: jnp.ndarray      # (num,) bool
    valid: jnp.ndarray       # (num,) bool — slot holds a real sample
    pos_mask: jnp.ndarray    # (N,) bool over candidates
    neg_mask: jnp.ndarray    # (N,) bool over candidates


def _rank_among(mask: jnp.ndarray, priority: jnp.ndarray) -> jnp.ndarray:
    """0-based rank of each element among `mask` entries by desc priority.

    Non-members get a rank >= count(mask).
    """
    key = jnp.where(mask, priority, -jnp.inf)
    order = jnp.argsort(-key)
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return ranks


def _select_top(mask: jnp.ndarray, priority: jnp.ndarray, quota,
                k_static: int) -> jnp.ndarray:
    """Mask of the min(quota, count(mask)) elements of `mask` with the
    largest `priority` — WITHOUT a full argsort + scatter.

    `rank < quota` selection only needs the quota-th largest masked value
    as a threshold: one `top_k(key, k_static)` (k_static >= max quota,
    static) replaces argsort(N)+scatter(N), which dominated the RPN loss at
    131k anchors (measured 3.9 + 7.5 ms per call on v5e vs ~0.03 ms for
    top_k). Requires unique priorities among masked entries to hit the
    quota exactly (random uniform keys are a.s. unique; ties over-select,
    so don't use for hardness scores — OHEM keeps the rank path).
    """
    key = jnp.where(mask, priority, -jnp.inf)
    k_static = min(k_static, key.shape[0])
    vals = jax.lax.top_k(key, k_static)[0]
    thr = vals[jnp.clip(quota - 1, 0, k_static - 1)]
    return mask & (key >= thr) & (quota > 0)


def random_sample(rng: jax.Array,
                  assigned_gt_inds: jnp.ndarray,
                  num: int,
                  pos_fraction: float,
                  neg_pos_ub: int = -1) -> SampleResult:
    """Sample `num` slots from assignment results.

    Positives = assigned > 0, negatives = assigned == 0 (mmdet convention).
    Exactly min(count_pos, num*pos_fraction) positives are chosen uniformly;
    negatives fill the remaining quota uniformly.
    """
    n = assigned_gt_inds.shape[0]
    pos = assigned_gt_inds > 0
    neg = assigned_gt_inds == 0
    r = jax.random.uniform(rng, (n,))

    num_expected_pos = int(num * pos_fraction)
    pos_sel = _select_top(pos, r, num_expected_pos, num_expected_pos)
    num_pos = jnp.sum(pos_sel)

    neg_quota = num - num_pos
    if neg_pos_ub >= 0:
        neg_quota = jnp.minimum(neg_quota, jnp.maximum(num_pos, 1) * neg_pos_ub)
    neg_sel = _select_top(neg, r, neg_quota, num)

    selected = pos_sel | neg_sel
    # fixed-size index extraction: positives first, then negatives, then junk
    sort_key = jnp.where(pos_sel, 3.0, jnp.where(neg_sel, 2.0, 0.0)) + r
    k = min(num, n)
    _, inds = jax.lax.top_k(sort_key, k)
    inds = inds.astype(jnp.int32)
    is_pos = pos_sel[inds]
    valid = selected[inds]
    if k < num:  # fewer candidates than slots: zero-pad (masked invalid)
        pad = num - k
        inds = jnp.concatenate([inds, jnp.zeros((pad,), inds.dtype)])
        is_pos = jnp.concatenate([is_pos, jnp.zeros((pad,), bool)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return SampleResult(inds, is_pos, valid, pos_sel, neg_sel)


def ohem_sample(assigned_gt_inds: jnp.ndarray,
                per_candidate_loss: jnp.ndarray,
                num: int,
                pos_fraction: float) -> SampleResult:
    """OHEM sampling (reference `core/bbox/samplers/ohem_sampler.py`):
    hardest (highest-loss) positives and negatives instead of random ones.

    `per_candidate_loss` comes from a preliminary forward of the bbox head
    over all candidates (mmdet does the same extra forward).
    """
    n = assigned_gt_inds.shape[0]
    pos = assigned_gt_inds > 0
    neg = assigned_gt_inds == 0

    num_expected_pos = int(num * pos_fraction)
    pos_rank = _rank_among(pos, per_candidate_loss)
    pos_sel = pos & (pos_rank < num_expected_pos)
    num_pos = jnp.sum(pos_sel)
    neg_rank = _rank_among(neg, per_candidate_loss)
    neg_sel = neg & (neg_rank < num - num_pos)

    selected = pos_sel | neg_sel
    sort_key = jnp.where(pos_sel, 2.0, jnp.where(neg_sel, 1.0, 0.0)) * 1e6 \
        + per_candidate_loss
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
