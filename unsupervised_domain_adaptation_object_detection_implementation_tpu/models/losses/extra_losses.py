"""Remaining reference losses: Seesaw, Dice, Associative Embedding, KD,
MSE, and the PISA reweighting pair (ISR-P, CARL).

References: `mmdet/models/losses/seesaw_loss.py:12`, `dice_loss.py`,
`ae_loss.py:11`, `kd_loss.py:10`, `mse_loss.py`, `pisa_loss.py:9,134`.

All take dense padded tensors with validity masks in place of the
reference's ragged per-image lists; reductions are masked sums so a whole
batch runs as one fused XLA kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def seesaw_ce_loss(cls_score: jnp.ndarray,
                   labels: jnp.ndarray,
                   cum_samples: jnp.ndarray,
                   p: float = 0.8,
                   q: float = 2.0,
                   eps: float = 1e-2) -> jnp.ndarray:
    """Seesaw cross-entropy (`seesaw_loss.py:12`), per-sample.

    Args:
        cls_score: (N, C) logits over the C object classes.
        labels: (N,) int in [0, C).
        cum_samples: (C,) cumulative per-class positive counts (caller
            maintains this as training state, like the reference buffer).
    Returns:
        (N,) per-sample losses (caller applies masks/reduction).
    """
    n, c = cls_score.shape
    onehot = jax.nn.one_hot(labels, c)
    seesaw = jnp.ones((n, c), cls_score.dtype)

    if p > 0:
        cs = jnp.maximum(cum_samples, 1.0)
        ratio = cs[None, :] / cs[:, None]                 # (C, C)
        mitig = jnp.where(ratio < 1.0, ratio ** p, 1.0)
        seesaw = seesaw * mitig[labels]
    if q > 0:
        scores = jax.nn.softmax(jax.lax.stop_gradient(cls_score), axis=1)
        self_sc = jnp.take_along_axis(scores, labels[:, None], axis=1)
        ratio = scores / jnp.maximum(self_sc, eps)
        comp = jnp.where(ratio > 1.0, ratio ** q, 1.0)
        seesaw = seesaw * comp

    adjusted = cls_score + jnp.log(seesaw) * (1 - onehot)
    logp = jax.nn.log_softmax(adjusted, axis=1)
    return -jnp.sum(onehot * logp, axis=1)


def dice_loss(pred: jnp.ndarray,
              target: jnp.ndarray,
              valid: Optional[jnp.ndarray] = None,
              use_sigmoid: bool = True,
              naive: bool = False,
              eps: float = 1e-3) -> jnp.ndarray:
    """Dice loss (`dice_loss.py`): per-sample over flattened masks.

    Args:
        pred/target: (N, ...) logits / binary targets.
        valid: optional (N, ...) element mask.
    Returns:
        (N,) per-sample dice losses.
    """
    if use_sigmoid:
        pred = jax.nn.sigmoid(pred)
    n = pred.shape[0]
    pred = pred.reshape(n, -1)
    target = target.reshape(n, -1).astype(pred.dtype)
    if valid is not None:
        v = valid.reshape(n, -1).astype(pred.dtype)
        pred = pred * v
        target = target * v
    num = 2 * jnp.sum(pred * target, axis=1)
    if naive:
        den = jnp.sum(pred, axis=1) + jnp.sum(target, axis=1)
    else:
        den = jnp.sum(pred * pred, axis=1) + jnp.sum(target * target, axis=1)
    return 1 - (num + eps) / (den + eps)


def ae_loss(tl_emb: jnp.ndarray,
            br_emb: jnp.ndarray,
            valid: jnp.ndarray,
            margin: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Associative-embedding pull/push (`ae_loss.py:11`), static-shape.

    Args:
        tl_emb/br_emb: (K,) corner embeddings gathered at the padded gt
            corner locations (the ragged `match` list becomes a gather the
            caller does with padded indices).
        valid: (K,) bool.
    Returns:
        (pull, push) scalars.
    """
    v = valid.astype(tl_emb.dtype)
    n = jnp.maximum(jnp.sum(v), 1.0)
    me = (tl_emb + br_emb) / 2.0
    pull = jnp.sum(((tl_emb - me) ** 2 + (br_emb - me) ** 2) * v) / n

    diff = jnp.abs(me[:, None] - me[None, :])
    pair_v = v[:, None] * v[None, :] * \
        (1 - jnp.eye(me.shape[0], dtype=tl_emb.dtype))
    push_mat = jax.nn.relu(margin - diff) * pair_v
    denom = jnp.maximum(n * (n - 1), 1.0)
    push = jnp.where(jnp.sum(v) > 1, jnp.sum(push_mat) / denom, 0.0)
    return pull, push


def knowledge_distillation_kl_div_loss(pred: jnp.ndarray,
                                       soft_label: jnp.ndarray,
                                       T: float = 10.0) -> jnp.ndarray:
    """LD/KD loss (`kd_loss.py:10`): KL(teacher ‖ student) at temperature
    T, scaled by T² — per-sample."""
    target = jax.nn.softmax(soft_label / T, axis=-1)
    logp = jax.nn.log_softmax(pred / T, axis=-1)
    kd = jnp.sum(target * (jnp.log(jnp.maximum(target, 1e-12)) - logp),
                 axis=-1)
    return kd * (T * T)


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """`mse_loss.py`: elementwise squared error."""
    return (pred - target) ** 2


def isr_p_weights(pos_scores: jnp.ndarray,
                  pos_ious: jnp.ndarray,
                  pos_labels: jnp.ndarray,
                  pos_valid: jnp.ndarray,
                  num_classes: int,
                  k: float = 2.0,
                  bias: float = 0.0) -> jnp.ndarray:
    """PISA ISR-P (`pisa_loss.py:9`): importance reweighting of positive
    classification losses by IoU hierarchical local rank.

    The reference ranks positives per (gt, class) by IoU to get the HLR,
    maps rank r of n to `bias + (1-bias)·((n-r)/n)^k`, then renormalizes so
    the total positive weight is unchanged. Here the per-class grouping is
    dense: rank positives within their class via a composite sort key.

    Returns (P,) weights (1 where invalid so callers can multiply freely).
    """
    p = pos_scores.shape[0]
    # rank within class by descending IoU: composite key class*2 + iou
    key = jnp.where(pos_valid,
                    pos_labels.astype(jnp.float32) * 2.0 + pos_ious, -jnp.inf)
    order = jnp.argsort(-key)
    rank_all = jnp.argsort(order)
    # local rank = global rank - rank of first same-class element
    first = jnp.full((num_classes + 1,), jnp.iinfo(jnp.int32).max)
    cls = jnp.where(pos_valid, pos_labels, num_classes)
    first = first.at[cls].min(rank_all.astype(jnp.int32))
    local_rank = rank_all - first[cls]
    n_cls = jnp.zeros((num_classes + 1,)).at[cls].add(
        pos_valid.astype(jnp.float32))
    n = jnp.maximum(n_cls[cls], 1.0)
    w = bias + (1 - bias) * ((n - local_rank) / n) ** k
    # renormalize: keep the sum of weights equal to the positive count
    total = jnp.maximum(jnp.sum(jnp.where(pos_valid, w, 0.0)), 1e-6)
    cnt = jnp.sum(pos_valid)
    w = w * cnt / total
    return jnp.where(pos_valid, w, 1.0)


def carl_weights(pos_cls_scores: jnp.ndarray,
                 pos_valid: jnp.ndarray,
                 k: float = 1.0,
                 bias: float = 0.2) -> jnp.ndarray:
    """PISA CARL (`pisa_loss.py:134`): classification-aware regression
    weights `(bias + (1-bias)·s)^k`, normalized to mean 1 over positives."""
    w = (bias + (1 - bias) * pos_cls_scores) ** k
    denom = jnp.maximum(jnp.sum(jnp.where(pos_valid, w, 0.0)), 1e-6)
    cnt = jnp.maximum(jnp.sum(pos_valid), 1.0)
    return jnp.where(pos_valid, w * cnt / denom, 0.0)
