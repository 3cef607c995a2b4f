"""Domain-alignment loss functions.

Batched, mask-based re-expressions of the reference's DA losses:

- `global_alignment_loss` — image-level CE on 2-way domain logits
  (`resnet_da_cbam.py:941-946` / `DAFaster_rcnn.py:181-183`). The reference
  accumulates these into a fresh CPU tensor, silently detaching the graph
  (SURVEY.md §2.1 quirks); here gradients flow through the GRL as intended.
  `quirk_detach=True` reproduces the reference numerics exactly.
- `patch_ls_loss` — least-squares patch loss on 1-channel logit maps:
  source 0.5·mean(σ(f)²), target 0.5·mean((1−σ(f))²)
  (`resnet_da_cbam.py:948-957`; the reference writes σ(1−f) for the target
  term — an activation-shift slip; both are monotone-decreasing in f and we
  use the SWDA-paper form (1−σ(f))²).
- `grouped_instance_loss` — fg/bg split by classifier confidence, k-means
  grouping to K prototypes per (domain × fg/bg) bucket, focal loss through
  two instance alignment heads (`DAFaster_rcnn.py:232-327`). The reference
  returns `.item()`-detached floats here (no gradient — `DAFaster_rcnn.py:
  325`); `quirk_detach=True` reproduces that, default trains properly.
- `consistency_loss` — DAF's image/instance consistency regularizer
  (`DAFaster_rcnn_Orig.py:161-175`).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..losses import sigmoid_focal_loss, softmax_cross_entropy
from .cluster import group_representatives


def global_alignment_loss(logits: jnp.ndarray, domain: jnp.ndarray,
                          quirk_detach: bool = False) -> jnp.ndarray:
    """CE between (B, 2) domain logits and the (B,) domain vector."""
    loss = jnp.mean(softmax_cross_entropy(logits, domain))
    if quirk_detach:
        loss = jax.lax.stop_gradient(loss)
    return loss


def patch_ls_loss(logit_map: jnp.ndarray, domain: jnp.ndarray,
                  quirk_sigmoid_shift: bool = False) -> jnp.ndarray:
    """Least-squares patch alignment over (B, H, W, 1) logit maps.

    Per-image: source 0.5·mean(σ(f)²), target 0.5·mean((1−σ(f))²); summed
    over the batch (the reference sums per-image terms,
    `resnet_da_cbam.py:950-957`).

    `quirk_sigmoid_shift=True` reproduces the reference's exact target term
    0.5·mean(σ(1−f)²) (`resnet_da_cbam.py:977` writes `sigmoid(1 - f)` —
    an activation-shift slip; both forms are monotone-decreasing in f, the
    default uses the SWDA-paper form). Used by the torch-numerics goldens.
    """
    p = jax.nn.sigmoid(logit_map)
    per_img_src = 0.5 * jnp.mean(p**2, axis=(1, 2, 3))
    if quirk_sigmoid_shift:
        per_img_tgt = 0.5 * jnp.mean(
            jax.nn.sigmoid(1.0 - logit_map)**2, axis=(1, 2, 3))
    else:
        per_img_tgt = 0.5 * jnp.mean((1.0 - p)**2, axis=(1, 2, 3))
    is_tgt = (domain == 1)
    return jnp.sum(jnp.where(is_tgt, per_img_tgt, per_img_src))


def image_da_loss(logit_map: jnp.ndarray, domain: jnp.ndarray) -> jnp.ndarray:
    """DAF-original image-level loss on the 1-channel map — same LS form
    applied to the `ImgAlignmentHead` output (`resnet_da_daf_org.py:796-825`)."""
    return patch_ls_loss(logit_map, domain)


def consistency_loss(img_logit_map: jnp.ndarray,
                     ins_logits: jnp.ndarray,
                     ins_valid: jnp.ndarray,
                     domain: jnp.ndarray,
                     rois_img_index: jnp.ndarray = None) -> jnp.ndarray:
    """DAF consistency regularizer: ‖mean image-level prob − instance-level
    prob‖₂ per RoI (`DAFaster_rcnn_Orig.py:161-175`).

    Args:
        img_logit_map: (B, H, W, 1) image-level logits.
        ins_logits: (B, S, 2) instance head logits (col 1 = "target" prob).
        ins_valid: (B, S).
    """
    img_prob = jnp.mean(jax.nn.sigmoid(img_logit_map), axis=(1, 2, 3))  # (B,)
    ins_prob = jax.nn.sigmoid(ins_logits[..., 1])                       # (B, S)
    diff = (img_prob[:, None] - ins_prob)**2 * ins_valid
    return jnp.sqrt(jnp.sum(diff) / jnp.maximum(jnp.sum(ins_valid), 1.0))


def grouped_instance_loss(
        fore_head_apply: Callable[[jnp.ndarray], jnp.ndarray],
        back_head_apply: Callable[[jnp.ndarray], jnp.ndarray],
        bbox_feats: jnp.ndarray,
        cls_scores: jnp.ndarray,
        valid: jnp.ndarray,
        domain: jnp.ndarray,
        k: int = 20,
        quirk_detach: bool = False) -> jnp.ndarray:
    """Grouped fg/bg instance alignment (`DAFaster_rcnn.py:232-327`).

    Args:
        *_head_apply: (2K, D) reps → (2K, 2) domain logits.
        bbox_feats: (B, S, D) post-shared-FC RoI features.
        cls_scores: (B, S, C+1) bbox-head logits (last column = background).
        valid: (B, S) sampled-RoI validity.
        domain: (B,).

    Foreground-ness: softmax background prob < 0.5 (the reference tests
    `softmax(cls)[0] >= 0.5`, i.e. prob of the FIRST class — correct only for
    its 1-class 'tea' setup; generalized here to any class count).
    """
    b, s, d = bbox_feats.shape
    feats = bbox_feats.reshape(-1, d)
    probs = jax.nn.softmax(cls_scores, axis=-1).reshape(b * s, -1)
    fg_score = 1.0 - probs[:, -1]
    is_fg = fg_score >= 0.5
    v = valid.reshape(-1)
    dom = jnp.repeat(domain, s)

    def bucket(domain_val, fg):
        mask = v & (dom == domain_val) & (is_fg == fg)
        score = jnp.where(fg, fg_score, 1.0 - fg_score)
        return group_representatives(feats, mask, score, k)

    losses = []
    for fg, head in ((True, fore_head_apply), (False, back_head_apply)):
        src_reps, src_valid = bucket(0, fg)
        tgt_reps, tgt_valid = bucket(1, fg)
        reps = jnp.concatenate([src_reps, tgt_reps], axis=0)      # (2K, D)
        labels = jnp.concatenate(
            [jnp.zeros((k,), jnp.int32), jnp.ones((k,), jnp.int32)])
        rep_valid = jnp.concatenate([src_valid, tgt_valid])
        logits = head(reps)                                       # (2K, 2)
        loss = sigmoid_focal_loss(
            logits, labels, weight=rep_valid.astype(logits.dtype),
            reduction='sum')
        # reference-numerics mode: mmdet FocalLoss(reduction='mean')
        # averages over N·C elements (C=2), not rows
        denom = jnp.sum(rep_valid) * (2.0 if quirk_detach else 1.0)
        losses.append(loss / jnp.maximum(denom, 1.0))
    total = losses[0] + losses[1]
    if quirk_detach:
        # reference returns `.item()`-detached floats: the grouped loss is
        # a logged number, no gradient (`DAFaster_rcnn.py:325`)
        total = jax.lax.stop_gradient(total)
    return total
