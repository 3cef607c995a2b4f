"""Sigmoid focal loss (reference `mmdet/models/losses/focal_loss.py:12,107`).

The reference's CUDA kernel path (`sigmoid_focal_loss` from mmcv,
`focal_loss.py:86`) and its pure-python fallback (`py_sigmoid_focal_loss:12`)
are both subsumed by one fused XLA implementation — elementwise math that XLA
fuses for free; no Pallas needed.

Note a reference quirk (kept out of this implementation, documented in the DA
detector): `DAFasterRCNN.criterion_fl` is fed *sigmoid outputs* of the
instance alignment head (`mmdet/models/roi_heads/instance_da.py:80` applies
sigmoid, `DAFaster_rcnn.py:316-322` then calls FocalLoss which sigmoids
again). Here heads emit logits and the loss applies sigmoid once.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES
from .utils import weight_reduce_loss


def sigmoid_focal_loss(logits: jnp.ndarray,
                       labels: jnp.ndarray,
                       weight: Optional[jnp.ndarray] = None,
                       gamma: float = 2.0,
                       alpha: float = 0.25,
                       reduction: str = 'mean',
                       avg_factor=None) -> jnp.ndarray:
    """Focal loss over (..., C) logits and integer labels (...,).

    Label == C means background (all-zero targets) — mmdet one-hot semantics.
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = (1 - p) * onehot + p * (1 - onehot)
    focal_weight = (alpha * onehot + (1 - alpha) * (1 - onehot)) * pt**gamma
    bce = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    loss = bce * focal_weight
    if weight is not None and weight.ndim == logits.ndim - 1:
        weight = weight[..., None]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def py_focal_loss_with_prob(prob: jnp.ndarray,
                            labels: jnp.ndarray,
                            weight: Optional[jnp.ndarray] = None,
                            gamma: float = 2.0,
                            alpha: float = 0.25,
                            reduction: str = 'mean',
                            avg_factor=None) -> jnp.ndarray:
    """Focal loss on probabilities (reference `py_focal_loss_with_prob`)."""
    num_classes = prob.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=prob.dtype)
    eps = 1e-12
    pt = (1 - prob) * onehot + prob * (1 - onehot)
    focal_weight = (alpha * onehot + (1 - alpha) * (1 - onehot)) * pt**gamma
    bce = -(onehot * jnp.log(prob + eps) + (1 - onehot) * jnp.log(1 - prob + eps))
    loss = bce * focal_weight
    if weight is not None and weight.ndim == prob.ndim - 1:
        weight = weight[..., None]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class FocalLoss:
    def __init__(self, use_sigmoid: bool = True, gamma: float = 2.0,
                 alpha: float = 0.25, reduction: str = 'mean',
                 activated: bool = False, loss_weight: float = 1.0):
        assert use_sigmoid, 'only sigmoid focal loss is supported (as mmdet)'
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.activated = activated
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        fn = py_focal_loss_with_prob if self.activated else sigmoid_focal_loss
        return self.loss_weight * fn(pred, target, weight, self.gamma,
                                     self.alpha, reduction, avg_factor)


def gaussian_focal_loss(pred_prob: jnp.ndarray,
                        gaussian_target: jnp.ndarray,
                        weight=None, alpha: float = 2.0, gamma: float = 4.0,
                        reduction: str = 'mean', avg_factor=None):
    """Gaussian-heatmap focal loss (CornerNet/CenterNet; reference
    `losses/gaussian_focal_loss.py`). `pred_prob` already sigmoid-activated."""
    eps = 1e-12
    pos_w = (gaussian_target == 1).astype(pred_prob.dtype)
    neg_w = (1 - gaussian_target)**gamma
    pos = -jnp.log(pred_prob + eps) * (1 - pred_prob)**alpha * pos_w
    neg = -jnp.log(1 - pred_prob + eps) * pred_prob**alpha * neg_w * \
        (1 - pos_w)
    return weight_reduce_loss(pos + neg, weight, reduction, avg_factor)


@LOSSES.register_module()
class GaussianFocalLoss:
    def __init__(self, alpha=2.0, gamma=4.0, reduction='mean',
                 loss_weight=1.0):
        self.alpha, self.gamma = alpha, gamma
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * gaussian_focal_loss(
            pred, target, weight, self.alpha, self.gamma, reduction,
            avg_factor)


def ghm_classification_loss(logits: jnp.ndarray,
                            labels: jnp.ndarray,
                            valid: jnp.ndarray,
                            bins: int = 10,
                            momentum: float = 0.0) -> jnp.ndarray:
    """GHM-C (reference `mmdet/models/losses/ghm_loss.py`): BCE re-weighted
    by inverse gradient density, computed with a static histogram."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes)
    p = jax.nn.sigmoid(logits)
    g = jnp.abs(p - onehot)                                  # gradient norm
    v = valid[..., None].astype(jnp.float32) * jnp.ones_like(g)
    edges = jnp.linspace(0.0, 1.0 + 1e-6, bins + 1)
    total = jnp.maximum(jnp.sum(v), 1.0)
    weights = jnp.zeros_like(g)
    for i in range(bins):
        in_bin = (g >= edges[i]) & (g < edges[i + 1]) & (v > 0)
        cnt = jnp.maximum(jnp.sum(in_bin), 1.0)
        weights = jnp.where(in_bin, total / (cnt * bins), weights)
    bce = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.sum(bce * weights * v) / total
