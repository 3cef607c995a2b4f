"""Generalized Focal Loss components (reference
`mmdet/models/losses/gfocal_loss.py`) and Varifocal loss
(`mmdet/models/losses/varifocal_loss.py`)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES
from .utils import weight_reduce_loss


def quality_focal_loss(logits: jnp.ndarray,
                       labels: jnp.ndarray,
                       quality: jnp.ndarray,
                       weight: Optional[jnp.ndarray] = None,
                       beta: float = 2.0,
                       reduction: str = 'mean',
                       avg_factor=None) -> jnp.ndarray:
    """QFL: soft one-hot targets = IoU quality on the gt class.

    Args:
        logits: (..., C). labels: (...,) int, C = background.
        quality: (...,) float target score (e.g. IoU) for positives.
    """
    logits = logits.astype(jnp.float32)
    c = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, c)
    soft = onehot * quality[..., None]
    p = jax.nn.sigmoid(logits)
    scale = jnp.abs(soft - p)**beta
    bce = jnp.maximum(logits, 0) - logits * soft + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    loss = bce * scale
    if weight is not None and weight.ndim == logits.ndim - 1:
        weight = weight[..., None]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def distribution_focal_loss(logits: jnp.ndarray,
                            target: jnp.ndarray,
                            weight: Optional[jnp.ndarray] = None,
                            reduction: str = 'mean',
                            avg_factor=None) -> jnp.ndarray:
    """DFL: regression target as a discrete distribution over bin edges.

    Args:
        logits: (..., n_bins) per-side distribution logits.
        target: (...,) continuous target in [0, n_bins - 1].
    """
    logits = logits.astype(jnp.float32)
    n = logits.shape[-1]
    t = jnp.clip(target, 0, n - 1 - 1e-4)
    lo = jnp.floor(t).astype(jnp.int32)
    hi = lo + 1
    w_hi = t - lo
    w_lo = 1.0 - w_hi
    logp = jax.nn.log_softmax(logits, axis=-1)
    pick = lambda idx: jnp.take_along_axis(  # noqa: E731
        logp, idx[..., None], axis=-1)[..., 0]
    loss = -(pick(lo) * w_lo + pick(jnp.minimum(hi, n - 1)) * w_hi)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def varifocal_loss(logits: jnp.ndarray,
                   targets: jnp.ndarray,
                   weight: Optional[jnp.ndarray] = None,
                   alpha: float = 0.75,
                   gamma: float = 2.0,
                   reduction: str = 'mean',
                   avg_factor=None) -> jnp.ndarray:
    """VFL: IoU-aware soft targets, asymmetric negative down-weighting.

    `targets` is the (..., C) soft target map (IoU score on the gt class,
    zeros elsewhere).
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    pos = (targets > 0).astype(jnp.float32)
    focal = targets * pos + alpha * jnp.abs(p)**gamma * (1 - pos)
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    loss = bce * focal
    if weight is not None and weight.ndim == logits.ndim - 1:
        weight = weight[..., None]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class QualityFocalLoss:
    def __init__(self, beta=2.0, reduction='mean', loss_weight=1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        labels, quality = target
        reduction = reduction_override or self.reduction
        return self.loss_weight * quality_focal_loss(
            pred, labels, quality, weight, self.beta, reduction, avg_factor)


@LOSSES.register_module()
class DistributionFocalLoss:
    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * distribution_focal_loss(
            pred, target, weight, reduction, avg_factor)


@LOSSES.register_module()
class VarifocalLoss:
    def __init__(self, alpha=0.75, gamma=2.0, reduction='mean',
                 loss_weight=1.0):
        self.alpha, self.gamma = alpha, gamma
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * varifocal_loss(
            pred, target, weight, self.alpha, self.gamma, reduction,
            avg_factor)
