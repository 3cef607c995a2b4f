"""Smooth-L1 / L1 (reference `mmdet/models/losses/smooth_l1_loss.py`)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...utils.registry import LOSSES
from .utils import weight_reduce_loss


def smooth_l1_loss(pred: jnp.ndarray,
                   target: jnp.ndarray,
                   weight: Optional[jnp.ndarray] = None,
                   beta: float = 1.0,
                   reduction: str = 'mean',
                   avg_factor=None) -> jnp.ndarray:
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def l1_loss(pred, target, weight=None, reduction='mean', avg_factor=None):
    return weight_reduce_loss(jnp.abs(pred - target), weight, reduction, avg_factor)


@LOSSES.register_module()
class SmoothL1Loss:
    def __init__(self, beta: float = 1.0, reduction: str = 'mean',
                 loss_weight: float = 1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * smooth_l1_loss(
            pred, target, weight, self.beta, reduction, avg_factor)


@LOSSES.register_module()
class L1Loss:
    def __init__(self, reduction: str = 'mean', loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * l1_loss(pred, target, weight, reduction, avg_factor)


def balanced_l1_loss(pred, target, weight=None, beta: float = 1.0,
                     alpha: float = 0.5, gamma: float = 1.5,
                     reduction='mean', avg_factor=None):
    """Balanced L1 (Libra R-CNN; reference `losses/balanced_l1_loss.py`)."""
    import numpy as _np
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    b = _np.e**(gamma / alpha) - 1
    loss = jnp.where(
        diff < beta,
        alpha / b * (b * diff + 1) * jnp.log(b * diff / beta + 1) -
        alpha * diff,
        gamma * diff + gamma / b - alpha * beta)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class BalancedL1Loss:
    def __init__(self, alpha=0.5, gamma=1.5, beta=1.0, reduction='mean',
                 loss_weight=1.0):
        self.alpha, self.gamma, self.beta = alpha, gamma, beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * balanced_l1_loss(
            pred, target, weight, self.beta, self.alpha, self.gamma,
            reduction, avg_factor)
