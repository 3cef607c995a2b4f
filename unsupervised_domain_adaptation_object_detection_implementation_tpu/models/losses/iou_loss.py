"""IoU-family box losses (reference `mmdet/models/losses/iou_loss.py`)."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES
from .utils import weight_reduce_loss


def _aligned_iou_terms(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-6):
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    ap = jnp.maximum(pred[..., 2] - pred[..., 0], 0) * \
        jnp.maximum(pred[..., 3] - pred[..., 1], 0)
    at = jnp.maximum(target[..., 2] - target[..., 0], 0) * \
        jnp.maximum(target[..., 3] - target[..., 1], 0)
    union = jnp.maximum(ap + at - inter, eps)
    iou = inter / union
    # smallest enclosing box
    elt = jnp.minimum(pred[..., :2], target[..., :2])
    erb = jnp.maximum(pred[..., 2:], target[..., 2:])
    ewh = jnp.maximum(erb - elt, 0.0)
    return iou, union, ewh, elt, erb


def iou_loss(pred, target, weight=None, eps=1e-6, reduction='mean',
             avg_factor=None, linear=False):
    iou, *_ = _aligned_iou_terms(pred, target, eps)
    loss = 1 - iou if linear else -jnp.log(jnp.maximum(iou, eps))
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def giou_loss(pred, target, weight=None, eps=1e-6, reduction='mean',
              avg_factor=None):
    iou, union, ewh, _, _ = _aligned_iou_terms(pred, target, eps)
    enclose = jnp.maximum(ewh[..., 0] * ewh[..., 1], eps)
    giou = iou - (enclose - union) / enclose
    return weight_reduce_loss(1 - giou, weight, reduction, avg_factor)


def diou_loss(pred, target, weight=None, eps=1e-6, reduction='mean',
              avg_factor=None):
    iou, _, ewh, _, _ = _aligned_iou_terms(pred, target, eps)
    c2 = ewh[..., 0]**2 + ewh[..., 1]**2 + eps
    pc = (pred[..., :2] + pred[..., 2:]) * 0.5
    tc = (target[..., :2] + target[..., 2:]) * 0.5
    rho2 = jnp.sum((pc - tc)**2, axis=-1)
    return weight_reduce_loss(1 - (iou - rho2 / c2), weight, reduction, avg_factor)


def ciou_loss(pred, target, weight=None, eps=1e-6, reduction='mean',
              avg_factor=None):
    iou, _, ewh, _, _ = _aligned_iou_terms(pred, target, eps)
    c2 = ewh[..., 0]**2 + ewh[..., 1]**2 + eps
    pc = (pred[..., :2] + pred[..., 2:]) * 0.5
    tc = (target[..., :2] + target[..., 2:]) * 0.5
    rho2 = jnp.sum((pc - tc)**2, axis=-1)
    pw = jnp.maximum(pred[..., 2] - pred[..., 0], eps)
    ph = jnp.maximum(pred[..., 3] - pred[..., 1], eps)
    tw = jnp.maximum(target[..., 2] - target[..., 0], eps)
    th = jnp.maximum(target[..., 3] - target[..., 1], eps)
    v = (4 / math.pi**2) * (jnp.arctan(tw / th) - jnp.arctan(pw / ph))**2
    alpha = v / jnp.maximum(1 - iou + v, eps)
    return weight_reduce_loss(1 - (iou - rho2 / c2 - alpha * v), weight,
                              reduction, avg_factor)


def bounded_iou_loss(pred, target, weight=None, beta=0.2, eps=1e-3,
                     reduction='mean', avg_factor=None):
    """BoundedIoULoss (reference `mmdet/models/losses/iou_loss.py:
    bounded_iou_loss`, IoU-Net): per-coordinate bounded overlap terms on
    decoded boxes, smooth-L1-composed with `beta`."""
    px = (pred[..., 0] + pred[..., 2]) * 0.5
    py = (pred[..., 1] + pred[..., 3]) * 0.5
    pw = pred[..., 2] - pred[..., 0]
    ph = pred[..., 3] - pred[..., 1]
    tx = (target[..., 0] + target[..., 2]) * 0.5
    ty = (target[..., 1] + target[..., 3]) * 0.5
    tw = jax.lax.stop_gradient(target[..., 2] - target[..., 0])
    th = jax.lax.stop_gradient(target[..., 3] - target[..., 1])
    dx = tx - px
    dy = ty - py
    loss_dx = 1 - jnp.maximum(
        (tw - 2 * jnp.abs(dx)) / (tw + 2 * jnp.abs(dx) + eps), 0)
    loss_dy = 1 - jnp.maximum(
        (th - 2 * jnp.abs(dy)) / (th + 2 * jnp.abs(dy) + eps), 0)
    loss_dw = 1 - jnp.minimum(tw / (pw + eps), pw / (tw + eps))
    loss_dh = 1 - jnp.minimum(th / (ph + eps), ph / (th + eps))
    comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], axis=-1)
    loss = jnp.where(comb < beta, 0.5 * comb * comb / beta,
                     comb - 0.5 * beta).sum(-1)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class BoundedIoULoss:
    def __init__(self, beta=0.2, eps=1e-3, reduction='mean',
                 loss_weight=1.0):
        self.beta = beta
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * bounded_iou_loss(
            pred, target, weight, self.beta, self.eps, reduction, avg_factor)


@LOSSES.register_module()
class IoULoss:
    def __init__(self, linear=False, eps=1e-6, reduction='mean', loss_weight=1.0):
        self.linear = linear
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * iou_loss(pred, target, weight, self.eps,
                                           reduction, avg_factor, self.linear)


@LOSSES.register_module()
class GIoULoss:
    def __init__(self, eps=1e-6, reduction='mean', loss_weight=1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * giou_loss(pred, target, weight, self.eps,
                                            reduction, avg_factor)
