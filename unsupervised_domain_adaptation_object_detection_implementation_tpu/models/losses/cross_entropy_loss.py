"""Cross-entropy losses (reference `mmdet/models/losses/cross_entropy_loss.py`).

`cross_entropy` = softmax CE over integer labels; `binary_cross_entropy` is the
`use_sigmoid=True` path where integer labels are one-hot expanded (the RPN and
RCNN cls losses of the DA configs both use `use_sigmoid=True` —
`da_configs/_base_/models/faster_rcnn_r50_torch_daf.py:36,57`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES
from .utils import weight_reduce_loss


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample softmax CE with integer labels: (..., C) x (...,) → (...,).
    Always computed in fp32 (bf16 logits are upcast)."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    labels_clipped = jnp.clip(labels, 0, logits.shape[-1] - 1)
    return -jnp.take_along_axis(log_probs, labels_clipped[..., None], axis=-1)[..., 0]


def cross_entropy(logits: jnp.ndarray,
                  labels: jnp.ndarray,
                  weight: Optional[jnp.ndarray] = None,
                  reduction: str = 'mean',
                  avg_factor=None,
                  class_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    loss = softmax_cross_entropy(logits, labels)
    if class_weight is not None:
        loss = loss * class_weight[labels]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def binary_cross_entropy(logits: jnp.ndarray,
                         labels: jnp.ndarray,
                         weight: Optional[jnp.ndarray] = None,
                         reduction: str = 'mean',
                         avg_factor=None) -> jnp.ndarray:
    """BCE-with-logits. Integer `labels` of shape (...) are one-hot expanded
    to match (..., C) logits (mmdet `_expand_onehot_labels` semantics: label
    == C (background) maps to the all-zeros row). Float labels matching the
    logits' shape are used directly.
    """
    logits = logits.astype(jnp.float32)
    if labels.ndim == logits.ndim - 1:
        num_classes = logits.shape[-1]
        onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
        labels = onehot
        if weight is not None and weight.ndim == logits.ndim - 1:
            weight = weight[..., None]
    labels = labels.astype(logits.dtype)
    # numerically stable BCE with logits
    loss = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class CrossEntropyLoss:
    """Config-driven CE (sigmoid or softmax) mirroring the reference class."""

    def __init__(self, use_sigmoid: bool = False, use_mask: bool = False,
                 reduction: str = 'mean', class_weight=None, loss_weight: float = 1.0):
        assert not use_mask, 'mask CE not needed by the DA path yet'
        self.use_sigmoid = use_sigmoid
        self.reduction = reduction
        self.class_weight = class_weight
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        if self.use_sigmoid:
            loss = binary_cross_entropy(pred, target, weight, reduction, avg_factor)
        else:
            cw = None if self.class_weight is None else jnp.asarray(self.class_weight)
            loss = cross_entropy(pred, target, weight, reduction, avg_factor, cw)
        return self.loss_weight * loss
