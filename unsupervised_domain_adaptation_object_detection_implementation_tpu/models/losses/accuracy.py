"""Top-k accuracy metric (reference `mmdet/models/losses/accuracy.py`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray,
             weight: jnp.ndarray = None, topk: int = 1) -> jnp.ndarray:
    """Fraction of rows whose top-k predictions contain the label (0-100)."""
    if topk == 1:
        correct = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    else:
        _, idx = jax.lax.top_k(logits, topk)
        correct = jnp.any(idx == labels[..., None], axis=-1).astype(jnp.float32)
    if weight is not None:
        total = jnp.maximum(jnp.sum(weight), 1e-6)
        return 100.0 * jnp.sum(correct * weight) / total
    return 100.0 * jnp.mean(correct)
