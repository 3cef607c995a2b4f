"""GAN losses for the CyDA / CyCADA pipelines.

Reference: `mmdet/models/backbones/resnet_da_v3.py` (GAN_Discriminator LS-GAN
logits, cycle-consistency L1) and `mmdet/models/detectors/CyDAFaster_rcnn.py:
142-146`. Least-squares GAN objective as in CycleGAN.
"""

from __future__ import annotations

import jax.numpy as jnp


def gan_lsgan_loss(logits: jnp.ndarray, is_real: bool) -> jnp.ndarray:
    """LS-GAN loss: mean((D(x) - target)^2), target 1 for real, 0 for fake."""
    target = 1.0 if is_real else 0.0
    return jnp.mean((logits - target)**2)


def cycle_consistency_loss(x: jnp.ndarray, x_rec: jnp.ndarray,
                           weight: float = 10.0) -> jnp.ndarray:
    """L1 cycle loss ||G_t2s(G_s2t(x)) - x||_1."""
    return weight * jnp.mean(jnp.abs(x - x_rec))
