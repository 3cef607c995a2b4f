"""CARAFE content-aware upsampling (mmcv `CARAFEPack` CUDA op — used by the
reference's FPN_CARAFE neck and some mask heads, SURVEY.md §2.6).

CARAFE (ICCV'19): each upsampled position (i, j) reassembles a k×k
neighborhood of its source position (i//σ, j//σ) with a per-position
predicted, softmax-normalized kernel.

TPU shape: the CUDA scatter/gather becomes
  1. `conv_general_dilated_patches` — im2col of the k×k neighborhoods
     (XLA lowers this to a few shifted slices, no gather);
  2. nearest-upsample of the patch tensor to the output grid;
  3. one einsum against the normalized masks — batched dot on the MXU.
Layout NHWC. The kernel-prediction convs (channel compressor + content
encoder) live in the caller's module; this op is the reassembly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def carafe(x: jnp.ndarray, masks: jnp.ndarray, kernel_size: int = 5,
           scale: int = 2) -> jnp.ndarray:
    """Reassemble.

    Args:
        x: (B, H, W, C) source features.
        masks: (B, H·σ, W·σ, k·k) softmax-normalized reassembly kernels.
    Returns:
        (B, H·σ, W·σ, C)
    """
    b, h, w, c = x.shape
    k = kernel_size
    pad = (k - 1) // 2
    # im2col: (B, H, W, C·k·k) with feature-major ordering (C slow, tap fast)
    patches = jax.lax.conv_general_dilated_patches(
        x.transpose(0, 3, 1, 2), (k, k), (1, 1),
        [(pad, pad), (pad, pad)])                  # (B, C*k*k, H, W)
    patches = patches.reshape(b, c, k * k, h, w)
    # nearest upsample to output grid
    patches = jnp.repeat(jnp.repeat(patches, scale, axis=3), scale, axis=4)
    out = jnp.einsum('bctij,bijt->bijc', patches, masks)
    return out


def carafe_normalized(x: jnp.ndarray, raw_masks: jnp.ndarray,
                      kernel_size: int = 5, scale: int = 2) -> jnp.ndarray:
    """Softmax-normalize raw mask logits then reassemble (CARAFEPack does
    the pixel-shuffle + softmax before the kernel; callers that predict
    (B, H, W, σ²·k²) masks at low res should pixel-shuffle first)."""
    return carafe(x, jax.nn.softmax(raw_masks, axis=-1), kernel_size, scale)
