"""Box IoU/IoF computation (XLA, batched, static shapes).

Equivalent of the reference `mmdet/core/bbox/iou_calculators/iou2d_calculator.py`
(`BboxOverlaps2D`, `bbox_overlaps`). Written as pure jnp so it vectorizes over
arbitrary leading batch dims and fuses into surrounding XLA programs.
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_area(boxes: jnp.ndarray, offset: float = 0.0) -> jnp.ndarray:
    """Area of [..., 4] xyxy boxes. `offset=1` gives VOC-legacy areas."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0] + offset, 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1] + offset, 0.0)
    return w * h


def bbox_overlaps(boxes1: jnp.ndarray,
                  boxes2: jnp.ndarray,
                  mode: str = 'iou',
                  offset: float = 0.0,
                  eps: float = 1e-6) -> jnp.ndarray:
    """Pairwise overlaps between [..., N, 4] and [..., M, 4] xyxy boxes.

    Returns [..., N, M]. mode='iou' (intersection/union) or 'iof'
    (intersection over area of boxes1). `offset=1` reproduces the VOC-legacy
    coordinate convention used by the reference evaluation
    (`mmdet/core/evaluation/mean_ap.py`, use_legacy_coordinate=True).
    """
    assert mode in ('iou', 'iof')
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.maximum(rb - lt + offset, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area1 = bbox_area(boxes1, offset)[..., :, None]
    if mode == 'iou':
        area2 = bbox_area(boxes2, offset)[..., None, :]
        union = area1 + area2 - inter
    else:
        union = area1
    return inter / jnp.maximum(union, eps)
