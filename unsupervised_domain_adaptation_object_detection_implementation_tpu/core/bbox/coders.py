"""Additional box coders (reference `mmdet/core/bbox/coder/`):

- `tblr2bbox`/`bbox2tblr` — TBLRBBoxCoder (FSAF family).
- `distance2bbox`/`bbox2distance` — DistancePointBBoxCoder (FCOS/ATSS/GFL).
- `PseudoBBoxCoder` semantics are identity (no module needed).
DeltaXYWH lives in `transforms.py`.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def bbox2tblr(priors: jnp.ndarray, gts: jnp.ndarray,
              normalizer: float = 4.0, normalize_by_wh: bool = True
              ) -> jnp.ndarray:
    """Encode gt boxes as (top, bottom, left, right) distances from prior
    centers, optionally normalized by prior w/h."""
    px = (priors[..., 0] + priors[..., 2]) * 0.5
    py = (priors[..., 1] + priors[..., 3]) * 0.5
    t = py - gts[..., 1]
    b = gts[..., 3] - py
    l = px - gts[..., 0]
    r = gts[..., 2] - px
    out = jnp.stack([t, b, l, r], axis=-1) / normalizer
    if normalize_by_wh:
        w = (priors[..., 2] - priors[..., 0])[..., None]
        h = (priors[..., 3] - priors[..., 1])[..., None]
        wh = jnp.concatenate([h, h, w, w], axis=-1)
        out = out / jnp.maximum(wh, 1e-6) * 4.0 * normalizer / normalizer
        out = jnp.stack([t, b, l, r], axis=-1) / jnp.maximum(wh, 1e-6) \
            / normalizer
    return out


def tblr2bbox(priors: jnp.ndarray, tblr: jnp.ndarray,
              normalizer: float = 4.0, normalize_by_wh: bool = True,
              max_shape=None) -> jnp.ndarray:
    px = (priors[..., 0] + priors[..., 2]) * 0.5
    py = (priors[..., 1] + priors[..., 3]) * 0.5
    d = tblr * normalizer
    if normalize_by_wh:
        w = priors[..., 2] - priors[..., 0]
        h = priors[..., 3] - priors[..., 1]
        d = d * jnp.stack([h, h, w, w], axis=-1)
    t, b, l, r = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    boxes = jnp.stack([px - l, py - t, px + r, py + b], axis=-1)
    if max_shape is not None:
        from .transforms import clip_boxes
        boxes = clip_boxes(boxes, max_shape)
    return boxes


def distance2bbox(points: jnp.ndarray, distances: jnp.ndarray,
                  max_shape=None) -> jnp.ndarray:
    """(x, y) points + (l, t, r, b) distances → xyxy boxes
    (reference `distance_point_bbox_coder.py` / FCOS decode)."""
    x1 = points[..., 0] - distances[..., 0]
    y1 = points[..., 1] - distances[..., 1]
    x2 = points[..., 0] + distances[..., 2]
    y2 = points[..., 1] + distances[..., 3]
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    if max_shape is not None:
        from .transforms import clip_boxes
        boxes = clip_boxes(boxes, max_shape)
    return boxes


def bbox2distance(points: jnp.ndarray, boxes: jnp.ndarray,
                  max_dist: Optional[float] = None, eps: float = 0.1
                  ) -> jnp.ndarray:
    l = points[..., 0] - boxes[..., 0]
    t = points[..., 1] - boxes[..., 1]
    r = boxes[..., 2] - points[..., 0]
    b = boxes[..., 3] - points[..., 1]
    out = jnp.stack([l, t, r, b], axis=-1)
    if max_dist is not None:
        out = jnp.clip(out, 0, max_dist - eps)
    return out
