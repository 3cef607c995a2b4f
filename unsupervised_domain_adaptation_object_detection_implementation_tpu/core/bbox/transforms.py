"""Box transforms: delta coding, clipping, flipping, result packing.

TPU-native equivalents of the reference's
`mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:13` (DeltaXYWHBBoxCoder) and
`mmdet/core/bbox/transforms.py:59,100` (bbox2roi / bbox2result). Everything is
batched and static-shape; the ragged `bbox2roi` concat becomes a padded
[B, R, 4] + validity-mask layout.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def delta2bbox(rois: jnp.ndarray,
               deltas: jnp.ndarray,
               means: Sequence[float] = (0., 0., 0., 0.),
               stds: Sequence[float] = (1., 1., 1., 1.),
               max_shape: Optional[jnp.ndarray] = None,
               wh_ratio_clip: float = 16 / 1000) -> jnp.ndarray:
    """Decode [..., 4] deltas w.r.t. [..., 4] xyxy rois.

    Matches DeltaXYWHBBoxCoder.decode (reference
    `mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:167` semantics):
    dxy scaled by wh, dwh exponentiated with ratio clip, optional clip to
    `max_shape` ([..., 2] as (h, w) — broadcastable per-image shapes).
    """
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    denorm = deltas * stds + means
    dx, dy, dw, dh = (denorm[..., 0], denorm[..., 1], denorm[..., 2], denorm[..., 3])
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)

    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]

    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)

    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    if max_shape is not None:
        boxes = clip_boxes(boxes, max_shape)
    return boxes


def bbox2delta(proposals: jnp.ndarray,
               gt: jnp.ndarray,
               means: Sequence[float] = (0., 0., 0., 0.),
               stds: Sequence[float] = (1., 1., 1., 1.),
               eps: float = 1e-6) -> jnp.ndarray:
    """Encode gt boxes as deltas w.r.t. proposals (DeltaXYWHBBoxCoder.encode)."""
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = jnp.maximum(proposals[..., 2] - proposals[..., 0], eps)
    ph = jnp.maximum(proposals[..., 3] - proposals[..., 1], eps)

    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = jnp.maximum(gt[..., 2] - gt[..., 0], eps)
    gh = jnp.maximum(gt[..., 3] - gt[..., 1], eps)

    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(gw / pw)
    dh = jnp.log(gh / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def clip_boxes(boxes: jnp.ndarray, img_shape: jnp.ndarray) -> jnp.ndarray:
    """Clip [..., 4] xyxy boxes to (h, w).

    `img_shape` is [..., 2] (h, w), broadcastable against boxes' batch dims —
    per-image valid shapes, not the padded canvas.
    """
    img_shape = jnp.asarray(img_shape, boxes.dtype)
    h = img_shape[..., 0:1]
    w = img_shape[..., 1:2]
    x1 = jnp.clip(boxes[..., 0], 0, w[..., 0])
    y1 = jnp.clip(boxes[..., 1], 0, h[..., 0])
    x2 = jnp.clip(boxes[..., 2], 0, w[..., 0])
    y2 = jnp.clip(boxes[..., 3], 0, h[..., 0])
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def flip_boxes(boxes: jnp.ndarray, img_shape: Tuple[int, int],
               direction: str = 'horizontal') -> jnp.ndarray:
    """Flip xyxy boxes inside (h, w) — reference `bbox_flip`."""
    h, w = img_shape
    if direction == 'horizontal':
        x1 = w - boxes[..., 2]
        x2 = w - boxes[..., 0]
        return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)
    elif direction == 'vertical':
        y1 = h - boxes[..., 3]
        y2 = h - boxes[..., 1]
        return jnp.stack([boxes[..., 0], y1, boxes[..., 2], y2], axis=-1)
    raise ValueError(direction)


def bbox2result(bboxes: np.ndarray, labels: np.ndarray, scores: np.ndarray,
                valid: np.ndarray, num_classes: int):
    """Convert padded device outputs to the reference's per-class list format.

    The reference `bbox2result` (`mmdet/core/bbox/transforms.py:100`) returns
    `list[num_classes]` of (n, 5) [x1,y1,x2,y2,score] arrays; downstream eval
    and visualization consume that format, so we keep it at the host boundary.
    """
    bboxes = np.asarray(bboxes)
    labels = np.asarray(labels)
    scores = np.asarray(scores)
    valid = np.asarray(valid).astype(bool)
    out = []
    for c in range(num_classes):
        sel = valid & (labels == c)
        det = np.concatenate([bboxes[sel], scores[sel, None]], axis=1)
        out.append(det.astype(np.float32))
    return out
