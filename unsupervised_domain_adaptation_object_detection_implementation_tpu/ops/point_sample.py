"""Point sampling (mmcv `point_sample` / `rel_roi_point_to_rel_img_point` —
used by the reference's PointRend head, SURVEY.md §2.6).

`point_sample` == F.grid_sample(align_corners=False) at scattered points:
normalized [0,1] point coords map to pixel space as `p * size - 0.5`,
bilinear, zero padding. One 4-tap gather per point, NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def point_sample(feat: jnp.ndarray, points: jnp.ndarray,
                 align_corners: bool = False) -> jnp.ndarray:
    """Sample (H, W, C) at (P, 2) normalized (x, y) in [0, 1].

    Returns (P, C)."""
    h, w, c = feat.shape
    if align_corners:
        xs = points[:, 0] * (w - 1)
        ys = points[:, 1] * (h - 1)
    else:
        xs = points[:, 0] * w - 0.5
        ys = points[:, 1] * h - 0.5

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    flat = feat.reshape(h * w, c)

    def tap(yi, xi, wgt):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(flat, idx.astype(jnp.int32), axis=0)
        return vals * (wgt * inside)[:, None]

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    return (tap(y0i, x0i, (1 - wy1) * (1 - wx1))
            + tap(y0i, x0i + 1, (1 - wy1) * wx1)
            + tap(y0i + 1, x0i, wy1 * (1 - wx1))
            + tap(y0i + 1, x0i + 1, wy1 * wx1))


def batched_point_sample(feats: jnp.ndarray, points: jnp.ndarray,
                         align_corners: bool = False) -> jnp.ndarray:
    """feats (B, H, W, C), points (B, P, 2) → (B, P, C)."""
    return jax.vmap(lambda f, p: point_sample(f, p, align_corners))(
        feats, points)


def rel_roi_point_to_rel_img_point(rois: jnp.ndarray,
                                   rel_roi_points: jnp.ndarray,
                                   img_shape,
                                   spatial_scale: float = 1.0) -> jnp.ndarray:
    """Map (P, 2) points relative to each roi into image-normalized coords
    (mmcv `rel_roi_point_to_rel_img_point`).

    Args:
        rois: (R, 4) xyxy.
        rel_roi_points: (P, 2) in [0, 1] relative to the roi.
        img_shape: (H, W) of the feature/image the points index into.
    Returns:
        (R, P, 2) normalized (x, y) for `point_sample`.
    """
    h, w = img_shape
    roi_w = rois[:, 2] - rois[:, 0]
    roi_h = rois[:, 3] - rois[:, 1]
    x = rois[:, 0:1] + rel_roi_points[None, :, 0] * roi_w[:, None]
    y = rois[:, 1:2] + rel_roi_points[None, :, 1] * roi_h[:, None]
    return jnp.stack([x * spatial_scale / w, y * spatial_scale / h], axis=-1)
