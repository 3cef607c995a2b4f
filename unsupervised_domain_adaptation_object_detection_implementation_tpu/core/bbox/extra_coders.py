"""Remaining reference box coders: bucketing, legacy delta, pseudo.

Reference: `mmdet/core/bbox/coder/bucketing_bbox_coder.py:13` (SABL),
`legacy_delta_xywh_bbox_coder.py:12` (SSD/legacy anchor convention with the
"+1" extent), `pseudo_bbox_coder.py:9`.

The bucketing encode's per-k scatter loop becomes a one-hot sum; everything
is static-shape and jit-friendly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bbox_rescale(bboxes: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    """Center-anchored rescale (`mmdet/core/bbox/transforms.py:214`)."""
    cx = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
    cy = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
    w = (bboxes[..., 2] - bboxes[..., 0]) * scale_factor
    h = (bboxes[..., 3] - bboxes[..., 1]) * scale_factor
    return jnp.stack([cx - w * 0.5, cy - h * 0.5,
                      cx + w * 0.5, cy + h * 0.5], axis=-1)


def _side_buckets(proposals: jnp.ndarray, num_buckets: int,
                  scale_factor: float):
    """Bucket centers per side (`bucketing_bbox_coder.py:96`)."""
    p = bbox_rescale(proposals, scale_factor)
    side_num = int(np.ceil(num_buckets / 2.0))
    # clamp: degenerate (padded/invalid) proposals would divide by zero
    # and poison masked loss terms with NaN (nan·0 = nan)
    pw = jnp.maximum(p[..., 2] - p[..., 0], 1e-4)
    ph = jnp.maximum(p[..., 3] - p[..., 1], 1e-4)
    bucket_w = pw / num_buckets
    bucket_h = ph / num_buckets
    steps = 0.5 + jnp.arange(side_num, dtype=p.dtype)
    l = p[..., 0:1] + steps[None, :] * bucket_w[:, None]
    r = p[..., 2:3] - steps[None, :] * bucket_w[:, None]
    t = p[..., 1:2] + steps[None, :] * bucket_h[:, None]
    d = p[..., 3:4] - steps[None, :] * bucket_h[:, None]
    return bucket_w, bucket_h, l, r, t, d


def bbox2bucket(proposals: jnp.ndarray,
                gt: jnp.ndarray,
                num_buckets: int,
                scale_factor: float,
                offset_topk: int = 2,
                offset_upperbound: float = 1.0,
                cls_ignore_neighbor: bool = True):
    """Bucketing targets (`bucketing_bbox_coder.py:145`).

    Returns (offsets, offset_weights, bucket_labels, cls_weights), each of
    shape (n, 4*side_num) laid out [l | r | t | d] like the reference.
    """
    side_num = int(np.ceil(num_buckets / 2.0))
    bucket_w, bucket_h, l_b, r_b, t_b, d_b = _side_buckets(
        proposals, num_buckets, scale_factor)

    offs = [
        (l_b - gt[..., 0:1]) / bucket_w[:, None],
        (r_b - gt[..., 2:3]) / bucket_w[:, None],
        (t_b - gt[..., 1:2]) / bucket_h[:, None],
        (d_b - gt[..., 3:4]) / bucket_h[:, None],
    ]

    weights, labels_1hot, cls_w = [], [], []
    for o in offs:
        topk_vals, topk_idx = jax.lax.top_k(-jnp.abs(o), offset_topk)
        topk_vals = -topk_vals                                  # ascending
        w = jnp.zeros_like(o)
        for k in range(offset_topk):
            gate = jnp.ones(o.shape[:1], o.dtype) if k == 0 else (
                topk_vals[:, k] < offset_upperbound).astype(o.dtype)
            w = w + jax.nn.one_hot(topk_idx[:, k], side_num,
                                   dtype=o.dtype) * gate[:, None]
        weights.append(jnp.minimum(w, 1.0))
        labels_1hot.append(jax.nn.one_hot(topk_idx[:, 0], side_num,
                                          dtype=o.dtype))
        cls_w.append((jnp.abs(o) < 1).astype(o.dtype))

    offsets = jnp.concatenate(offs, axis=-1)
    offset_weights = jnp.concatenate(weights, axis=-1)
    bucket_labels = jnp.concatenate(labels_1hot, axis=-1)
    cls_weights = jnp.concatenate(cls_w, axis=-1)
    if cls_ignore_neighbor:
        cls_weights = (~((cls_weights == 1)
                         & (bucket_labels == 0))).astype(offsets.dtype)
    else:
        cls_weights = jnp.ones_like(cls_weights)
    return offsets, offset_weights, bucket_labels, cls_weights


def bucket2bbox(proposals: jnp.ndarray,
                cls_preds: jnp.ndarray,
                offset_preds: jnp.ndarray,
                num_buckets: int,
                scale_factor: float = 1.0,
                max_shape: Optional[Tuple[int, int]] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bucketing decode + localization confidence
    (`bucketing_bbox_coder.py:269`). cls/offset preds: (n, 4*side_num).
    """
    n = proposals.shape[0]
    side_num = int(np.ceil(num_buckets / 2.0))
    scores = jax.nn.softmax(cls_preds.reshape(n, 4, side_num), axis=-1)
    top2, lab2 = jax.lax.top_k(scores, 2)                       # (n, 4, 2)
    best = lab2[..., 0]                                         # (n, 4)

    bucket_w, bucket_h, l_b, r_b, t_b, d_b = _side_buckets(
        proposals, num_buckets, scale_factor)
    p = bbox_rescale(proposals, scale_factor)

    steps = 0.5 + best.astype(p.dtype)
    l_buckets = p[..., 0] + steps[:, 0] * bucket_w
    r_buckets = p[..., 2] - steps[:, 1] * bucket_w
    t_buckets = p[..., 1] + steps[:, 2] * bucket_h
    d_buckets = p[..., 3] - steps[:, 3] * bucket_h

    off = offset_preds.reshape(n, 4, side_num)
    sel = jnp.take_along_axis(off, best[..., None], axis=-1)[..., 0]  # (n,4)

    x1 = l_buckets - sel[:, 0] * bucket_w
    x2 = r_buckets - sel[:, 1] * bucket_w
    y1 = t_buckets - sel[:, 2] * bucket_h
    y2 = d_buckets - sel[:, 3] * bucket_h
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    bboxes = jnp.stack([x1, y1, x2, y2], axis=-1)

    # bucketing-guided rescoring: add runner-up score if adjacent bucket
    neighbor = (jnp.abs(lab2[..., 0] - lab2[..., 1]) == 1)
    conf = top2[..., 0] + top2[..., 1] * neighbor.astype(top2.dtype)
    return bboxes, jnp.mean(conf, axis=1)


def legacy_bbox2delta(proposals: jnp.ndarray,
                      gt: jnp.ndarray,
                      means=(0., 0., 0., 0.),
                      stds=(1., 1., 1., 1.)) -> jnp.ndarray:
    """Legacy (+1 extent) delta encode
    (`legacy_delta_xywh_bbox_coder.py:106`)."""
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0] + 1.0
    ph = proposals[..., 3] - proposals[..., 1] + 1.0
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0] + 1.0
    gh = gt[..., 3] - gt[..., 1] + 1.0
    deltas = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                        jnp.log(gw / pw), jnp.log(gh / ph)], axis=-1)
    return (deltas - jnp.asarray(means)) / jnp.asarray(stds)


def legacy_delta2bbox(rois: jnp.ndarray,
                      deltas: jnp.ndarray,
                      means=(0., 0., 0., 0.),
                      stds=(1., 1., 1., 1.),
                      max_shape: Optional[Tuple[int, int]] = None,
                      wh_ratio_clip: float = 16 / 1000) -> jnp.ndarray:
    """Legacy (+1 extent) delta decode
    (`legacy_delta_xywh_bbox_coder.py:133`): note the decoded corners are
    center ± (w-1)/2, matching the off-by-one convention."""
    reps = deltas.shape[-1] // 4
    d = deltas * jnp.tile(jnp.asarray(stds), reps) \
        + jnp.tile(jnp.asarray(means), reps)
    dx, dy, dw, dh = d[..., 0::4], d[..., 1::4], d[..., 2::4], d[..., 3::4]
    max_ratio = abs(np.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0] + 1.0)[..., None]
    ph = (rois[..., 3] - rois[..., 1] + 1.0)[..., None]
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = gx - (gw - 1) * 0.5
    y1 = gy - (gh - 1) * 0.5
    x2 = gx + (gw - 1) * 0.5
    y2 = gy + (gh - 1) * 0.5
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    out = jnp.stack([x1, y1, x2, y2], axis=-1)
    return out.reshape(deltas.shape)


def pseudo_encode(bboxes: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """PseudoBBoxCoder (`pseudo_bbox_coder.py:9`): targets are the gts."""
    return gt


def pseudo_decode(bboxes: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    return pred
