"""RoIPool (mmcv `RoIPool` C++/CUDA op — the reference's inference-time
fallback extractor, `mmdet/apis/inference.py:7`; SURVEY.md §2.6).

Kernel semantics (legacy Fast R-CNN, shared by mmcv/torchvision):
roi corners are rounded to the feature grid, extents get the legacy "+1"
(`roi_width = max(round(x2·s) − round(x1·s) + 1, 1)`), bin (ph, pw)
max-pools integer pixels in
[roi_start_h + floor(ph·bh), roi_start_h + ceil((ph+1)·bh)) clipped to the
map; empty bins read 0.

TPU shape: the data-dependent per-bin pixel set becomes a static grid of
`samples × samples` integer taps per bin (offset start + i·step, masked by
position < end) — exact whenever every bin spans ≤ `samples` pixels; larger
bins degrade to a stride-sampled max. One flat gather; the max-reduction
fuses in XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_pool(feat: jnp.ndarray,
             rois: jnp.ndarray,
             roi_valid: jnp.ndarray,
             out_size: int = 7,
             spatial_scale: float = 1.0,
             samples: int = 8) -> jnp.ndarray:
    """Max-pool RoI features.

    Args:
        feat: (H, W, C) one image's feature map.
        rois: (R, 4) xyxy in image coords.
        roi_valid: (R,) bool.
    Returns:
        (R, out_size, out_size, C)
    """
    h, w, c = feat.shape
    r = rois.shape[0]
    start_w = jnp.round(rois[:, 0] * spatial_scale)
    start_h = jnp.round(rois[:, 1] * spatial_scale)
    end_w = jnp.round(rois[:, 2] * spatial_scale)
    end_h = jnp.round(rois[:, 3] * spatial_scale)
    roi_w = jnp.maximum(end_w - start_w + 1.0, 1.0)
    roi_h = jnp.maximum(end_h - start_h + 1.0, 1.0)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    ph = jnp.arange(out_size, dtype=feat.dtype)
    hstart = jnp.floor(ph[None, :] * bin_h[:, None]) + start_h[:, None]
    hend = jnp.ceil((ph[None, :] + 1) * bin_h[:, None]) + start_h[:, None]
    wstart = jnp.floor(ph[None, :] * bin_w[:, None]) + start_w[:, None]
    wend = jnp.ceil((ph[None, :] + 1) * bin_w[:, None]) + start_w[:, None]
    hstart = jnp.clip(hstart, 0, h)
    hend = jnp.clip(hend, 0, h)
    wstart = jnp.clip(wstart, 0, w)
    wend = jnp.clip(wend, 0, w)

    # static taps: index i of `samples` maps to start + i·ceil(extent/samples)
    i = jnp.arange(samples, dtype=feat.dtype)
    h_step = jnp.maximum(jnp.ceil((hend - hstart) / samples), 1.0)
    w_step = jnp.maximum(jnp.ceil((wend - wstart) / samples), 1.0)
    ys = hstart[..., None] + i * h_step[..., None]      # (R, out, S)
    xs = wstart[..., None] + i * w_step[..., None]
    y_ok = ys < hend[..., None]
    x_ok = xs < wend[..., None]

    yi = jnp.clip(ys, 0, h - 1).astype(jnp.int32)
    xi = jnp.clip(xs, 0, w - 1).astype(jnp.int32)

    # gather (R, out, S, out, S, C) via flat indices
    flat = feat.reshape(h * w, c)
    idx = (yi[:, :, :, None, None] * w
           + xi[:, None, None, :, :]).reshape(-1)       # R·out·S·out·S
    vals = jnp.take(flat, idx, axis=0).reshape(
        r, out_size, samples, out_size, samples, c)
    ok = (y_ok[:, :, :, None, None] & x_ok[:, None, None, :, :])
    ok = ok & roi_valid[:, None, None, None, None]
    neg = jnp.finfo(feat.dtype).min
    vals = jnp.where(ok[..., None], vals, neg)
    out = jnp.max(vals, axis=(2, 4))
    # empty bins (or invalid rois) read 0, matching the CUDA kernel
    any_ok = jnp.any(ok, axis=(2, 4))
    return jnp.where(any_ok[..., None], out, 0.0)


def batched_roi_pool(feats: jnp.ndarray, rois: jnp.ndarray,
                     roi_valid: jnp.ndarray, out_size: int = 7,
                     spatial_scale: float = 1.0,
                     samples: int = 8) -> jnp.ndarray:
    """vmap over the batch: feats (B, H, W, C), rois (B, R, 4)."""
    return jax.vmap(
        lambda f, r, v: roi_pool(f, r, v, out_size, spatial_scale, samples)
    )(feats, rois, roi_valid)


def deform_roi_pool_fpn(feats, rois, offsets, strides=(4, 8, 16, 32),
                        out_size: int = 7, sampling_ratio: int = 2,
                        gamma: float = 0.1, finest_scale: int = 56):
    """Deformable RoI pooling over the FPN (reference mmcv
    `deform_roi_pool.py:DeformRoIPoolPack` as used by
    `configs/dcn/faster_rcnn_r50_fpn_dpool_1x_coco.py`): each output bin's
    sample grid shifts by a learned offset (`offsets` (B, R, o, o, 2) in
    bin units, scaled by gamma·roi_wh like the reference), then bilinear
    taps average within the bin. Level routing matches
    `batched_roi_align_fpn` (map_roi_levels). Point-gather formulation —
    this is the opt-in parity row, not the hot default path.

    Returns (B, R, o, o, C)."""
    import jax
    import numpy as np
    from .point_sample import point_sample
    from .roi_align import roi_levels

    b, r = rois.shape[:2]
    o, sr = out_size, sampling_ratio
    lvl = roi_levels(rois, len(strides), finest_scale)

    x1, y1, x2, y2 = (rois[..., i] for i in range(4))
    rw = jnp.maximum(x2 - x1, 1e-4)
    rh = jnp.maximum(y2 - y1, 1e-4)
    # base sample grid: sr×sr taps per bin at bin-relative centers
    gx = (np.arange(o * sr) + 0.5) / (o * sr)         # (o·sr,)
    gy = (np.arange(o * sr) + 0.5) / (o * sr)
    gxx, gyy = np.meshgrid(gx, gy, indexing='xy')     # (o·sr, o·sr)
    gxx = jnp.asarray(gxx.reshape(-1), jnp.float32)   # (P,)
    gyy = jnp.asarray(gyy.reshape(-1), jnp.float32)
    # per-point bin index → offset lookup
    bin_x = (np.arange(o * sr) // sr)
    bxx, byy = np.meshgrid(bin_x, bin_x, indexing='xy')
    bin_idx = jnp.asarray((byy * o + bxx).reshape(-1), jnp.int32)  # (P,)

    off = offsets.reshape(b, r, o * o, 2)
    off_x = jnp.take(off[..., 0], bin_idx, axis=2)     # (B, R, P)
    off_y = jnp.take(off[..., 1], bin_idx, axis=2)
    px = (x1[..., None] + gxx[None, None] * rw[..., None]
          + gamma * rw[..., None] * off_x)
    py = (y1[..., None] + gyy[None, None] * rh[..., None]
          + gamma * rh[..., None] * off_y)

    total = None
    for i, s in enumerate(strides):
        feat = feats[i]
        h, w = feat.shape[1], feat.shape[2]
        pts = jnp.stack([px / (s * w), py / (s * h)], -1)  # normalized
        sampled = jax.vmap(  # over batch
            lambda f, p: jax.vmap(point_sample, (None, 0))(f, p)
        )(feat, pts)                                   # (B, R, P, C)
        sampled = sampled * (lvl == i).astype(
            sampled.dtype)[..., None, None]
        total = sampled if total is None else total + sampled
    c = feats[0].shape[-1]
    total = total.reshape(b, r, o * sr, o * sr, c)
    total = total.reshape(b, r, o, sr, o, sr, c).mean(axis=(3, 5))
    return total
