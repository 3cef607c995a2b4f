"""RoIAlign for TPU.

Replaces the reference's mmcv CUDA `RoIAlign` (used via `SingleRoIExtractor`,
`mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py:10`;
config `da_configs/_base_/models/faster_rcnn_r50_torch_daf.py:42`:
output_size=7, sampling_ratio=0, aligned).

TPU-first design: bilinear sampling is LINEAR in the feature map, and the
sample grid is separable per axis, so RoIAlign for each RoI is two small
matmuls:

    out[r] = Wy[r] @ feat @ Wx[r]^T        (per channel)

where Wy[r] (out_h, H) / Wx[r] (out_w, W) hold the averaged bilinear weights
of that RoI's sample points. This keeps the op on the MXU with dense,
static-shape contractions instead of 4-tap gathers (gathers are
bandwidth-bound and scatter VMEM on TPU). RoIs are processed in fixed-size
chunks to bound the (chunk, H, out, C) intermediate.

Semantics notes vs mmcv:
- `aligned=True` (half-pixel offset) matches mmdet 2.x default.
- mmcv's `sampling_ratio=0` means adaptive ceil(bin/sample) counts — a
  data-dependent shape, so we use a fixed `sampling_ratio` (default 2, the
  detectron2-standard choice); documented deviation, mAP-neutral.
- out-of-image samples contribute zero (mmcv skips samples with y < -1 or
  y > H; boundary samples clamp inward) — verified element-exact against a
  transcription of the mmcv CPU kernel in `tests/test_parity`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _axis_weights(lo: jnp.ndarray, bin_size: jnp.ndarray, out_size: int,
                  sampling_ratio: int, axis_len: int) -> jnp.ndarray:
    """Averaged bilinear weight matrix for one axis.

    Args:
        lo: (R,) start coordinate of each roi on this axis (feature units).
        bin_size: (R,) per-roi bin extent.
        out_size: number of output bins.
        axis_len: feature length on this axis.

    Returns:
        (R, out_size, axis_len) weights.
    """
    sr = sampling_ratio
    r = lo.shape[0]
    # sample positions: lo + (bin + (s + .5)/sr) * bin_size
    bins = jnp.arange(out_size, dtype=lo.dtype)
    samples = (jnp.arange(sr, dtype=lo.dtype) + 0.5) / sr
    pos = lo[:, None, None] + \
        (bins[None, :, None] + samples[None, None, :]) * bin_size[:, None, None]
    # (R, out, sr) — mmcv `bilinear_interpolate` skips only y < -1 or
    # y > len (boundary values are valid and clamp inward)
    valid = (pos >= -1.0) & (pos <= axis_len)
    pos_c = jnp.clip(pos, 0.0, axis_len - 1.0)
    x0 = jnp.floor(pos_c)
    frac = pos_c - x0
    x0i = x0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, axis_len - 1)
    grid = jnp.arange(axis_len, dtype=jnp.int32)
    w0 = jnp.where(valid, 1.0 - frac, 0.0)
    w1 = jnp.where(valid, frac, 0.0)
    # scatter the two taps onto the axis grid: (R, out, sr, L) -> sum over sr
    onehot0 = (grid[None, None, None, :] == x0i[..., None]).astype(lo.dtype)
    onehot1 = (grid[None, None, None, :] == x1i[..., None]).astype(lo.dtype)
    w = w0[..., None] * onehot0 + w1[..., None] * onehot1
    return w.sum(axis=2) / sr                                  # (R, out, L)


@partial(jax.jit, static_argnames=('out_size', 'sampling_ratio', 'aligned',
                                   'roi_chunk'))
def roi_align(feat: jnp.ndarray,
              rois: jnp.ndarray,
              spatial_scale: float,
              out_size: int = 7,
              sampling_ratio: int = 2,
              aligned: bool = True,
              roi_chunk: int = 16) -> jnp.ndarray:
    """Single-image RoIAlign.

    Args:
        feat: (H, W, C) feature map.
        rois: (R, 4) xyxy boxes in IMAGE coordinates.
        spatial_scale: 1/stride of the feature map.

    Returns:
        (R, out_size, out_size, C).
    """
    h, w, c = feat.shape
    n = rois.shape[0]
    offset = 0.5 if aligned else 0.0
    scaled = rois * spatial_scale
    x1 = scaled[:, 0] - offset
    y1 = scaled[:, 1] - offset
    roi_w = scaled[:, 2] - scaled[:, 0]
    roi_h = scaled[:, 3] - scaled[:, 1]
    if not aligned:  # legacy: clamp to min size 1
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    wx = _axis_weights(x1, bin_w, out_size, sampling_ratio, w)   # (R, o, W)
    wy = _axis_weights(y1, bin_h, out_size, sampling_ratio, h)   # (R, o, H)

    chunk = min(roi_chunk, n)
    pad = (-n) % chunk
    if pad:
        wx = jnp.pad(wx, ((0, pad), (0, 0), (0, 0)))
        wy = jnp.pad(wy, ((0, pad), (0, 0), (0, 0)))

    wx_ch = wx.reshape(-1, chunk, out_size, w)
    wy_ch = wy.reshape(-1, chunk, out_size, h)

    def one_chunk(args):
        wy_c, wx_c = args
        # x-interp first: (chunk, H, o, C). MXU accumulates fp32; the
        # result is stored back at feat dtype — at bf16 this HALVES the
        # HBM round-trip of the (chunk, H, o, C) intermediate, which is
        # what this op is bound by (~2 GB/step at bench shapes).
        t = jnp.einsum('row,hwc->rhoc', wx_c.astype(feat.dtype), feat,
                       preferred_element_type=jnp.float32).astype(feat.dtype)
        # y-interp: (chunk, o, o, C)
        out = jnp.einsum('roh,rhpc->ropc', wy_c.astype(feat.dtype), t,
                         preferred_element_type=jnp.float32)
        return out.astype(feat.dtype)

    out = jax.lax.map(one_chunk, (wy_ch, wx_ch))
    out = out.reshape(-1, out_size, out_size, c)[:n]
    return out


def _roi_weights(rois, spatial_scale, out_size, sampling_ratio, aligned,
                 h, w):
    """Per-roi separable weights: (R, o, W) and (R, o, H)."""
    offset = 0.5 if aligned else 0.0
    scaled = rois * spatial_scale
    x1 = scaled[:, 0] - offset
    y1 = scaled[:, 1] - offset
    roi_w = scaled[:, 2] - scaled[:, 0]
    roi_h = scaled[:, 3] - scaled[:, 1]
    if not aligned:  # legacy: clamp to min size 1
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    wx = _axis_weights(x1, roi_w / out_size, out_size, sampling_ratio, w)
    wy = _axis_weights(y1, roi_h / out_size, out_size, sampling_ratio, h)
    return wx, wy


def batched_roi_align(feats: jnp.ndarray, rois: jnp.ndarray,
                      spatial_scale: float, out_size: int = 7,
                      sampling_ratio: int = 2, aligned: bool = True,
                      roi_chunk: int = 32,
                      flatten: bool = False) -> jnp.ndarray:
    """Batched RoIAlign: (B,H,W,C) x (B,R,4) → (B,R,o,o,C).

    NOT vmap(roi_align): one flat scan over image-major RoI chunks. With
    vmap-of-scan the stacked ys come out chunk-major ((chunks, B, chunk, …)),
    and reordering them for the bbox head costs three ~800 MB layout copies
    per step at the flagship bench shapes (measured in xprof, ~8 ms). With
    image-major iteration order the stacked (B·chunks, chunk, o, o, C) ys
    reshape to (B, R, o, o, C) with zero data movement.

    `flatten=True` returns (B, R, o·o·C) instead, with the flatten done
    INSIDE the scan body: the (…, o, o, C) form is tile-padded in HBM
    (o=7 rounds up to 8 sublanes), so flattening it later is a real
    ~800 MB repack (xprof: 2.8 ms fwd + 2.8 ms bwd at bench shapes);
    per-chunk the repack happens in VMEM as part of the einsum's output
    write. Use for consumers that want the flat form (Shared2FC head).

    FLATTEN ORDER IS (xbin, ybin, C) — x-major, NOT the (ybin, xbin, C)
    a row-major reshape of the 5-D form gives. Rationale: the y-interp
    dot's natural output layout is xbin-outer ({3,1,2,0} on (r,yb,xb,c)),
    so an x-major flatten is a bitcast while a y-major one materializes
    the 822 MB result twice more per step (xprof at bench shapes:
    convert-copy 1.2 ms + reshape-copy 2.6 ms fwd, again in bwd; x-major
    measured −2.9 ms/step fwd+bwd). The order is internal: every
    consumer/producer pair agrees (`bbox_head.py` flattens 5-D input the
    same way; `tools/model_converters/mmdet_to_udaod.py:_first_fc`
    permutes imported torch fc weights to match).
    """
    b, h, w, c = feats.shape
    n = rois.shape[1]
    wx, wy = jax.vmap(lambda r: _roi_weights(
        r, spatial_scale, out_size, sampling_ratio, aligned, h, w))(rois)

    chunk = min(roi_chunk, n)
    pad = (-n) % chunk
    if pad:
        wx = jnp.pad(wx, ((0, 0), (0, pad), (0, 0), (0, 0)))
        wy = jnp.pad(wy, ((0, 0), (0, pad), (0, 0), (0, 0)))
    n_pad = n + pad
    nch = n_pad // chunk
    wx_ch = wx.reshape(b * nch, chunk, out_size, w)
    wy_ch = wy.reshape(b * nch, chunk, out_size, h)
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), nch)

    def one_chunk(carry, args):
        bi, wy_c, wx_c = args
        f = jax.lax.dynamic_index_in_dim(feats, bi, 0, keepdims=False)
        t = jnp.einsum('row,hwc->rhoc', wx_c.astype(feats.dtype), f,
                       preferred_element_type=jnp.float32).astype(feats.dtype)
        out = jnp.einsum('roh,rhpc->ropc', wy_c.astype(feats.dtype), t,
                         preferred_element_type=jnp.float32)
        out = out.astype(feats.dtype)
        if flatten:
            # x-major flatten (see docstring): matches the dot's natural
            # layout, so swap+reshape is a bitcast instead of two copies
            out = jnp.swapaxes(out, 1, 2).reshape(
                chunk, out_size * out_size * c)
        return carry, out

    _, out = jax.lax.scan(one_chunk, 0, (img_idx, wy_ch, wx_ch))
    if flatten:
        return out.reshape(b, n_pad, out_size * out_size * c)[:, :n]
    return out.reshape(b, n_pad, out_size, out_size, c)[:, :n]


def _tap_coords(pos: jnp.ndarray, axis_len: jnp.ndarray):
    """Per-sample bilinear taps on one axis with a PER-ROI axis length.

    pos: (..., S) float sample positions; axis_len: broadcastable int.
    Returns (i0, i1, w0, w1) — tap indices and weights, zeroed where the
    sample is invalid under the mmcv rule (pos < -1 or pos > len).
    """
    valid = (pos >= -1.0) & (pos <= axis_len)
    pos_c = jnp.clip(pos, 0.0, axis_len - 1.0)
    i0 = jnp.floor(pos_c)
    frac = pos_c - i0
    i0i = i0.astype(jnp.int32)
    i1i = jnp.minimum(i0i + 1, (axis_len - 1).astype(jnp.int32))
    w0 = jnp.where(valid, 1.0 - frac, 0.0)
    w1 = jnp.where(valid, frac, 0.0)
    return i0i, i1i, w0, w1


def roi_levels(rois: jnp.ndarray, num_levels: int,
               finest_scale: int = 56) -> jnp.ndarray:
    """map_roi_levels (reference `single_level_roi_extractor.py:10`):
    level = clamp(floor(log2(sqrt(area)/finest_scale)))."""
    scale = jnp.sqrt(
        jnp.maximum(rois[..., 2] - rois[..., 0], 0) *
        jnp.maximum(rois[..., 3] - rois[..., 1], 0))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def batched_roi_align_fpn(feats, rois: jnp.ndarray, strides,
                          out_size: int = 7, sampling_ratio: int = 2,
                          aligned: bool = True, finest_scale: int = 56,
                          roi_chunk: int = 512) -> jnp.ndarray:
    """Multi-level RoIAlign, separable-matmul form (the FPN
    `SingleRoIExtractor`, reference `single_level_roi_extractor.py:10`).

    Per level: x-interp dot over a PRE-TRANSPOSED (W, H·C) feature copy
    (one relayout per level per step, instead of one per roi-chunk scan
    step — the naive in-scan einsum re-lays 16 MB per chunk, measured
    18.0 ms fwd at bench shapes vs 14.8 ms here), then per-roi y-interp;
    a one-hot level mask selects each roi's level. A point-gather variant
    (each roi touching only its level — 12× fewer FLOPs) was probed and
    measured WORSE (34-48 ms: XLA TPU gather of (196·R, C) rows runs at
    ~6% of HBM bandwidth); kept as `batched_roi_align_pyramid` for the
    record and as an independent golden.
    """
    b = feats[0].shape[0]
    c = feats[0].shape[-1]
    n = rois.shape[1]
    lvl = roi_levels(rois, len(strides), finest_scale)
    chunk = min(roi_chunk, n)
    pad = (-n) % chunk
    nch = (n + pad) // chunk
    total = None
    for i, s in enumerate(strides):
        feat = feats[i]
        h, w = feat.shape[1], feat.shape[2]
        wx, wy = jax.vmap(lambda r: _roi_weights(
            r, 1.0 / s, out_size, sampling_ratio, aligned, h, w))(rois)
        # fold the level mask into the x weights: off-level rois produce
        # zeros, so the masked add below is exact (and mask-mult fuses)
        wx = wx * (lvl == i).astype(wx.dtype)[..., None, None]
        ft = feat.transpose(0, 2, 1, 3).reshape(b, w, h * c)
        if pad:
            wx = jnp.pad(wx, ((0, 0), (0, pad), (0, 0), (0, 0)))
            wy = jnp.pad(wy, ((0, 0), (0, pad), (0, 0), (0, 0)))
        wx_ch = wx.reshape(b * nch, chunk * out_size, w)
        wy_ch = wy.reshape(b * nch, chunk, out_size, h)
        bi_ch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), nch)

        def one(carry, args, ft=ft, h=h):
            bi, wy_c, wx_c = args
            fti = jax.lax.dynamic_index_in_dim(ft, bi, 0, keepdims=False)
            t = jnp.dot(wx_c.astype(feat.dtype), fti,
                        preferred_element_type=jnp.float32)
            t = t.reshape(chunk, out_size, h, c).astype(feat.dtype)
            o = jnp.einsum('roh,rphc->ropc', wy_c.astype(feat.dtype), t,
                           preferred_element_type=jnp.float32)
            return carry, o.astype(feat.dtype)

        _, o = jax.lax.scan(one, 0, (bi_ch, wy_ch, wx_ch))
        o = o.reshape(b, n + pad, out_size, out_size, c)[:, :n]
        total = o if total is None else total + o
    return total


def batched_roi_align_pyramid(feats, rois: jnp.ndarray, strides,
                              out_size: int = 7, sampling_ratio: int = 2,
                              aligned: bool = True,
                              finest_scale: int = 56,
                              roi_chunk: int = 64) -> jnp.ndarray:
    """Multi-level RoIAlign as ONE level-aware point gather (the FPN
    `SingleRoIExtractor`, reference `single_level_roi_extractor.py:10`).

    Each RoI samples only ITS pyramid level (map_roi_levels: level =
    clamp(floor(log2(sqrt(area)/finest_scale)))). The separable-matmul
    form (`batched_roi_align`) is wrong for this: its x-interp costs
    o·W·H·C MACs per roi per LEVEL, so running every roi against every
    level at bench shapes is ~640 GFLOP fwd, 3/4 of it masked out —
    measured 18 ms on v5e. Here the pyramid is flattened to one
    (B, ΣHW, C) buffer and each roi's 4·(o·sr)² bilinear taps become flat
    gathers `off_l + y·W_l + x` — zero matmul FLOPs, ~1.6 GB of gather
    traffic, everything static-shape. Sample positions and the mmcv
    validity/clamp rules match `batched_roi_align` exactly (golden-tested
    against it).

    feats: list of (B, H_l, W_l, C), one per stride. rois: (B, R, 4) xyxy
    in image coords. Returns (B, R, out, out, C).
    """
    b, _, _, c = feats[0].shape
    n = rois.shape[1]
    sr = sampling_ratio
    s_out = out_size * sr
    dtype = feats[0].dtype

    hs = np.asarray([f.shape[1] for f in feats])
    ws = np.asarray([f.shape[2] for f in feats])
    offs = np.concatenate([[0], np.cumsum(hs * ws)])[:-1]
    flat = jnp.concatenate([f.reshape(b, -1, c) for f in feats], axis=1)
    flat = flat.reshape(b * flat.shape[1], c)
    img_stride = int((hs * ws).sum())

    # per-roi level (map_roi_levels) and that level's constants
    scale = jnp.sqrt(
        jnp.maximum(rois[..., 2] - rois[..., 0], 0) *
        jnp.maximum(rois[..., 3] - rois[..., 1], 0))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, len(strides) - 1).astype(jnp.int32)   # (B, R)
    inv_stride = jnp.take(
        jnp.asarray([1.0 / s for s in strides], jnp.float32), lvl)
    w_l = jnp.take(jnp.asarray(ws, jnp.float32), lvl)
    h_l = jnp.take(jnp.asarray(hs, jnp.float32), lvl)
    w_li = jnp.take(jnp.asarray(ws, jnp.int32), lvl)
    off_l = jnp.take(jnp.asarray(offs, jnp.int32), lvl)
    off_l = off_l + (jnp.arange(b, dtype=jnp.int32) * img_stride)[:, None]

    offset = 0.5 if aligned else 0.0
    x1 = rois[..., 0] * inv_stride - offset
    y1 = rois[..., 1] * inv_stride - offset
    roi_w = (rois[..., 2] - rois[..., 0]) * inv_stride
    roi_h = (rois[..., 3] - rois[..., 1]) * inv_stride
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    # sample positions, bin-major: (B, R, o·sr)
    grid = (jnp.arange(s_out, dtype=jnp.float32) + 0.5) / sr
    pos_x = x1[..., None] + grid * (roi_w / out_size)[..., None]
    pos_y = y1[..., None] + grid * (roi_h / out_size)[..., None]
    x0, x1i, wx0, wx1 = _tap_coords(pos_x, w_l[..., None])
    y0, y1i, wy0, wy1 = _tap_coords(pos_y, h_l[..., None])

    # flat row bases (B, R, S) and x offsets; combine into 4 tap-id grids
    base0 = off_l[..., None] + y0 * w_li[..., None]
    base1 = off_l[..., None] + y1i * w_li[..., None]

    def chunked(arr, chunk):
        pad = (-n) % chunk
        if pad:
            arr = jnp.pad(arr, ((0, 0), (0, pad)) +
                          ((0, 0),) * (arr.ndim - 2))
        return arr.reshape(-1, chunk, *arr.shape[2:])

    chunk = min(roi_chunk, n)
    parts = [chunked(a, chunk) for a in
             (base0, base1, x0, x1i, wy0, wy1, wx0, wx1)]

    def one_chunk(carry, args):
        b0, b1, cx0, cx1, cwy0, cwy1, cwx0, cwx1 = args
        acc = None
        for rows, wy in ((b0, cwy0), (b1, cwy1)):
            for cols, wx in ((cx0, cwx0), (cx1, cwx1)):
                idx = rows[:, :, None] + cols[:, None, :]      # (ch, S, S)
                wgt = (wy[:, :, None] * wx[:, None, :]).astype(dtype)
                v = jnp.take(flat, idx.reshape(-1), axis=0)
                v = v.reshape(idx.shape + (c,)) * wgt[..., None]
                acc = v if acc is None else acc + v
        # average the sr×sr samples of each bin: (ch, o, sr, o, sr, C)
        acc = acc.reshape(chunk, out_size, sr, out_size, sr, c)
        return carry, acc.mean(axis=(2, 4)).astype(dtype)

    _, out = jax.lax.scan(one_chunk, 0, parts)
    # (B·nch, chunk, …) → (B, nch·chunk, …): image-major, plain reshape
    return out.reshape(b, -1, out_size, out_size, c)[:, :n]
