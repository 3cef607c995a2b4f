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
