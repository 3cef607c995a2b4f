"""Pallas TPU kernel for RoIAlign.

The XLA path (`ops/roi_align.py`) materializes a (R, H, out, C) intermediate
in HBM between the two interpolation matmuls (~1.9 GB at bench shapes —
bandwidth-bound, ~15 ms). This kernel fuses both matmuls per RoI inside
VMEM: for each grid cell (image, roi-chunk, channel-slab) the feature slab
loads once and every RoI's

    t = Wy[r] @ feat              (o, W*Cs)
    out[r] = Wx[r] @ t'           (o, o*Cs)

stays on-chip. Interpolation weights are computed by XLA outside (tiny), so
the kernel is two `jnp.dot`s per RoI on MXU-aligned shapes.

Grid: (B, R/chunk, C/c_slab). VMEM per cell ≈ feat slab (H·W·Cs) +
out block (chunk·o²·Cs) + per-roi temporaries.

Measured (v5e, bench shapes 4×512 rois, 32×64×2048 bf16): ~27 ms vs ~14 ms
for the XLA separable path — the per-RoI M=7 dots underutilize the MXU and
the roi loop serializes, so the XLA path remains the DEFAULT
(`models.roi_heads.standard_roi_head.extract_roi_feats`). Kept as the
starting point for a batched-RoI kernel revision; numerically validated
against the XLA path (interpret-mode test in tests/test_models).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import _axis_weights


def _kernel(feat_ref, wy_ref, wx_ref, out_ref, *, chunk: int, out_size: int):
    """Blocks: feat (1, H, W, Cs) · wy (1, 1, chunk, o, H) ·
    wx (1, 1, chunk, o, W) → out (1, 1, chunk, o, o, Cs)."""
    _, h, w, cs = feat_ref.shape
    o = out_size
    feat = feat_ref[0].reshape(h, w * cs)

    def body(r, _):
        # y-interp: (o, H) @ (H, W*Cs) → (o, W*Cs)
        t = jnp.dot(wy_ref[0, 0, r], feat,
                    preferred_element_type=jnp.float32)
        # x-interp: (o, W) @ (W, o*Cs) → (o, o*Cs)
        t = t.reshape(o, w, cs).transpose(1, 0, 2).reshape(w, o * cs)
        res = jnp.dot(wx_ref[0, 0, r].astype(jnp.float32), t,
                      preferred_element_type=jnp.float32)
        # res[xbin, ybin*cs] — transpose back to (ybin, xbin, cs)
        out_ref[0, 0, r] = res.reshape(o, o, cs).transpose(1, 0, 2).astype(
            out_ref.dtype)
        return ()

    jax.lax.fori_loop(0, chunk, body, ())


@partial(jax.jit, static_argnames=('out_size', 'sampling_ratio', 'aligned',
                                   'roi_chunk', 'c_slab', 'interpret'))
def roi_align_pallas(feats: jnp.ndarray,
                     rois: jnp.ndarray,
                     spatial_scale: float,
                     out_size: int = 7,
                     sampling_ratio: int = 2,
                     aligned: bool = True,
                     roi_chunk: int = 64,
                     c_slab: int = 512,
                     interpret: bool = False) -> jnp.ndarray:
    """Batched RoIAlign: (B, H, W, C) × (B, R, 4) → (B, R, o, o, C).

    Semantics identical to `ops.roi_align.batched_roi_align`.
    """
    b, h, w, c = feats.shape
    r = rois.shape[1]
    offset = 0.5 if aligned else 0.0
    scaled = rois * spatial_scale
    x1 = scaled[..., 0] - offset
    y1 = scaled[..., 1] - offset
    roi_w = scaled[..., 2] - scaled[..., 0]
    roi_h = scaled[..., 3] - scaled[..., 1]
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    def weights_for(lo, bins, axis_len):
        return jax.vmap(lambda l, s: _axis_weights(
            l, s, out_size, sampling_ratio, axis_len))(lo, bins)

    wx = weights_for(x1, roi_w / out_size, w)       # (B, R, o, W)
    wy = weights_for(y1, roi_h / out_size, h)       # (B, R, o, H)
    wx = wx.astype(feats.dtype)
    wy = wy.astype(feats.dtype)

    chunk = min(roi_chunk, r)
    pad_r = (-r) % chunk
    if pad_r:
        wx = jnp.pad(wx, ((0, 0), (0, pad_r), (0, 0), (0, 0)))
        wy = jnp.pad(wy, ((0, 0), (0, pad_r), (0, 0), (0, 0)))
    n_chunks = (r + pad_r) // chunk
    wx = wx.reshape(b, n_chunks, chunk, out_size, w)
    wy = wy.reshape(b, n_chunks, chunk, out_size, h)

    cs = min(c_slab, c)
    assert c % cs == 0, 'channel count must divide c_slab'
    n_slabs = c // cs

    out = pl.pallas_call(
        partial(_kernel, chunk=chunk, out_size=out_size),
        grid=(b, n_chunks, n_slabs),
        in_specs=[
            pl.BlockSpec((1, h, w, cs), lambda bi, ri, ci: (bi, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, out_size, h),
                         lambda bi, ri, ci: (bi, ri, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, out_size, w),
                         lambda bi, ri, ci: (bi, ri, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, chunk, out_size, out_size, cs),
            lambda bi, ri, ci: (bi, ri, 0, 0, 0, ci),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_chunks, chunk, out_size, out_size, c), feats.dtype),
        interpret=interpret,
    )(feats, wy, wx)
    return out.reshape(b, n_chunks * chunk, out_size, out_size, c)[:, :r]


# ---------------------------------------------------------------------------
# v2: batched-RoI kernel (VERDICT r1 item 3). The v1 kernel above loops
# per-RoI with M=7 dots; here the x-interp is ONE (chunk·o, W) @ (W, Cs) dot
# per feature row (M=224+ — MXU-shaped) fused with a per-oy VPU row-scaled
# accumulation, all inside VMEM: the (R, H, o, C) intermediate never
# touches HBM. Backward is a mirrored kernel (grad wrt feat only — RoIs
# are stop-gradient proposals on every caller path, matching mmcv
# RoIAlign's non-differentiable-in-rois CUDA usage).
#
# Measured (v5e, bench shapes 8x512 rois, 32x64x2048 bf16):
#   fwd 35.8 ms / bwd 14.7 ms at (chunk=32, cs=512)  vs  XLA separable
#   fwd 19.1 ms / bwd 12.9 ms. The per-instance serial h-loop leaves the
#   MXU latency-bound (16k small dots); larger tiles exceed VMEM (Mosaic
#   compile fails above chunk*cs ~ 16k). The XLA path therefore remains
#   the DEFAULT; this kernel is kept as the structured starting point for
#   a pipelined revision and is interpret-mode parity-tested
#   (tests/test_models/test_roi_align_fused.py).
# ---------------------------------------------------------------------------


def _fwd_kernel(feat_ref, wye_ref, wx_ref, out_ref, *, chunk, out_size):
    """Blocks: feat (1, H, W, Cs) · wye (1, 1, H, o, chunk*o) ·
    wx (1, 1, chunk*o, W) → out (1, 1, o, chunk*o, Cs).
    One loop over feature rows: x-interp dot, then per-oy row-scaled
    accumulation — no cross-row scratch, all operands 2-D (sublane, lane)
    so Mosaic never faces reshapes/dynamic lane slicing."""
    _, h, w, cs = feat_ref.shape
    o = out_size
    wx2d = wx_ref[0, 0]                                  # (chunk*o, W)

    def body(hi, accs):
        t_h = jnp.dot(wx2d, feat_ref[0, hi],
                      preferred_element_type=jnp.float32)  # (chunk*o, Cs)
        return tuple(
            accs[oy] + wye_ref[0, 0, hi, oy].astype(
                jnp.float32)[:, None] * t_h
            for oy in range(o))

    zero = jnp.zeros((chunk * o, cs), jnp.float32)
    accs = jax.lax.fori_loop(0, h, body, (zero,) * o)
    for oy in range(o):
        out_ref[0, 0, oy] = accs[oy].astype(out_ref.dtype)


def _bwd_kernel(g_ref, wye_ref, wx_ref, gf_ref, acc_ref, *, chunk,
                out_size, n_chunks):
    """Blocks: g (1, 1, o, chunk*o, Cs) [oy-major like fwd out] ·
    wye (1, 1, H, o, chunk*o) · wx as fwd → grad_feat (1, H, W, Cs),
    accumulated across the roi-chunk grid axis (innermost)."""
    _, h, w, cs = gf_ref.shape
    o = out_size
    ri = pl.program_id(2)
    wxT = wx_ref[0, 0].astype(jnp.float32)               # (W, chunk*o)

    @pl.when(ri == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def per_row(hi, _):
        # u[(r,ox), c] = sum_oy wye[hi, oy, (r,ox)] * g[oy, (r,ox), c] —
        # unrolled over oy as 2D row scalings (see fwd ypass note)
        u = jnp.zeros((chunk * o, cs), jnp.float32)
        for oy in range(o):
            u = u + wye_ref[0, 0, hi, oy].astype(
                jnp.float32)[:, None] * g_ref[0, 0, oy].astype(jnp.float32)
        acc_ref[hi] += jnp.dot(wxT, u,
                               preferred_element_type=jnp.float32)
        return ()

    jax.lax.fori_loop(0, h, per_row, ())

    @pl.when(ri == n_chunks - 1)
    def _flush():
        gf_ref[0] = acc_ref[:].astype(gf_ref.dtype)


def _prep_weights(rois, spatial_scale, out_size, sampling_ratio, aligned,
                  h, w, chunk, dtype):
    offset = 0.5 if aligned else 0.0
    scaled = rois * spatial_scale
    x1 = scaled[..., 0] - offset
    y1 = scaled[..., 1] - offset
    roi_w = scaled[..., 2] - scaled[..., 0]
    roi_h = scaled[..., 3] - scaled[..., 1]
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    wx = jax.vmap(lambda l, s: _axis_weights(
        l, s, out_size, sampling_ratio, w))(x1, roi_w / out_size)
    wy = jax.vmap(lambda l, s: _axis_weights(
        l, s, out_size, sampling_ratio, h))(y1, roi_h / out_size)
    b, r = rois.shape[:2]
    pad_r = (-r) % chunk
    if pad_r:
        wx = jnp.pad(wx, ((0, 0), (0, pad_r), (0, 0), (0, 0)))
        wy = jnp.pad(wy, ((0, 0), (0, pad_r), (0, 0), (0, 0)))
    n_chunks = (r + pad_r) // chunk
    wx = wx.reshape(b, n_chunks, chunk, out_size, w).astype(dtype)
    wy = wy.reshape(b, n_chunks, chunk, out_size, h).astype(dtype)
    return wx, wy, n_chunks


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def roi_align_fused(feats, rois, spatial_scale, out_size=7,
                    sampling_ratio=2, aligned=True, roi_chunk=64,
                    c_slab=256, interpret=False):
    """Batched fused RoIAlign: (B,H,W,C) × (B,R,4) → (B,R,o,o,C).

    Numerics match `ops.roi_align.batched_roi_align` (same `_axis_weights`);
    gradient flows to `feats` only (RoIs are non-differentiable, as in the
    reference CUDA op's usage — proposals are detached upstream,
    `mmdet/models/roi_heads/standard_roi_head.py` forward_train).
    """
    out, _ = _fused_fwd(feats, rois, spatial_scale, out_size,
                        sampling_ratio, aligned, roi_chunk, c_slab,
                        interpret)
    return out


def _fused_fwd(feats, rois, spatial_scale, out_size, sampling_ratio,
               aligned, roi_chunk, c_slab, interpret=False):
    b, h, w, c = feats.shape
    r = rois.shape[1]
    chunk = min(roi_chunk, r)
    wx, wy, n_chunks = _prep_weights(rois, spatial_scale, out_size,
                                     sampling_ratio, aligned, h, w, chunk,
                                     feats.dtype)
    cs = min(c_slab, c)
    assert c % cs == 0
    n_slabs = c // cs
    o = out_size
    # expand wy (B,nc,chunk,o,H) → row-scale layout (B,nc,H,o,chunk*o):
    # wye[..., h, oy, r*o + ox] = wy[..., r, oy, h] for every ox
    wye = jnp.repeat(wy.transpose(0, 1, 4, 3, 2), o, axis=-1)
    # collapse (chunk, o) OUTSIDE the kernel — Mosaic cannot reshape
    # across the sublane boundary in-kernel
    wx = wx.reshape(b, n_chunks, chunk * o, w)

    out = pl.pallas_call(
        partial(_fwd_kernel, chunk=chunk, out_size=o),
        grid=(b, n_slabs, n_chunks),
        in_specs=[
            pl.BlockSpec((1, h, w, cs), lambda bi, ci, ri: (bi, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, o, chunk * o),
                         lambda bi, ci, ri: (bi, ri, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk * o, w),
                         lambda bi, ci, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, o, chunk * o, cs),
            lambda bi, ci, ri: (bi, ri, 0, 0, ci),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_chunks, o, chunk * o, c),
                                       feats.dtype),
        interpret=interpret,
    )(feats, wye, wx)
    # (B, nc, oy, chunk*ox, C) → (B, R, oy, ox, C)
    out = out.reshape(b, n_chunks, o, chunk, o, c).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, n_chunks * chunk, o, o, c)[:, :r]
    # residuals must be jax values; a zero (H, W) array carries the feat
    # shape/dtype statically through its aval (b and C are recoverable
    # from g/rois in the bwd rule)
    shape_token = jnp.zeros((h, w), feats.dtype)
    return out, (rois, shape_token)


def _fused_bwd(spatial_scale, out_size, sampling_ratio, aligned, roi_chunk,
               c_slab, interpret, res, g):
    rois, shape_token = res
    h, w = shape_token.shape
    feat_dtype = shape_token.dtype
    b, r = rois.shape[:2]
    c = g.shape[-1]
    chunk = min(roi_chunk, r)
    wx, wy, n_chunks = _prep_weights(rois, spatial_scale, out_size,
                                     sampling_ratio, aligned, h, w, chunk,
                                     feat_dtype)
    cs = min(c_slab, c)
    n_slabs = c // cs
    o = out_size
    pad_r = n_chunks * chunk - r
    if pad_r:
        g = jnp.pad(g, ((0, 0), (0, pad_r), (0, 0), (0, 0), (0, 0)))
    # (B, R, oy, ox, C) → fwd-out layout (B, nc, oy, chunk*ox, C)
    g = g.reshape(b, n_chunks, chunk, o, o, c).transpose(0, 1, 3, 2, 4, 5)
    g = g.reshape(b, n_chunks, o, chunk * o, c).astype(feat_dtype)
    wye = jnp.repeat(wy.transpose(0, 1, 4, 3, 2), o, axis=-1)
    wxT = wx.reshape(b, n_chunks, chunk * o, w).transpose(0, 1, 3, 2)

    gf = pl.pallas_call(
        partial(_bwd_kernel, chunk=chunk, out_size=o, n_chunks=n_chunks),
        grid=(b, n_slabs, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, o, chunk * o, cs),
                         lambda bi, ci, ri: (bi, ri, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, o, chunk * o),
                         lambda bi, ci, ri: (bi, ri, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, chunk * o),
                         lambda bi, ci, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cs),
                               lambda bi, ci, ri: (bi, 0, 0, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), feat_dtype),
        scratch_shapes=[pltpu.VMEM((h, w, cs), jnp.float32)],
        interpret=interpret,
    )(g, wye, wxT)
    return gf, jnp.zeros_like(rois)


roi_align_fused.defvjp(
    lambda feats, rois, *a: _fused_fwd(feats, rois, *a),
    _fused_bwd)


# ---------------------------------------------------------------------------
# v3: one-dot-per-instance kernel. v2's weakness was the serial per-row
# loop (32 small dots per grid cell → MXU latency-bound). Here the feature
# block is pre-arranged SLAB-MAJOR outside the kernel —
# (B, n_slabs, W, H*Cs) — so the whole x-interp for a roi-chunk × c-slab
# is ONE (chunk·o, W) @ (W, H*Cs) matmul, and the y-interp is an unrolled
# set of static lane-sliced row-scale accumulations (VPU). Backward
# mirrors it with a single K=chunk·o dot per cell.
#
# Measured on v5e (bench shapes, isolation probe in git history): the
# x-pass dot alone covers the whole step in 4.0 ms — but the VPU y-pass
# adds ~26 ms (f32 accumulators spill to VMEM: 7x(224,128) carried across
# 32 unrolled FMAs exceeds the vector register file), and a repeat/tile
# "fused" variant is worse (relayout ops). Net 35 ms vs XLA separable's
# 19 ms. CONCLUSION: RoIAlign's y-interp has a per-RoI contraction
# (K=32·roi-diagonal) that maps to neither MXU (block-diag waste or
# latency-bound small dots) nor VPU (spill-bound) better than XLA's fused
# elementwise pipeline; the XLA path stays default. Both kernels remain
# interpret-parity-tested as documented design probes.
# ---------------------------------------------------------------------------


def _v3_fwd_kernel(featp_ref, wye_ref, wx_ref, out_ref, *, chunk, out_size,
                   h, cs):
    """Blocks: featp (1, 1, W, H*Cs) · wye (1, 1, H, o, chunk*o) ·
    wx (1, 1, chunk*o, W) → out (1, 1, o, chunk*o, Cs)."""
    o = out_size
    t = jnp.dot(wx_ref[0, 0], featp_ref[0, 0],
                preferred_element_type=jnp.float32)    # (chunk*o, H*Cs)
    for oy in range(o):
        acc = jnp.zeros((chunk * o, cs), jnp.float32)
        for hi in range(h):
            w_h = wye_ref[0, 0, hi, oy].astype(jnp.float32)
            acc = acc + w_h[:, None] * t[:, hi * cs:(hi + 1) * cs]
        out_ref[0, 0, oy] = acc.astype(out_ref.dtype)


def _v3_bwd_kernel(g_ref, wye_ref, wx_ref, gf_ref, acc_ref, *, chunk,
                   out_size, h, cs, n_chunks):
    """g (1, 1, o, chunk*o, Cs) → grad featp (1, W, 1, H*Cs), accumulated
    over the roi-chunk grid axis."""
    o = out_size
    ri = pl.program_id(2)

    @pl.when(ri == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # u[(r,ox), (h,c)] = sum_oy wye[h, oy, (r,ox)] * g[oy, (r,ox), c];
    # built as a lane-concat of per-h columns (in-kernel scatter into a
    # value is not lowerable)
    cols = []
    for hi in range(h):
        col = jnp.zeros((chunk * o, cs), jnp.float32)
        for oy in range(o):
            w_h = wye_ref[0, 0, hi, oy].astype(jnp.float32)
            col = col + w_h[:, None] * g_ref[0, 0, oy].astype(jnp.float32)
        cols.append(col)
    u = jnp.concatenate(cols, axis=1)
    acc_ref[:] += jnp.dot(wx_ref[0, 0].T.astype(jnp.float32), u,
                          preferred_element_type=jnp.float32)

    @pl.when(ri == n_chunks - 1)
    def _flush():
        gf_ref[0, 0] = acc_ref[:].astype(gf_ref.dtype)


def _pack_slab_major(feats, cs):
    """(B, H, W, C) → (B, n_slabs, W, H*Cs): slab-major so each c-slab's
    (W, H*Cs) panel is one contiguous (sublane, lane)-aligned block."""
    b, h, w, c = feats.shape
    n_slabs = c // cs
    x = feats.transpose(0, 2, 1, 3)                 # (B, W, H, C)
    x = x.reshape(b, w, h, n_slabs, cs)
    x = x.transpose(0, 3, 1, 2, 4)                  # (B, S, W, H, Cs)
    return x.reshape(b, n_slabs, w, h * cs)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def roi_align_fused_v3(feats, rois, spatial_scale, out_size=7,
                       sampling_ratio=2, aligned=True, roi_chunk=64,
                       c_slab=128, interpret=False):
    """One-dot-per-instance fused RoIAlign (see header above)."""
    out, _ = _v3_fwd(feats, rois, spatial_scale, out_size, sampling_ratio,
                     aligned, roi_chunk, c_slab, interpret)
    return out


def _v3_fwd(feats, rois, spatial_scale, out_size, sampling_ratio, aligned,
            roi_chunk, c_slab, interpret=False):
    b, h, w, c = feats.shape
    r = rois.shape[1]
    chunk = min(roi_chunk, r)
    wx, wy, n_chunks = _prep_weights(rois, spatial_scale, out_size,
                                     sampling_ratio, aligned, h, w, chunk,
                                     feats.dtype)
    cs = min(c_slab, c)
    assert c % cs == 0
    n_slabs = c // cs
    o = out_size
    wye = jnp.repeat(wy.transpose(0, 1, 4, 3, 2), o, axis=-1)
    wx2 = wx.reshape(b, n_chunks, chunk * o, w)
    featp = _pack_slab_major(feats, cs)

    out = pl.pallas_call(
        partial(_v3_fwd_kernel, chunk=chunk, out_size=o, h=h, cs=cs),
        grid=(b, n_slabs, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, w, h * cs),
                         lambda bi, ci, ri: (bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, o, chunk * o),
                         lambda bi, ci, ri: (bi, ri, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk * o, w),
                         lambda bi, ci, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, o, chunk * o, cs),
            lambda bi, ci, ri: (bi, ri, 0, 0, ci),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_chunks, o, chunk * o, c),
                                       feats.dtype),
        interpret=interpret,
    )(featp, wye, wx2)
    out = out.reshape(b, n_chunks, o, chunk, o, c).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, n_chunks * chunk, o, o, c)[:, :r]
    shape_token = jnp.zeros((h, w), feats.dtype)
    return out, (rois, shape_token)


def _v3_bwd(spatial_scale, out_size, sampling_ratio, aligned, roi_chunk,
            c_slab, interpret, res, g):
    rois, shape_token = res
    h, w = shape_token.shape
    feat_dtype = shape_token.dtype
    b, r = rois.shape[:2]
    c = g.shape[-1]
    chunk = min(roi_chunk, r)
    wx, wy, n_chunks = _prep_weights(rois, spatial_scale, out_size,
                                     sampling_ratio, aligned, h, w, chunk,
                                     feat_dtype)
    cs = min(c_slab, c)
    n_slabs = c // cs
    o = out_size
    pad_r = n_chunks * chunk - r
    if pad_r:
        g = jnp.pad(g, ((0, 0), (0, pad_r), (0, 0), (0, 0), (0, 0)))
    g = g.reshape(b, n_chunks, chunk, o, o, c).transpose(0, 1, 3, 2, 4, 5)
    g = g.reshape(b, n_chunks, o, chunk * o, c).astype(feat_dtype)
    wye = jnp.repeat(wy.transpose(0, 1, 4, 3, 2), o, axis=-1)
    wx2 = wx.reshape(b, n_chunks, chunk * o, w)

    gfp = pl.pallas_call(
        partial(_v3_bwd_kernel, chunk=chunk, out_size=o, h=h, cs=cs,
                n_chunks=n_chunks),
        grid=(b, n_slabs, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, o, chunk * o, cs),
                         lambda bi, ci, ri: (bi, ri, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, o, chunk * o),
                         lambda bi, ci, ri: (bi, ri, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk * o, w),
                         lambda bi, ci, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, w, h * cs),
                               lambda bi, ci, ri: (bi, ci, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_slabs, w, h * cs), feat_dtype),
        scratch_shapes=[pltpu.VMEM((w, h * cs), jnp.float32)],
        interpret=interpret,
    )(g, wye, wx2)
    # unpack slab-major back to (B, H, W, C)
    gf = gfp.reshape(b, n_slabs, w, h, cs).transpose(0, 3, 2, 1, 4)
    gf = gf.reshape(b, h, w, c)
    return gf, jnp.zeros_like(rois)


roi_align_fused_v3.defvjp(
    lambda feats, rois, *a: _v3_fwd(feats, rois, *a),
    _v3_bwd)


# ---------------------------------------------------------------------------
# v4: BOTH passes on the MXU. v3 proved the stacked x-pass is one cheap dot
# (4 ms across the whole step) and that the y-pass dies on the VPU (f32
# accumulator spill). v4 makes the y-pass a single BLOCK-DIAGONAL dot per
# cell: after the x-dot produces t[(r,ox),(h,c)], a per-RoI static-slice
# relayout assembles t2[(r,h),(ox,c)] in VMEM scratch, and
# out = Wy_blk @ t2 with Wy_blk[(r,oy),(r',h)] = δ(r,r')·wy[r,oy,h] built
# OUTSIDE by XLA (tiny einsum-with-eye). The block-diagonal K-dim waste is
# chunk× on a contraction whose useful FLOPs are ~50 GF/step — irrelevant
# next to the HBM traffic this kernel avoids (the XLA path's (R,H,o,C)
# intermediate, ~8.8 GB/step round-trip at bench shapes).
#
# MEASURED (v5e, bench shapes 8×512 rois, 32×64×2048 bf16): fwd 31–38 ms,
# bwd kernel ~24 ms (chunk 8–16, cs 256–512) vs XLA separable 18.7 / 12.7.
# With both contractions now single MXU dots per cell, the remaining cost
# is the per-RoI (o,H,Cs)→(H,o·Cs) relayout itself: ~7 µs/RoI of VMEM
# shuffles, which retro-explains v1's 27 ms too (its "small dots" were
# never the bottleneck). Four designs (v1 loop-dots, v2 row-dot+VPU,
# v3 one-dot+VPU, v4 all-MXU+relayout) bracket the space: RoIAlign's
# bilinear y-contraction needs a per-RoI lane→sublane exchange that Mosaic
# cannot express cheaply, while XLA's fused elementwise pipeline overlaps
# it with the HBM streaming it already pays for. The XLA separable path
# (ops/roi_align.py) therefore remains the production default — it sits
# within ~1.7× of its own HBM bound.
# ---------------------------------------------------------------------------


def _v4_fwd_kernel(featp_ref, wyblk_ref, wx_ref, out_ref, t2_ref, *,
                   chunk, out_size, h, cs):
    """Blocks: featp (1,1,W,H·Cs) · wyblk (1,1,chunk·o,chunk·H) ·
    wx (1,1,chunk·o,W) → out (1,1,1,chunk·o,o·Cs);
    scratch t2 (chunk·H, o·Cs)."""
    o = out_size
    t = jnp.dot(wx_ref[0, 0], featp_ref[0, 0],
                preferred_element_type=jnp.float32)     # (chunk·o, H·Cs)
    t = t.astype(featp_ref.dtype)
    for r in range(chunk):
        tr = t[r * o:(r + 1) * o, :].reshape(o, h, cs)
        t2_ref[r * h:(r + 1) * h, :] = tr.transpose(1, 0, 2).reshape(
            h, o * cs)
    out_ref[0, 0, 0] = jnp.dot(
        wyblk_ref[0, 0], t2_ref[:],
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _v4_bwd_kernel(g_ref, wyblk_ref, wx_ref, gf_ref, acc_ref, dt_ref, *,
                   chunk, out_size, h, cs, n_chunks):
    """g (1,1,1,chunk·o,o·Cs) → grad featp (1,1,W,H·Cs) accumulated over
    the roi-chunk grid axis; scratch dt (chunk·o, H·Cs)."""
    o = out_size
    ri = pl.program_id(2)

    @pl.when(ri == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = g_ref[0, 0, 0]                                  # (chunk·o, o·Cs)
    # dt2 = Wy_blk^T @ g → (chunk·H, o·Cs)
    dt2 = jax.lax.dot_general(
        wyblk_ref[0, 0], g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(g.dtype)
    # inverse relayout: dt[(r,ox),(h,c)] from dt2[(r,h),(ox,c)]
    for r in range(chunk):
        dr = dt2[r * h:(r + 1) * h, :].reshape(h, o, cs)
        dt_ref[r * o:(r + 1) * o, :] = dr.transpose(1, 0, 2).reshape(
            o, h * cs)
    # dfeatp += wx^T @ dt → (W, H·Cs)
    acc_ref[:] += jax.lax.dot_general(
        wx_ref[0, 0], dt_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ri == n_chunks - 1)
    def _flush():
        gf_ref[0, 0] = acc_ref[:].astype(gf_ref.dtype)


def _v4_wyblk(wy, chunk):
    """(B, K, chunk, o, H) → block-diagonal (B, K, chunk·o, chunk·H)."""
    b, k, _, o, h = wy.shape
    eye = jnp.eye(chunk, dtype=wy.dtype)
    blk = jnp.einsum('bkrih,rs->bkrish', wy, eye)
    return blk.reshape(b, k, chunk * o, chunk * h)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def roi_align_fused_v4(feats, rois, spatial_scale, out_size=7,
                       sampling_ratio=2, aligned=True, roi_chunk=16,
                       c_slab=256, interpret=False):
    """All-MXU fused RoIAlign (see v4 header above)."""
    out, _ = _v4_fwd(feats, rois, spatial_scale, out_size, sampling_ratio,
                     aligned, roi_chunk, c_slab, interpret)
    return out


def _v4_fwd(feats, rois, spatial_scale, out_size, sampling_ratio, aligned,
            roi_chunk, c_slab, interpret=False):
    b, h, w, c = feats.shape
    r = rois.shape[1]
    chunk = min(roi_chunk, r)
    wx, wy, n_chunks = _prep_weights(rois, spatial_scale, out_size,
                                     sampling_ratio, aligned, h, w, chunk,
                                     feats.dtype)
    cs = min(c_slab, c)
    assert c % cs == 0
    n_slabs = c // cs
    o = out_size
    wyblk = _v4_wyblk(wy, chunk)
    wx2 = wx.reshape(b, n_chunks, chunk * o, w)
    featp = _pack_slab_major(feats, cs)

    out = pl.pallas_call(
        partial(_v4_fwd_kernel, chunk=chunk, out_size=o, h=h, cs=cs),
        grid=(b, n_slabs, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, w, h * cs),
                         lambda bi, ci, ri: (bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk * o, chunk * h),
                         lambda bi, ci, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk * o, w),
                         lambda bi, ci, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, chunk * o, o * cs),
            lambda bi, ci, ri: (bi, ri, ci, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_chunks, n_slabs, chunk * o, o * cs), feats.dtype),
        scratch_shapes=[pltpu.VMEM((chunk * h, o * cs), feats.dtype)],
        interpret=interpret,
    )(featp, wyblk, wx2)
    # (B, K, S, (r,oy), (ox,cs)) → (B, R, oy, ox, C)
    out = out.reshape(b, n_chunks, n_slabs, chunk, o, o, cs)
    out = out.transpose(0, 1, 3, 4, 5, 2, 6)
    out = out.reshape(b, n_chunks * chunk, o, o, c)[:, :r]
    shape_token = jnp.zeros((h, w), feats.dtype)
    return out, (rois, shape_token)


def _v4_bwd(spatial_scale, out_size, sampling_ratio, aligned, roi_chunk,
            c_slab, interpret, res, g):
    rois, shape_token = res
    h, w = shape_token.shape
    feat_dtype = shape_token.dtype
    b, r = rois.shape[:2]
    c = g.shape[-1]
    chunk = min(roi_chunk, r)
    wx, wy, n_chunks = _prep_weights(rois, spatial_scale, out_size,
                                     sampling_ratio, aligned, h, w, chunk,
                                     feat_dtype)
    cs = min(c_slab, c)
    n_slabs = c // cs
    o = out_size
    pad_r = n_chunks * chunk - r
    if pad_r:
        g = jnp.pad(g, ((0, 0), (0, pad_r), (0, 0), (0, 0), (0, 0)))
    # (B, R, oy, ox, C) → (B, K, S, (r,oy), (ox,cs)) [fwd out layout]
    g = g.reshape(b, n_chunks, chunk, o, o, n_slabs, cs)
    g = g.transpose(0, 1, 5, 2, 3, 4, 6)
    g = g.reshape(b, n_chunks, n_slabs, chunk * o, o * cs).astype(feat_dtype)
    wyblk = _v4_wyblk(wy, chunk)
    wx2 = wx.reshape(b, n_chunks, chunk * o, w)

    gfp = pl.pallas_call(
        partial(_v4_bwd_kernel, chunk=chunk, out_size=o, h=h, cs=cs,
                n_chunks=n_chunks),
        grid=(b, n_slabs, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, 1, chunk * o, o * cs),
                         lambda bi, ci, ri: (bi, ri, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk * o, chunk * h),
                         lambda bi, ci, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk * o, w),
                         lambda bi, ci, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, w, h * cs),
                               lambda bi, ci, ri: (bi, ci, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_slabs, w, h * cs), feat_dtype),
        scratch_shapes=[pltpu.VMEM((w, h * cs), jnp.float32),
                        pltpu.VMEM((chunk * o, h * cs), feat_dtype)],
        interpret=interpret,
    )(g, wyblk, wx2)
    gf = gfp.reshape(b, n_slabs, w, h, cs).transpose(0, 3, 2, 1, 4)
    gf = gf.reshape(b, h, w, c)
    return gf, jnp.zeros_like(rois)


roi_align_fused_v4.defvjp(
    lambda feats, rois, *a: _v4_fwd(feats, rois, *a),
    _v4_bwd)


# ---------------------------------------------------------------------------
# Multi-level (FPN) fused RoIAlign.
#
# The FPN geometry is the OPPOSITE of the DC5 probes above: large H×W
# (128×256 at bench shapes), small C (256), and 4 levels each aligned for
# every roi with a level one-hot folded into the x weights (static shapes,
# reference `single_level_roi_extractor.py:10` map_roi_levels). The XLA
# separable path materializes the (R, o, H, C) x-interp intermediate in HBM
# (~3.8 GB/step at bench shapes, measured 14.8 ms fwd with a pre-transposed
# rhs, 18.0 ms without). Here the x-dot runs per (image, roi-chunk, h-block)
# grid cell — (cr·o, W)@(W, hb·C), MXU-friendly — and the y-interp
# contracts the h-block immediately on the VPU into a per-cell f32 VMEM
# accumulator, so the intermediate never leaves the chip. The y-pass is a
# 7-way unrolled broadcast-FMA into a scratch REF (the v3 probe's register
# spill came from carrying f32 accumulators as loop VALUES).
# ---------------------------------------------------------------------------


def _fpn_fwd_kernel(ftp_ref, wx_ref, wy_ref, out_ref, acc_ref, *,
                    cr, o, hb, c):
    """Blocks: ftp (1, W_p, hb, C) · wx (1, 1, cr·o, W_p) ·
    wy (1, 1, 1, cr, o·hb) → out (1, 1, cr·o, o·C); acc (o, cr, o·C) f32
    (oy-major so every slice/flush is tile-aligned)."""
    hbi = pl.program_id(2)

    @pl.when(hbi == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wp = ftp_ref.shape[1]
    ft = ftp_ref[0].reshape(wp, hb * c)
    t = jnp.dot(wx_ref[0, 0], ft, preferred_element_type=jnp.float32)
    t = t.reshape(cr, o, hb, c)                        # (r, ox, j, C)
    wy = wy_ref[0, 0, 0].reshape(cr, o, hb).astype(jnp.float32)
    for oy in range(o):
        # slice_in_dim, not int indexing — middle-axis int indexing
        # lowers to a >2D gather Mosaic rejects
        wyo = jax.lax.slice_in_dim(wy, oy, oy + 1, axis=1)   # (cr, 1, hb)
        contrib = jnp.sum(t * wyo[..., None], axis=2)
        acc_ref[oy] = acc_ref[oy] + contrib.reshape(cr, o * c)

    @pl.when(hbi == pl.num_programs(2) - 1)
    def _():
        out_ref[0, 0] = acc_ref[:].transpose(1, 0, 2).reshape(
            cr * o, o * c).astype(out_ref.dtype)


def _fpn_bwd_kernel(g_ref, wx_ref, wy_ref, gf_ref, acc_ref, *,
                    cr, o, hb, c):
    """Blocks: g (1, 1, cr·o, o·C) · wx (1, 1, cr·o, W_p) ·
    wy (1, 1, 1, cr, o·hb) → gf (1, 1, W_p, hb·C); acc (W_p, hb·C) f32."""
    rci = pl.program_id(2)

    @pl.when(rci == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = g_ref[0, 0].reshape(cr, o, o, c).astype(jnp.float32)
    wy = wy_ref[0, 0, 0].reshape(cr, o, hb).astype(jnp.float32)
    # u[r, ox, j, C] = sum_oy wy[r, oy, j] * g[r, oy, ox, C]
    u = None
    for oy in range(o):
        # slice_in_dim (see fwd kernel note); (r, ox, 1, C) * (r, 1, j, 1)
        go = jax.lax.slice_in_dim(g, oy, oy + 1, axis=1)     # (r, 1, ox, C)
        wyo = jax.lax.slice_in_dim(wy, oy, oy + 1, axis=1)   # (r, 1, hb)
        term = go.reshape(cr, o, 1, c) * wyo.reshape(cr, 1, hb, 1)
        u = term if u is None else u + term
    u = u.reshape(cr * o, hb * c).astype(g_ref.dtype)
    # dfeat_t[w, j·C] += wx^T @ u : contract the (cr·o) rows
    d = jax.lax.dot_general(wx_ref[0, 0], u, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] + d

    @pl.when(rci == pl.num_programs(2) - 1)
    def _():
        gf_ref[0, 0] = acc_ref[:].astype(gf_ref.dtype)


def _fpn_level_weights(rois, lvl, i, stride, out_size, sampling_ratio,
                       aligned, h, w, hp, wp, cr, hb, dtype):
    """Level-masked separable weights, padded to (H_p, W_p), chunked.

    wy is laid out (B, nch, n_hb, cr, o·hb) so each kernel block takes the
    FULL last two dims — Pallas TPU blocks must have last-two dims divisible
    by (8, 128) or equal to the array dims, and (o=7, hb) is neither."""
    from .roi_align import _roi_weights
    b, n = rois.shape[:2]
    wx, wy = jax.vmap(lambda r: _roi_weights(
        r, 1.0 / stride, out_size, sampling_ratio, aligned, h, w))(rois)
    wx = wx * (lvl == i).astype(wx.dtype)[..., None, None]
    pad_n = (-n) % cr
    wx = jnp.pad(wx, ((0, 0), (0, pad_n), (0, 0), (0, wp - w)))
    wy = jnp.pad(wy, ((0, 0), (0, pad_n), (0, 0), (0, hp - h)))
    nch = (n + pad_n) // cr
    o = out_size
    wx = wx.reshape(b, nch, cr * o, wp).astype(dtype)
    # (B, R, o, H_p) → (B, nch, cr, o, n_hb, hb) → (B, nch, n_hb, cr, o·hb)
    wy = wy.reshape(b, nch, cr, o, hp // hb, hb).transpose(0, 1, 4, 2, 3, 5)
    wy = wy.reshape(b, nch, hp // hb, cr, o * hb).astype(dtype)
    return wx, wy, nch


def _fpn_fused_fwd(feats, rois, strides, out_size, sampling_ratio, aligned,
                   finest_scale, roi_chunk, h_block, interpret=False):
    from .roi_align import roi_levels
    b, _, _, c = feats[0].shape
    n = rois.shape[1]
    o = out_size
    cr = min(roi_chunk if o <= 7 else max(8, roi_chunk // 4), n)
    hb = h_block
    lvl = roi_levels(rois, len(strides), finest_scale)
    total = None
    for i, (s, feat) in enumerate(zip(strides, feats)):
        h, w = feat.shape[1], feat.shape[2]
        hp = h + (-h) % hb
        wp = w + (-w) % 128
        wx, wy, nch = _fpn_level_weights(
            rois, lvl, i, s, o, sampling_ratio, aligned, h, w, hp, wp, cr,
            hb, feat.dtype)
        ftp = jnp.pad(feat, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        ftp = ftp.transpose(0, 2, 1, 3)                # (B, W_p, H_p, C)
        out = pl.pallas_call(
            partial(_fpn_fwd_kernel, cr=cr, o=o, hb=hb, c=c),
            grid=(b, nch, hp // hb),
            in_specs=[
                pl.BlockSpec((1, wp, hb, c),
                             lambda bi, ri, hi: (bi, 0, hi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, cr * o, wp),
                             lambda bi, ri, hi: (bi, ri, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, cr, o * hb),
                             lambda bi, ri, hi: (bi, ri, hi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, cr * o, o * c),
                                   lambda bi, ri, hi: (bi, ri, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, nch, cr * o, o * c),
                                           feat.dtype),
            scratch_shapes=[pltpu.VMEM((o, cr, o * c), jnp.float32)],
            interpret=interpret,
        )(ftp, wx, wy)
        out = out.reshape(b, nch * cr, o, o, c)[:, :n]
        total = out if total is None else total + out
    shape_tokens = tuple(jnp.zeros(f.shape[1:3], f.dtype) for f in feats)
    return total, (rois, shape_tokens)


def _fpn_fused_bwd(strides, out_size, sampling_ratio, aligned, finest_scale,
                   roi_chunk, h_block, interpret, res, g):
    from .roi_align import roi_levels
    rois, shape_tokens = res
    b, n = rois.shape[:2]
    c = g.shape[-1]
    o = out_size
    cr = min(roi_chunk if o <= 7 else max(8, roi_chunk // 4), n)
    hb = h_block
    lvl = roi_levels(rois, len(strides), finest_scale)
    pad_n = (-n) % cr
    gp = jnp.pad(g, ((0, 0), (0, pad_n)) + ((0, 0),) * 3)
    nch = (n + pad_n) // cr
    grads = []
    for i, (s, tok) in enumerate(zip(strides, shape_tokens)):
        h, w = tok.shape
        dtype = tok.dtype
        hp = h + (-h) % hb
        wp = w + (-w) % 128
        wx, wy, _ = _fpn_level_weights(
            rois, lvl, i, s, o, sampling_ratio, aligned, h, w, hp, wp, cr,
            hb, dtype)
        g2 = gp.reshape(b, nch, cr * o, o * c).astype(dtype)
        gfp = pl.pallas_call(
            partial(_fpn_bwd_kernel, cr=cr, o=o, hb=hb, c=c),
            grid=(b, hp // hb, nch),
            in_specs=[
                pl.BlockSpec((1, 1, cr * o, o * c),
                             lambda bi, hi, ri: (bi, ri, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, cr * o, wp),
                             lambda bi, hi, ri: (bi, ri, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, cr, o * hb),
                             lambda bi, hi, ri: (bi, ri, hi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, wp, hb * c),
                                   lambda bi, hi, ri: (bi, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, hp // hb, wp, hb * c),
                                           dtype),
            scratch_shapes=[pltpu.VMEM((wp, hb * c), jnp.float32)],
            interpret=interpret,
        )(g2, wx, wy)
        # (B, n_hb, W_p, hb·C) → (B, H, W, C)
        gf = gfp.reshape(b, hp // hb, wp, hb, c).transpose(0, 1, 3, 2, 4)
        gf = gf.reshape(b, hp, wp, c)[:, :h, :w]
        grads.append(gf)
    for tok in shape_tokens[len(strides):]:   # unused FPN levels (see v2)
        grads.append(jnp.zeros((b,) + tok.shape + (c,), tok.dtype))
    return tuple(grads), jnp.zeros_like(rois)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def roi_align_fpn_fused(feats, rois, strides=(4, 8, 16, 32), out_size=7,
                        sampling_ratio=2, aligned=True, finest_scale=56,
                        roi_chunk=64, h_block=8, interpret=False):
    """Multi-level fused RoIAlign: tuple of (B,H_l,W_l,C) × (B,R,4) →
    (B,R,o,o,C). Numerics match `ops.roi_align.batched_roi_align_fpn`
    (same `_roi_weights`, same level one-hot). Gradient flows to `feats`
    only — proposals are detached on every caller path."""
    out, _ = _fpn_fused_fwd(tuple(feats), rois, strides, out_size,
                            sampling_ratio, aligned, finest_scale,
                            roi_chunk, h_block, interpret)
    return out


roi_align_fpn_fused.defvjp(
    lambda feats, rois, *a: _fpn_fused_fwd(tuple(feats), rois, *a),
    _fpn_fused_bwd)


# ---------------------------------------------------------------------------
# FPN fused RoIAlign v2 — the lane-legal redesign (r5).
#
# v1's kernels die in Mosaic on the (cr, o·hb) → (cr, o, hb) shape cast:
# o·hb = 56 lanes cannot split into (7, 8) (minor not 128-aligned). v2
# removes EVERY in-kernel lane split:
# - the x-interp dot runs per h-row j against a 256-aligned lane slice of
#   the feature panel: (cr·o, W_p) @ (W_p, C) — 8 dots/cell instead of 1,
#   same total FLOPs;
# - the y-interp is an unrolled (oy, j) loop of column-scaled FMAs where
#   the wy weights arrive PRE-BROADCAST over ox as (o, cr·o, hb) blocks
#   (array layout (B, nch, n_hb, o, cr·o, hb) — last two dims are full
#   array dims, so the block spec is trivially legal);
# - the accumulator holds (o, cr·o, C) f32 (leading oy index; trailing two
#   dims tile-aligned) and flushes straight into an out block of the same
#   shape — the (r, oy, ox) disentangling happens outside the kernel.
# All operands the VPU/MXU touch are 2-D with ≥128-aligned (or full-array)
# lane extents. Cost vs v1: none in FLOPs; +o× wy HBM traffic (~1% of the
# feature traffic).
#
# Known limitation (measured r5): with f32 inputs at ≥512 rois the
# compiler stack-allocates the ENTIRE result in scoped vmem
# (25.7 MB > the 16 MB limit → remote-compile OOM); bf16 results fit
# (12.8 MB). The production default (`extract_roi_feats_fpn`) therefore
# engages this kernel only for bf16 feats; f32 callers keep the XLA
# separable path.
# ---------------------------------------------------------------------------


def _fpn2_fwd_kernel(ftp_ref, wx_ref, wyb_ref, out_ref, acc_ref, *,
                     cr, o, hb, c):
    """Blocks: ftp (1, W_p, hb·C) · wx (1, 1, cr·o, W_p) ·
    wyb (1, 1, 1, o, cr·o, hb) → out (1, 1, o, cr·o, C);
    acc (o, cr·o, C) f32."""
    hbi = pl.program_id(2)

    @pl.when(hbi == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wx = wx_ref[0, 0]
    for j in range(hb):
        ftj = ftp_ref[0][:, j * c:(j + 1) * c]          # (W_p, C)
        tj = jnp.dot(wx, ftj, preferred_element_type=jnp.float32)
        for oy in range(o):
            wcol = wyb_ref[0, 0, 0, oy][:, j:j + 1]     # (cr·o, 1)
            acc_ref[oy] = acc_ref[oy] + tj * wcol.astype(jnp.float32)

    @pl.when(hbi == pl.num_programs(2) - 1)
    def _():
        out_ref[0, 0] = acc_ref[:].astype(out_ref.dtype)


def _fpn2_bwd_kernel(g_ref, wx_ref, wyb_ref, gf_ref, acc_ref, *,
                     cr, o, hb, c):
    """Blocks: g (1, 1, o, cr·o, C) · wx (1, 1, cr·o, W_p) ·
    wyb (1, 1, 1, o, cr·o, hb) → gf (1, 1, W_p, hb·C);
    acc (W_p, hb·C) f32."""
    rci = pl.program_id(2)

    @pl.when(rci == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wx = wx_ref[0, 0]
    for j in range(hb):
        u = None
        for oy in range(o):
            g_oy = g_ref[0, 0, oy].astype(jnp.float32)  # (cr·o, C)
            wcol = wyb_ref[0, 0, 0, oy][:, j:j + 1].astype(jnp.float32)
            term = g_oy * wcol
            u = term if u is None else u + term
        d = jax.lax.dot_general(wx, u.astype(wx.dtype),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc_ref[:, j * c:(j + 1) * c] = acc_ref[:, j * c:(j + 1) * c] + d

    @pl.when(rci == pl.num_programs(2) - 1)
    def _():
        gf_ref[0, 0] = acc_ref[:].astype(gf_ref.dtype)


def _fpn2_level_weights(rois, lvl, i, stride, out_size, sampling_ratio,
                        aligned, h, w, hp, wp, cr, hb, dtype):
    """wx (B, nch, cr·o, W_p) as in v1; wy pre-broadcast over ox:
    (B, nch, n_hb, o, cr·o, hb)."""
    from .roi_align import _roi_weights
    b, n = rois.shape[:2]
    o = out_size
    wx, wy = jax.vmap(lambda r: _roi_weights(
        r, 1.0 / stride, out_size, sampling_ratio, aligned, h, w))(rois)
    wx = wx * (lvl == i).astype(wx.dtype)[..., None, None]
    pad_n = (-n) % cr
    wx = jnp.pad(wx, ((0, 0), (0, pad_n), (0, 0), (0, wp - w)))
    wy = jnp.pad(wy, ((0, 0), (0, pad_n), (0, 0), (0, hp - h)))
    nch = (n + pad_n) // cr
    wx = wx.reshape(b, nch, cr * o, wp).astype(dtype)
    # (B, R, o, H_p) → (B, nch, cr, o, n_hb, hb) → broadcast ox →
    # (B, nch, n_hb, o, cr·o, hb)
    wy = wy.reshape(b, nch, cr, o, hp // hb, hb)
    wy = wy.transpose(0, 1, 4, 3, 2, 5)              # (B,nch,n_hb,o,cr,hb)
    wy = jnp.broadcast_to(wy[:, :, :, :, :, None, :],
                          (b, nch, hp // hb, o, cr, o, hb))
    wy = wy.reshape(b, nch, hp // hb, o, cr * o, hb).astype(dtype)
    return wx, wy, nch


def _fpn2_fused_fwd(feats, rois, strides, out_size, sampling_ratio, aligned,
                    finest_scale, roi_chunk, h_block, interpret=False):
    from .roi_align import roi_levels
    b, _, _, c = feats[0].shape
    n = rois.shape[1]
    o = out_size
    cr = min(roi_chunk if o <= 7 else max(8, roi_chunk // 4), n)
    hb = h_block
    lvl = roi_levels(rois, len(strides), finest_scale)
    total = None
    for i, (s, feat) in enumerate(zip(strides, feats)):
        h, w = feat.shape[1], feat.shape[2]
        hp = h + (-h) % hb
        wp = w + (-w) % 128
        wx, wyb, nch = _fpn2_level_weights(
            rois, lvl, i, s, o, sampling_ratio, aligned, h, w, hp, wp, cr,
            hb, feat.dtype)
        ftp = jnp.pad(feat, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        # (B, H_p, W_p, C) → (B, n_hb, W_p, hb·C): one panel per h-block
        ftp = ftp.reshape(b, hp // hb, hb, wp, c).transpose(0, 1, 3, 2, 4)
        ftp = ftp.reshape(b * (hp // hb), wp, hb * c)
        nhb = hp // hb
        out = pl.pallas_call(
            partial(_fpn2_fwd_kernel, cr=cr, o=o, hb=hb, c=c),
            grid=(b, nch, nhb),
            in_specs=[
                pl.BlockSpec((1, wp, hb * c),
                             lambda bi, ri, hi: (bi * nhb + hi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, cr * o, wp),
                             lambda bi, ri, hi: (bi, ri, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, o, cr * o, hb),
                             lambda bi, ri, hi: (bi, ri, hi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, o, cr * o, c),
                                   lambda bi, ri, hi: (bi, ri, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, nch, o, cr * o, c),
                                           feat.dtype),
            scratch_shapes=[pltpu.VMEM((o, cr * o, c), jnp.float32)],
            interpret=interpret,
        )(ftp, wx, wyb)
        # (B, nch, oy, (r, ox), C) → (B, R, oy, ox, C)
        out = out.reshape(b, nch, o, cr, o, c).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, nch * cr, o, o, c)[:, :n]
        total = out if total is None else total + out
    shape_tokens = tuple(jnp.zeros(f.shape[1:3], f.dtype) for f in feats)
    return total, (rois, shape_tokens)


def _fpn2_fused_bwd(strides, out_size, sampling_ratio, aligned, finest_scale,
                    roi_chunk, h_block, interpret, res, g):
    from .roi_align import roi_levels
    rois, shape_tokens = res
    b, n = rois.shape[:2]
    c = g.shape[-1]
    o = out_size
    cr = min(roi_chunk if o <= 7 else max(8, roi_chunk // 4), n)
    hb = h_block
    lvl = roi_levels(rois, len(strides), finest_scale)
    pad_n = (-n) % cr
    gp = jnp.pad(g, ((0, 0), (0, pad_n)) + ((0, 0),) * 3)
    nch = (n + pad_n) // cr
    # (B, R_p, oy, ox, C) → (B, nch, oy, (r, ox), C)
    g2 = gp.reshape(b, nch, cr, o, o, c).transpose(0, 1, 3, 2, 4, 5)
    g2 = g2.reshape(b, nch, o, cr * o, c)
    grads = []
    for i, (s, tok) in enumerate(zip(strides, shape_tokens)):
        h, w = tok.shape
        dtype = tok.dtype
        hp = h + (-h) % hb
        wp = w + (-w) % 128
        wx, wyb, _ = _fpn2_level_weights(
            rois, lvl, i, s, o, sampling_ratio, aligned, h, w, hp, wp, cr,
            hb, dtype)
        nhb = hp // hb
        gfp = pl.pallas_call(
            partial(_fpn2_bwd_kernel, cr=cr, o=o, hb=hb, c=c),
            grid=(b, nhb, nch),
            in_specs=[
                pl.BlockSpec((1, 1, o, cr * o, c),
                             lambda bi, hi, ri: (bi, ri, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, cr * o, wp),
                             lambda bi, hi, ri: (bi, ri, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, o, cr * o, hb),
                             lambda bi, hi, ri: (bi, ri, hi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, wp, hb * c),
                                   lambda bi, hi, ri: (bi, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, nhb, wp, hb * c), dtype),
            scratch_shapes=[pltpu.VMEM((wp, hb * c), jnp.float32)],
            interpret=interpret,
        )(g2.astype(dtype), wx, wyb)
        gf = gfp.reshape(b, nhb, wp, hb, c).transpose(0, 1, 3, 2, 4)
        gf = gf.reshape(b, hp, wp, c)[:, :h, :w]
        grads.append(gf)
    # FPN necks emit num_outs=5 levels but the RoI extractor consumes
    # len(strides)=4 (reference SingleRoIExtractor featmap_strides);
    # unused levels get zero cotangents so the bwd container matches the
    # primal feats tuple
    for tok in shape_tokens[len(strides):]:
        grads.append(jnp.zeros((b,) + tok.shape + (c,), tok.dtype))
    return tuple(grads), jnp.zeros_like(rois)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def roi_align_fpn_fused_v2(feats, rois, strides=(4, 8, 16, 32), out_size=7,
                           sampling_ratio=2, aligned=True, finest_scale=56,
                           roi_chunk=64, h_block=8, interpret=False):
    """Lane-legal fused multi-level RoIAlign (see module comment above).
    Numerics match `ops.roi_align.batched_roi_align_fpn`."""
    out, _ = _fpn2_fused_fwd(tuple(feats), rois, strides, out_size,
                             sampling_ratio, aligned, finest_scale,
                             roi_chunk, h_block, interpret)
    return out


roi_align_fpn_fused_v2.defvjp(
    lambda feats, rois, *a: _fpn2_fused_fwd(tuple(feats), rois, *a),
    _fpn2_fused_bwd)
