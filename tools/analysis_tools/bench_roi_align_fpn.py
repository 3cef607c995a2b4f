"""Micro-benchmark the multi-level (FPN) RoIAlign paths on the real TPU.

Usage: python tools/analysis_tools/bench_roi_align_fpn.py
Compares the separable-dense path (`batched_roi_align_fpn`) against the
fused Pallas kernel (`roi_align_fpn_fused`) at FPN bench shapes
(B=8, image 512x1024 -> levels 128x256..16x32, C=256, 512 rois), fwd and
fwd+bwd. Drives the VERDICT r3 item 2 optimization; results recorded in
docs/RESULTS.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp
import numpy as np

from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops.roi_align import (  # noqa: E501
    batched_roi_align_fpn)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops.roi_align_pallas import (  # noqa: E501
    roi_align_fpn_fused, roi_align_fpn_fused_v2)

B, R, C = 8, 512, 256
STRIDES = (4, 8, 16, 32)
IMG_H, IMG_W = 512, 1024


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rs = np.random.RandomState(0)
    feats = tuple(
        jnp.asarray(rs.rand(B, IMG_H // s, IMG_W // s, C), jnp.bfloat16)
        for s in STRIDES)
    xy = np.sort(rs.rand(B, R, 2, 2) * [[IMG_W, IMG_H]], axis=2)
    rois = jnp.asarray(
        np.stack([xy[..., 0, 0], xy[..., 0, 1], xy[..., 1, 0], xy[..., 1, 1]],
                 -1), jnp.float32)

    dense = jax.jit(lambda f, r: batched_roi_align_fpn(f, r, STRIDES))
    print('dense fwd          :', round(timeit(dense, feats, rois), 3), 'ms')

    def dense_loss(f, r):
        return jnp.sum(batched_roi_align_fpn(f, r, STRIDES)
                       .astype(jnp.float32))
    dg = jax.jit(jax.grad(dense_loss))
    print('dense fwd+bwd      :', round(timeit(dg, feats, rois), 3), 'ms')

    for chunk, hb in [(64, 8), (128, 8), (64, 16), (256, 8), (32, 8)]:
        tag = f'ch={chunk:<4} hb={hb:<3}'
        try:
            pal = jax.jit(lambda f, r, ch=chunk, h=hb: roi_align_fpn_fused(
                f, r, STRIDES, 7, 2, True, 56, ch, h))
            print(f'pallas fwd  {tag}:', round(timeit(pal, feats, rois), 3),
                  'ms')

            def ploss(f, r, ch=chunk, h=hb):
                return jnp.sum(roi_align_fpn_fused(
                    f, r, STRIDES, 7, 2, True, 56, ch, h)
                    .astype(jnp.float32))
            pg = jax.jit(jax.grad(ploss))
            print(f'pallas f+b  {tag}:', round(timeit(pg, feats, rois), 3),
                  'ms')
        except Exception as e:  # noqa: BLE001
            print(f'pallas {tag}: FAILED {type(e).__name__}: '
                  f'{str(e)[:160]}')

    # v2: the lane-legal redesign (r5) — per-j lane-sliced dots +
    # pre-broadcast wy columns; expected to actually compile on Mosaic
    for chunk, hb in [(64, 8), (32, 8), (64, 16), (128, 8), (16, 8)]:
        tag = f'ch={chunk:<4} hb={hb:<3}'
        try:
            pal = jax.jit(lambda f, r, ch=chunk, h=hb: roi_align_fpn_fused_v2(
                f, r, STRIDES, 7, 2, True, 56, ch, h))
            print(f'pallas2 fwd {tag}:', round(timeit(pal, feats, rois), 3),
                  'ms')

            def ploss(f, r, ch=chunk, h=hb):
                return jnp.sum(roi_align_fpn_fused_v2(
                    f, r, STRIDES, 7, 2, True, 56, ch, h)
                    .astype(jnp.float32))
            pg = jax.jit(jax.grad(ploss))
            print(f'pallas2 f+b {tag}:', round(timeit(pg, feats, rois), 3),
                  'ms')
        except Exception as e:  # noqa: BLE001
            print(f'pallas2 {tag}: FAILED {type(e).__name__}: '
                  f'{str(e)[:160]}')


if __name__ == '__main__':
    main()
