"""Micro-benchmark the RoIAlign paths at bench shapes on the real TPU.

Usage: python tools/analysis_tools/bench_roi_align.py
Prints per-variant ms/step at the DA bench shape (B=8, 32x64x2048 bf16,
512 rois). Used to drive the VERDICT r1 item 3 optimization; results are
recorded in docs/RESULTS.md.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops.roi_align import (
    batched_roi_align)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops.roi_align_pallas import (
    roi_align_pallas)

B, H, W, C, R = 8, 32, 64, 2048, 512


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # tunnel-honest sync: fetch a scalar
    float(jnp.sum(out[0, 0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0, 0, 0, 0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rs = np.random.RandomState(0)
    feats = jnp.asarray(rs.rand(B, H, W, C), jnp.bfloat16)
    rois = jnp.asarray(np.sort(rs.rand(B, R, 2, 2) * [[1024, 512]],
                               axis=2).reshape(B, R, 4)[..., [0, 1, 2, 3]],
                       jnp.float32)
    # xyxy from sorted pairs: (x1, y1, x2, y2)
    rois = jnp.stack([rois[..., 0], rois[..., 1],
                      rois[..., 2], rois[..., 3]], -1)

    xla = jax.jit(lambda f, r: batched_roi_align(f, r, 1 / 16.0))
    print('xla separable     :', round(timeit(xla, feats, rois), 3), 'ms')

    for chunk, cs in [(64, 512), (128, 256), (256, 512), (32, 1024)]:
        try:
            pal = jax.jit(lambda f, r, ch=chunk, c=cs: roi_align_pallas(
                f, r, 1 / 16.0, roi_chunk=ch, c_slab=c))
            ms = timeit(pal, feats, rois)
            print(f'pallas ch={chunk:<4} cs={cs:<5}:', round(ms, 3), 'ms')
        except Exception as e:  # noqa: BLE001
            print(f'pallas ch={chunk} cs={cs}: FAILED {type(e).__name__}: '
                  f'{str(e)[:120]}')


if __name__ == '__main__':
    main()
