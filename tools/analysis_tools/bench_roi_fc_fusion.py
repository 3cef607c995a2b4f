"""RoIAlign→shared_fc1 fusion probe (VERDICT r2 item 7).

Question: does computing `shared_fc1` INSIDE the RoIAlign scan body — so the
(B·R, 7·7·C) flattened activation (822 MB bf16 at bench shapes) never
materializes in HBM — beat the production path (in-scan flatten, then one
big (4096, 100352) @ (100352, 1024) matmul)?

Traffic math at bench shapes (B=8, R=512, DC5 feat 32x64x2048 bf16,
o=7 → D1=100352, F=1024, W1 bf16 = 205 MB):

  unfused (production): flatten write 822 + fc1-fwd read (822 + W1 205)
    + bwd dW read 822 + bwd dx (205 W1 + 822 dflat write) + roi-bwd 822
    ≈ 4.5 GB dominated by five 822 MB slabs.
  fused, group of G rois per matmul: saves the flatten write + fc1-fwd
    read (1.6 GB) but re-streams W1 once per group: (4096/G) x 205 MB.
    Breakeven G = W1_bytes / act_bytes_per_roi = 205 MB / 196 KB ≈ 1045
    rois — but t=(chunk,H,o,C) VMEM residency caps the inner chunk at ~16
    and the accumulated (G, D1) group buffer at G≈512 (102 MB VMEM), so
    the best reachable G pays ≈1.6 GB of weight streams for a 1.6 GB
    saving: a wash in fwd, and strictly worse in bwd (dW1 needs the
    activation again → remat re-pays feat reads, or store → status quo).

This script measures both at bench shapes to close the item with numbers.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops.roi_align import (
    _roi_weights, batched_roi_align)

B, H, W, C = 8, 32, 64, 2048      # DC5 feature map at the 512x1024 canvas
R, O, F = 512, 7, 1024
D1 = O * O * C


def fused_roi_fc(feats, rois, w1, b1, spatial_scale=1.0 / 16,
                 roi_chunk=16, group=32):
    """RoIAlign + fc1 with the matmul folded into the scan.

    Inner chunk keeps t=(chunk,H,o,C) VMEM-resident; `group` chunks of roi
    features are stacked per scan step and hit W1 in one
    (group*chunk, D1) @ (D1, F) matmul, so W1 streams (B*R)/(group*chunk)
    times instead of once.
    """
    b, h, w, c = feats.shape
    n = rois.shape[1]
    wx, wy = jax.vmap(lambda r: _roi_weights(
        r, spatial_scale, O, 2, True, h, w))(rois)
    step_rois = roi_chunk * group
    assert (b * n) % step_rois == 0 and n % step_rois == 0
    nsteps = (b * n) // step_rois
    wx_s = wx.reshape(nsteps, group, roi_chunk, O, w)
    wy_s = wy.reshape(nsteps, group, roi_chunk, O, h)
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n // step_rois)

    def one_step(carry, args):
        bi, wy_g, wx_g = args
        f = jax.lax.dynamic_index_in_dim(feats, bi, 0, keepdims=False)

        def one_chunk(_, a):
            wy_c, wx_c = a
            t = jnp.einsum('row,hwc->rhoc', wx_c.astype(feats.dtype), f,
                           preferred_element_type=jnp.float32
                           ).astype(feats.dtype)
            out = jnp.einsum('roh,rhpc->ropc', wy_c.astype(feats.dtype), t,
                             preferred_element_type=jnp.float32
                             ).astype(feats.dtype)
            return _, out.reshape(roi_chunk, D1)

        _, flat = jax.lax.scan(one_chunk, 0, (wy_g, wx_g))
        flat = flat.reshape(step_rois, D1)
        y = (jnp.dot(flat, w1, preferred_element_type=jnp.float32)
             + b1).astype(feats.dtype)
        return carry, y

    _, ys = jax.lax.scan(one_step, 0, (img_idx, wy_s, wx_s))
    return ys.reshape(b, n, F)


def unfused_roi_fc(feats, rois, w1, b1, spatial_scale=1.0 / 16):
    flat = batched_roi_align(feats, rois, spatial_scale, O, 2, True,
                             roi_chunk=16, flatten=True)
    return (jnp.dot(flat, w1, preferred_element_type=jnp.float32)
            + b1).astype(feats.dtype)


def _sync(out):
    # over the axon tunnel block_until_ready acks before remote execution
    # completes; fetching a VALUE is the only reliable synchronization
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf)))


def timed(fn, args, iters=10, tag=''):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f'{tag:<44}: {ms:8.2f} ms')
    return ms


def main():
    k = jax.random.PRNGKey(0)
    feats = jax.random.normal(k, (B, H, W, C), jnp.bfloat16)
    cx = jax.random.uniform(k, (B, R, 2), jnp.float32, 64, 960)
    wh = jax.random.uniform(k, (B, R, 2), jnp.float32, 32, 256)
    rois = jnp.concatenate([cx - wh / 2, cx + wh / 2], -1)
    w1 = jax.random.normal(k, (D1, F), jnp.bfloat16) * 0.01
    b1 = jnp.zeros((F,), jnp.bfloat16)

    def loss_unfused(w1_, feats_):
        return jnp.sum(unfused_roi_fc(feats_, rois, w1_, b1) ** 2)

    def mk_loss_fused(group, remat):
        f = partial(fused_roi_fc, group=group)
        if remat:
            f = jax.checkpoint(f, static_argnums=())

        def loss(w1_, feats_):
            return jnp.sum(f(feats_, rois, w1_, b1) ** 2)
        return loss

    # forward only
    timed(jax.jit(unfused_roi_fc), (feats, rois, w1, b1),
          tag='fwd unfused (prod)')
    for g in (8, 16, 32):
        timed(jax.jit(partial(fused_roi_fc, group=g)),
              (feats, rois, w1, b1), tag=f'fwd fused group={g * 16} rois')

    # fwd+bwd (grads wrt w1 and feats — the training-path signature)
    timed(jax.jit(jax.value_and_grad(loss_unfused, argnums=(0, 1))),
          (w1, feats), tag='fwd+bwd unfused (prod)')
    for g in (8, 16, 32):
        for remat in (False, True):
            tag = f'fwd+bwd fused group={g * 16}' + (' remat' if remat else '')
            try:
                timed(jax.jit(jax.value_and_grad(
                    mk_loss_fused(g, remat), argnums=(0, 1))),
                    (w1, feats), tag=tag)
            except Exception as e:  # noqa: BLE001
                print(f'{tag:<44}: FAILED {str(e)[:100]}')

    # numeric parity of the fused path
    ref = jax.jit(unfused_roi_fc)(feats, rois, w1, b1)
    got = jax.jit(partial(fused_roi_fc, group=8))(feats, rois, w1, b1)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f'max |fused - unfused| = {err:.2e}')


if __name__ == '__main__':
    main()
