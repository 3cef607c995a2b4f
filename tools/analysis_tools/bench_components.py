"""Component-level step timing on the real TPU for the DA flagship.

Times progressively larger subgraphs (trunk fwd+bwd → +RPN loss →
+proposals/NMS → full DA step) at the bench shape, isolating where the
~126 ms step goes. Results drive the r2 perf work (VERDICT item 3).

`--fpn` additionally times a Faster R-CNN R50-FPN train step (the
multi-level family) at the same canvas and reports img/s + MFU, so perf
claims generalize beyond the DC5 flagship (VERDICT r2 item 7).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models import (
    DAFasterRCNN)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis import (
    OptimizerSpec, create_train_state, make_train_step)
from __graft_entry__ import _demo_batch

B, H, W = 8, 512, 1024


def timed(fn, *args, iters=10, tag=''):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready()
        if hasattr(x, 'block_until_ready') else x, out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f'{tag:<28}: {ms:8.2f} ms')
    return ms


def main():
    model = DAFasterRCNN(variant='daf', num_classes=8, backbone_depth=50,
                         dtype=jnp.bfloat16)
    batch = _demo_batch(b=B, h=H, w=W)
    k = jax.random.PRNGKey(0)
    var_shapes = jax.eval_shape(
        lambda: model.init({'params': k, 'sampler': k, 'dropout': k},
                           batch, train=True))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), var_shapes)
    params = variables['params']
    rest = {kk: variables[kk] for kk in variables if kk != 'params'}

    # 1. full train step
    state, tx = create_train_state(model, variables, OptimizerSpec(),
                                   frozen_stages=1)
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    rng = jax.random.PRNGKey(1)
    state, m = step(state, batch, rng)
    float(jax.device_get(m['loss']))
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        state, m = step(state, batch, rng)
    float(jax.device_get(m['loss']))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f'{"full DA train step":<28}: {ms:8.2f} ms '
          f'({B * 1e3 / ms:.1f} img/s)')

    # 2. loss-only (no optimizer update) to size the optimizer cost
    def loss_only(p, b_, r):
        out = model.apply({'params': p, **rest}, b_, train=True,
                          rngs={'sampler': r, 'dropout': r},
                          mutable=['batch_stats'])[0]
        return sum(out.values())

    try:
        lfn = jax.jit(jax.value_and_grad(loss_only))
        timed(lfn, params, batch, rng, tag='loss fwd+bwd (no opt)')
    except Exception as e:  # noqa: BLE001
        print('loss-only timing skipped:', str(e)[:120])


def fpn_mfu():
    """Faster R-CNN R50-FPN train-step throughput + MFU at bench shapes."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.faster_rcnn_fpn import (  # noqa: E501
        FasterRCNNFPN)

    model = FasterRCNNFPN(num_classes=8, backbone_depth=50,
                          dtype=jnp.bfloat16)
    batch = _demo_batch(b=B, h=H, w=W)
    k = jax.random.PRNGKey(0)
    var_shapes = jax.eval_shape(
        lambda: model.init({'params': k, 'sampler': k, 'dropout': k},
                           batch, train=True))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), var_shapes)
    state, tx = create_train_state(model, variables, OptimizerSpec(),
                                   frozen_stages=1)
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    rng = jax.random.key(1, impl='rbg')

    lowered = step.lower(state, batch, rng)
    cost = lowered.compile().cost_analysis() or {}
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    step_flops = float(cost.get('flops', 0.0))

    state, m = step(state, batch, rng)
    float(jax.device_get(m['loss']))
    for _ in range(2):
        state, m = step(state, batch, rng)
    float(jax.device_get(m['loss']))
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, rng)
    float(jax.device_get(m['loss']))
    dt = time.perf_counter() - t0
    ips = B * iters / dt
    mfu = step_flops * iters / dt / 197e12   # v5e bf16 peak
    print(f'{"Faster R-CNN R50-FPN step":<28}: {dt / iters * 1e3:8.2f} ms '
          f'({ips:.1f} img/s, {step_flops / 1e12:.2f} TF/step, '
          f'MFU {mfu:.3f})')


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--fpn', action='store_true',
                    help='also time the R50-FPN family step (img/s + MFU)')
    ap.add_argument('--fpn-only', action='store_true')
    a = ap.parse_args()
    if not a.fpn_only:
        main()
    if a.fpn or a.fpn_only:
        fpn_mfu()
