"""Attribute flagship train-step time by ablation (real chip).

Times the full DA train step, then variants with one component short-
circuited, and prints the delta — the in-step cost of that component
(more honest than standalone microbenches, which miss fusion/overlap).

Mirrors what the reference would measure with nvprof over its CUDA step;
here components are swapped at the Python level and each variant is its
own jitted program.

Usage: python tools/analysis_tools/step_ablation.py [--iters 10]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--batch', type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models import (
        DAFasterRCNN)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors import (
        da_faster_rcnn as dafr_mod)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.roi_heads import (
        standard_roi_head as roi_mod)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis import (
        OptimizerSpec, create_train_state, make_train_step)
    from __graft_entry__ import _demo_batch

    H, W, B = 512, 1024, args.batch
    batch = _demo_batch(b=B, h=H, w=W)
    rng = jax.random.PRNGKey(1)

    def build(instance_mode='grouped'):
        model = DAFasterRCNN(variant='daf', num_classes=8, backbone_depth=50,
                             dtype=jnp.bfloat16, instance_mode=instance_mode)
        k = jax.random.PRNGKey(0)
        var_shapes = jax.eval_shape(
            lambda: model.init({'params': k, 'sampler': k, 'dropout': k},
                               batch, train=True))
        variables = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), var_shapes)
        state, tx = create_train_state(model, variables, OptimizerSpec(),
                                       frozen_stages=1)
        return model, state, tx

    def timeit(step, state):
        s = state
        s, m = step(s, batch, rng)
        float(jax.device_get(m['loss']))
        for _ in range(2):
            s, m = step(s, batch, rng)
        float(jax.device_get(m['loss']))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, m = step(s, batch, rng)
        float(jax.device_get(m['loss']))
        return (time.perf_counter() - t0) / args.iters

    results = {}

    # 1. full step
    model, state, tx = build()
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    results['full'] = timeit(step, state)
    print(f'full step:              {results["full"]*1e3:8.2f} ms '
          f'({B/results["full"]:.1f} img/s)', flush=True)

    # 2. no instance-DA (instance head + k-means)
    model2, state2, tx2 = build(instance_mode='none')
    step2 = jax.jit(make_train_step(model2, tx2), donate_argnums=0)
    results['no_instance'] = timeit(step2, state2)
    print(f'no instance-DA:         {results["no_instance"]*1e3:8.2f} ms '
          f'(delta {1e3*(results["full"]-results["no_instance"]):+.2f})',
          flush=True)

    # 3. RoIAlign -> zeros (same output shape, no gather/matmul work)
    real_extract = roi_mod.extract_roi_feats

    def fake_extract(feat, rois, stride, out_size=7, **kw):
        r = rois.shape[:-1]
        return jnp.zeros((*r, out_size, out_size, feat.shape[-1]),
                         feat.dtype)

    for mod in (roi_mod, dafr_mod):
        mod.extract_roi_feats = fake_extract
    try:
        model3, state3, tx3 = build()
        step3 = jax.jit(make_train_step(model3, tx3), donate_argnums=0)
        results['no_roialign'] = timeit(step3, state3)
        print(f'RoIAlign stubbed:       {results["no_roialign"]*1e3:8.2f} ms '
              f'(delta {1e3*(results["full"]-results["no_roialign"]):+.2f})',
              flush=True)
    finally:
        for mod in (roi_mod, dafr_mod):
            mod.extract_roi_feats = real_extract

    # 4. proposals -> fixed grid (skips RPN decode + NMS + topk)
    real_props = dafr_mod.rpn_proposals
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads import (
        rpn_head as rpn_mod)

    def fake_props(rpn_cls, rpn_reg, anchors, img_shape, cfg):
        b = rpn_cls.shape[0]
        n = cfg.max_per_img
        # fixed boxes, but keep a data dependence on rpn outputs so the
        # trunk/head compute cannot be DCE'd
        eps = jnp.mean(rpn_cls) * 0.0
        base = jnp.linspace(0, 200, n, dtype=jnp.float32)
        boxes = jnp.stack([base, base, base + 64, base + 64], -1) + eps
        boxes = jnp.broadcast_to(boxes, (b, n, 4))
        scores = jnp.broadcast_to(jnp.linspace(1, 0, n), (b, n))
        valid = jnp.ones((b, n), bool)
        return boxes, scores, valid

    dafr_mod.rpn_proposals = fake_props
    try:
        model4, state4, tx4 = build()
        step4 = jax.jit(make_train_step(model4, tx4), donate_argnums=0)
        results['no_nms'] = timeit(step4, state4)
        print(f'proposal path stubbed:  {results["no_nms"]*1e3:8.2f} ms '
              f'(delta {1e3*(results["full"]-results["no_nms"]):+.2f})',
              flush=True)
    finally:
        dafr_mod.rpn_proposals = real_props

    # 5. dropout -> identity (isolates PRNG+mask cost of the p=.5 dropouts
    # on the DA heads' feature maps)
    import flax.linen as fnn
    real_dropout_call = fnn.Dropout.__call__

    def no_dropout(self, x, deterministic=None, rng=None):
        return x

    fnn.Dropout.__call__ = no_dropout
    try:
        model6, state6, tx6 = build()
        step6 = jax.jit(make_train_step(model6, tx6), donate_argnums=0)
        results['no_dropout'] = timeit(step6, state6)
        print(f'dropout stubbed:        {results["no_dropout"]*1e3:8.2f} ms '
              f'(delta {1e3*(results["full"]-results["no_dropout"]):+.2f})',
              flush=True)
    finally:
        fnn.Dropout.__call__ = real_dropout_call

    # 6. rbg PRNG keys (threefry is compute-heavy on TPU; rbg is the
    # documented fast path for dropout-style usage)
    model7, state7, tx7 = build()
    step7 = jax.jit(make_train_step(model7, tx7), donate_argnums=0)
    rbg_rng = jax.random.key(1, impl='rbg')
    s = state7
    try:
        s, m = step7(s, batch, rbg_rng)
        float(jax.device_get(m['loss']))
        for _ in range(2):
            s, m = step7(s, batch, rbg_rng)
        float(jax.device_get(m['loss']))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, m = step7(s, batch, rbg_rng)
        float(jax.device_get(m['loss']))
        results['rbg'] = (time.perf_counter() - t0) / args.iters
        print(f'rbg PRNG:               {results["rbg"]*1e3:8.2f} ms '
              f'(delta {1e3*(results["full"]-results["rbg"]):+.2f})',
              flush=True)
    except Exception as e:
        print(f'rbg PRNG: failed ({type(e).__name__}: {e})', flush=True)

    # 7. forward-only (no grad/optimizer): loss value but no backward
    model5, state5, _ = build()

    def fwd_only(state, batch, rng):
        rngs = {'sampler': jax.random.PRNGKey(0),
                'dropout': jax.random.PRNGKey(1)}
        out, _ = model5.apply(
            {'params': state.params, 'batch_stats': state.batch_stats},
            batch, train=True, rngs=rngs, mutable=['batch_stats'])
        return state, {'loss': sum(out.values())}

    step5 = jax.jit(fwd_only, donate_argnums=0)
    results['fwd_only'] = timeit(step5, state5)
    print(f'forward only:           {results["fwd_only"]*1e3:8.2f} ms',
          flush=True)


if __name__ == '__main__':
    main()
