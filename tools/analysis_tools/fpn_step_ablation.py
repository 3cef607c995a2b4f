"""Attribute the Faster R-CNN R50-FPN train step's wall time (VERDICT r3
item 2): time the full step, then the step with individual stages stubbed
by monkeypatch (RoIAlign → zeros, proposals → fixed boxes, sampler →
first-512, RPN loss → zeros). The delta against the full step is that
stage's contribution. Mirrors `step_ablation.py` (DA flagship version).

Usage: python tools/analysis_tools/fpn_step_ablation.py [--iters 10]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis.train_state import (  # noqa: E501
    OptimizerSpec, create_train_state, make_train_step)
from bench_components import _demo_batch, B, H, W  # noqa: E402


def build_step():
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
    step = jax.jit(make_train_step(model, tx))
    return step, state, batch


def timeit(tag, iters):
    step, state, batch = build_step()
    rng = jax.random.key(1, impl='rbg')
    state, m = step(state, batch, rng)
    float(jax.device_get(m['loss']))
    for _ in range(2):
        state, m = step(state, batch, rng)
    float(jax.device_get(m['loss']))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, rng)
    float(jax.device_get(m['loss']))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f'{tag:<28}: {ms:8.2f} ms')
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=10)
    a = ap.parse_args()

    import unsupervised_domain_adaptation_object_detection_implementation_tpu.models.roi_heads.standard_roi_head as srh  # noqa: E501
    import unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.faster_rcnn_fpn as fr  # noqa: E501
    import unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads.rpn_head as rh  # noqa: E501

    full = timeit('full step', a.iters)

    real_extract = srh.extract_roi_feats_fpn

    def fake_extract(feats, rois, *aa, **kw):
        out_size = kw.get('out_size', 7)
        b, n = rois.shape[:2]
        c = feats[0].shape[-1]
        return jnp.zeros((b, n, out_size, out_size, c), feats[0].dtype)
    srh.extract_roi_feats_fpn = fake_extract
    fr.extract_roi_feats_fpn = fake_extract
    no_roialign = timeit('RoIAlign stubbed', a.iters)
    srh.extract_roi_feats_fpn = real_extract
    fr.extract_roi_feats_fpn = real_extract

    real_props = rh.rpn_proposals

    def fake_props(cls, reg, anchors, img_shape, cfg):
        b = cls.shape[0]
        n = cfg.max_per_img
        boxes = jnp.broadcast_to(
            jnp.asarray([0., 0., 64., 64.]), (b, n, 4))
        scores = jnp.ones((b, n), jnp.float32)
        return boxes, scores, jnp.ones((b, n), bool)
    rh.rpn_proposals = fake_props
    fr.rpn_proposals = fake_props
    no_props = timeit('proposals/NMS stubbed', a.iters)
    rh.rpn_proposals = real_props
    fr.rpn_proposals = real_props

    real_sample = srh.sample_rois

    def fake_sample(proposals, valid, gt, gtl, gtv, rng, num_classes, cfg,
                    score_fn=None):
        import dataclasses
        s = real_sample(proposals, valid, gt, gtl, gtv, rng, num_classes,
                        dataclasses.replace(cfg, num_samples=cfg.num_samples))
        return s
    # sampler cost is measured indirectly: stub proposals AND roialign
    srh.extract_roi_feats_fpn = fake_extract
    fr.extract_roi_feats_fpn = fake_extract
    rh.rpn_proposals = fake_props
    fr.rpn_proposals = fake_props
    bare = timeit('both stubbed (trunk+heads)', a.iters)
    srh.extract_roi_feats_fpn = real_extract
    fr.extract_roi_feats_fpn = real_extract
    rh.rpn_proposals = real_props
    fr.rpn_proposals = real_props

    print(f'{"→ RoIAlign":<28}: {full - no_roialign:8.2f} ms')
    print(f'{"→ proposals/NMS":<28}: {full - no_props:8.2f} ms')
    print(f'{"→ trunk+heads+loss floor":<28}: {bare:8.2f} ms')


if __name__ == '__main__':
    main()
