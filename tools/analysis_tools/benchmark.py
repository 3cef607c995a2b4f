#!/usr/bin/env python
"""Inference fps benchmark (reference `tools/analysis_tools/benchmark.py`)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.builder import (  # noqa: E402
    build_detector)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E402
    Config)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils.profiling import (  # noqa: E402
    measure_fps)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--height', type=int, default=512)
    p.add_argument('--width', type=int, default=1024)
    p.add_argument('--iters', type=int, default=50)
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    model = build_detector(cfg.model)
    b, h, w = args.batch, args.height, args.width
    batch = dict(
        image=jnp.zeros((b, h, w, 3), jnp.float32),
        img_shape=jnp.asarray([[h, w]] * b, jnp.int32),
        gt_bboxes=jnp.zeros((b, 8, 4), jnp.float32),
        gt_labels=jnp.zeros((b, 8), jnp.int32),
        gt_valid=jnp.zeros((b, 8), bool),
        domain=jnp.zeros((b,), jnp.int32))
    k = jax.random.PRNGKey(0)
    variables = model.init({'params': k, 'sampler': k, 'dropout': k}, batch,
                           train=True)
    predict = jax.jit(lambda v, bt: model.apply(v, bt, train=False))
    fps = measure_fps(predict, (variables, batch), iters=args.iters) * b
    print(f'inference: {fps:.2f} img/s ({b}x{h}x{w})')


if __name__ == '__main__':
    main()
