#!/usr/bin/env python
"""Model FLOPs/memory via XLA cost analysis
(reference `tools/analysis_tools/get_flops.py`)."""
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--shape', type=int, nargs=2, default=[512, 1024])
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    model = build_detector(cfg.model)
    h, w = args.shape
    batch = dict(
        image=jnp.zeros((1, h, w, 3), jnp.float32),
        img_shape=jnp.asarray([[h, w]], jnp.int32),
        gt_bboxes=jnp.zeros((1, 8, 4), jnp.float32),
        gt_labels=jnp.zeros((1, 8), jnp.int32),
        gt_valid=jnp.zeros((1, 8), bool),
        domain=jnp.zeros((1,), jnp.int32))
    k = jax.random.PRNGKey(0)
    variables = model.init({'params': k, 'sampler': k, 'dropout': k}, batch,
                           train=True)
    import numpy as np
    n_params = sum(np.prod(v.shape) for v in
                   jax.tree_util.tree_leaves(variables['params']))
    lowered = jax.jit(lambda v, b: model.apply(v, b, train=False)).lower(
        variables, batch)
    cost = lowered.compile().cost_analysis()
    flops = cost.get('flops', float('nan'))
    print(f'params: {n_params / 1e6:.2f} M')
    print(f'inference flops (XLA): {flops / 1e9:.2f} GFLOPs @ {h}x{w}')


if __name__ == '__main__':
    main()
