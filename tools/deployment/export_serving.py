#!/usr/bin/env python
"""Export a trained detector's inference function as a serialized, serving-
ready artifact (the TPU-native counterpart of the reference's ONNX export,
`tools/deployment/pytorch2onnx.py`): `jax.export` serializes the lowered
StableHLO of `predict` plus the weights; `load_and_run` reloads without any
model code.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.builder import (  # noqa: E402
    build_detector)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E402
    Config, load_checkpoint)


def export(config_path: str, checkpoint: str, out_path: str,
           batch: int = 1, height: int = 512, width: int = 1024):
    from jax import export as jexport
    cfg = Config.fromfile(config_path)
    model = build_detector(cfg.model)
    dummy = dict(
        image=jnp.zeros((batch, height, width, 3), jnp.float32),
        img_shape=jnp.asarray([[height, width]] * batch, jnp.int32),
        gt_bboxes=jnp.zeros((batch, 8, 4), jnp.float32),
        gt_labels=jnp.zeros((batch, 8), jnp.int32),
        gt_valid=jnp.zeros((batch, 8), bool),
        domain=jnp.zeros((batch,), jnp.int32))
    k = jax.random.PRNGKey(0)
    variables = model.init({'params': k, 'sampler': k, 'dropout': k}, dummy,
                           train=True)
    if checkpoint:
        state = load_checkpoint(checkpoint)
        variables = {'params': state['params'],
                     'batch_stats': state['batch_stats']}

    def serve(image, img_shape):
        return model.apply(variables, dict(dummy, image=image,
                                           img_shape=img_shape), train=False)

    exported = jexport.export(jax.jit(serve))(
        jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch, 2), jnp.int32))
    payload = dict(serialized=exported.serialize(),
                   batch=batch, height=height, width=width)
    with open(out_path, 'wb') as f:
        pickle.dump(payload, f)
    print(f'exported serving artifact → {out_path} '
          f'({len(payload["serialized"]) / 1e6:.1f} MB)')


def load_and_run(artifact_path: str, image: np.ndarray,
                 img_shape: np.ndarray):
    """Reload an artifact (no model code needed) and run it."""
    from jax import export as jexport
    with open(artifact_path, 'rb') as f:
        payload = pickle.load(f)
    exported = jexport.deserialize(payload['serialized'])
    return exported.call(jnp.asarray(image), jnp.asarray(img_shape))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out', default='detector_serving.jaxexport')
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--shape', type=int, nargs=2, default=[512, 1024])
    p.add_argument('--selfcheck', action='store_true',
                   help='reload the artifact and run one inference')
    args = p.parse_args()
    export(args.config, args.checkpoint, args.out, args.batch,
           args.shape[0], args.shape[1])
    if args.selfcheck:
        img = np.zeros((args.batch, args.shape[0], args.shape[1], 3),
                       np.float32)
        shp = np.asarray([[args.shape[0], args.shape[1]]] * args.batch,
                         np.int32)
        out = load_and_run(args.out, img, shp)
        print('selfcheck dets shape:', np.asarray(out['dets']).shape)


if __name__ == '__main__':
    main()
