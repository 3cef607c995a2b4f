#!/usr/bin/env python
"""Evaluate an exported serving artifact against a dataset — the
TPU-native counterpart of the reference's `tools/deployment/test.py`
(which evaluates ONNX/TensorRT exports with the same dataset metrics as
`tools/test.py`). The artifact is the `jax.export` StableHLO payload
written by `export_serving.py`; no model code is needed to run it, which
is exactly what this tool verifies: export → reload → dataset metrics.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np  # noqa: E402

from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis.test import (  # noqa: E402,E501
    results_from_batch)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.data import (  # noqa: E402,E501
    build_dataset)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E402,E501
    Config)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils.config import (  # noqa: E402,E501
    parse_option_value)


def main(argv=None):
    p = argparse.ArgumentParser(description='Evaluate a serving artifact')
    p.add_argument('config', help='dataset/eval config')
    p.add_argument('artifact', help='.jaxexport payload from export_serving')
    p.add_argument('--eval', default='mAP', help='mAP | recall | bbox')
    p.add_argument('--num-classes', type=int, default=None,
                   help='defaults to len(dataset.CLASSES)')
    p.add_argument('--cfg-options', nargs='+', default=[])
    args = p.parse_args(argv)

    import jax.numpy as jnp
    from jax import export as jexport

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict({
            kv.split('=', 1)[0]: parse_option_value(kv.split('=', 1)[1])
            for kv in args.cfg_options})
    dataset = build_dataset(dict(cfg.data['test'], test_mode=True))
    num_classes = args.num_classes or len(dataset.CLASSES)

    with open(args.artifact, 'rb') as f:
        payload = pickle.load(f)
    exported = jexport.deserialize(payload['serialized'])
    batch, h, w = payload['batch'], payload['height'], payload['width']

    results = []
    n = len(dataset)
    for start in range(0, n, batch):
        idxs = [min(start + j, n - 1) for j in range(batch)]
        samples = [dataset[i] for i in idxs]
        image = np.stack([s['image'] for s in samples]).astype(np.float32)
        if image.shape[1:3] != (h, w):
            raise SystemExit(
                f'dataset canvas {image.shape[1:3]} != artifact ({h}, {w}); '
                f're-export with --shape or adjust the test pipeline Pad')
        img_shape = np.stack([s['img_shape'] for s in samples])
        out = exported.call(jnp.asarray(image),
                            jnp.asarray(img_shape, np.int32))
        scale = np.stack([
            np.asarray(s.get('scale_factor', 1.0), np.float32)
            for s in samples])
        if scale.ndim == 1:
            scale = scale[:, None]
        per_img = results_from_batch(
            np.asarray(out['dets']), np.asarray(out['labels']),
            np.asarray(out['valid']), scale, num_classes)
        take = min(batch, n - start)
        results.extend(per_img[:take])

    metrics = dataset.evaluate(results, metric=args.eval)
    print('exported-artifact metrics:', metrics)
    return metrics


if __name__ == '__main__':
    main()
