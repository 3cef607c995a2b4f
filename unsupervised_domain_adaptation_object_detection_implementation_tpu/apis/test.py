"""Evaluation API (reference `mmdet/apis/test.py:17` single_gpu_test +
`tools/test.py` flow).

Batched jitted inference over a dataset; padded device outputs are converted
to the reference's per-class numpy list format at the host boundary and fed
to `dataset.evaluate`. Detections are rescaled to original image coordinates
(inference_detector `rescale=True` semantics).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np

from ..core.bbox.transforms import bbox2result
from ..data import DataLoader
from ..parallel import shard_batch


def results_from_batch(dets: np.ndarray, labels: np.ndarray,
                       valid: np.ndarray, scale_factor: np.ndarray,
                       num_classes: int) -> List[List[np.ndarray]]:
    """Device outputs → per-image per-class (n, 5) arrays in ORIGINAL coords."""
    out = []
    for i in range(dets.shape[0]):
        boxes = dets[i, :, :4] / scale_factor[i]
        scores = dets[i, :, 4]
        out.append(bbox2result(boxes, labels[i], scores, valid[i],
                               num_classes))
    return out


_PREDICT_CACHE: dict = {}


def _jitted_predict(model):
    """Cache the jitted predict per model instance — a fresh lambda per call
    would recompile on every evaluation."""
    fn = _PREDICT_CACHE.get(id(model))
    if fn is None:
        fn = jax.jit(lambda v, b: model.apply(v, b, train=False))
        _PREDICT_CACHE[id(model)] = fn
    return fn


def run_inference(model, variables, dataset, samples_per_batch: int = 2,
                  mesh=None) -> List[List[np.ndarray]]:
    """Run `model.predict` over a dataset; returns reference-format results."""
    num_classes = model.num_classes
    loader = DataLoader(dataset, samples_per_batch, shuffle=False,
                        two_stream=False, drop_last=False)
    predict = _jitted_predict(model)
    results: List[List[np.ndarray]] = []
    seen = 0
    n = len(dataset)
    for batch in loader:
        if mesh is not None:
            db = shard_batch(batch, mesh)
        else:
            db = batch
        out = jax.device_get(predict(variables, db))
        got = results_from_batch(out['dets'], out['labels'], out['valid'],
                                 batch['scale_factor'], num_classes)
        take = min(len(got), n - seen)   # drop wrap-padded tail items
        results.extend(got[:take])
        seen += take
    return results


def evaluate_dataset(model, variables, dataset, samples_per_batch: int = 2,
                     metric: str = 'mAP', mesh=None) -> Dict[str, float]:
    results = run_inference(model, variables, dataset, samples_per_batch,
                            mesh)
    return dataset.evaluate(results, metric=metric)
