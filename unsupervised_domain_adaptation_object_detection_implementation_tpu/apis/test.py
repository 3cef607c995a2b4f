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


def _host_nms(dets: np.ndarray, thr: float) -> np.ndarray:
    """Greedy NMS on (n, 5) host arrays (TTA merging)."""
    order = np.argsort(-dets[:, 4])
    keep = []
    sup = np.zeros(len(dets), bool)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        x1 = np.maximum(dets[i, 0], dets[:, 0])
        y1 = np.maximum(dets[i, 1], dets[:, 1])
        x2 = np.minimum(dets[i, 2], dets[:, 2])
        y2 = np.minimum(dets[i, 3], dets[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        a = (dets[:, 2] - dets[:, 0]) * (dets[:, 3] - dets[:, 1])
        ai = (dets[i, 2] - dets[i, 0]) * (dets[i, 3] - dets[i, 1])
        iou = inter / np.maximum(a + ai - inter, 1e-9)
        sup |= iou > thr
    return dets[sorted(keep)]


def run_inference(model, variables, dataset, samples_per_batch: int = 2,
                  mesh=None, flip_tta: bool = False,
                  tta_nms_thr: float = 0.5) -> List[List[np.ndarray]]:
    """Run `model.predict` over a dataset; returns reference-format results.

    `flip_tta=True` adds a horizontally-flipped pass and merges the unflipped
    detections per class with host NMS — the reference's
    `MultiScaleFlipAug(flip=True)` + `merge_aug_bboxes` flow.
    """
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
        if flip_tta:
            img = np.asarray(batch['image'])[:, :, ::-1]
            canvas_w = img.shape[2]
            fb = dict(batch, image=img,
                      img_shape=np.tile(
                          np.asarray([[img.shape[1], canvas_w]], np.int32),
                          (img.shape[0], 1)))
            out2 = jax.device_get(predict(variables, fb))
            dets2 = np.asarray(out2['dets']).copy()
            x1 = canvas_w - dets2[..., 2]
            x2 = canvas_w - dets2[..., 0]
            dets2[..., 0], dets2[..., 2] = x1, x2
            got2 = results_from_batch(dets2, out2['labels'], out2['valid'],
                                      batch['scale_factor'], num_classes)
            got = [
                [_host_nms(np.concatenate([a, b2], 0), tta_nms_thr)
                 if len(a) + len(b2) else a
                 for a, b2 in zip(per_img, per_img2)]
                for per_img, per_img2 in zip(got, got2)
            ]
        take = min(len(got), n - seen)   # drop wrap-padded tail items
        results.extend(got[:take])
        seen += take
    return results


def evaluate_dataset(model, variables, dataset, samples_per_batch: int = 2,
                     metric: str = 'mAP', mesh=None) -> Dict[str, float]:
    results = run_inference(model, variables, dataset, samples_per_batch,
                            mesh)
    return dataset.evaluate(results, metric=metric)
