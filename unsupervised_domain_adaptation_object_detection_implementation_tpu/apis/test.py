"""Evaluation API (reference `mmdet/apis/test.py:17` single_gpu_test +
`tools/test.py` flow).

Batched jitted inference over a dataset; padded device outputs are converted
to the reference's per-class numpy list format at the host boundary and fed
to `dataset.evaluate`. Detections are rescaled to original image coordinates
(inference_detector `rescale=True` semantics).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

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
    """Greedy NMS on (n, 5) host arrays (TTA merging). C++ fast path
    (`native/imageproc.cpp:host_nms`) with the numpy mirror as fallback."""
    from ..utils.native import host_nms_native
    keep_mask = host_nms_native(dets, thr)
    if keep_mask is not None:
        return dets[keep_mask]
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


def _merge_aug_results(per_aug: List[List[List[np.ndarray]]],
                       thr: float) -> List[List[np.ndarray]]:
    """Concat per-class detections across augmentations + host NMS — the
    reference `merge_aug_bboxes`/`merge_aug_results` equivalent
    (`core/post_processing/merge_augs.py`)."""
    merged = []
    for per_img in zip(*per_aug):
        out_img = []
        for per_cls in zip(*per_img):
            cat = np.concatenate([p for p in per_cls if len(p)], 0) \
                if any(len(p) for p in per_cls) else per_cls[0]
            out_img.append(_host_nms(cat, thr) if len(cat) else cat)
        merged.append(out_img)
    return merged


def _rescaled_batch(batch, ratio: float):
    """Device-side bilinear rescale of the padded canvas by `ratio`
    (÷32-padded), with per-image true shapes scaled to match. Returns the
    new batch and per-axis (ry, rx) factors to map boxes back."""
    import jax.numpy as jnp
    img = jnp.asarray(batch['image'])
    b, h, w, c = img.shape
    rh, rw = int(round(h * ratio)), int(round(w * ratio))
    ch, cw = -(-rh // 32) * 32, -(-rw // 32) * 32
    out = jax.image.resize(img, (b, rh, rw, c), 'bilinear')
    out = jnp.pad(out, ((0, 0), (0, ch - rh), (0, cw - rw), (0, 0)))
    ry, rx = rh / h, rw / w
    shapes = np.asarray(batch['img_shape'], np.float64) * [ry, rx]
    nb = dict(batch, image=out,
              img_shape=np.minimum(np.round(shapes), [ch, cw]).astype(
                  np.int32))
    return nb, (ry, rx)


def run_inference(model, variables, dataset, samples_per_batch: int = 2,
                  mesh=None, flip_tta: bool = False,
                  scale_tta: Sequence[float] = (),
                  tta_nms_thr: float = 0.5) -> List[List[np.ndarray]]:
    """Run `model.predict` over a dataset; returns reference-format results.

    TTA (the reference `MultiScaleFlipAug` + `merge_aug_*` flow):
    - `flip_tta=True` adds a horizontally-flipped pass;
    - `scale_tta=(0.75, 1.25, …)` adds passes at rescaled canvases (device
      bilinear resize; each distinct canvas compiles once);
    detections from all passes are mapped back to the base coordinates,
    concatenated per class and merged with host NMS.
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
        per_aug = [results_from_batch(out['dets'], out['labels'],
                                      out['valid'], batch['scale_factor'],
                                      num_classes)]
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
            per_aug.append(results_from_batch(
                dets2, out2['labels'], out2['valid'],
                batch['scale_factor'], num_classes))
        for ratio in scale_tta:
            sb, (ry, rx) = _rescaled_batch(batch, ratio)
            out3 = jax.device_get(predict(variables, sb))
            dets3 = np.asarray(out3['dets']).copy()
            dets3[..., 0] /= rx       # back to base coordinates
            dets3[..., 2] /= rx
            dets3[..., 1] /= ry
            dets3[..., 3] /= ry
            per_aug.append(results_from_batch(
                dets3, out3['labels'], out3['valid'],
                batch['scale_factor'], num_classes))
        got = per_aug[0] if len(per_aug) == 1 else \
            _merge_aug_results(per_aug, tta_nms_thr)
        take = min(len(got), n - seen)   # drop wrap-padded tail items
        results.extend(got[:take])
        seen += take
    return results


def evaluate_dataset(model, variables, dataset, samples_per_batch: int = 2,
                     metric: str = 'mAP', mesh=None) -> Dict[str, float]:
    results = run_inference(model, variables, dataset, samples_per_batch,
                            mesh)
    return dataset.evaluate(results, metric=metric)
