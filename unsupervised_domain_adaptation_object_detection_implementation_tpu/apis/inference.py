"""Inference API (reference `mmdet/apis/inference.py:17,90`).

`init_detector(config, checkpoint)` → bundle; `inference_detector(bundle,
imgs)` → per-class box arrays in original image coordinates — the exact
return format of the reference, so downstream tooling (visualization,
analysis) ports unchanged.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bbox.transforms import bbox2result
from ..data.pipelines.transforms import (Compose, LoadImageFromFile,
                                         Normalize, Pad, PackDetInputs,
                                         Resize)
from ..models.builder import build_detector
from ..utils.checkpoint import load_checkpoint
from ..utils.config import Config


class DetectorBundle(NamedTuple):
    model: object
    variables: dict
    cfg: Config
    classes: Sequence[str]
    canvas: tuple
    img_scale: tuple


def _default_canvas(img_scale, divisor=32):
    long_e, short_e = max(img_scale), min(img_scale)
    h = int(np.ceil(short_e / divisor)) * divisor
    w = int(np.ceil(long_e / divisor)) * divisor
    return (h, w)


def init_detector(config: Union[str, Config],
                  checkpoint: Optional[str] = None,
                  classes: Optional[Sequence[str]] = None) -> DetectorBundle:
    cfg = Config.fromfile(config) if isinstance(config, str) else config
    model = build_detector(cfg.model)
    # derive test pipeline geometry from the config's test pipeline
    img_scale = (1000, 600)
    test_cfg = (cfg.get('data') or {}).get('test') or {}
    for t in test_cfg.get('pipeline', []):
        if t.get('type') == 'MultiScaleFlipAug':
            img_scale = tuple(t.get('img_scale', img_scale))
    canvas = _default_canvas(img_scale)

    # init with a dummy batch of the canvas shape
    dummy = dict(
        image=jnp.zeros((1, *canvas, 3), jnp.float32),
        img_shape=jnp.asarray([[canvas[0], canvas[1]]], jnp.int32),
        gt_bboxes=jnp.zeros((1, 8, 4), jnp.float32),
        gt_labels=jnp.zeros((1, 8), jnp.int32),
        gt_valid=jnp.zeros((1, 8), bool),
        domain=jnp.zeros((1,), jnp.int32),
    )
    k = jax.random.PRNGKey(0)
    variables = model.init({'params': k, 'sampler': k, 'dropout': k}, dummy,
                           train=True)
    if checkpoint:
        state = load_checkpoint(checkpoint)
        params = state['params'] if 'params' in state else state[1]
        stats = state.get('batch_stats', state[2]) \
            if hasattr(state, 'get') else state[2]
        variables = {'params': params, 'batch_stats': stats}
    if classes is None:
        # reference CLASSES fallback: top-level `classes` in the config,
        # then the dataset's declared classes (mmdet `init_detector` reads
        # checkpoint meta CLASSES, `apis/inference.py:17`)
        classes = cfg.get('classes')
        if classes is None:
            for split in ('test', 'val', 'train'):
                classes = (cfg.get('data') or {}).get(split, {}).get('classes')
                if classes:
                    break
        if classes is not None:
            classes = tuple(classes)
        else:
            classes = tuple(f'class_{i}' for i in range(model.num_classes))
    return DetectorBundle(model, variables, cfg, classes, canvas, img_scale)


def inference_detector(bundle: DetectorBundle,
                       imgs: Union[str, np.ndarray, List]):
    """Detect on one image (path or HWC RGB array) or a list of them.

    Returns per-image `list[num_classes]` of (n, 5) arrays, original coords.
    """
    single = not isinstance(imgs, (list, tuple))
    if single:
        imgs = [imgs]

    pipeline = Compose([
        Resize(img_scale=bundle.img_scale),
        Normalize(),
        Pad(size=bundle.canvas),
        PackDetInputs(max_gt=1),
    ])
    samples = []
    for img in imgs:
        if isinstance(img, str):
            results = LoadImageFromFile()(dict(
                img_info=dict(filename=img), img_prefix=None))
        else:
            results = dict(img=np.asarray(img),
                           img_shape=np.asarray(img).shape[:2],
                           ori_shape=np.asarray(img).shape[:2])
        results.setdefault('gt_bboxes', np.zeros((0, 4), np.float32))
        results.setdefault('gt_labels', np.zeros((0,), np.int64))
        samples.append(pipeline(results))

    from ..data import collate
    batch = {k: jnp.asarray(v) for k, v in collate(samples).items()}
    out = jax.device_get(bundle.model.apply(bundle.variables, batch,
                                            train=False))
    results_out = []
    for i in range(len(imgs)):
        boxes = out['dets'][i, :, :4] / np.asarray(
            samples[i]['scale_factor'])
        results_out.append(bbox2result(
            boxes, out['labels'][i], out['dets'][i, :, 4], out['valid'][i],
            bundle.model.num_classes))
    return results_out[0] if single else results_out


async def async_inference_detector(bundle: DetectorBundle,
                                   imgs: Union[str, np.ndarray, List]):
    """Async detection (reference `mmdet/apis/inference.py:155`
    `async_inference_detector`, tested by `tests/test_runtime/test_async.py`).

    The reference frees the GIL by running CUDA kernels on a dedicated
    stream inside `torch.no_grad`; under JAX, device dispatch is already
    asynchronous, so the blocking parts are host-side preprocessing and the
    final `device_get` — this coroutine moves the whole call off the event
    loop onto the default executor. Results are identical to
    `inference_detector` (same code path).
    """
    import asyncio
    loop = asyncio.get_running_loop()
    return await loop.run_in_executor(
        None, inference_detector, bundle, imgs)


def show_result(img: Union[str, np.ndarray], result: List[np.ndarray],
                classes: Sequence[str], score_thr: float = 0.3,
                out_file: Optional[str] = None) -> np.ndarray:
    """Draw detections (reference `BaseDetector.show_result`,
    `core/visualization/image.py` imshow_det_bboxes equivalent)."""
    from PIL import Image, ImageDraw
    if isinstance(img, str):
        img = np.asarray(Image.open(img).convert('RGB'))
    canvas = Image.fromarray(img.astype(np.uint8))
    draw = ImageDraw.Draw(canvas)
    palette = [(255, 56, 56), (56, 168, 255), (72, 249, 10), (255, 157, 151),
               (255, 112, 31), (134, 219, 61), (26, 147, 52), (164, 72, 255)]
    for c, dets in enumerate(result):
        color = palette[c % len(palette)]
        for x1, y1, x2, y2, s in dets:
            if s < score_thr:
                continue
            draw.rectangle([x1, y1, x2, y2], outline=color, width=2)
            draw.text((x1 + 2, max(y1 - 12, 0)),
                      f'{classes[c]} {s:.2f}', fill=color)
    arr = np.asarray(canvas)
    if out_file:
        canvas.save(out_file)
    return arr
