"""Host-side data pipeline transforms (numpy).

Equivalent of the reference pipeline stages
(`mmdet/datasets/pipelines/loading.py`, `transforms.py`, `formating.py`)
re-designed for the static-shape TPU batch layout: the pipeline ends in a
fixed canvas (`PadToCanvas`) and fixed-size gt blocks (`PackDetInputs`), so
every batch has identical shapes and the jitted train step never recompiles.

Each transform is a callable on a `results` dict with keys:
    img (H, W, 3 uint8/f32, RGB), img_shape, ori_shape, scale_factor,
    gt_bboxes (n, 4 xyxy), gt_labels (n,), flip, domain (optional)
"""

from __future__ import annotations

import os.path as osp
from typing import Optional, Sequence, Tuple

import numpy as np

from ...utils.registry import PIPELINES

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def _imread(path: str) -> np.ndarray:
    """Read an image as RGB uint8."""
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return img[..., ::-1]  # BGR → RGB
    from PIL import Image
    return np.asarray(Image.open(path).convert('RGB'))


def _imresize(img: np.ndarray, size_wh: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize to (w, h) — native C++ (OpenMP, PIL-convention
    antialiased, `native/imageproc.cpp`) with cv2/PIL fallback."""
    if img.dtype == np.uint8 and img.ndim == 3:
        from ...utils.native import resize_bilinear_native
        out = resize_bilinear_native(img, size_wh)
        if out is not None:
            return out
    if _HAS_CV2:
        return cv2.resize(img, size_wh, interpolation=cv2.INTER_LINEAR)
    from PIL import Image
    return np.asarray(Image.fromarray(img).resize(size_wh, Image.BILINEAR))


@PIPELINES.register_module()
class LoadImageFromFile:
    """Reference `LoadImageFromFile` (`pipelines/loading.py:18`), RGB layout."""

    def __init__(self, to_float32: bool = False):
        self.to_float32 = to_float32

    def __call__(self, results):
        path = results['img_info']['filename']
        prefix = results.get('img_prefix')
        if prefix:
            path = osp.join(prefix, path)
        img = _imread(path)
        if self.to_float32:
            img = img.astype(np.float32)
        results['filename'] = path
        results['img'] = img
        results['img_shape'] = img.shape[:2]
        results['ori_shape'] = img.shape[:2]
        return results


@PIPELINES.register_module()
class LoadAnnotations:
    """Reference `LoadAnnotations` (`pipelines/loading.py:202`).

    `with_mask=True` rasterizes each instance's polygons into a fixed
    `mask_size`² BOX-FRAME raster (the TPU-native replacement for ragged
    `BitmapMasks` — see `models/roi_heads/mask_head.py`).
    """

    def __init__(self, with_bbox: bool = True, with_label: bool = True,
                 with_mask: bool = False, mask_size: int = 112):
        self.with_bbox = with_bbox
        self.with_label = with_label
        self.with_mask = with_mask
        self.mask_size = mask_size

    def _rasterize(self, polygons, box):
        from PIL import Image, ImageDraw
        m = self.mask_size
        x1, y1, x2, y2 = box
        sx = m / max(x2 - x1, 1e-3)
        sy = m / max(y2 - y1, 1e-3)
        img = Image.new('L', (m, m), 0)
        draw = ImageDraw.Draw(img)
        for poly in polygons:
            pts = [((px - x1) * sx, (py - y1) * sy)
                   for px, py in zip(poly[0::2], poly[1::2])]
            if len(pts) >= 3:
                draw.polygon(pts, fill=1)
        return np.asarray(img, np.uint8)

    def __call__(self, results):
        ann = results['ann_info']
        if self.with_bbox:
            results['gt_bboxes'] = ann['bboxes'].astype(np.float32).reshape(-1, 4)
            if ann.get('bboxes_ignore') is not None:
                results['gt_bboxes_ignore'] = \
                    ann['bboxes_ignore'].astype(np.float32).reshape(-1, 4)
        if self.with_label:
            results['gt_labels'] = ann['labels'].astype(np.int64).reshape(-1)
        if self.with_mask:
            polys = ann.get('masks', [])
            boxes = results['gt_bboxes']
            rasters = np.zeros((len(boxes), self.mask_size, self.mask_size),
                               np.uint8)
            for i, box in enumerate(boxes):
                if i < len(polys) and polys[i]:
                    rasters[i] = self._rasterize(polys[i], box)
            results['gt_masks'] = rasters
        return results


@PIPELINES.register_module()
class Resize:
    """Keep-ratio resize to fit inside `img_scale` (reference `Resize`,
    `pipelines/transforms.py:30` with keep_ratio=True).

    `img_scale` is (long_edge, short_edge) — mmdet convention: the scale
    factor is min(long/max_side, short/min_side), never upscaling beyond it.

    Multi-scale training (reference `Resize` `multiscale_mode`/
    `ratio_range`): pass a LIST of scales with `multiscale_mode='value'`
    (sample one) or two scales with `'range'` (sample each edge uniformly
    between them), and/or `ratio_range=(lo, hi)` to jitter a single scale.
    Downstream `Pad(size=...)` still defines the static compile canvas —
    size it for the LARGEST sampled scale (Pad asserts the fit).
    """

    def __init__(self, img_scale, keep_ratio: bool = True,
                 multiscale_mode: str = 'range', ratio_range=None):
        self.img_scale = img_scale
        self.keep_ratio = keep_ratio
        self.multiscale_mode = multiscale_mode
        self.ratio_range = ratio_range

    def _sample_scale(self, rng) -> Tuple[int, int]:
        sc = self.img_scale
        multi = isinstance(sc, (list, tuple)) and len(sc) > 0 and \
            isinstance(sc[0], (list, tuple))
        if multi:
            if self.multiscale_mode == 'value' or len(sc) != 2:
                sc = sc[int(rng.randint(len(sc)))]
            else:  # 'range': sample each edge between the two bounds
                longs = sorted(max(s) for s in sc)
                shorts = sorted(min(s) for s in sc)
                sc = (int(rng.randint(longs[0], longs[1] + 1)),
                      int(rng.randint(shorts[0], shorts[1] + 1)))
        if self.ratio_range is not None:
            r = float(rng.uniform(*self.ratio_range))
            sc = (int(max(sc) * r), int(min(sc) * r))
        return tuple(sc)

    def __call__(self, results):
        rng = results.get('_rng', np.random)
        h, w = results['img'].shape[:2]
        scale_hw = self._sample_scale(rng)
        long_edge, short_edge = max(scale_hw), min(scale_hw)
        if self.keep_ratio:
            scale = min(long_edge / max(h, w), short_edge / min(h, w))
            new_w, new_h = int(w * scale + 0.5), int(h * scale + 0.5)
        else:
            new_w, new_h = scale_hw
        img = _imresize(results['img'], (new_w, new_h))
        w_scale = new_w / w
        h_scale = new_h / h
        results['img'] = img
        results['img_shape'] = img.shape[:2]
        results['scale_factor'] = np.array(
            [w_scale, h_scale, w_scale, h_scale], np.float32)
        if 'gt_bboxes' in results:
            boxes = results['gt_bboxes'] * results['scale_factor']
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, new_w)
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, new_h)
            results['gt_bboxes'] = boxes
        return results


@PIPELINES.register_module()
class RandomFlip:
    """Horizontal flip with probability `flip_ratio`
    (reference `pipelines/transforms.py:323`)."""

    def __init__(self, flip_ratio: float = 0.5):
        self.flip_ratio = flip_ratio

    def __call__(self, results):
        rng: np.random.RandomState = results.get('_rng', np.random)
        flip = bool(rng.rand() < self.flip_ratio)
        results['flip'] = flip
        if flip:
            results['img'] = results['img'][:, ::-1]
            if 'gt_bboxes' in results:
                h, w = results['img_shape']
                boxes = results['gt_bboxes'].copy()
                boxes[:, 0] = w - results['gt_bboxes'][:, 2]
                boxes[:, 2] = w - results['gt_bboxes'][:, 0]
                results['gt_bboxes'] = boxes
            if 'gt_masks' in results:
                # box-frame rasters flip with the image
                results['gt_masks'] = results['gt_masks'][:, :, ::-1]
        return results


@PIPELINES.register_module()
class Normalize:
    """Mean/std normalize (reference `pipelines/transforms.py:669`).

    Defaults are the torchvision/ImageNet RGB stats used by every DA config
    (`da_configs/_base_/datasets/c2foggy.py:4-5`).
    """

    def __init__(self, mean=(123.675, 116.28, 103.53),
                 std=(58.395, 57.12, 57.375), to_rgb: bool = True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        # images are loaded RGB already; to_rgb kept for config compatibility
        self.to_rgb = to_rgb

    def __call__(self, results):
        img = results['img'].astype(np.float32)
        results['img'] = (img - self.mean) / self.std
        results['img_norm_cfg'] = dict(mean=self.mean, std=self.std)
        return results


@PIPELINES.register_module()
class Pad:
    """Pad to `size_divisor` or a fixed `size` (h, w)
    (reference `pipelines/transforms.py:570`)."""

    def __init__(self, size: Optional[Tuple[int, int]] = None,
                 size_divisor: Optional[int] = None, pad_val: float = 0.0):
        assert (size is None) != (size_divisor is None)
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val

    def __call__(self, results):
        img = results['img']
        h, w = img.shape[:2]
        if self.size_divisor:
            th = int(np.ceil(h / self.size_divisor)) * self.size_divisor
            tw = int(np.ceil(w / self.size_divisor)) * self.size_divisor
        else:
            th, tw = self.size
            if h > th or w > tw:
                raise ValueError(
                    f'Pad: resized image ({h}, {w}) exceeds the fixed canvas '
                    f'({th}, {tw}); it would be silently cropped. Enlarge '
                    f'`Pad.size` or tighten the Resize scale.')
        padded = np.full((th, tw) + img.shape[2:], self.pad_val, img.dtype)
        padded[:h, :w] = img
        results['img'] = padded
        results['pad_shape'] = (th, tw)
        return results


@PIPELINES.register_module()
class PhotoMetricDistortion:
    """Brightness/contrast/saturation/hue jitter
    (reference `pipelines/transforms.py:938`), numpy implementation."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta

    def __call__(self, results):
        rng: np.random.RandomState = results.get('_rng', np.random)
        img = results['img'].astype(np.float32)
        if rng.randint(2):
            img += rng.uniform(-self.brightness_delta, self.brightness_delta)
        if rng.randint(2):
            img *= rng.uniform(*self.contrast_range)
        # saturation via luminance mix (avoids HSV conversion cost)
        if rng.randint(2):
            gray = img.mean(axis=2, keepdims=True)
            alpha = rng.uniform(*self.saturation_range)
            img = gray + (img - gray) * alpha
        results['img'] = np.clip(img, 0, 255)
        return results


@PIPELINES.register_module()
class PackDetInputs:
    """Terminal stage: fixed-size arrays for device transfer.

    Replaces the reference's `DefaultFormatBundle`+`Collect`
    (`pipelines/formating.py:175,266`): instead of DataContainers carrying
    ragged tensors, gts are padded to `max_gt` with a validity mask and all
    meta becomes fixed-size numeric arrays.
    """

    def __init__(self, max_gt: int = 100, with_mask: bool = False,
                 with_full_masks: bool = False, full_mask_stride: int = 4,
                 with_semantic: bool = False, num_stuff: int = 1):
        self.max_gt = max_gt
        self.with_mask = with_mask
        # `gt_masks_full`: per-instance FULL-IMAGE rasters at 1/stride
        # resolution (SOLO/panoptic consumers), rebuilt from the box-frame
        # rasters by pasting each into its (resized) box
        self.with_full_masks = with_full_masks
        self.full_mask_stride = full_mask_stride
        # `gt_semantic_seg` derived from the instance rasters when the
        # dataset carries no stuff maps (the synth panoptic benchmark:
        # one background stuff class, things folded to id `num_stuff` —
        # the PanopticFPN semantic-head target convention, reference
        # `panoptic_fpn_head.py _set_things_to_void`)
        self.with_semantic = with_semantic
        self.num_stuff = num_stuff

    def __call__(self, results):
        img = results['img'].astype(np.float32)
        n = min(len(results.get('gt_labels', [])), self.max_gt)
        gt_bboxes = np.zeros((self.max_gt, 4), np.float32)
        gt_labels = np.zeros((self.max_gt,), np.int32)
        gt_valid = np.zeros((self.max_gt,), bool)
        if n:
            gt_bboxes[:n] = results['gt_bboxes'][:n]
            gt_labels[:n] = results['gt_labels'][:n]
            gt_valid[:n] = True
        extra = {}
        if self.with_mask:
            m = results.get('gt_masks')
            msize = m.shape[-1] if m is not None and m.size else 112
            packed = np.zeros((self.max_gt, msize, msize), np.uint8)
            if m is not None and n:
                packed[:n] = m[:n]
            extra['gt_masks'] = packed
        if self.with_full_masks:
            from PIL import Image
            st = self.full_mask_stride
            fh, fw = img.shape[0] // st, img.shape[1] // st
            full = np.zeros((self.max_gt, fh, fw), np.uint8)
            m = results.get('gt_masks')
            for gi in range(n):
                x1, y1, x2, y2 = results['gt_bboxes'][gi] / st
                bw = max(int(round(x2 - x1)), 1)
                bh = max(int(round(y2 - y1)), 1)
                if m is not None and m.size:
                    r = np.asarray(Image.fromarray(
                        (m[gi] * 255).astype(np.uint8)).resize(
                        (bw, bh), Image.BILINEAR)) > 127
                else:
                    r = np.ones((bh, bw), bool)
                xs, ys = int(round(x1)), int(round(y1))
                xe, ye = min(xs + bw, fw), min(ys + bh, fh)
                xs0, ys0 = max(xs, 0), max(ys, 0)
                if xe > xs0 and ye > ys0:
                    full[gi, ys0:ye, xs0:xe] = r[ys0 - ys:ye - ys,
                                                xs0 - xs:xe - xs]
            extra['gt_masks_full'] = full
            if self.with_semantic:
                # stuff id 0 = background everywhere no thing lives;
                # thing pixels fold to id num_stuff
                sem = np.zeros(full.shape[1:], np.int32)
                if n:
                    sem[full[:n].any(axis=0)] = self.num_stuff
                extra['gt_semantic_seg'] = sem
        if self.with_semantic and not self.with_full_masks:
            raise ValueError('with_semantic requires with_full_masks '
                             '(semantic maps derive from instance rasters)')
        return dict(
            **extra,
            image=img,
            img_shape=np.asarray(results['img_shape'], np.int32),
            ori_shape=np.asarray(results['ori_shape'], np.int32),
            scale_factor=results.get(
                'scale_factor', np.ones((4,), np.float32)),
            flip=np.asarray(results.get('flip', False)),
            gt_bboxes=gt_bboxes,
            gt_labels=gt_labels,
            gt_valid=gt_valid,
            domain=np.asarray(results.get('domain', 0), np.int32),
        )


@PIPELINES.register_module()
class MultiScaleFlipAug:
    """Test-time wrapper (reference `pipelines/test_time_aug.py:11`).

    The DA configs use it with a single scale and flip=False — i.e. a plain
    test pipeline — which is what this implements. True multi-scale/flip TTA
    (list outputs + `merge_aug_bboxes`) is not yet supported; configs
    requesting it fail loudly rather than silently evaluating single-scale.
    """

    def __init__(self, transforms, img_scale=None, flip=False,
                 scale_factor=None):
        if flip or (isinstance(img_scale, list) and len(img_scale) > 1):
            raise NotImplementedError(
                'config-driven multi-scale TTA is not wired; use '
                'run_inference(flip_tta=True) / tools/test.py --flip-tta '
                'for flip TTA, single scale otherwise')
        self.inner = Compose(transforms)

    def __call__(self, results):
        return self.inner(results)


@PIPELINES.register_module()
class Compose:
    """Chain of transforms (reference `pipelines/compose.py:10`)."""

    def __init__(self, transforms):
        from ...utils.registry import PIPELINES as REG
        self.transforms = [
            t if callable(t) else REG.build(t) for t in transforms
        ]

    def __call__(self, results):
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results


@PIPELINES.register_module()
class RandomCrop:
    """Random crop with box filtering (reference `pipelines/transforms.py:710`).

    `crop_type`: 'absolute' (fixed crop_size) or 'absolute_range'
    (crop h/w drawn uniformly from [crop_size[0], crop_size[1]] each —
    the Swin/DETR ms-crop recipe, reference configs/swin/*ms-crop-3x*).
    Box-frame mask rasters ride their surviving boxes unchanged (rasters
    live in the box frame, so pure translation is a no-op; edge-clipped
    boxes keep the full-object raster — documented deviation)."""

    def __init__(self, crop_size, crop_type: str = 'absolute',
                 allow_negative_crop: bool = False):
        assert crop_type in ('absolute', 'absolute_range'), crop_type
        self.crop_size = crop_size   # (h, w) or (min, max) for range
        self.crop_type = crop_type
        self.allow_negative_crop = allow_negative_crop

    def __call__(self, results):
        rng: np.random.RandomState = results.get('_rng', np.random)
        img = results['img']
        h, w = img.shape[:2]
        if self.crop_type == 'absolute_range':
            lo, hi = self.crop_size
            ch = min(rng.randint(lo, hi + 1), h)
            cw = min(rng.randint(lo, hi + 1), w)
        else:
            ch, cw = min(self.crop_size[0], h), min(self.crop_size[1], w)
        y0 = rng.randint(0, h - ch + 1)
        x0 = rng.randint(0, w - cw + 1)
        results['img'] = img[y0:y0 + ch, x0:x0 + cw]
        results['img_shape'] = (ch, cw)
        if 'gt_bboxes' in results:
            boxes = results['gt_bboxes'] - np.array([x0, y0, x0, y0],
                                                    np.float32)
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, cw)
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, ch)
            keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
            if not keep.any() and not self.allow_negative_crop:
                # revert (keeps at least one box — mmdet returns None;
                # rejecting samples breaks fixed-length epochs, so keep orig)
                results['img'] = img
                results['img_shape'] = (h, w)
                return results
            results['gt_bboxes'] = boxes[keep]
            results['gt_labels'] = results['gt_labels'][keep]
            if 'gt_masks' in results:
                results['gt_masks'] = results['gt_masks'][keep]
        return results


@PIPELINES.register_module()
class Expand:
    """Paste the image onto a larger mean-filled canvas
    (reference `pipelines/transforms.py:1042`)."""

    def __init__(self, mean=(123.675, 116.28, 103.53), ratio_range=(1, 4),
                 prob: float = 0.5):
        self.mean = np.asarray(mean, np.float32)
        self.ratio_range = ratio_range
        self.prob = prob

    def __call__(self, results):
        rng: np.random.RandomState = results.get('_rng', np.random)
        if rng.rand() > self.prob:
            return results
        img = results['img']
        h, w = img.shape[:2]
        ratio = rng.uniform(*self.ratio_range)
        eh, ew = int(h * ratio), int(w * ratio)
        y0 = rng.randint(0, eh - h + 1)
        x0 = rng.randint(0, ew - w + 1)
        canvas = np.empty((eh, ew, 3), img.dtype)
        canvas[...] = self.mean if img.dtype == np.float32 else \
            self.mean.astype(img.dtype)
        canvas[y0:y0 + h, x0:x0 + w] = img
        results['img'] = canvas
        results['img_shape'] = (eh, ew)
        if 'gt_bboxes' in results:
            results['gt_bboxes'] = results['gt_bboxes'] + \
                np.array([x0, y0, x0, y0], np.float32)
        return results


@PIPELINES.register_module()
class MinIoURandomCrop:
    """IoU-constrained random crop (reference `pipelines/transforms.py:1134`)."""

    def __init__(self, min_ious=(0.1, 0.3, 0.5, 0.7, 0.9),
                 min_crop_size: float = 0.3, max_attempts: int = 50):
        self.min_ious = (1.0,) + tuple(min_ious)
        self.min_crop_size = min_crop_size
        self.max_attempts = max_attempts

    def __call__(self, results):
        rng: np.random.RandomState = results.get('_rng', np.random)
        img = results['img']
        h, w = img.shape[:2]
        boxes = results.get('gt_bboxes', np.zeros((0, 4), np.float32))
        min_iou = self.min_ious[rng.randint(len(self.min_ious))]
        if min_iou == 1.0 or len(boxes) == 0:
            return results
        for _ in range(self.max_attempts):
            cw = int(rng.uniform(self.min_crop_size, 1.0) * w)
            ch = int(rng.uniform(self.min_crop_size, 1.0) * h)
            if cw / max(ch, 1) < 0.5 or cw / max(ch, 1) > 2:
                continue
            x0 = rng.randint(0, w - cw + 1)
            y0 = rng.randint(0, h - ch + 1)
            patch = np.array([x0, y0, x0 + cw, y0 + ch], np.float32)
            lt = np.maximum(boxes[:, :2], patch[:2])
            rb = np.minimum(boxes[:, 2:], patch[2:])
            wh = np.maximum(rb - lt, 0)
            inter = wh[:, 0] * wh[:, 1]
            area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            ious = inter / np.maximum(area, 1e-6)
            if ious.min() < min_iou:
                continue
            ctr = (boxes[:, :2] + boxes[:, 2:]) / 2
            keep = ((ctr[:, 0] > patch[0]) & (ctr[:, 0] < patch[2]) &
                    (ctr[:, 1] > patch[1]) & (ctr[:, 1] < patch[3]))
            if not keep.any():
                continue
            results['img'] = img[y0:y0 + ch, x0:x0 + cw]
            results['img_shape'] = (ch, cw)
            nb = boxes[keep] - np.array([x0, y0, x0, y0], np.float32)
            nb[:, 0::2] = nb[:, 0::2].clip(0, cw)
            nb[:, 1::2] = nb[:, 1::2].clip(0, ch)
            results['gt_bboxes'] = nb
            results['gt_labels'] = results['gt_labels'][keep]
            return results
        return results


@PIPELINES.register_module()
class CutOut:
    """Random rectangular dropout (reference `pipelines/transforms.py:1871`)."""

    def __init__(self, n_holes=1, cutout_ratio=(0.1, 0.2), fill_in=(0, 0, 0)):
        self.n_holes = n_holes if isinstance(n_holes, tuple) else \
            (n_holes, n_holes)
        self.cutout_ratio = cutout_ratio
        self.fill_in = fill_in

    def __call__(self, results):
        rng: np.random.RandomState = results.get('_rng', np.random)
        img = results['img'].copy()
        h, w = img.shape[:2]
        n = rng.randint(self.n_holes[0], self.n_holes[1] + 1)
        for _ in range(n):
            rw = rng.uniform(*self.cutout_ratio)
            rh = rng.uniform(*self.cutout_ratio)
            cw, ch = int(w * rw), int(h * rh)
            x0 = rng.randint(0, max(w - cw, 1))
            y0 = rng.randint(0, max(h - ch, 1))
            img[y0:y0 + ch, x0:x0 + cw] = self.fill_in
        results['img'] = img
        return results


@PIPELINES.register_module()
class Mosaic:
    """4-image mosaic (reference `pipelines/transforms.py:1945`): paste the
    sample and 3 `mix_results` images around a jittered center on a 2× canvas.
    Requires a `MultiImageMixDataset` wrapper to supply `mix_results`."""

    def __init__(self, img_scale=(640, 640), center_ratio_range=(0.5, 1.5),
                 pad_val: float = 114.0):
        self.img_scale = img_scale          # (h, w) of one tile
        self.center_ratio_range = center_ratio_range
        self.pad_val = pad_val

    def __call__(self, results):
        rng: np.random.RandomState = results.get('_rng', np.random)
        assert 'mix_results' in results and len(results['mix_results']) == 3
        h, w = self.img_scale
        canvas = np.full((2 * h, 2 * w, 3), self.pad_val, np.float32)
        cx = int(rng.uniform(*self.center_ratio_range) * w)
        cy = int(rng.uniform(*self.center_ratio_range) * h)
        all_boxes, all_labels = [], []
        items = [results] + list(results['mix_results'])
        # tl, tr, bl, br placements around (cx, cy)
        for pos, item in zip(('tl', 'tr', 'bl', 'br'), items):
            img = item['img'].astype(np.float32)
            ih, iw = img.shape[:2]
            scale = min(h / ih, w / iw)
            nw, nh = int(iw * scale), int(ih * scale)
            img = _imresize(img.astype(np.uint8), (nw, nh)).astype(np.float32)
            if pos == 'tl':
                x1, y1 = max(cx - nw, 0), max(cy - nh, 0)
                x2, y2 = cx, cy
            elif pos == 'tr':
                x1, y1 = cx, max(cy - nh, 0)
                x2, y2 = min(cx + nw, 2 * w), cy
            elif pos == 'bl':
                x1, y1 = max(cx - nw, 0), cy
                x2, y2 = cx, min(cy + nh, 2 * h)
            else:
                x1, y1 = cx, cy
                x2, y2 = min(cx + nw, 2 * w), min(cy + nh, 2 * h)
            cw, ch = x2 - x1, y2 - y1
            if cw <= 0 or ch <= 0:
                continue
            # crop the resized image region adjacent to the center corner
            sx = nw - cw if pos in ('tl', 'bl') else 0
            sy = nh - ch if pos in ('tl', 'tr') else 0
            canvas[y1:y2, x1:x2] = img[sy:sy + ch, sx:sx + cw]
            boxes = item.get('gt_bboxes', np.zeros((0, 4), np.float32))
            if len(boxes):
                b = boxes * scale
                b[:, 0::2] += x1 - sx
                b[:, 1::2] += y1 - sy
                b[:, 0::2] = b[:, 0::2].clip(0, 2 * w)
                b[:, 1::2] = b[:, 1::2].clip(0, 2 * h)
                keep = (b[:, 2] - b[:, 0] > 2) & (b[:, 3] - b[:, 1] > 2)
                all_boxes.append(b[keep])
                all_labels.append(
                    item['gt_labels'][:len(boxes)][keep])
        results['img'] = canvas
        results['img_shape'] = canvas.shape[:2]
        results['gt_bboxes'] = np.concatenate(all_boxes) if all_boxes else \
            np.zeros((0, 4), np.float32)
        results['gt_labels'] = np.concatenate(all_labels) if all_labels else \
            np.zeros((0,), np.int64)
        results.pop('mix_results')
        return results


@PIPELINES.register_module()
class MixUp:
    """Two-image mixup (reference `pipelines/transforms.py:2200`, simplified:
    same-canvas blend + box union)."""

    def __init__(self, ratio_range=(0.5, 1.5), pad_val: float = 114.0):
        self.ratio_range = ratio_range
        self.pad_val = pad_val

    def __call__(self, results):
        rng: np.random.RandomState = results.get('_rng', np.random)
        assert 'mix_results' in results and len(results['mix_results']) >= 1
        other = results['mix_results'][0]
        img = results['img'].astype(np.float32)
        oimg = other['img'].astype(np.float32)
        h = max(img.shape[0], oimg.shape[0])
        w = max(img.shape[1], oimg.shape[1])
        canvas = np.full((h, w, 3), self.pad_val, np.float32)
        canvas[:img.shape[0], :img.shape[1]] = img
        ocanvas = np.full((h, w, 3), self.pad_val, np.float32)
        ocanvas[:oimg.shape[0], :oimg.shape[1]] = oimg
        lam = 0.5
        results['img'] = canvas * lam + ocanvas * (1 - lam)
        results['img_shape'] = (h, w)
        results['gt_bboxes'] = np.concatenate([
            results.get('gt_bboxes', np.zeros((0, 4), np.float32)),
            other.get('gt_bboxes', np.zeros((0, 4), np.float32))])
        results['gt_labels'] = np.concatenate([
            results.get('gt_labels', np.zeros((0,), np.int64)),
            other.get('gt_labels', np.zeros((0,), np.int64))])
        results.pop('mix_results')
        return results


@PIPELINES.register_module()
class LoadProposals:
    """Load precomputed proposals into the results dict (reference
    `pipelines/loading.py:500`): expects `results['proposals']` provided by
    the dataset (e.g. from a standalone RPN run saved with `--out`), pads
    or truncates to `num_max_proposals`."""

    def __init__(self, num_max_proposals: int = 1000):
        self.num_max = num_max_proposals

    def __call__(self, results):
        props = np.asarray(results.get('proposals',
                                       np.zeros((0, 4), np.float32)),
                           np.float32)
        if props.shape[-1] == 5:
            props = props[:, :4]
        n = min(len(props), self.num_max)
        out = np.zeros((self.num_max, 4), np.float32)
        out[:n] = props[:n]
        results['proposals'] = out
        results['proposals_valid'] = np.arange(self.num_max) < n
        return results


@PIPELINES.register_module()
class RandomAffine:
    """Random affine (reference `pipelines/transforms.py:2444`, the YOLOX
    geometric aug): rotation/scale/shear/translate as one 3x3 warp applied
    to image (inverse-mapped bilinear) and boxes (corner transform +
    clip + degenerate filter)."""

    def __init__(self, max_rotate_degree: float = 10.0,
                 max_translate_ratio: float = 0.1,
                 scaling_ratio_range=(0.5, 1.5),
                 max_shear_degree: float = 2.0,
                 border_val: float = 114.0,
                 min_bbox_size: float = 2.0):
        self.max_rot = max_rotate_degree
        self.max_tr = max_translate_ratio
        self.scale_range = scaling_ratio_range
        self.max_shear = max_shear_degree
        self.border_val = border_val
        self.min_bbox = min_bbox_size

    def _matrix(self, rng, h, w):
        ang = np.deg2rad(rng.uniform(-self.max_rot, self.max_rot))
        sc = rng.uniform(*self.scale_range)
        shx = np.deg2rad(rng.uniform(-self.max_shear, self.max_shear))
        shy = np.deg2rad(rng.uniform(-self.max_shear, self.max_shear))
        tx = rng.uniform(-self.max_tr, self.max_tr) * w
        ty = rng.uniform(-self.max_tr, self.max_tr) * h
        rot = np.array([[np.cos(ang) * sc, -np.sin(ang) * sc, 0],
                        [np.sin(ang) * sc, np.cos(ang) * sc, 0],
                        [0, 0, 1]])
        shear = np.array([[1, np.tan(shx), 0], [np.tan(shy), 1, 0],
                          [0, 0, 1]])
        trans = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]])
        # rotate/scale/shear around the image center
        c = np.array([[1, 0, w / 2], [0, 1, h / 2], [0, 0, 1]])
        ci = np.array([[1, 0, -w / 2], [0, 1, -h / 2], [0, 0, 1]])
        return trans @ c @ shear @ rot @ ci

    def __call__(self, results):
        rng: np.random.RandomState = results.get('_rng', np.random)
        img = results['img']
        h, w = img.shape[:2]
        m = self._matrix(rng, h, w)
        minv = np.linalg.inv(m)
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        src_x = minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]
        src_y = minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]
        x0 = np.floor(src_x).astype(int)
        y0 = np.floor(src_y).astype(int)
        fx = src_x - x0
        fy = src_y - y0
        valid = (src_x >= 0) & (src_x < w - 1) & (src_y >= 0) & \
            (src_y < h - 1)
        x0c = np.clip(x0, 0, w - 2)
        y0c = np.clip(y0, 0, h - 2)
        imgf = img.astype(np.float32)
        out = (imgf[y0c, x0c] * ((1 - fx) * (1 - fy))[..., None]
               + imgf[y0c, x0c + 1] * (fx * (1 - fy))[..., None]
               + imgf[y0c + 1, x0c] * ((1 - fx) * fy)[..., None]
               + imgf[y0c + 1, x0c + 1] * (fx * fy)[..., None])
        out = np.where(valid[..., None], out, self.border_val)
        results['img'] = out.astype(img.dtype)

        boxes = results.get('gt_bboxes')
        if boxes is not None and len(boxes):
            corners = np.stack([
                boxes[:, [0, 1]], boxes[:, [2, 1]],
                boxes[:, [0, 3]], boxes[:, [2, 3]]], axis=1)  # (G, 4, 2)
            ones = np.ones((*corners.shape[:2], 1))
            warped = np.concatenate([corners, ones], -1) @ m.T
            xy = warped[..., :2]
            new = np.concatenate([xy.min(1), xy.max(1)], -1)
            new[:, [0, 2]] = new[:, [0, 2]].clip(0, w)
            new[:, [1, 3]] = new[:, [1, 3]].clip(0, h)
            ok = ((new[:, 2] - new[:, 0]) > self.min_bbox) & \
                ((new[:, 3] - new[:, 1]) > self.min_bbox)
            results['gt_bboxes'] = new[ok].astype(np.float32)
            if 'gt_labels' in results:
                results['gt_labels'] = results['gt_labels'][ok]
            if 'gt_masks' in results:
                results['gt_masks'] = results['gt_masks'][ok]
        return results
