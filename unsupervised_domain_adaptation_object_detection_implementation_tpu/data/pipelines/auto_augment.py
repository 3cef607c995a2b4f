"""AutoAugment detection policies (reference
`mmdet/datasets/pipelines/auto_augment.py`, 894 LoC).

Implements the v1 policy set and the individual ops — Shear, Rotate,
Translate, color ops (ColorTransform / BrightnessTransform /
ContrastTransform / EqualizeTransform) — over the same numpy result-dict
contract as `transforms.py`. Geometric ops use inverse-mapped affine
warps (pure numpy, no cv2 dependency) and transform gt boxes by their
warped corners, clipping and filtering like the reference.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ...utils.registry import PIPELINES

_MAX_LEVEL = 10


def level_to_value(level: float, max_value: float) -> float:
    return level / _MAX_LEVEL * max_value


def _affine_warp(img: np.ndarray, inv: np.ndarray,
                 fill: Sequence[float]) -> np.ndarray:
    """Inverse-mapped affine warp: out[y, x] = img[inv @ (x, y, 1)]
    (nearest neighbor, matching cv2.warpAffine INTER_NEAREST closely
    enough for augmentation purposes)."""
    h, w = img.shape[:2]
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    src_x = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    src_y = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    xi = np.round(src_x).astype(np.int64)
    yi = np.round(src_y).astype(np.int64)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    out = np.empty_like(img)
    out[...] = np.asarray(fill, img.dtype)
    out[valid] = img[yi[valid], xi[valid]]
    return out


def _warp_boxes(boxes: np.ndarray, mat: np.ndarray, h: int, w: int
                ) -> np.ndarray:
    """Forward-transform box corners, take the enclosing box, clip."""
    if len(boxes) == 0:
        return boxes
    corners = np.stack([
        boxes[:, [0, 1]], boxes[:, [2, 1]],
        boxes[:, [0, 3]], boxes[:, [2, 3]]], axis=1)       # (N, 4, 2)
    ones = np.ones((*corners.shape[:2], 1))
    pts = np.concatenate([corners, ones], axis=-1) @ mat.T  # (N, 4, 2)
    x1 = pts[..., 0].min(1).clip(0, w)
    y1 = pts[..., 1].min(1).clip(0, h)
    x2 = pts[..., 0].max(1).clip(0, w)
    y2 = pts[..., 1].max(1).clip(0, h)
    return np.stack([x1, y1, x2, y2], -1).astype(np.float32)


def _filter_boxes(results, min_size: float = 1.0):
    if 'gt_bboxes' not in results:
        return results
    b = results['gt_bboxes']
    keep = ((b[:, 2] - b[:, 0]) >= min_size) & \
        ((b[:, 3] - b[:, 1]) >= min_size)
    results['gt_bboxes'] = b[keep]
    for k in ('gt_labels', 'gt_masks'):
        if k in results:
            results[k] = results[k][keep]
    return results


class _GeometricOp:
    def __init__(self, prob: float, img_fill_val=128):
        self.prob = prob
        self.fill = ([img_fill_val] * 3
                     if np.isscalar(img_fill_val) else list(img_fill_val))

    def _matrices(self, results):
        raise NotImplementedError

    def __call__(self, results):
        rng = results.get('_rng', np.random)
        if rng.rand() > self.prob:
            return results
        mat, inv = self._matrices(results, rng)
        h, w = results['img'].shape[:2]
        results['img'] = _affine_warp(results['img'], inv, self.fill)
        if 'gt_bboxes' in results:
            results['gt_bboxes'] = _warp_boxes(results['gt_bboxes'], mat,
                                               h, w)
        return _filter_boxes(results)


@PIPELINES.register_module()
class Shear(_GeometricOp):
    """`auto_augment.py:Shear`."""

    def __init__(self, level: float, prob: float = 0.5,
                 direction: str = 'horizontal', img_fill_val=128,
                 random_negative_prob: float = 0.5):
        super().__init__(prob, img_fill_val)
        self.magnitude = level_to_value(level, 0.3)
        self.direction = direction
        self.rnp = random_negative_prob

    def _matrices(self, results, rng):
        m = self.magnitude * (-1 if rng.rand() < self.rnp else 1)
        if self.direction == 'horizontal':
            mat = np.array([[1, m, 0], [0, 1, 0]], float)
            inv = np.array([[1, -m, 0], [0, 1, 0]], float)
        else:
            mat = np.array([[1, 0, 0], [m, 1, 0]], float)
            inv = np.array([[1, 0, 0], [-m, 1, 0]], float)
        return mat, inv


@PIPELINES.register_module()
class Rotate(_GeometricOp):
    """`auto_augment.py:Rotate` — rotation about the image center."""

    def __init__(self, level: float, prob: float = 0.5, img_fill_val=128,
                 max_rotate_angle: float = 30.0,
                 random_negative_prob: float = 0.5):
        super().__init__(prob, img_fill_val)
        self.angle = level_to_value(level, max_rotate_angle)
        self.rnp = random_negative_prob

    def _matrices(self, results, rng):
        a = np.deg2rad(self.angle * (-1 if rng.rand() < self.rnp else 1))
        h, w = results['img'].shape[:2]
        cx, cy = (w - 1) / 2, (h - 1) / 2
        c, s = np.cos(a), np.sin(a)

        def about_center(cc, ss):
            return np.array([
                [cc, -ss, cx - cc * cx + ss * cy],
                [ss, cc, cy - ss * cx - cc * cy]], float)
        return about_center(c, s), about_center(c, -s)


@PIPELINES.register_module()
class Translate(_GeometricOp):
    """`auto_augment.py:Translate` — offset is a fraction of the image
    extent on the chosen axis."""

    def __init__(self, level: float, prob: float = 0.5,
                 direction: str = 'horizontal', img_fill_val=128,
                 max_translate_offset: float = 250.0,
                 random_negative_prob: float = 0.5):
        super().__init__(prob, img_fill_val)
        self.offset = int(level_to_value(level, max_translate_offset))
        self.direction = direction
        self.rnp = random_negative_prob

    def _matrices(self, results, rng):
        off = self.offset * (-1 if rng.rand() < self.rnp else 1)
        if self.direction == 'horizontal':
            mat = np.array([[1, 0, off], [0, 1, 0]], float)
            inv = np.array([[1, 0, -off], [0, 1, 0]], float)
        else:
            mat = np.array([[1, 0, 0], [0, 1, off]], float)
            inv = np.array([[1, 0, 0], [0, 1, -off]], float)
        return mat, inv


@PIPELINES.register_module()
class ColorTransform:
    """`auto_augment.py:ColorTransform`: blend toward grayscale."""

    def __init__(self, level: float, prob: float = 0.5):
        self.factor = 1.0 + level_to_value(level, 1.8) - 0.9
        self.prob = prob

    def __call__(self, results):
        rng = results.get('_rng', np.random)
        if rng.rand() > self.prob:
            return results
        img = results['img'].astype(np.float32)
        gray = img @ np.array([0.299, 0.587, 0.114], np.float32)
        gray = gray[..., None].repeat(3, -1)
        out = gray + self.factor * (img - gray)
        results['img'] = out.clip(0, 255).astype(results['img'].dtype)
        return results


@PIPELINES.register_module()
class BrightnessTransform:
    def __init__(self, level: float, prob: float = 0.5):
        self.factor = 1.0 + level_to_value(level, 1.8) - 0.9
        self.prob = prob

    def __call__(self, results):
        rng = results.get('_rng', np.random)
        if rng.rand() > self.prob:
            return results
        img = results['img'].astype(np.float32) * self.factor
        results['img'] = img.clip(0, 255).astype(results['img'].dtype)
        return results


@PIPELINES.register_module()
class ContrastTransform:
    def __init__(self, level: float, prob: float = 0.5):
        self.factor = 1.0 + level_to_value(level, 1.8) - 0.9
        self.prob = prob

    def __call__(self, results):
        rng = results.get('_rng', np.random)
        if rng.rand() > self.prob:
            return results
        img = results['img'].astype(np.float32)
        mean = img.mean()
        out = mean + self.factor * (img - mean)
        results['img'] = out.clip(0, 255).astype(results['img'].dtype)
        return results


@PIPELINES.register_module()
class EqualizeTransform:
    """Per-channel histogram equalization (`auto_augment.py:Equalize`)."""

    def __init__(self, prob: float = 0.5):
        self.prob = prob

    def __call__(self, results):
        rng = results.get('_rng', np.random)
        if rng.rand() > self.prob:
            return results
        img = results['img']
        out = np.empty_like(img)
        for c in range(img.shape[-1]):
            ch = img[..., c]
            hist = np.bincount(ch.ravel(), minlength=256)
            nonzero = hist[hist > 0]
            if len(nonzero) <= 1:
                out[..., c] = ch
                continue
            step = (hist.sum() - nonzero[-1]) // 255
            if step == 0:
                out[..., c] = ch
                continue
            lut = (np.cumsum(hist) - hist // 2) // step
            lut = np.clip(np.concatenate([[0], lut[:-1]]), 0, 255)
            out[..., c] = lut[ch]
        results['img'] = out
        return results


@PIPELINES.register_module()
class AutoAugment:
    """Policy container (`auto_augment.py:AutoAugment`): picks one random
    sub-policy (a list of transform configs) per call."""

    def __init__(self, policies: List[List[dict]]):
        self.policies = [
            [PIPELINES.build(cfg) for cfg in policy]
            for policy in policies
        ]

    def __call__(self, results):
        rng = results.get('_rng', np.random)
        policy = self.policies[rng.randint(len(self.policies))]
        for t in policy:
            results = t(results)
        return results


def autoaug_policy_v0() -> List[List[dict]]:
    """The reference's `policies_v0`-style detection policy
    (auto_augment.py docstring policies)."""
    return [
        [dict(type='Translate', level=8, prob=0.6),
         dict(type='Rotate', level=10, prob=0.6)],
        [dict(type='ColorTransform', level=6, prob=0.6),
         dict(type='EqualizeTransform', prob=0.8)],
        [dict(type='Shear', level=8, prob=0.6, direction='vertical'),
         dict(type='BrightnessTransform', level=6, prob=0.6)],
        [dict(type='Rotate', level=6, prob=0.8),
         dict(type='ContrastTransform', level=4, prob=0.6)],
        [dict(type='Translate', level=4, prob=0.6,
              direction='vertical'),
         dict(type='Shear', level=6, prob=0.6)],
    ]
