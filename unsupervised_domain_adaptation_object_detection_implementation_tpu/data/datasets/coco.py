"""COCO-json dataset (reference `mmdet/datasets/coco.py:23`).

Self-contained json parsing (pycocotools is not a dependency) and a
COCO-protocol bbox evaluation: AP averaged over IoU .50:.95 with 101-point
interpolated precision, per the COCOeval definition — implemented directly
over our tp/fp machinery.
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Dict, List

import numpy as np

from ...core.eval.mean_ap import _overlaps
from ...utils.registry import DATASETS
from .custom import CustomDataset


@DATASETS.register_module()
class CocoDataset(CustomDataset):
    CLASSES = (
        'person', 'bicycle', 'car', 'motorcycle', 'airplane', 'bus', 'train',
        'truck', 'boat', 'traffic light', 'fire hydrant', 'stop sign',
        'parking meter', 'bench', 'bird', 'cat', 'dog', 'horse', 'sheep',
        'cow', 'elephant', 'bear', 'zebra', 'giraffe', 'backpack', 'umbrella',
        'handbag', 'tie', 'suitcase', 'frisbee', 'skis', 'snowboard',
        'sports ball', 'kite', 'baseball bat', 'baseball glove', 'skateboard',
        'surfboard', 'tennis racket', 'bottle', 'wine glass', 'cup', 'fork',
        'knife', 'spoon', 'bowl', 'banana', 'apple', 'sandwich', 'orange',
        'broccoli', 'carrot', 'hot dog', 'pizza', 'donut', 'cake', 'chair',
        'couch', 'potted plant', 'bed', 'dining table', 'toilet', 'tv',
        'laptop', 'mouse', 'remote', 'keyboard', 'cell phone', 'microwave',
        'oven', 'toaster', 'sink', 'refrigerator', 'book', 'clock', 'vase',
        'scissors', 'teddy bear', 'hair drier', 'toothbrush')

    def load_annotations(self, ann_file: str) -> List[dict]:
        with open(ann_file) as f:
            coco = json.load(f)
        cats = sorted(coco['categories'], key=lambda c: c['id'])
        # an explicit `classes=` subset filters annotations to those names
        # (reference mmdet/datasets/coco.py get_cat_ids); otherwise derive
        # the table from the json when it disagrees with the default
        if not getattr(self, 'custom_classes', False) and (
                not self.CLASSES or len(self.CLASSES) != len(cats)):
            self.CLASSES = tuple(c['name'] for c in cats)
            self.cat2label = {c: i for i, c in enumerate(self.CLASSES)}
        catid2label = {c['id']: self.cat2label[c['name']] for c in cats
                       if c['name'] in self.cat2label}
        anns_by_img = defaultdict(list)
        for a in coco.get('annotations', []):
            anns_by_img[a['image_id']].append(a)
        infos = []
        for img in coco['images']:
            bboxes, labels, masks = [], [], []
            bboxes_ignore, labels_ignore = [], []
            for a in anns_by_img[img['id']]:
                if a.get('ignore') or a['category_id'] not in catid2label:
                    continue
                x, y, w, h = a['bbox']
                box = [x, y, x + w, y + h]
                if a.get('iscrowd'):
                    bboxes_ignore.append(box)
                    labels_ignore.append(catid2label[a['category_id']])
                else:
                    bboxes.append(box)
                    labels.append(catid2label[a['category_id']])
                    seg = a.get('segmentation')
                    masks.append(seg if isinstance(seg, list) else [])
            ann = dict(
                bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
                labels=np.asarray(labels, np.int64),
                bboxes_ignore=np.asarray(bboxes_ignore,
                                         np.float32).reshape(-1, 4),
                labels_ignore=np.asarray(labels_ignore, np.int64),
                masks=masks,
            )
            infos.append(dict(id=img['id'], filename=img['file_name'],
                              width=img['width'], height=img['height'],
                              ann=ann))
        return infos

    def evaluate(self, results, metric: str = 'bbox', logger=None,
                 **kwargs) -> Dict[str, float]:
        if metric == 'mAP':   # VOC-style fallback
            return super().evaluate(results, metric='mAP',
                                    use_legacy_coordinate=False, **kwargs)
        assert metric == 'bbox'
        annotations = [self.get_ann_info(i) for i in range(len(self))]
        iou_thrs = np.arange(0.5, 1.0, 0.05)
        n = len(self.CLASSES)
        aps = coco_style_ap(results, annotations, iou_thrs, n)
        out = {
            'bbox_mAP': float(np.mean(aps)),
            'bbox_mAP_50': float(aps[0]),
            'bbox_mAP_75': float(aps[5]),
        }
        # area-range breakdown (COCOeval small/medium/large; the reference
        # reports these via pycocotools, mmdet/datasets/coco.py:364)
        for key, rng in (('s', AREA_SMALL), ('m', AREA_MEDIUM),
                         ('l', AREA_LARGE)):
            a = coco_style_ap(results, annotations, iou_thrs, n,
                              area_rng=rng)
            out[f'bbox_mAP_{key}'] = float(np.mean(a))
        return out


# COCOeval area ranges (pycocotools cocoeval.py Params: areaRng)
AREA_ALL = (0.0, 1e10)
AREA_SMALL = (0.0, 32.0 ** 2)
AREA_MEDIUM = (32.0 ** 2, 96.0 ** 2)
AREA_LARGE = (96.0 ** 2, 1e10)


def _coco_ious(d: np.ndarray, g: np.ndarray,
               iscrowd: np.ndarray) -> np.ndarray:
    """Pairwise det×gt IoU with COCO crowd semantics: against a crowd gt
    the denominator is the DET area alone (pycocotools maskUtils.iou)."""
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    lt = np.maximum(d[:, None, :2], g[None, :, :2])
    rb = np.minimum(d[:, None, 2:4], g[None, :, 2:4])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    da = ((d[:, 2] - d[:, 0]) * (d[:, 3] - d[:, 1]))[:, None]
    ga = ((g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1]))[None, :]
    union = np.where(iscrowd[None, :], da, da + ga - inter)
    return inter / np.maximum(union, np.finfo(np.float64).eps)


def _match_one_image(d, g, iscrowd, gt_ig, iou_thrs, max_dets):
    """COCOeval.evaluateImg matching for one image & class.

    `d` (n,5) dets; `g` (m,4) gts (crowd included); `iscrowd`/`gt_ig`
    (m,) bools. Returns (scores (n',), dt_matched (T,n'), dt_ig (T,n'))
    with n' = min(n, max_dets) dets in stable score-descending order.
    Matching per pycocotools: gts sorted ignore-last; a det takes the
    best-IoU gt ≥ thr (ties → later gt); crowd gts are reusable; once a
    non-ignore match is held, ignore gts cannot displace it; unmatched
    dets falling outside the gt area range are marked ignore.
    """
    order = np.argsort(-d[:, -1], kind='mergesort')[:max_dets]
    d = d[order]
    gt_order = np.argsort(gt_ig, kind='mergesort')   # non-ignored first
    g, iscrowd, gt_ig = g[gt_order], iscrowd[gt_order], gt_ig[gt_order]
    ious = _coco_ious(d[:, :4], g, iscrowd)
    T, n, m = len(iou_thrs), len(d), len(g)
    dtm = np.zeros((T, n), bool)
    dt_ig = np.zeros((T, n), bool)
    for t, thr in enumerate(iou_thrs):
        gtm = np.zeros(m, bool)
        for i in range(n):
            best = min(thr, 1 - 1e-10)
            match = -1
            for j in range(m):
                if gtm[j] and not iscrowd[j]:
                    continue
                if match > -1 and not gt_ig[match] and gt_ig[j]:
                    break
                if ious[i, j] < best:
                    continue
                best = ious[i, j]
                match = j
            if match == -1:
                continue
            dtm[t, i] = True
            dt_ig[t, i] = gt_ig[match]
            gtm[match] = True
    return d[:, -1], dtm, dt_ig


def coco_style_ap(det_results, annotations, iou_thrs, num_classes,
                  max_dets: int = 100, area_rng=None) -> np.ndarray:
    """COCO AP with full COCOeval semantics (pycocotools cocoeval.py:
    evaluateImg + accumulate; the reference evaluates through COCOeval at
    `mmdet/datasets/coco.py:364`).

    Implements: per-image top-`max_dets` by stable score sort, crowd gts
    as reusable ignore regions (IoU over det area), gts outside
    `area_rng` ignored, unmatched dets outside `area_rng` ignored,
    101-point interpolated precision, classes without (non-ignored) gt
    excluded from the mean. Returns one AP per IoU threshold.
    """
    iou_thrs = np.asarray(iou_thrs, np.float64)
    lo, hi = area_rng if area_rng is not None else AREA_ALL
    recall_thrs = np.linspace(0, 1, 101)
    T = len(iou_thrs)
    aps = np.full((T, num_classes), -1.0)
    for c in range(num_classes):
        scores, dtm_parts, dtig_parts = [], [], []
        npig = 0
        for det, ann in zip(det_results, annotations):
            d = np.asarray(det[c], np.float64).reshape(-1, 5)
            keep = ann['labels'] == c
            g = np.asarray(ann['bboxes'][keep], np.float64).reshape(-1, 4)
            g_ign = np.asarray(
                ann.get('bboxes_ignore', np.zeros((0, 4))),
                np.float64).reshape(-1, 4)
            # crowd regions are per-category in COCO; keep only class-c
            # crowds when the loader recorded their labels
            l_ign = ann.get('labels_ignore')
            if l_ign is not None and len(l_ign) == len(g_ign):
                g_ign = g_ign[np.asarray(l_ign) == c]
            gall = np.concatenate([g, g_ign], axis=0)
            iscrowd = np.concatenate([np.zeros(len(g), bool),
                                      np.ones(len(g_ign), bool)])
            area = (gall[:, 2] - gall[:, 0]) * (gall[:, 3] - gall[:, 1])
            gt_ig = iscrowd | (area < lo) | (area > hi)
            s, dtm, dt_ig = _match_one_image(d, gall, iscrowd, gt_ig,
                                             iou_thrs, max_dets)
            # unmatched dets outside the area range are ignored
            darea = (d[:, 2] - d[:, 0]) * (d[:, 3] - d[:, 1])
            dorder = np.argsort(-d[:, -1], kind='mergesort')[:max_dets]
            out_rng = (darea[dorder] < lo) | (darea[dorder] > hi)
            dt_ig = dt_ig | (~dtm & out_rng[None, :])
            scores.append(s)
            dtm_parts.append(dtm)
            dtig_parts.append(dt_ig)
            npig += int((~gt_ig).sum())
        if npig == 0:
            continue
        s_all = np.concatenate(scores) if scores else np.zeros(0)
        order = np.argsort(-s_all, kind='mergesort')
        dtm = (np.concatenate(dtm_parts, axis=1)[:, order]
               if scores else np.zeros((T, 0), bool))
        dt_ig = (np.concatenate(dtig_parts, axis=1)[:, order]
                 if scores else np.zeros((T, 0), bool))
        tps = np.cumsum(dtm & ~dt_ig, axis=1, dtype=np.float64)
        fps = np.cumsum(~dtm & ~dt_ig, axis=1, dtype=np.float64)
        for t in range(T):
            tp, fp = tps[t], fps[t]
            rc = tp / npig
            pr = tp / (fp + tp + np.spacing(1))
            q = np.zeros(len(recall_thrs))
            # monotone envelope (in-place, right to left)
            for i in range(len(pr) - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            inds = np.searchsorted(rc, recall_thrs, side='left')
            valid = inds < len(pr)
            q[valid] = pr[inds[valid]]
            aps[t, c] = q.mean()
    has = aps[0] > -1
    if not has.any():
        return np.zeros(T)
    return aps[:, has].mean(axis=1)
