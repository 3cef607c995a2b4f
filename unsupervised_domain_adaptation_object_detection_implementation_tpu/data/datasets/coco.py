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
        if not self.CLASSES or len(self.CLASSES) != len(cats):
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
            bboxes_ignore = []
            for a in anns_by_img[img['id']]:
                if a.get('ignore') or a['category_id'] not in catid2label:
                    continue
                x, y, w, h = a['bbox']
                box = [x, y, x + w, y + h]
                if a.get('iscrowd'):
                    bboxes_ignore.append(box)
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
                labels_ignore=np.zeros((len(bboxes_ignore),), np.int64),
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
        aps = coco_style_ap(results, annotations, iou_thrs,
                            num_classes=len(self.CLASSES))
        out = {
            'bbox_mAP': float(np.mean(aps)),
            'bbox_mAP_50': float(aps[0]),
            'bbox_mAP_75': float(aps[5]),
        }
        return out


def coco_style_ap(det_results, annotations, iou_thrs, num_classes,
                  max_dets: int = 100) -> np.ndarray:
    """COCO AP: 101-point interpolation, per-IoU, averaged over classes.

    Greedy matching in score order against best available gt per COCOeval.
    Returns array of APs, one per IoU threshold (mean over classes with gts).
    """
    recall_thrs = np.linspace(0, 1, 101)
    aps = np.zeros((len(iou_thrs), num_classes))
    has_gt = np.zeros(num_classes, bool)
    for c in range(num_classes):
        scores_all, matched_all = [], []   # per iou_thr matched flags
        n_gt = 0
        per_img = []
        for det, ann in zip(det_results, annotations):
            d = det[c]
            g = ann['bboxes'][ann['labels'] == c]
            n_gt += len(g)
            per_img.append((d, g))
        if n_gt == 0:
            continue
        has_gt[c] = True
        for t, thr in enumerate(iou_thrs):
            scores, matches = [], []
            for d, g in per_img:
                d = d[np.argsort(-d[:, -1])][:max_dets]
                taken = np.zeros(len(g), bool)
                ious = _overlaps(d[:, :4], g, 0.0) if len(d) and len(g) \
                    else np.zeros((len(d), len(g)))
                for i in range(len(d)):
                    best, best_j = thr, -1
                    for j in range(len(g)):
                        if not taken[j] and ious[i, j] >= best:
                            best, best_j = ious[i, j], j
                    if best_j >= 0:
                        taken[best_j] = True
                        matches.append(1)
                    else:
                        matches.append(0)
                    scores.append(d[i, -1])
            if not scores:
                continue
            order = np.argsort(-np.asarray(scores))
            m = np.asarray(matches)[order]
            tp = np.cumsum(m)
            fp = np.cumsum(1 - m)
            rec = tp / n_gt
            prec = tp / np.maximum(tp + fp, 1e-9)
            # monotone precision envelope then 101-point sample
            for i in range(len(prec) - 2, -1, -1):
                prec[i] = max(prec[i], prec[i + 1])
            idx = np.searchsorted(rec, recall_thrs, side='left')
            q = np.zeros_like(recall_thrs)
            valid = idx < len(prec)
            q[valid] = prec[idx[valid]]
            aps[t, c] = q.mean()
    if not has_gt.any():
        return np.zeros(len(iou_thrs))
    return aps[:, has_gt].mean(axis=1)
