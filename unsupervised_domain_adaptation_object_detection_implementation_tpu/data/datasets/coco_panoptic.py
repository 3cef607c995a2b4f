"""COCO Panoptic dataset + PQ evaluation (reference
`mmdet/datasets/coco_panoptic.py`).

The reference evaluates through the `panopticapi` package; here PQ/SQ/RQ is
computed directly from id maps with the same definition (Kirillov et al.):
segments match iff IoU > 0.5 (unique by construction), PQ = ΣIoU_TP /
(|TP| + |FP|/2 + |FN|/2). Predictions are (H, W) panoptic id maps in the
`heuristic_fuse` encoding: id = label + INSTANCE_OFFSET * instance for
things, `num_things + stuff_id` for stuff, -1 void.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence

import numpy as np

from ...utils.registry import DATASETS
from .coco import CocoDataset

VOID = -1


def pq_compute(pred_maps: Sequence[np.ndarray],
               gt_maps: Sequence[np.ndarray],
               pred_cats: Sequence[Dict[int, int]],
               gt_cats: Sequence[Dict[int, int]],
               num_classes: int,
               things_mask: np.ndarray) -> Dict[str, float]:
    """PQ over a list of images.

    Args:
        pred_maps/gt_maps: (H, W) int segment-id maps (VOID = -1).
        pred_cats/gt_cats: per image {segment_id: class_id}.
        things_mask: (num_classes,) bool — True for thing classes.
    """
    iou_sum = np.zeros(num_classes)
    tp = np.zeros(num_classes)
    fp = np.zeros(num_classes)
    fn = np.zeros(num_classes)
    for pm, gm, pc, gc in zip(pred_maps, gt_maps, pred_cats, gt_cats):
        # pair intersection counts via a collision-free combined id:
        # shift both maps to non-negative then mix with a stride larger
        # than any pred id
        g64 = gm.astype(np.int64)
        p64 = pm.astype(np.int64)
        base = int(max(p64.max(), 0)) + 2            # room for VOID(-1)+1
        combo = (g64 + 1) * base + (p64 + 1)
        ids, counts = np.unique(combo, return_counts=True)
        gt_area = {s: int((gm == s).sum()) for s in gc}
        pr_area = {s: int((pm == s).sum()) for s in pc}
        matched_gt, matched_pr = set(), set()
        inter: Dict[tuple, int] = {}
        g_ids = ids // base - 1
        p_ids = ids % base - 1
        for gi, pi, cnt in zip(g_ids, p_ids, counts):
            inter[(int(gi), int(pi))] = int(cnt)
        for (gi, pi), cnt in inter.items():
            if gi not in gc or pi not in pc:
                continue
            if gc[gi] != pc[pi]:
                continue
            union = gt_area[gi] + pr_area[pi] - cnt \
                - inter.get((VOID, pi), 0)
            iou = cnt / max(union, 1)
            if iou > 0.5:
                c = gc[gi]
                iou_sum[c] += iou
                tp[c] += 1
                matched_gt.add(gi)
                matched_pr.add(pi)
        for gi, c in gc.items():
            if gi not in matched_gt:
                fn[c] += 1
        for pi, c in pc.items():
            if pi in matched_pr:
                continue
            # FP unless mostly void in gt (panopticapi rule)
            void_frac = inter.get((VOID, pi), 0) / max(pr_area[pi], 1)
            if void_frac <= 0.5:
                fp[c] += 1

    denom = tp + fp / 2 + fn / 2
    present = denom > 0
    pq_c = np.where(present, iou_sum / np.maximum(denom, 1e-9), 0.0)
    sq_c = np.where(tp > 0, iou_sum / np.maximum(tp, 1e-9), 0.0)
    rq_c = np.where(present, tp / np.maximum(denom, 1e-9), 0.0)

    def agg(mask):
        m = present & mask
        if m.sum() == 0:
            return dict(pq=0.0, sq=0.0, rq=0.0, n=0)
        return dict(pq=float(pq_c[m].mean()), sq=float(sq_c[m].mean()),
                    rq=float(rq_c[m].mean()), n=int(m.sum()))

    allm = np.ones(num_classes, bool)
    out = {'All': agg(allm), 'Things': agg(things_mask),
           'Stuff': agg(~things_mask)}
    return {'PQ': out['All']['pq'], 'SQ': out['All']['sq'],
            'RQ': out['All']['rq'], 'PQ_th': out['Things']['pq'],
            'PQ_st': out['Stuff']['pq']}


@DATASETS.register_module()
class CocoPanopticDataset(CocoDataset):
    """Panoptic COCO: instances json for the detection path plus a
    panoptic json + PNG id maps for PQ evaluation. Predictions for
    `evaluate` are the `heuristic_fuse` outputs per image."""

    def __init__(self, *args, panoptic_ann_file: str = None,
                 seg_prefix: str = None, num_stuff: int = 53, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_stuff = num_stuff
        self.seg_prefix = seg_prefix
        self.pan_anns = None
        if panoptic_ann_file and os.path.exists(panoptic_ann_file):
            with open(panoptic_ann_file) as f:
                pj = json.load(f)
            self.pan_anns = {a['image_id']: a for a in pj['annotations']}
            self.pan_cats = {c['id']: c for c in pj['categories']}

    @staticmethod
    def _rgb2id(png: np.ndarray) -> np.ndarray:
        return (png[..., 0].astype(np.int64)
                + 256 * png[..., 1].astype(np.int64)
                + 256 * 256 * png[..., 2].astype(np.int64))

    def gt_panoptic(self, idx: int):
        """(gt_map, {segment: class}) for image idx, classes remapped to
        [things..., stuff...] contiguous ids."""
        from PIL import Image
        info = self.data_infos[idx]
        ann = self.pan_anns[info['id']]
        png = np.asarray(Image.open(
            os.path.join(self.seg_prefix, ann['file_name'])).convert('RGB'))
        idmap = self._rgb2id(png)
        cats = {}
        thing_ids = [cid for cid, c in self.pan_cats.items()
                     if c.get('isthing')]
        stuff_ids = [cid for cid, c in self.pan_cats.items()
                     if not c.get('isthing')]
        remap = {cid: i for i, cid in enumerate(sorted(thing_ids))}
        remap.update({cid: len(thing_ids) + i
                      for i, cid in enumerate(sorted(stuff_ids))})
        for seg in ann['segments_info']:
            cats[seg['id']] = remap[seg['category_id']]
        out = np.where(np.isin(idmap, list(cats)), idmap, VOID)
        return out, cats

    def evaluate(self, results, metric='PQ', **kwargs):
        """results: list of (pan_map, {segment: class}) per image."""
        from .coco_panoptic import pq_compute as _pq
        num_things = len(self.CLASSES)
        nc = num_things + self.num_stuff
        things = np.zeros(nc, bool)
        things[:num_things] = True
        gt_maps, gt_cats, pr_maps, pr_cats = [], [], [], []
        for i, (pm, pc) in enumerate(results):
            gm, gc = self.gt_panoptic(i)
            gt_maps.append(gm)
            gt_cats.append(gc)
            pr_maps.append(pm)
            pr_cats.append(pc)
        return _pq(pr_maps, gt_maps, pr_cats, gt_cats, nc, things)
