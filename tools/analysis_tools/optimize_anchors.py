#!/usr/bin/env python
"""K-means anchor-shape optimization over a dataset's gt boxes
(reference `tools/analysis_tools/optimize_anchors.py`)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np  # noqa: E402

from unsupervised_domain_adaptation_object_detection_implementation_tpu.data import (  # noqa: E402
    build_dataset)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E402
    Config)


def shape_iou(wh, centers):
    inter = np.minimum(wh[:, None, 0], centers[None, :, 0]) * \
        np.minimum(wh[:, None, 1], centers[None, :, 1])
    union = wh[:, None].prod(-1) + centers[None, :].prod(-1) - inter
    return inter / np.maximum(union, 1e-9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--n-anchors', type=int, default=9)
    p.add_argument('--iters', type=int, default=50)
    p.add_argument('--split', default='train')
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    data_cfg = cfg.data[args.split]
    if data_cfg.get('type') == 'ConcatDataset':
        data_cfg = data_cfg['datasets'][0]
    ds = build_dataset(data_cfg)
    whs = []
    for i in range(len(ds)):
        ann = ds.get_ann_info(i)
        b = ann['bboxes']
        if len(b):
            whs.append(np.stack([b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], -1))
    wh = np.concatenate(whs)
    rng = np.random.RandomState(0)
    centers = wh[rng.choice(len(wh), args.n_anchors, replace=False)]
    for _ in range(args.iters):
        assign = shape_iou(wh, centers).argmax(1)
        for k in range(args.n_anchors):
            sel = wh[assign == k]
            if len(sel):
                centers[k] = np.median(sel, axis=0)
    centers = centers[np.argsort(centers.prod(1))]
    mean_iou = shape_iou(wh, centers).max(1).mean()
    print(f'boxes: {len(wh)}  mean best-IoU: {mean_iou:.4f}')
    print('anchors (w, h):')
    for w, h in centers:
        print(f'  ({w:.1f}, {h:.1f})')


if __name__ == '__main__':
    main()
