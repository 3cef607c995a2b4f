#!/usr/bin/env python
"""Confusion matrix from saved results
(reference `tools/analysis_tools/confusion_matrix.py`)."""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np  # noqa: E402

from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.eval.mean_ap import (  # noqa: E402
    _overlaps)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.data import (  # noqa: E402
    build_dataset)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E402
    Config)


def compute_confusion(results, dataset, score_thr=0.3, iou_thr=0.5):
    n = len(dataset.CLASSES)
    mat = np.zeros((n + 1, n + 1), int)   # last row/col = background/missed
    for i, per_class in enumerate(results):
        ann = dataset.get_ann_info(i)
        gts, gls = ann['bboxes'], ann['labels']
        taken = np.zeros(len(gts), bool)
        dets = [(c, d) for c, arr in enumerate(per_class)
                for d in arr if d[4] >= score_thr]
        dets.sort(key=lambda x: -x[1][4])
        for c, d in dets:
            if len(gts):
                ious = _overlaps(d[None, :4], gts, 0.0)[0]
                j = int(np.argmax(ious))
                if ious[j] >= iou_thr and not taken[j]:
                    taken[j] = True
                    mat[gls[j], c] += 1
                    continue
            mat[n, c] += 1   # false positive
        for j, t in enumerate(taken):
            if not t:
                mat[gls[j], n] += 1   # missed gt
    return mat


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('results_pkl')
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--iou-thr', type=float, default=0.5)
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    dataset = build_dataset(dict(cfg.data['test'], test_mode=True))
    with open(args.results_pkl, 'rb') as f:
        results = pickle.load(f)
    mat = compute_confusion(results, dataset, args.score_thr, args.iou_thr)
    names = list(dataset.CLASSES) + ['bg/miss']
    width = max(len(s) for s in names) + 2
    print(' ' * width + ''.join(f'{s:>{width}}' for s in names))
    for name, row in zip(names, mat):
        print(f'{name:>{width}}' + ''.join(f'{v:>{width}}' for v in row))


if __name__ == '__main__':
    main()
