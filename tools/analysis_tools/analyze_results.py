#!/usr/bin/env python
"""Rank images by prediction quality and dump visualizations
(reference `tools/analysis_tools/analyze_results.py`)."""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np  # noqa: E402

from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.eval import (  # noqa: E402
    eval_map)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.data import (  # noqa: E402
    build_dataset)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E402
    Config)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('results_pkl')
    p.add_argument('--show-dir', default='analyze_out')
    p.add_argument('--topk', type=int, default=5)
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    dataset = build_dataset(dict(cfg.data['test'], test_mode=True))
    with open(args.results_pkl, 'rb') as f:
        results = pickle.load(f)
    # per-image AP
    scores = []
    for i in range(len(dataset)):
        m, _ = eval_map([results[i]], [dataset.get_ann_info(i)],
                        use_legacy_coordinate=True)
        scores.append(m)
    order = np.argsort(scores)
    os.makedirs(args.show_dir, exist_ok=True)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis import (
        show_result)
    import os.path as osp
    for tag, idxs in (('worst', order[:args.topk]),
                      ('best', order[-args.topk:])):
        for i in idxs:
            info = dataset.data_infos[int(i)]
            img_path = osp.join(dataset.img_prefix, info['filename'])
            out = osp.join(args.show_dir,
                           f'{tag}_{scores[int(i)]:.3f}_{info["id"]}.jpg')
            show_result(img_path, results[int(i)], dataset.CLASSES,
                        score_thr=0.2, out_file=out)
    print(f'mean per-image AP: {np.mean(scores):.4f}; '
          f'visualizations in {args.show_dir}')


if __name__ == '__main__':
    main()
