#!/usr/bin/env python
"""Re-evaluate saved results (reference `tools/analysis_tools/eval_metric.py`)."""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from unsupervised_domain_adaptation_object_detection_implementation_tpu.data import (  # noqa: E402
    build_dataset)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E402
    Config)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('results_pkl')
    p.add_argument('--eval', default='mAP')
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    dataset = build_dataset(dict(cfg.data['test'], test_mode=True))
    with open(args.results_pkl, 'rb') as f:
        results = pickle.load(f)
    metrics = dataset.evaluate(results, metric=args.eval)
    print('metrics:', {k: round(float(v), 4) for k, v in metrics.items()})


if __name__ == '__main__':
    main()
