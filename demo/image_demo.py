#!/usr/bin/env python
"""Single-image demo (reference `demo/image_demo.py`)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis import (  # noqa: E402
    init_detector, inference_detector, show_result)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('img')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out-file', default='demo_out.jpg')
    p.add_argument('--score-thr', type=float, default=0.3)
    args = p.parse_args()
    bundle = init_detector(args.config, args.checkpoint)
    result = inference_detector(bundle, args.img)
    show_result(args.img, result, bundle.classes, args.score_thr,
                args.out_file)
    n = sum(len(r[r[:, 4] >= args.score_thr]) for r in result)
    print(f'{n} detections >= {args.score_thr}; saved {args.out_file}')


if __name__ == '__main__':
    main()
