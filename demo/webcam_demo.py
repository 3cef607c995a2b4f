#!/usr/bin/env python
"""Webcam demo (reference `demo/webcam_demo.py`): capture → inference →
overlay loop. Requires cv2 with a camera device."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis.inference import (  # noqa: E402
    init_detector, inference_detector, show_result)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('--camera-id', type=int, default=0)
    p.add_argument('--score-thr', type=float, default=0.3)
    args = p.parse_args()
    import cv2
    bundle = init_detector(args.config, args.checkpoint)
    cap = cv2.VideoCapture(args.camera_id)
    print('Press ESC or q to quit.')
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        result = inference_detector(bundle, frame[..., ::-1])  # BGR → RGB
        vis = show_result(frame[..., ::-1], result, bundle.classes,
                          score_thr=args.score_thr)
        cv2.imshow('udaod', vis[..., ::-1])
        if cv2.waitKey(1) & 0xFF in (27, ord('q')):
            break
    cap.release()


if __name__ == '__main__':
    main()
