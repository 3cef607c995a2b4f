#!/usr/bin/env python
"""Video demo (reference `demo/video_demo.py`): per-frame detection."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis import (  # noqa: E402
    init_detector, inference_detector, show_result)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('video')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out', default='video_out.mp4')
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--max-frames', type=int, default=0)
    args = p.parse_args()
    import cv2
    bundle = init_detector(args.config, args.checkpoint)
    cap = cv2.VideoCapture(args.video)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    writer = None
    n = 0
    while True:
        ok, frame_bgr = cap.read()
        if not ok or (args.max_frames and n >= args.max_frames):
            break
        frame = frame_bgr[..., ::-1]
        result = inference_detector(bundle, frame)
        drawn = show_result(frame, result, bundle.classes, args.score_thr)
        if writer is None:
            h, w = drawn.shape[:2]
            writer = cv2.VideoWriter(
                args.out, cv2.VideoWriter_fourcc(*'mp4v'), fps, (w, h))
        writer.write(drawn[..., ::-1].copy())
        n += 1
    cap.release()
    if writer:
        writer.release()
    print(f'processed {n} frames → {args.out}')


if __name__ == '__main__':
    main()
