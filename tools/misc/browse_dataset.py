#!/usr/bin/env python
"""Visualize pipeline outputs (reference `tools/misc/browse_dataset.py`):
renders N dataset samples with their (post-pipeline) boxes to an out dir."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np  # noqa: E402

from unsupervised_domain_adaptation_object_detection_implementation_tpu.data import (  # noqa: E402
    build_dataset)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E402
    Config)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--split', default='train')
    p.add_argument('--out-dir', default='browse_out')
    p.add_argument('--n', type=int, default=8)
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    data_cfg = cfg.data[args.split]
    if data_cfg.get('type') == 'ConcatDataset':
        data_cfg = data_cfg['datasets'][0]
    ds = build_dataset(data_cfg)
    os.makedirs(args.out_dir, exist_ok=True)
    from PIL import Image, ImageDraw
    for i in range(min(args.n, len(ds))):
        s = ds[i]
        img = s['image']
        # un-normalize for display
        mean = np.array([123.675, 116.28, 103.53])
        std = np.array([58.395, 57.12, 57.375])
        disp = (img * std + mean).clip(0, 255).astype(np.uint8)
        im = Image.fromarray(disp)
        draw = ImageDraw.Draw(im)
        for box, ok in zip(s['gt_bboxes'], s['gt_valid']):
            if ok:
                draw.rectangle(box.tolist(), outline=(255, 64, 64), width=2)
        im.save(os.path.join(args.out_dir, f'sample_{i}.jpg'))
    print(f'wrote {min(args.n, len(ds))} samples to {args.out_dir}')


if __name__ == '__main__':
    main()
