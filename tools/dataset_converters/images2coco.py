#!/usr/bin/env python
"""Unannotated image dir → COCO-json stub (reference
`tools/dataset_converters/images2coco.py`) — for inference-only datasets."""
import argparse
import glob
import json
import os

from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument('img_dir')
    p.add_argument('out_json')
    p.add_argument('--classes', nargs='+', default=['object'])
    args = p.parse_args()
    images = []
    exts = ('*.jpg', '*.jpeg', '*.png')
    files = sorted(sum((glob.glob(os.path.join(args.img_dir, e))
                        for e in exts), []))
    for i, path in enumerate(files, 1):
        with Image.open(path) as im:
            w, h = im.size
        images.append(dict(id=i, file_name=os.path.basename(path),
                           width=w, height=h))
    coco = dict(images=images, annotations=[],
                categories=[dict(id=i + 1, name=c)
                            for i, c in enumerate(args.classes)])
    with open(args.out_json, 'w') as f:
        json.dump(coco, f)
    print(f'{len(images)} images → {args.out_json}')


if __name__ == '__main__':
    main()
