#!/usr/bin/env python
"""Generate a synthetic domain-adaptation detection benchmark.

Source domain: colored shapes (circle/square → 2 classes) on textured
background. Target domain: the same generative process under a synthetic
"fog" (low contrast, haze, blur) — a controllable stand-in for
Cityscapes→FoggyCityscapes that actually fits in CI/TPU smoke budgets.
VOC-XML layout, consumable by `DADataset` directly.
"""

import argparse
import os

import numpy as np
from PIL import Image, ImageDraw, ImageFilter

CLASSES = ['square', 'circle']


def make_image(rng, size=(192, 128), n_obj=(2, 5), foggy=False):
    w, h = size
    # textured background
    base = rng.randint(40, 160)
    arr = (base + rng.randn(h, w, 3) * 20).clip(0, 255).astype(np.uint8)
    img = Image.fromarray(arr)
    draw = ImageDraw.Draw(img)
    objs = []
    for _ in range(rng.randint(*n_obj)):
        s = rng.randint(14, 36)
        x1 = rng.randint(0, w - s)
        y1 = rng.randint(0, h - s)
        color = tuple(rng.randint(100, 255, 3).tolist())
        cls = rng.randint(2)
        if cls == 0:
            draw.rectangle([x1, y1, x1 + s, y1 + s], fill=color,
                           outline=(0, 0, 0))
        else:
            draw.ellipse([x1, y1, x1 + s, y1 + s], fill=color,
                         outline=(0, 0, 0))
        objs.append((CLASSES[cls], x1, y1, x1 + s, y1 + s))
    if foggy:
        img = img.filter(ImageFilter.GaussianBlur(1.5))
        a = np.asarray(img).astype(np.float32)
        fog = 215.0
        t = 0.45  # transmission
        a = a * t + fog * (1 - t)
        img = Image.fromarray(a.clip(0, 255).astype(np.uint8))
    return img, objs


def write_split(root, name, n, rng, foggy):
    for sub in ('JPEGImages', 'Annotations', 'ImageSets/Main'):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    ids = []
    for i in range(n):
        img_id = f'{name}_{i:04d}'
        img, objs = make_image(rng, foggy=foggy)
        img.save(os.path.join(root, 'JPEGImages', img_id + '.jpg'),
                 quality=92)
        w, hh = img.size
        xml = [f'<annotation><filename>{img_id}.jpg</filename>',
               f'<size><width>{w}</width><height>{hh}</height>'
               f'<depth>3</depth></size>']
        for cls, x1, y1, x2, y2 in objs:
            xml.append(f'<object><name>{cls}</name><difficult>0</difficult>'
                       f'<bndbox><xmin>{x1 + 1}</xmin><ymin>{y1 + 1}</ymin>'
                       f'<xmax>{x2 + 1}</xmax><ymax>{y2 + 1}</ymax>'
                       f'</bndbox></object>')
        xml.append('</annotation>')
        with open(os.path.join(root, 'Annotations', img_id + '.xml'),
                  'w') as f:
            f.write('\n'.join(xml))
        ids.append(img_id)
    with open(os.path.join(root, 'ImageSets/Main', f'{name}.txt'), 'w') as f:
        f.write('\n'.join(ids) + '\n')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('out_root')
    p.add_argument('--n-train', type=int, default=200)
    p.add_argument('--n-test', type=int, default=50)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--coco-masks', action='store_true',
                   help='also emit a COCO-json split with polygons')
    args = p.parse_args()
    rng = np.random.RandomState(args.seed)
    src = os.path.join(args.out_root, 'shapes_clear')
    tgt = os.path.join(args.out_root, 'shapes_foggy')
    write_split(src, 'train', args.n_train, rng, foggy=False)
    write_split(src, 'test', args.n_test, rng, foggy=False)
    write_split(tgt, 'train', args.n_train, rng, foggy=True)
    write_split(tgt, 'test', args.n_test, rng, foggy=True)
    if args.coco_masks:
        seg = os.path.join(args.out_root, 'shapes_seg')
        write_coco_split(seg, 'train', args.n_train, rng)
        write_coco_split(seg, 'test', args.n_test, rng)
        print(f'wrote {seg} (coco + polygons)')
    print(f'wrote {src} and {tgt}')




def write_coco_split(root, name, n, rng):
    """COCO-json variant WITH segmentation polygons (square = 4-gon,
    circle = 16-gon) for instance-seg smoke training."""
    import json
    import math
    img_dir = os.path.join(root, 'images')
    os.makedirs(img_dir, exist_ok=True)
    images, anns = [], []
    aid = 1
    for i in range(n):
        img_id = i + 1
        img, objs = make_image(rng, foggy=False)
        fname = f'{name}_{i:04d}.jpg'
        img.save(os.path.join(img_dir, fname), quality=92)
        w, h = img.size
        images.append(dict(id=img_id, file_name=fname, width=w, height=h))
        for cls, x1, y1, x2, y2 in objs:
            s = x2 - x1
            if cls == 'square':
                poly = [x1, y1, x2, y1, x2, y2, x1, y2]
            else:
                cx, cy, r = (x1 + x2) / 2, (y1 + y2) / 2, s / 2
                poly = []
                for k in range(16):
                    a = 2 * math.pi * k / 16
                    poly += [cx + r * math.cos(a), cy + r * math.sin(a)]
            anns.append(dict(id=aid, image_id=img_id,
                             category_id=CLASSES.index(cls) + 1,
                             bbox=[x1, y1, s, s], area=float(s * s),
                             iscrowd=0, segmentation=[poly]))
            aid += 1
    cats = [dict(id=i + 1, name=c) for i, c in enumerate(CLASSES)]
    with open(os.path.join(root, f'{name}.json'), 'w') as f:
        json.dump(dict(images=images, annotations=anns,
                       categories=cats), f)


if __name__ == '__main__':
    main()
