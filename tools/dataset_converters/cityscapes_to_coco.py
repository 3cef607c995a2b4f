#!/usr/bin/env python
"""Convert Cityscapes gtFine polygon annotations to COCO-style
`instancesonly_filtered_gtFine_{split}.json` — the converter equivalent
of the reference's `tools/dataset_converters/cityscapes.py`, producing
the files `configs/cityscapes/*` and `CityscapesDataset` consume.

Usage:
  python cityscapes_to_coco.py <cityscapes_root> <out_dir> \
      [--splits train val] [--foggy --beta 0.02]

Boxes come from polygon extents; each instance keeps its polygon as the
COCO segmentation so mask heads can train on the converted set.
"""
import argparse
import glob
import json
import os

CLASSES = ('person', 'rider', 'car', 'truck', 'bus', 'train',
           'motorcycle', 'bicycle')


def convert_split(cs_root, split, foggy=False, beta=0.02):
    img_dir = 'leftImg8bit_foggy' if foggy else 'leftImg8bit'
    suffix = (f'_leftImg8bit_foggy_beta_{beta}.png' if foggy
              else '_leftImg8bit.png')
    images, annotations = [], []
    ann_id = 1
    cat_ids = {name: i + 1 for i, name in enumerate(CLASSES)}
    ann_files = sorted(glob.glob(os.path.join(
        cs_root, 'gtFine', split, '*', '*_gtFine_polygons.json')))
    for img_id, ann_path in enumerate(ann_files, start=1):
        base = os.path.basename(ann_path).replace('_gtFine_polygons.json', '')
        city = base.split('_')[0]
        file_name = os.path.join(city, base + suffix)
        if not os.path.exists(os.path.join(cs_root, img_dir, split,
                                           file_name)):
            continue
        with open(ann_path) as f:
            ann = json.load(f)
        images.append(dict(id=img_id, file_name=file_name,
                           width=ann['imgWidth'], height=ann['imgHeight']))
        for obj in ann.get('objects', []):
            label = obj['label']
            iscrowd = 0
            if label.endswith('group'):   # crowd regions in cityscapes
                label = label[:-5]
                iscrowd = 1
            if label not in cat_ids:
                continue
            xs = [p[0] for p in obj['polygon']]
            ys = [p[1] for p in obj['polygon']]
            x1 = max(min(xs), 0.0)
            y1 = max(min(ys), 0.0)
            x2 = min(max(xs), ann['imgWidth'] - 1.0)
            y2 = min(max(ys), ann['imgHeight'] - 1.0)
            w, h = x2 - x1, y2 - y1
            if w <= 0 or h <= 0:
                continue
            seg = [float(v) for xy in obj['polygon'] for v in xy]
            annotations.append(dict(
                id=ann_id, image_id=img_id, category_id=cat_ids[label],
                bbox=[x1, y1, w, h], area=w * h, iscrowd=iscrowd,
                segmentation=[seg]))
            ann_id += 1
    categories = [dict(id=i, name=n) for n, i in cat_ids.items()]
    return dict(images=images, annotations=annotations,
                categories=categories)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('cityscapes_root')
    p.add_argument('out_dir')
    p.add_argument('--splits', nargs='+', default=['train', 'val'])
    p.add_argument('--foggy', action='store_true')
    p.add_argument('--beta', type=float, default=0.02)
    args = p.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    for split in args.splits:
        coco = convert_split(args.cityscapes_root, split,
                             foggy=args.foggy, beta=args.beta)
        tag = 'Foggy_' if args.foggy else ''
        out = os.path.join(
            args.out_dir,
            f'instancesonly_filtered_gtFine_{tag}{split}.json')
        with open(out, 'w') as f:
            json.dump(coco, f)
        print(f'{split}: {len(coco["images"])} images, '
              f'{len(coco["annotations"])} instances → {out}')


if __name__ == '__main__':
    main()
