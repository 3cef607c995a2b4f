#!/usr/bin/env python
"""Convert Cityscapes gtFine polygon annotations to the VOC-XML layout the DA
configs consume (reference prepares `data/VOCdevkit/CityScapes-VOC2012/`;
converter equivalent of `tools/dataset_converters/cityscapes.py`).

Usage:
  python cityscapes_to_voc.py <cityscapes_root> <out_root> [--foggy --beta 0.02]

Produces <out_root>/{JPEGImages,Annotations,ImageSets/Main}/ with the 8 DA
classes (person rider car truck bus train motorcycle bicycle).
"""
import argparse
import glob
import json
import os
import shutil

CLASSES = {'person': 'person', 'rider': 'rider', 'car': 'car',
           'truck': 'truck', 'bus': 'bus', 'train': 'train',
           'motorcycle': 'motorcycle', 'bicycle': 'bicycle'}


def convert_split(cs_root, out_root, split, foggy=False, beta=0.02):
    img_dir = 'leftImg8bit_foggy' if foggy else 'leftImg8bit'
    suffix = f'_leftImg8bit_foggy_beta_{beta}.png' if foggy \
        else '_leftImg8bit.png'
    ids = []
    ann_files = glob.glob(os.path.join(
        cs_root, 'gtFine', split, '*', '*_gtFine_polygons.json'))
    for ann_path in sorted(ann_files):
        base = os.path.basename(ann_path).replace('_gtFine_polygons.json', '')
        city = base.split('_')[0]
        img_path = os.path.join(cs_root, img_dir, split, city, base + suffix)
        if not os.path.exists(img_path):
            continue
        with open(ann_path) as f:
            ann = json.load(f)
        objs = []
        for obj in ann.get('objects', []):
            label = obj['label']
            if label.endswith('group'):
                label = label[:-5]
            if label not in CLASSES:
                continue
            xs = [p[0] for p in obj['polygon']]
            ys = [p[1] for p in obj['polygon']]
            x1, y1 = max(min(xs), 0), max(min(ys), 0)
            x2 = min(max(xs), ann['imgWidth'] - 1)
            y2 = min(max(ys), ann['imgHeight'] - 1)
            if x2 <= x1 or y2 <= y1:
                continue
            objs.append((CLASSES[label], x1 + 1, y1 + 1, x2 + 1, y2 + 1))
        if not objs:
            continue
        ids.append(base)
        shutil.copy(img_path, os.path.join(out_root, 'JPEGImages',
                                           base + '.png'))
        xml = [f'<annotation><filename>{base}.png</filename>',
               f"<size><width>{ann['imgWidth']}</width>"
               f"<height>{ann['imgHeight']}</height><depth>3</depth></size>"]
        for cls, x1, y1, x2, y2 in objs:
            xml.append(
                f'<object><name>{cls}</name><difficult>0</difficult>'
                f'<bndbox><xmin>{int(x1)}</xmin><ymin>{int(y1)}</ymin>'
                f'<xmax>{int(x2)}</xmax><ymax>{int(y2)}</ymax>'
                f'</bndbox></object>')
        xml.append('</annotation>')
        with open(os.path.join(out_root, 'Annotations', base + '.xml'),
                  'w') as f:
            f.write('\n'.join(xml))
    return ids


def main():
    p = argparse.ArgumentParser()
    p.add_argument('cityscapes_root')
    p.add_argument('out_root')
    p.add_argument('--foggy', action='store_true')
    p.add_argument('--beta', type=float, default=0.02)
    args = p.parse_args()
    for sub in ('JPEGImages', 'Annotations', 'ImageSets/Main'):
        os.makedirs(os.path.join(args.out_root, sub), exist_ok=True)
    train_ids = convert_split(args.cityscapes_root, args.out_root, 'train',
                              args.foggy, args.beta)
    val_ids = convert_split(args.cityscapes_root, args.out_root, 'val',
                            args.foggy, args.beta)
    sets = os.path.join(args.out_root, 'ImageSets/Main')
    with open(os.path.join(sets, 'train.txt'), 'w') as f:
        f.write('\n'.join(train_ids) + '\n')
    with open(os.path.join(sets, 'test.txt'), 'w') as f:
        f.write('\n'.join(val_ids) + '\n')
    print(f'train: {len(train_ids)}  test: {len(val_ids)}')


if __name__ == '__main__':
    main()
