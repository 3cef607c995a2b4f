#!/usr/bin/env python
"""VOC-XML → COCO-json conversion (reference `tools/dataset_converters/
pascal_voc.py`)."""
import argparse
import json
import os
import sys
import xml.etree.ElementTree as ET


def main():
    p = argparse.ArgumentParser()
    p.add_argument('voc_root', help='dir with Annotations/ JPEGImages/ '
                                    'ImageSets/Main/')
    p.add_argument('split', help='e.g. train / test')
    p.add_argument('out_json')
    p.add_argument('--classes', nargs='+', required=True)
    args = p.parse_args()
    cat2id = {c: i + 1 for i, c in enumerate(args.classes)}
    images, annotations = [], []
    ann_id = 1
    with open(os.path.join(args.voc_root, 'ImageSets/Main',
                           args.split + '.txt')) as f:
        ids = [line.strip() for line in f if line.strip()]
    for img_id, name in enumerate(ids, 1):
        xml_path = os.path.join(args.voc_root, 'Annotations', name + '.xml')
        root = ET.parse(xml_path).getroot()
        size = root.find('size')
        fname = root.findtext('filename') or name + '.jpg'
        images.append(dict(id=img_id, file_name=fname,
                           width=int(size.findtext('width')),
                           height=int(size.findtext('height'))))
        for obj in root.findall('object'):
            cls = obj.findtext('name')
            if cls not in cat2id:
                continue
            b = obj.find('bndbox')
            x1 = float(b.findtext('xmin')) - 1
            y1 = float(b.findtext('ymin')) - 1
            w = float(b.findtext('xmax')) - 1 - x1
            h = float(b.findtext('ymax')) - 1 - y1
            annotations.append(dict(
                id=ann_id, image_id=img_id, category_id=cat2id[cls],
                bbox=[x1, y1, w, h], area=w * h, iscrowd=0,
                ignore=int(obj.findtext('difficult') or 0)))
            ann_id += 1
    coco = dict(images=images, annotations=annotations,
                categories=[dict(id=i, name=c) for c, i in cat2id.items()])
    with open(args.out_json, 'w') as f:
        json.dump(coco, f)
    print(f'{len(images)} images, {len(annotations)} annotations '
          f'→ {args.out_json}')


if __name__ == '__main__':
    main()
