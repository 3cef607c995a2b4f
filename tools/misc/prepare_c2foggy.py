#!/usr/bin/env python
"""One-command Cityscapes→FoggyCityscapes (C2F) experiment preparation.

The north-star DA experiment (reference recipe
`da_configs/faster_rcnn/faster_rcnn_r50_daf_c2f.py:7-21` over
`da_configs/_base_/datasets/c2foggy.py`) needs:

  source = clear Cityscapes train (VOC layout)
  target = foggy Cityscapes train, beta 0.02 (VOC layout, annotations unused
           for DA but kept for oracle runs)
  val    = foggy Cityscapes val (VOC layout, evaluated with VOC AP50)

This script composes `tools/dataset_converters/cityscapes_to_voc.py` into
those three trees and prints the flagship run command. Run it once against a
mounted Cityscapes root containing `leftImg8bit/`, `leftImg8bit_foggy/` and
`gtFine/`:

  python tools/misc/prepare_c2foggy.py /data/cityscapes /data/c2f_voc
  python tools/DA_train.py configs/da/faster_rcnn_r50_daf_c2f.py \\
      --work-dir work_dirs/daf_c2f \\
      --cfg-options data_root=/data/c2f_voc
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from tools.dataset_converters.cityscapes_to_voc import convert_split  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('cityscapes_root',
                   help='dir with leftImg8bit/, leftImg8bit_foggy/, gtFine/')
    p.add_argument('out_root', help='output root for the three VOC trees')
    p.add_argument('--beta', type=float, default=0.02,
                   help='fog density (reference uses 0.02)')
    args = p.parse_args()

    # layout the c2foggy config consumes (`configs/_base_/datasets/c2foggy.py`):
    #   <root>/CityScapes-VOC2012/        train.txt            (source)
    #   <root>/Foggy-CityScapes-VOC2012/  train.txt, test.txt  (target + val)
    jobs = [
        ('CityScapes-VOC2012', False, {'train.txt': 'train'}),
        ('Foggy-CityScapes-VOC2012', True, {'train.txt': 'train',
                                            'test.txt': 'val'}),
    ]
    for name, foggy, splits in jobs:
        out = os.path.join(args.out_root, name)
        for sub in ('JPEGImages', 'Annotations',
                    os.path.join('ImageSets', 'Main')):
            os.makedirs(os.path.join(out, sub), exist_ok=True)
        for set_file, split in splits.items():
            ids = convert_split(args.cityscapes_root, out, split,
                                foggy=foggy, beta=args.beta)
            with open(os.path.join(out, 'ImageSets', 'Main', set_file),
                      'w') as f:
                f.write('\n'.join(ids) + '\n')
            print(f'[prepare_c2foggy] {name}/{set_file}: {len(ids)} images '
                  f'({split}, foggy={foggy})')

    print('\nNext (flagship DAF, reference schedule — SGD 1e-3, step@9, '
          '14 epochs). The config reads data/VOCdevkit/, so link it first:')
    print(f'  mkdir -p data && ln -sfn {os.path.abspath(args.out_root)} '
          'data/VOCdevkit')
    print('  python tools/DA_train.py configs/da/faster_rcnn_r50_daf_c2f.py '
          '--work-dir work_dirs/daf_c2f')
    print('  python tools/test.py configs/da/faster_rcnn_r50_daf_c2f.py '
          'work_dirs/daf_c2f/ckpt_14 --eval mAP')


if __name__ == '__main__':
    main()
