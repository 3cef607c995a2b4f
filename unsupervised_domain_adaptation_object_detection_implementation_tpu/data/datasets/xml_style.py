"""VOC-XML datasets (reference `mmdet/datasets/xml_style.py:14`,
`voc.py:12`, and the fork's `da_dataset.py:12`).

Annotation layout: `<root>/Annotations/<id>.xml`, `<root>/JPEGImages/<id>.*`,
split files under `ImageSets/Main/*.txt` listing ids. `DADataset` adds the
`domain` tag consumed by the two-stream batch builder.
"""

from __future__ import annotations

import os.path as osp
import xml.etree.ElementTree as ET
from typing import List

import numpy as np

from ...utils.registry import DATASETS
from .custom import CustomDataset


@DATASETS.register_module()
class XMLDataset(CustomDataset):
    """Pascal-VOC XML annotation dataset."""

    img_subdir = 'JPEGImages'
    ann_subdir = 'Annotations'

    def __init__(self, min_size: int = 0, **kwargs):
        self.min_size = min_size
        super().__init__(**kwargs)

    def load_annotations(self, ann_file: str) -> List[dict]:
        with open(ann_file) as f:
            ids = [line.strip() for line in f if line.strip()]
        infos = []
        for img_id in ids:
            xml_path = osp.join(self.img_prefix, self.ann_subdir,
                                f'{img_id}.xml')
            tree = ET.parse(xml_path)
            root = tree.getroot()
            size = root.find('size')
            width = int(size.find('width').text)
            height = int(size.find('height').text)
            filename = root.find('filename')
            filename = filename.text if filename is not None else \
                f'{img_id}.jpg'
            if osp.dirname(filename) == '':
                filename = osp.join(self.img_subdir, filename)
            bboxes, labels = [], []
            bboxes_ignore, labels_ignore = [], []
            for obj in root.findall('object'):
                name = obj.find('name').text
                if name not in self.cat2label:
                    continue
                label = self.cat2label[name]
                difficult = obj.find('difficult')
                difficult = int(difficult.text) if difficult is not None else 0
                bnd = obj.find('bndbox')
                # VOC pixel indices are 1-based (reference xml_style.py)
                box = [
                    float(bnd.find('xmin').text) - 1,
                    float(bnd.find('ymin').text) - 1,
                    float(bnd.find('xmax').text) - 1,
                    float(bnd.find('ymax').text) - 1,
                ]
                too_small = self.min_size and (
                    box[2] - box[0] < self.min_size or
                    box[3] - box[1] < self.min_size)
                if difficult or too_small:
                    bboxes_ignore.append(box)
                    labels_ignore.append(label)
                else:
                    bboxes.append(box)
                    labels.append(label)
            ann = dict(
                bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
                labels=np.asarray(labels, np.int64),
                bboxes_ignore=np.asarray(bboxes_ignore,
                                         np.float32).reshape(-1, 4),
                labels_ignore=np.asarray(labels_ignore, np.int64),
            )
            infos.append(dict(id=img_id, filename=filename, width=width,
                              height=height, ann=ann))
        return infos


@DATASETS.register_module()
class VOCDataset(XMLDataset):
    """Pascal VOC with the 20 standard classes (reference `voc.py:12`)."""

    CLASSES = ('aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus', 'car',
               'cat', 'chair', 'cow', 'diningtable', 'dog', 'horse',
               'motorbike', 'person', 'pottedplant', 'sheep', 'sofa', 'train',
               'tvmonitor')

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.year = 2007 if 'VOC2007' in self.img_prefix else 2012


CITYSCAPES_DA_CLASSES = ('person', 'rider', 'car', 'truck', 'bus', 'train',
                         'motorcycle', 'bicycle')


@DATASETS.register_module()
class DADataset(XMLDataset):
    """Two-stream domain-adaptation dataset (reference `da_dataset.py:12`).

    `domain='source'|'target'` tags every emitted sample; the reference's
    hardcoded `CLASSES=('tea',)` default is replaced by the 8 Cityscapes DA
    classes (configs override via `classes=`).
    """

    CLASSES = CITYSCAPES_DA_CLASSES

    def __init__(self, domain: str = 'source', **kwargs):
        super().__init__(domain=domain, **kwargs)
        self.year = None
