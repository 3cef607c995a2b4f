"""Dataset class-name tables (reference `core/evaluation/class_names.py`)."""

from __future__ import annotations


def voc_classes():
    return ['aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus', 'car',
            'cat', 'chair', 'cow', 'diningtable', 'dog', 'horse',
            'motorbike', 'person', 'pottedplant', 'sheep', 'sofa', 'train',
            'tvmonitor']


def imagenet_det_classes():
    # the reference table is the ILSVRC-DET 200-class list; pointers only —
    # the detection datasets in this repo do not consume it
    raise NotImplementedError('ILSVRC-DET table not bundled')


def cityscapes_classes():
    return ['person', 'rider', 'car', 'truck', 'bus', 'train', 'motorcycle',
            'bicycle']


def coco_classes():
    from ...data.datasets.coco import CocoDataset
    return list(CocoDataset.CLASSES)


def wider_face_classes():
    return ['face']


dataset_aliases = {
    'voc': ['voc', 'pascal_voc', 'voc07', 'voc12'],
    'coco': ['coco', 'mscoco', 'ms_coco'],
    'cityscapes': ['cityscapes'],
    'wider_face': ['WIDERFaceDataset', 'wider_face', 'WIDERFace'],
}


def get_classes(dataset: str):
    """Name → class list (reference `class_names.py:get_classes`)."""
    for name, aliases in dataset_aliases.items():
        if dataset in aliases:
            return {'voc': voc_classes, 'coco': coco_classes,
                    'cityscapes': cityscapes_classes,
                    'wider_face': wider_face_classes}[name]()
    raise ValueError(f'Unrecognized dataset: {dataset}')
