"""Remaining concrete datasets: Cityscapes, LVIS v0.5/v1, WIDERFace,
DeepFashion.

References: `mmdet/datasets/cityscapes.py` (COCO-format with per-class AP
at 8 instance classes), `lvis.py` (federated annotations — images carry
`neg_category_ids` / `not_exhaustive_category_ids`; AP must ignore
detections of categories not verified for an image), `wider_face.py`
(XML-style faces), `deepfashion.py` (plain COCO with fashion classes).
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Dict, List

import numpy as np

from ...utils.registry import DATASETS
from .coco import CocoDataset, coco_style_ap
from .xml_style import XMLDataset


@DATASETS.register_module()
class CityscapesDataset(CocoDataset):
    """`cityscapes.py:26`: the 8 instance classes; COCO-format jsons from
    the cityscapes→coco converter. evaluate adds per-class AP rows like
    the reference's cityscapes-scripts path."""

    CLASSES = ('person', 'rider', 'car', 'truck', 'bus', 'train',
               'motorcycle', 'bicycle')

    def evaluate(self, results, metric: str = 'bbox', logger=None,
                 **kwargs) -> Dict[str, float]:
        out = super().evaluate(results, metric=metric, logger=logger,
                               **kwargs)
        # per-class AP@[.5:.95] (reference prints the cityscapes table)
        annotations = [self.get_ann_info(i) for i in range(len(self))]
        iou_thrs = np.arange(0.5, 1.0, 0.05)
        for ci, name in enumerate(self.CLASSES):
            cls_dets = [[r[ci]] for r in results]
            cls_anns = []
            for a in annotations:
                keep = a['labels'] == ci
                cls_anns.append(dict(
                    bboxes=a['bboxes'][keep],
                    labels=np.zeros(int(keep.sum()), np.int64),
                    bboxes_ignore=a.get('bboxes_ignore',
                                        np.zeros((0, 4), np.float32)),
                    labels_ignore=np.zeros(
                        len(a.get('bboxes_ignore', ())), np.int64)))
            aps = coco_style_ap(cls_dets, cls_anns, iou_thrs, 1)
            out[f'bbox_mAP_{name}'] = float(np.mean(aps))
        return out


class _LVISBase(CocoDataset):
    """Shared LVIS loader: categories come sorted by id; images may list
    `neg_category_ids` and `not_exhaustive_category_ids`. Following the
    LVIS protocol, evaluation ignores a class's detections on images where
    that class was not verified absent/present."""

    def load_annotations(self, ann_file: str) -> List[dict]:
        with open(ann_file) as f:
            lvis = json.load(f)
        cats = sorted(lvis['categories'], key=lambda c: c['id'])
        # LVIS frequency bins (lvis-api: 'r'are <10 imgs, 'c'ommon 10-100,
        # 'f'requent >100) drive the APr/APc/APf summary
        self.cat_frequency = tuple(c.get('frequency', 'f') for c in cats)
        self.CLASSES = tuple(c['name'] for c in cats)
        self.cat2label = {c: i for i, c in enumerate(self.CLASSES)}
        catid2label = {c['id']: i for i, c in enumerate(cats)}
        anns_by_img = defaultdict(list)
        for a in lvis.get('annotations', []):
            anns_by_img[a['image_id']].append(a)
        infos = []
        for img in lvis['images']:
            bboxes, labels = [], []
            for a in anns_by_img[img['id']]:
                x, y, w, h = a['bbox']
                bboxes.append([x, y, x + w, y + h])
                labels.append(catid2label[a['category_id']])
            # LVIS v1 keeps full URLs in coco_url; filename = last 2 parts
            fname = img.get('file_name')
            if fname is None:
                fname = '/'.join(img['coco_url'].split('/')[-2:])
            ann = dict(
                bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
                labels=np.asarray(labels, np.int64),
                bboxes_ignore=np.zeros((0, 4), np.float32),
                labels_ignore=np.zeros((0,), np.int64),
                neg_category_ids=[catid2label.get(c) for c in
                                  img.get('neg_category_ids', [])],
                not_exhaustive=[catid2label.get(c) for c in
                                img.get('not_exhaustive_category_ids', [])],
            )
            infos.append(dict(id=img['id'], filename=fname,
                              width=img['width'], height=img['height'],
                              ann=ann))
        return infos

    def evaluate(self, results, metric: str = 'bbox', logger=None,
                 **kwargs) -> Dict[str, float]:
        # Federated eval: for each class, only images where the class is
        # annotated (present) or listed negative count; others are dropped
        # from both dets and gts (lvis-api `_prepare` semantics).
        annotations = [self.get_ann_info(i) for i in range(len(self))]
        iou_thrs = np.arange(0.5, 1.0, 0.05)
        n_cls = len(self.CLASSES)
        aps, freqs = [], []
        for ci in range(n_cls):
            dets_c, anns_c = [], []
            any_gt = False
            for info, det, ann in zip(self.data_infos, results,
                                      annotations):
                present = bool((ann['labels'] == ci).any())
                negative = ci in info['ann'].get('neg_category_ids', [])
                if not (present or negative):
                    continue
                keep = ann['labels'] == ci
                any_gt = any_gt or bool(keep.any())
                dets_c.append([det[ci]])
                anns_c.append(dict(
                    bboxes=ann['bboxes'][keep],
                    labels=np.zeros(int(keep.sum()), np.int64),
                    bboxes_ignore=np.zeros((0, 4), np.float32),
                    labels_ignore=np.zeros((0,), np.int64)))
            if not any_gt:
                continue
            aps.append(np.mean(coco_style_ap(dets_c, anns_c, iou_thrs, 1,
                                             max_dets=300)))
            freqs.append(getattr(self, 'cat_frequency', ('f',) * n_cls)[ci])
        out = {'bbox_AP': float(np.mean(aps)) if aps else 0.0}
        # lvis-api frequency-binned summary (LVISEval: APr/APc/APf over
        # rare/common/frequent categories; reference mmdet/datasets/lvis.py
        # reports these through the lvis package)
        aps_arr = np.asarray(aps)
        freqs_arr = np.asarray(freqs)
        for key, tag in (('bbox_APr', 'r'), ('bbox_APc', 'c'),
                         ('bbox_APf', 'f')):
            sel = freqs_arr == tag
            out[key] = float(aps_arr[sel].mean()) if sel.any() else 0.0
        return out


@DATASETS.register_module()
class LVISV05Dataset(_LVISBase):
    """LVIS v0.5 (`lvis.py:LVISV05Dataset`)."""


@DATASETS.register_module()
class LVISV1Dataset(_LVISBase):
    """LVIS v1 (`lvis.py:LVISV1Dataset`)."""


@DATASETS.register_module()
class WIDERFaceDataset(XMLDataset):
    """`wider_face.py:14`: VOC-XML annotations, single 'face' class, image
    paths nested by event folder."""

    CLASSES = ('face',)

    def load_annotations(self, ann_file: str):
        import os.path as osp
        import xml.etree.ElementTree as ET
        infos = super().load_annotations(ann_file)
        # WIDER subfolder layout: images live at <folder>/<filename>
        # (the reference reads the xml's <folder> tag, wider_face.py:42)
        for info in infos:
            xml_path = osp.join(self.img_prefix, self.ann_subdir,
                                f"{info['id']}.xml")
            folder = ET.parse(xml_path).getroot().find('folder')
            if folder is not None and folder.text:
                base = osp.basename(info['filename'])
                info['filename'] = osp.join(self.img_subdir, folder.text,
                                            base)
        return infos


@DATASETS.register_module()
class DeepFashionDataset(CocoDataset):
    """`deepfashion.py:8`."""

    CLASSES = ('top', 'skirt', 'leggings', 'dress', 'outer', 'pants',
               'bag', 'neckwear', 'headwear', 'eyeglass', 'belt',
               'footwear', 'hair', 'skin', 'face')
