"""Dataset + pipeline + two-stream loader tests over the committed fixtures
(mirrors the reference `tests/test_data/` strategy)."""

import os

import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.data import (
    build_dataset, DataLoader)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.data.datasets import (
    DADataset, ConcatDataset)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.data.samplers import (
    TwoStreamBatchSampler)

DATA = os.path.join(os.path.dirname(__file__), '..', 'data')
CLASSES = ('car', 'person')

PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(96, 64), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=(64, 96)),
    dict(type='PackDetInputs', max_gt=10),
]


def _src_cfg(**kw):
    cfg = dict(type='DADataset',
               ann_file=os.path.join(DATA, 'voc_source/ImageSets/Main/train.txt'),
               img_prefix=os.path.join(DATA, 'voc_source'),
               pipeline=PIPELINE, classes=CLASSES, domain='source')
    cfg.update(kw)
    return cfg


def _tgt_cfg(**kw):
    cfg = _src_cfg(domain='target')
    cfg['ann_file'] = os.path.join(DATA, 'voc_target/ImageSets/Main/train.txt')
    cfg['img_prefix'] = os.path.join(DATA, 'voc_target')
    cfg.update(kw)
    return cfg


def test_xml_dataset_loading():
    ds = build_dataset(_src_cfg())
    assert len(ds) == 4
    ann = ds.get_ann_info(0)
    assert ann['bboxes'].shape[1] == 4
    assert ann['labels'].max() < len(CLASSES)
    # VOC 1-based → 0-based conversion
    assert ann['bboxes'].min() >= 0


def test_pipeline_static_shapes():
    ds = build_dataset(_src_cfg())
    sample = ds[0]
    assert sample['image'].shape == (64, 96, 3)
    assert sample['gt_bboxes'].shape == (10, 4)
    assert sample['gt_labels'].shape == (10,)
    assert sample['gt_valid'].sum() == 2
    assert sample['domain'] == 0
    # normalized floats
    assert abs(float(sample['image'].mean())) < 3.0
    # boxes inside the resized image
    h, w = sample['img_shape']
    valid_boxes = sample['gt_bboxes'][sample['gt_valid']]
    assert valid_boxes[:, 2].max() <= w
    assert valid_boxes[:, 3].max() <= h


def test_da_dataset_domain_tag():
    tgt = build_dataset(_tgt_cfg())
    assert tgt[0]['domain'] == 1


def test_two_stream_sampler_interleaves():
    s = TwoStreamBatchSampler(source_size=4, target_size=3,
                              samples_per_batch=4, seed=0)
    batches = list(iter(s))
    assert len(batches) == (4 + 3) // 4
    for b in batches:
        # even slots source (< 4), odd slots target (>= 4)
        assert all(i < 4 for i in b[0::2])
        assert all(i >= 4 for i in b[1::2])


def test_two_stream_recycles_shorter_stream():
    s = TwoStreamBatchSampler(source_size=8, target_size=2,
                              samples_per_batch=4, steps_per_epoch=4, seed=0)
    seen_tgt = [i - 8 for b in iter(s) for i in b[1::2]]
    assert len(seen_tgt) == 8
    assert set(seen_tgt) == {0, 1}  # recycled


def test_dataloader_two_stream_autodetect():
    concat = ConcatDataset([_src_cfg(), _tgt_cfg()])
    loader = DataLoader(concat, samples_per_batch=4, seed=0, prefetch=0)
    batch = next(iter(loader))
    assert batch['image'].shape == (4, 64, 96, 3)
    np.testing.assert_array_equal(batch['domain'], [0, 1, 0, 1])
    assert batch['gt_valid'].shape == (4, 10)


def test_dataloader_plain():
    ds = build_dataset(_src_cfg())
    loader = DataLoader(ds, samples_per_batch=2, seed=0, prefetch=2)
    batches = list(iter(loader))
    assert len(batches) == 2
    assert batches[0]['image'].shape == (2, 64, 96, 3)


def test_dataset_evaluate_roundtrip():
    """Perfect predictions from the annotations → mAP 1.0."""
    ds = build_dataset(_src_cfg())
    results = []
    for i in range(len(ds)):
        ann = ds.get_ann_info(i)
        per_class = []
        for c in range(len(CLASSES)):
            sel = ann['labels'] == c
            det = np.concatenate(
                [ann['bboxes'][sel],
                 np.full((sel.sum(), 1), 0.9, np.float32)], axis=1)
            per_class.append(det)
        results.append(per_class)
    out = ds.evaluate(results, metric='mAP')
    assert out['mAP'] == pytest.approx(1.0)


def test_coco_dataset(tmp_path):
    import json
    coco = dict(
        images=[dict(id=1, file_name='a.jpg', width=100, height=100)],
        annotations=[
            dict(id=1, image_id=1, category_id=3, bbox=[10, 10, 20, 20],
                 area=400, iscrowd=0),
            dict(id=2, image_id=1, category_id=7, bbox=[50, 50, 10, 10],
                 area=100, iscrowd=1),
        ],
        categories=[dict(id=3, name='car'), dict(id=7, name='person')])
    p = tmp_path / 'ann.json'
    p.write_text(json.dumps(coco))
    ds = build_dataset(dict(type='CocoDataset', ann_file=str(p),
                            pipeline=[], classes=('car', 'person'),
                            test_mode=True))
    ann = ds.get_ann_info(0)
    np.testing.assert_allclose(ann['bboxes'], [[10, 10, 30, 30]])
    assert ann['bboxes_ignore'].shape == (1, 4)
    # perfect prediction → AP 1.0 across IoUs
    results = [[np.array([[10, 10, 30, 30, 0.9]]), np.zeros((0, 5))]]
    out = ds.evaluate(results, metric='bbox')
    assert out['bbox_mAP'] == pytest.approx(1.0)
    assert out['bbox_mAP_75'] == pytest.approx(1.0)


def test_aug_transforms_box_consistency():
    """RandomCrop/Expand/MinIoURandomCrop/CutOut keep boxes inside images."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.data.pipelines import (
        RandomCrop, Expand, MinIoURandomCrop, CutOut)
    rng = np.random.RandomState(3)
    for t in [RandomCrop((40, 60)), Expand(prob=1.0),
              MinIoURandomCrop(), CutOut(n_holes=2)]:
        for seed in range(3):
            r = dict(img=rng.randint(0, 255, (64, 96, 3), dtype=np.uint8),
                     img_shape=(64, 96),
                     gt_bboxes=np.array([[10., 10., 30., 30.],
                                         [50., 20., 80., 50.]], np.float32),
                     gt_labels=np.array([0, 1]),
                     _rng=np.random.RandomState(seed))
            out = t(r)
            h, w = out['img'].shape[:2]
            assert out['img_shape'] == (h, w) or 'img_shape' not in out or \
                tuple(out['img_shape']) == (h, w)
            b = out['gt_bboxes']
            if len(b):
                assert b[:, 0::2].max() <= w + 1e-3
                assert b[:, 1::2].max() <= h + 1e-3
                assert (b[:, 2] >= b[:, 0]).all()
            assert len(out['gt_bboxes']) == len(out['gt_labels'])


def test_mosaic_mixup_via_mix_dataset():
    load_pipe = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
    ]
    mix_pipe = [
        dict(type='Mosaic', img_scale=(64, 96)),
        dict(type='Normalize'),
        dict(type='Pad', size=(128, 192)),
        dict(type='PackDetInputs', max_gt=40),
    ]
    ds = build_dataset(dict(
        type='MultiImageMixDataset',
        dataset=_src_cfg(pipeline=load_pipe),
        pipeline=mix_pipe))
    s = ds[0]
    assert s['image'].shape == (128, 192, 3)
    assert s['gt_valid'].sum() >= 2  # boxes from multiple tiles survive
    b = s['gt_bboxes'][s['gt_valid']]
    assert b[:, 2].max() <= 192 and b[:, 3].max() <= 128

    mixup_pipe = [
        dict(type='MixUp'),
        dict(type='Normalize'),
        dict(type='Pad', size=(96, 128)),
        dict(type='PackDetInputs', max_gt=40),
    ]
    ds2 = build_dataset(dict(
        type='MultiImageMixDataset', num_mix=1,
        dataset=_src_cfg(pipeline=load_pipe),
        pipeline=mixup_pipe))
    s2 = ds2[0]
    assert s2['gt_valid'].sum() == 4   # 2 boxes from each image


def test_resize_multiscale_modes():
    """Multi-scale train resize (reference `Resize` multiscale_mode /
    ratio_range, `pipelines/transforms.py:30`)."""
    import numpy as np
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.data.pipelines.transforms import (
        Resize)

    img = (np.random.RandomState(0).rand(100, 200, 3) * 255).astype(np.uint8)

    # 'value': sampled scale always one of the listed pairs
    t = Resize(img_scale=[(128, 64), (256, 128)], multiscale_mode='value')
    seen = set()
    for seed in range(20):
        r = t({'img': img.copy(), '_rng': np.random.RandomState(seed)})
        seen.add(r['img_shape'])
    assert seen <= {(64, 128), (128, 256)} and len(seen) == 2

    # 'range': long edge lands between the two bounds
    t = Resize(img_scale=[(100, 50), (200, 100)], multiscale_mode='range')
    for seed in range(10):
        r = t({'img': img.copy(), '_rng': np.random.RandomState(seed)})
        h, w = r['img_shape']
        assert 50 <= w <= 200 and abs(w - 2 * h) <= 1  # keep-ratio 2:1

    # ratio_range jitters a single scale
    t = Resize(img_scale=(128, 64), ratio_range=(0.5, 1.0))
    shapes = {t({'img': img.copy(),
                 '_rng': np.random.RandomState(s)})['img_shape']
              for s in range(10)}
    assert len(shapes) > 1
    assert all(hw[1] <= 128 for hw in shapes)

    # single-scale behavior unchanged (boxes scale along)
    t = Resize(img_scale=(128, 64))
    r = t({'img': img.copy(),
           'gt_bboxes': np.array([[0., 0., 200., 100.]], np.float32)})
    assert r['img_shape'] == (64, 128)
    np.testing.assert_allclose(r['gt_bboxes'], [[0, 0, 128, 64]], atol=0.5)


def test_coco_dataset_classes_subset(tmp_path):
    """Explicit `classes=` subset filters annotations and remaps labels
    (reference configs/faster_rcnn/
    faster_rcnn_r50_caffe_fpn_mstrain_1x_coco-person.py)."""
    import json
    coco = dict(
        images=[dict(id=1, file_name='a.jpg', width=100, height=100)],
        annotations=[
            dict(id=1, image_id=1, category_id=3, bbox=[10, 10, 20, 20],
                 area=400, iscrowd=0),
            dict(id=2, image_id=1, category_id=7, bbox=[50, 50, 10, 10],
                 area=100, iscrowd=0),
        ],
        categories=[dict(id=3, name='car'), dict(id=7, name='person')])
    p = tmp_path / 'ann.json'
    p.write_text(json.dumps(coco))
    ds = build_dataset(dict(type='CocoDataset', ann_file=str(p),
                            pipeline=[], classes=('person',),
                            test_mode=True))
    assert ds.CLASSES == ('person',)
    ann = ds.get_ann_info(0)
    # only the person box survives, remapped to label 0
    np.testing.assert_allclose(ann['bboxes'], [[50, 50, 60, 60]])
    assert ann['labels'].tolist() == [0]


def test_random_crop_absolute_range():
    """crop_type='absolute_range' (the Swin/DETR ms-crop recipe,
    reference configs/swin/*ms-crop-3x*): crop h/w drawn from the range,
    masks filtered with their boxes."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.data.pipelines.transforms import (
        RandomCrop)
    rng = np.random.RandomState(3)
    t = RandomCrop((8, 20), crop_type='absolute_range',
                   allow_negative_crop=True)
    res = dict(img=np.zeros((32, 48, 3), np.float32),
               gt_bboxes=np.asarray([[2., 2., 30., 30.], [40., 28., 47., 31.]],
                                    np.float32),
               gt_labels=np.asarray([0, 1]),
               gt_masks=np.ones((2, 28, 28), np.uint8),
               _rng=rng)
    out = t(res)
    h, w = out['img'].shape[:2]
    assert 8 <= h <= 20 and 8 <= w <= 20
    assert len(out['gt_bboxes']) == len(out['gt_labels']) == \
        len(out['gt_masks'])
    if len(out['gt_bboxes']):
        assert (out['gt_bboxes'][:, 2] <= w).all()
        assert (out['gt_bboxes'][:, 3] <= h).all()
