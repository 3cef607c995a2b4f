"""Tests for the second-wave datasets (Cityscapes/LVIS/WIDERFace) and the
AutoAugment pipeline, on generated micro-fixtures."""
import json
import os

import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.data.datasets import (
    CityscapesDataset, LVISV1Dataset)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.data.pipelines import (
    AutoAugment, Shear, Rotate, Translate, ColorTransform,
    BrightnessTransform, ContrastTransform, EqualizeTransform,
    autoaug_policy_v0)


@pytest.fixture()
def coco_json(tmp_path):
    def make(categories, images, annotations, name='ann.json'):
        p = tmp_path / name
        p.write_text(json.dumps(dict(categories=categories, images=images,
                                     annotations=annotations)))
        return str(p)
    return make


class TestCityscapes:
    def test_loads_and_evaluates(self, coco_json, tmp_path):
        cats = [dict(id=i + 1, name=n) for i, n in enumerate(
            CityscapesDataset.CLASSES)]
        images = [dict(id=1, file_name='a.png', width=64, height=64)]
        anns = [dict(id=1, image_id=1, category_id=3,
                     bbox=[10, 10, 20, 20], area=400, iscrowd=0)]
        ds = CityscapesDataset(ann_file=coco_json(cats, images, anns),
                               img_prefix=str(tmp_path), pipeline=[],
                               test_mode=True)
        assert len(ds) == 1
        ann = ds.get_ann_info(0)
        np.testing.assert_allclose(ann['bboxes'][0], [10, 10, 30, 30])
        assert ann['labels'][0] == 2       # 'car'
        # perfect detection → per-class AP 1.0 for car
        det = [[np.zeros((0, 5), np.float32) for _ in range(8)]]
        det[0][2] = np.array([[10, 10, 30, 30, 0.9]], np.float32)
        out = ds.evaluate(det)
        assert out['bbox_mAP_car'] > 0.99
        assert out['bbox_mAP'] > 0.1


class TestLVIS:
    def test_federated_eval_ignores_unverified(self, coco_json, tmp_path):
        cats = [dict(id=1, name='cat'), dict(id=2, name='dog')]
        images = [
            dict(id=1, file_name='a.jpg', width=64, height=64,
                 neg_category_ids=[], not_exhaustive_category_ids=[]),
            dict(id=2, file_name='b.jpg', width=64, height=64,
                 neg_category_ids=[2], not_exhaustive_category_ids=[]),
        ]
        anns = [dict(id=1, image_id=1, category_id=1,
                     bbox=[0, 0, 10, 10], area=100)]
        ds = LVISV1Dataset(ann_file=coco_json(cats, images, anns),
                           img_prefix=str(tmp_path), pipeline=[],
                           test_mode=True)
        # detector fires 'dog' on image 1 (unverified there): must be
        # ignored; a correct 'cat' on image 1 gives AP 1
        det = [
            [np.array([[0, 0, 10, 10, 0.9]], np.float32),
             np.array([[0, 0, 60, 60, 0.9]], np.float32)],
            [np.zeros((0, 5), np.float32), np.zeros((0, 5), np.float32)],
        ]
        out = ds.evaluate(det)
        assert out['bbox_AP'] > 0.99

    def test_frequency_bins(self, coco_json, tmp_path):
        """APr/APc/APf: lvis-api groups per-class APs by the categories'
        `frequency` tag (reference mmdet/datasets/lvis.py reports these
        through LVISEval)."""
        cats = [dict(id=1, name='rareclass', frequency='r'),
                dict(id=2, name='commonclass', frequency='c'),
                dict(id=3, name='frequentclass', frequency='f')]
        images = [dict(id=1, file_name='a.jpg', width=200, height=200,
                       neg_category_ids=[],
                       not_exhaustive_category_ids=[])]
        anns = [dict(id=1, image_id=1, category_id=1,
                     bbox=[0, 0, 10, 10], area=100),
                dict(id=2, image_id=1, category_id=2,
                     bbox=[50, 50, 10, 10], area=100),
                dict(id=3, image_id=1, category_id=3,
                     bbox=[100, 100, 10, 10], area=100)]
        ds = LVISV1Dataset(ann_file=coco_json(cats, images, anns),
                           img_prefix=str(tmp_path), pipeline=[],
                           test_mode=True)
        assert ds.cat_frequency == ('r', 'c', 'f')
        # perfect rare + frequent, missed common
        det = [[np.array([[0, 0, 10, 10, 0.9]], np.float32),
                np.zeros((0, 5), np.float32),
                np.array([[100, 100, 110, 110, 0.9]], np.float32)]]
        out = ds.evaluate(det)
        assert out['bbox_APr'] > 0.99
        assert out['bbox_APc'] == 0.0
        assert out['bbox_APf'] > 0.99
        np.testing.assert_allclose(out['bbox_AP'], (1 + 0 + 1) / 3,
                                   atol=1e-6)


class TestAutoAugment:
    def _results(self):
        rs = np.random.RandomState(0)
        return dict(img=rs.randint(0, 255, (32, 48, 3), np.uint8),
                    img_shape=(32, 48),
                    gt_bboxes=np.array([[4, 4, 20, 28]], np.float32),
                    gt_labels=np.array([1]),
                    _rng=np.random.RandomState(1))

    @pytest.mark.parametrize('op', [
        Shear(level=5, prob=1.0),
        Rotate(level=5, prob=1.0),
        Translate(level=3, prob=1.0),
        ColorTransform(level=5, prob=1.0),
        BrightnessTransform(level=5, prob=1.0),
        ContrastTransform(level=5, prob=1.0),
        EqualizeTransform(prob=1.0),
    ], ids=lambda o: type(o).__name__)
    def test_op_preserves_contract(self, op):
        r = op(self._results())
        assert r['img'].shape == (32, 48, 3)
        assert r['img'].dtype == np.uint8
        if len(r['gt_bboxes']):
            b = r['gt_bboxes']
            assert (b[:, 2] >= b[:, 0]).all()
            assert (b[:, 0] >= 0).all() and (b[:, 2] <= 48).all()
            assert len(r['gt_labels']) == len(b)

    def test_translate_moves_boxes(self):
        r = self._results()
        op = Translate(level=5, prob=1.0, random_negative_prob=0.0)
        before = r['gt_bboxes'].copy()
        out = op(r)
        if len(out['gt_bboxes']):
            assert not np.allclose(out['gt_bboxes'], before)

    def test_policy_container(self):
        aug = AutoAugment(policies=autoaug_policy_v0())
        r = aug(self._results())
        assert r['img'].shape == (32, 48, 3)

    def test_rotate_identity_at_zero(self):
        r = self._results()
        op = Rotate(level=0, prob=1.0)
        img_before = r['img'].copy()
        out = op(r)
        np.testing.assert_array_equal(out['img'], img_before)


class TestPackFullMasks:
    """`PackDetInputs(with_full_masks=True)` rebuilds full-image rasters
    (SOLO's `gt_masks_full` contract) from box-frame masks."""

    def _results(self):
        img = np.zeros((64, 96, 3), np.uint8)
        return dict(
            img=img, img_shape=(64, 96), ori_shape=(64, 96),
            gt_bboxes=np.asarray([[16., 8., 48., 40.]], np.float32),
            gt_labels=np.asarray([0], np.int64),
            gt_masks=np.ones((1, 56, 56), np.uint8))

    def test_full_mask_paste(self):
        from unsupervised_domain_adaptation_object_detection_implementation_tpu.data.pipelines.transforms import (
            PackDetInputs)
        out = PackDetInputs(max_gt=4, with_mask=True,
                            with_full_masks=True)(self._results())
        full = out['gt_masks_full']
        assert full.shape == (4, 16, 24)  # stride 4
        # box [16,8,48,40] / 4 -> [4,2,12,10]: ones exactly inside
        assert full[0, 2:10, 4:12].all()
        outside = full[0].copy()
        outside[2:10, 4:12] = 0
        assert not outside.any()
        assert not full[1:].any()

    def test_full_mask_without_rasters_fills_box(self):
        from unsupervised_domain_adaptation_object_detection_implementation_tpu.data.pipelines.transforms import (
            PackDetInputs)
        r = self._results()
        del r['gt_masks']
        out = PackDetInputs(max_gt=4, with_full_masks=True)(r)
        assert out['gt_masks_full'][0, 2:10, 4:12].all()


def test_albu_identity_fallback_without_albumentations():
    """Albu degrades to a warned no-op when albumentations is missing
    (keeps configs/albu_example runnable in minimal images)."""
    import importlib
    import warnings
    import numpy as np
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.data.pipelines.third_party import (  # noqa: E501
        Albu)
    try:
        importlib.import_module('albumentations')
        import pytest
        pytest.skip('albumentations installed — fallback path inactive')
    except ImportError:
        pass
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter('always')
        a = Albu([dict(type='ShiftScaleRotate', p=0.5)])
    assert any('no-op' in str(w.message) for w in rec)
    results = dict(img=np.zeros((4, 4, 3), np.uint8))
    assert a(results) is results
