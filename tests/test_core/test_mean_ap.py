"""mAP golden tests (mirrors `tests/test_metrics/test_mean_ap.py`)."""

import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.eval import (
    average_precision, eval_map, eval_recalls, tpfp_default)


def test_average_precision_perfect():
    recalls = np.array([0.5, 1.0])
    precisions = np.array([1.0, 1.0])
    assert average_precision(recalls, precisions, 'area') == pytest.approx(1.0)
    assert average_precision(recalls, precisions, '11points') == \
        pytest.approx(1.0)


def test_average_precision_half():
    recalls = np.array([0.5])
    precisions = np.array([1.0])
    assert average_precision(recalls, precisions, 'area') == pytest.approx(0.5)


def test_tpfp_basic():
    dets = np.array([[0, 0, 10, 10, 0.9], [20, 20, 30, 30, 0.8]])
    gts = np.array([[0, 0, 10, 10]])
    tp, fp = tpfp_default(dets, gts, None, 0.5)
    np.testing.assert_array_equal(tp, [1, 0])
    np.testing.assert_array_equal(fp, [0, 1])


def test_tpfp_duplicate_detection_is_fp():
    dets = np.array([[0, 0, 10, 10, 0.9], [0, 0, 10, 10, 0.8]])
    gts = np.array([[0, 0, 10, 10]])
    tp, fp = tpfp_default(dets, gts, None, 0.5)
    np.testing.assert_array_equal(tp, [1, 0])
    np.testing.assert_array_equal(fp, [0, 1])


def test_eval_map_perfect_single_class():
    det_results = [[np.array([[0, 0, 10, 10, 0.9]])]]
    annotations = [dict(bboxes=np.array([[0., 0., 10., 10.]]),
                        labels=np.array([0]))]
    mean_ap, results = eval_map(det_results, annotations, iou_thr=0.5)
    assert mean_ap == pytest.approx(1.0)
    assert results[0]['num_gts'] == 1


def test_eval_map_legacy_coordinates():
    # tiny 1-pixel boxes: legacy +1 convention changes IoU materially
    det_results = [[np.array([[0, 0, 1, 1, 0.9]])]]
    annotations = [dict(bboxes=np.array([[0., 0., 1., 1.]]),
                        labels=np.array([0]))]
    m_new, _ = eval_map(det_results, annotations, use_legacy_coordinate=False)
    m_leg, _ = eval_map(det_results, annotations, use_legacy_coordinate=True)
    assert m_new == pytest.approx(1.0)
    assert m_leg == pytest.approx(1.0)


def test_eval_map_missed_gt():
    det_results = [[np.array([[0, 0, 10, 10, 0.9]])]]
    annotations = [dict(bboxes=np.array([[0., 0., 10., 10.],
                                         [50., 50., 60., 60.]]),
                        labels=np.array([0, 0]))]
    mean_ap, results = eval_map(det_results, annotations)
    assert results[0]['num_gts'] == 2
    assert mean_ap == pytest.approx(0.5)


def test_eval_recalls():
    gts = [np.array([[0., 0., 10., 10.]])]
    props = [np.array([[0, 0, 10, 10, 0.9], [100, 100, 110, 110, 0.8]])]
    rec = eval_recalls(gts, props, proposal_nums=(1, 2), iou_thrs=(0.5,))
    assert rec.shape == (2, 1)
    assert rec[0, 0] == pytest.approx(1.0)
