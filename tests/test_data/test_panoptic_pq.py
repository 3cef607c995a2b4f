"""PQ computation unit tests (reference panopticapi semantics)."""
import numpy as np

from unsupervised_domain_adaptation_object_detection_implementation_tpu.data.datasets import (
    pq_compute)


def test_perfect_prediction_pq_1():
    gm = np.zeros((10, 10), np.int64)
    gm[:5] = 7
    gm[5:] = 9
    gc = {7: 0, 9: 2}
    things = np.asarray([True, True, False])
    res = pq_compute([gm], [gm], [gc], [gc], 3, things)
    assert abs(res['PQ'] - 1.0) < 1e-6
    assert abs(res['SQ'] - 1.0) < 1e-6


def test_partial_overlap_and_fp():
    gm = np.full((10, 10), -1, np.int64)
    gm[:6] = 1                       # gt segment, class 0, area 60
    pm = np.full((10, 10), -1, np.int64)
    pm[:4] = 5                       # pred overlaps 40/60 → IoU 40/60 < 0.5?
    pm[8:] = 6                       # spurious pred, class 0, on void → no FP
    pc = {5: 0, 6: 0}
    gc = {1: 0}
    things = np.asarray([True])
    res = pq_compute([pm], [gm], [pc], [gc], 1, things)
    # IoU = 40 / 60 = 0.667 > 0.5 → TP with that IoU; pred 6 sits fully on
    # void → not counted as FP
    assert abs(res['SQ'] - 40 / 60) < 1e-6
    assert abs(res['RQ'] - 1.0) < 1e-6


def test_class_mismatch_is_fn_and_fp():
    gm = np.zeros((4, 4), np.int64)
    gc = {0: 1}
    pm = np.zeros((4, 4), np.int64)
    pc = {0: 0}                      # same segment, wrong class
    things = np.asarray([True, True])
    res = pq_compute([pm], [gm], [pc], [gc], 2, things)
    assert res['PQ'] == 0.0
