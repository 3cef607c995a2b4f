"""C++ imageproc kernels vs python references (parity gates the fast
paths wired into `_imresize` / `_host_nms`)."""
import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils.native import (
    has_native, host_nms_native, normalize_pad_native,
    resize_bilinear_native)

pytestmark = pytest.mark.skipif(not has_native(),
                                reason='no native toolchain')


def test_resize_matches_pil_within_1lsb():
    from PIL import Image
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (181, 277, 3), np.uint8)
    for size in [(139, 97), (554, 362), (277, 181)]:
        out = resize_bilinear_native(img, size)
        ref = np.asarray(Image.fromarray(img).resize(size, Image.BILINEAR))
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1, size


def test_normalize_pad_exact():
    rs = np.random.RandomState(1)
    img = rs.randint(0, 255, (60, 80, 3), np.uint8)
    mean = [123.675, 116.28, 103.53]
    std = [58.395, 57.12, 57.375]
    out = normalize_pad_native(img, mean, std, (64, 96))
    ref = np.zeros((64, 96, 3), np.float32)
    ref[:60, :80] = (img - np.asarray(mean)) / np.asarray(std)
    assert np.abs(out - ref).max() < 1e-5


def test_host_nms_matches_numpy_mirror():
    rs = np.random.RandomState(2)
    dets = np.concatenate([rs.rand(80, 2) * 100,
                           rs.rand(80, 2) * 100 + 120,
                           rs.rand(80, 1)], 1).astype(np.float32)
    keep = host_nms_native(dets, 0.5)

    order = np.argsort(-dets[:, 4])
    ref_keep = []
    sup = np.zeros(len(dets), bool)
    for i in order:
        if sup[i]:
            continue
        ref_keep.append(i)
        x1 = np.maximum(dets[i, 0], dets[:, 0])
        y1 = np.maximum(dets[i, 1], dets[:, 1])
        x2 = np.minimum(dets[i, 2], dets[:, 2])
        y2 = np.minimum(dets[i, 3], dets[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        a = (dets[:, 2] - dets[:, 0]) * (dets[:, 3] - dets[:, 1])
        ai = (dets[i, 2] - dets[i, 0]) * (dets[i, 3] - dets[i, 1])
        iou = inter / np.maximum(a + ai - inter, 1e-9)
        sup |= iou > 0.5
    assert set(np.where(keep)[0]) == set(ref_keep)
