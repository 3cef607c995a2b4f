"""Anchor generator golden tests (mirrors `tests/test_utils/test_anchor.py`)."""

import numpy as np

from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.anchors import (
    AnchorGenerator)


def test_base_anchor_count_and_areas():
    gen = AnchorGenerator(strides=[16], ratios=[0.5, 1.0, 2.0],
                          scales=[2, 4, 8, 16, 32])
    assert gen.num_base_anchors == [15]
    base = gen.base_anchors[0]
    ws = base[:, 2] - base[:, 0]
    hs = base[:, 3] - base[:, 1]
    # areas equal (stride*scale)^2 for each (ratio, scale) pair
    areas = sorted(set(np.round(ws * hs).astype(int).tolist()))
    expected = sorted({(16 * s)**2 for s in [2, 4, 8, 16, 32]})
    np.testing.assert_allclose(areas, expected, rtol=1e-3)
    # ratio h/w honored
    ratios = np.round(hs / ws, 3)
    assert set(ratios.tolist()) == {0.5, 1.0, 2.0}


def test_grid_priors_layout():
    gen = AnchorGenerator(strides=[16], ratios=[1.0], scales=[1])
    anchors = gen.grid_priors([(2, 3)])[0]
    assert anchors.shape == (6, 4)
    # location-major: first anchor at (0,0), second at x=16
    np.testing.assert_allclose(anchors[0], [-8, -8, 8, 8])
    np.testing.assert_allclose(anchors[1], [8, -8, 24, 8])
    np.testing.assert_allclose(anchors[3], [-8, 8, 8, 24])


def test_valid_flags():
    gen = AnchorGenerator(strides=[16], ratios=[1.0], scales=[1])
    flags = gen.valid_flags([(4, 4)], pad_shape=(33, 64))[0]
    assert flags.shape == (16,)
    # valid_h = ceil(33/16) = 3 rows, all 4 cols valid
    assert flags.sum() == 12
