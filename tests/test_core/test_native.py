"""Native C++ eval kernel: build, run, and python-parity fuzz test."""

import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils.native import (
    has_native, tpfp_greedy_native)


def python_tpfp(dets, gts, ig, thr, extra):
    """Pure-python replica of the fallback logic in mean_ap.tpfp_default."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.eval.mean_ap import (
        _overlaps)
    n, g = len(dets), len(gts)
    tp = np.zeros(n)
    fp = np.zeros(n)
    if g == 0 and len(ig) == 0:
        fp[:] = 1
        return tp, fp
    ious = _overlaps(dets[:, :4], gts, extra) if g else np.zeros((n, 0))
    ious_max = ious.max(1) if g else np.zeros(n)
    ious_arg = ious.argmax(1) if g else np.zeros(n, int)
    ig_ious = _overlaps(dets[:, :4], ig, extra) if len(ig) else None
    covered = np.zeros(g, bool)
    for i in np.argsort(-dets[:, 4], kind='stable'):
        if g and ious_max[i] >= thr:
            m = ious_arg[i]
            if not covered[m]:
                covered[m] = True
                tp[i] = 1
            else:
                fp[i] = 1
        elif ig_ious is not None and len(ig) and ig_ious[i].max() >= thr:
            continue
        else:
            fp[i] = 1
    return tp, fp


@pytest.mark.skipif(not has_native(), reason='g++ unavailable')
def test_native_matches_python_fuzz():
    rng = np.random.RandomState(0)
    for trial in range(20):
        n = rng.randint(1, 40)
        g = rng.randint(0, 8)
        ni = rng.randint(0, 3)

        def boxes(k):
            c = rng.uniform(10, 90, (k, 2))
            wh = rng.uniform(5, 30, (k, 2))
            return np.concatenate([c - wh / 2, c + wh / 2], 1).astype(
                np.float32)

        dets = np.concatenate(
            [boxes(n), rng.uniform(0, 1, (n, 1)).astype(np.float32)], 1)
        gts = boxes(g)
        ig = boxes(ni)
        extra = float(rng.choice([0.0, 1.0]))
        got = tpfp_greedy_native(dets, gts, ig, 0.5, extra)
        want = python_tpfp(dets, gts, ig, 0.5, extra)
        np.testing.assert_array_equal(got[0], want[0], err_msg=f't{trial} tp')
        np.testing.assert_array_equal(got[1], want[1], err_msg=f't{trial} fp')


@pytest.mark.skipif(not has_native(), reason='g++ unavailable')
def test_native_speedup_sanity():
    import time
    rng = np.random.RandomState(1)
    c = rng.uniform(50, 950, (2000, 2))
    wh = rng.uniform(10, 80, (2000, 2))
    dets = np.concatenate([c - wh / 2, c + wh / 2,
                           rng.uniform(0, 1, (2000, 1))], 1).astype(
        np.float32)
    gts = dets[:200, :4].copy()
    t0 = time.perf_counter()
    tpfp_greedy_native(dets, gts, None, 0.5, 0.0)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    python_tpfp(dets, gts, np.zeros((0, 4), np.float32), 0.5, 0.0)
    py_t = time.perf_counter() - t0
    print(f'native {native_t*1e3:.2f}ms vs python {py_t*1e3:.2f}ms')
    assert native_t < py_t * 2  # at minimum not slower
