"""LR policy parity with mmcv LrUpdaterHook semantics.

Golden values are hand-computed from the mmcv formulas the reference
training loop uses (`mmcv.runner.hooks.lr_updater` + the fork's
`mmdet/core/hook/yolox_lrupdater_hook.py:8`).
"""
import math

import numpy as np

from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis.train_state import (  # noqa: E501
    OptimizerSpec, make_lr_schedule)


def _lr(spec, step):
    return float(make_lr_schedule(spec)(step))


def test_step_policy_linear_warmup():
    spec = OptimizerSpec(lr=0.02, warmup_iters=10, warmup_ratio=0.1,
                         decay_steps=(100, 200))
    # mid-warmup: ratio + (1-ratio)*frac
    assert np.isclose(_lr(spec, 5), 0.02 * (0.1 + 0.9 * 0.5))
    assert np.isclose(_lr(spec, 50), 0.02)
    assert np.isclose(_lr(spec, 150), 0.002)
    assert np.isclose(_lr(spec, 250), 0.0002)


def test_exp_warmup():
    # mmcv exp warmup: k = warmup_ratio ** (1 - cur/warmup_iters)
    spec = OptimizerSpec(lr=0.01, warmup_iters=100, warmup_ratio=0.5,
                         warmup='exp', decay_steps=())
    assert np.isclose(_lr(spec, 0), 0.01 * 0.5)
    assert np.isclose(_lr(spec, 50), 0.01 * 0.5 ** 0.5)
    assert np.isclose(_lr(spec, 100), 0.01)


def test_cosine_policy():
    # CosineAnnealingLrUpdaterHook: lr(t) = floor + (lr-floor)/2*(1+cos(pi t/T))
    spec = OptimizerSpec(lr=0.01, warmup_iters=0, policy='CosineAnnealing',
                         total_steps=1000, min_lr_ratio=0.05)
    assert np.isclose(_lr(spec, 0), 0.01)
    mid = 0.0005 + 0.5 * (0.01 - 0.0005) * (math.cos(math.pi * 0.5) + 1)
    assert np.isclose(_lr(spec, 500), mid)
    assert np.isclose(_lr(spec, 1000), 0.0005)


def test_yolox_policy():
    # quadratic-exp warmup, cosine anneal, fixed floor for the last epochs
    # (yolox_lrupdater_hook.py get_warmup_lr / get_lr)
    spec = OptimizerSpec(lr=0.01, warmup_iters=50, warmup_ratio=1.0,
                         policy='YOLOX', total_steps=1000,
                         min_lr_ratio=0.05, fixed_last_steps=150)
    # warmup: lr * ratio * ((i+1)/w)^2
    assert np.isclose(_lr(spec, 0), 0.01 * (1 / 50) ** 2)
    assert np.isclose(_lr(spec, 24), 0.01 * (25 / 50) ** 2)
    # just after warmup: at the cosine start
    assert np.isclose(_lr(spec, 50), 0.01, rtol=1e-3)
    # fixed tail
    assert np.isclose(_lr(spec, 900), 0.01 * 0.05)
    assert np.isclose(_lr(spec, 999), 0.01 * 0.05)
    # mid-anneal matches annealing_cos
    frac = (700 + 1 - 50) / (1000 - 50 - 150)
    want = 0.0005 + 0.5 * (0.01 - 0.0005) * (math.cos(math.pi * frac) + 1)
    assert np.isclose(_lr(spec, 700), want)
    # monotone non-increasing after warmup
    vals = [_lr(spec, s) for s in range(50, 1000, 25)]
    assert all(a >= b - 1e-9 for a, b in zip(vals, vals[1:]))


def test_resolve_runner_epoch_vs_iter():
    """IterBasedRunner milestones stay in iters; epoch milestones scale by
    steps_per_epoch (reference retinanet_r50_fpn_90k_coco.py:12)."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis.train import (  # noqa: E501
        resolve_runner)
    it, ep, mi, ms = resolve_runner(
        dict(type='EpochBasedRunner', max_epochs=12),
        dict(step=[8, 11]), steps_per_epoch=100)
    assert (it, ep, mi, ms) == (False, 12, None, (800, 1100))
    it, ep, mi, ms = resolve_runner(
        dict(type='IterBasedRunner', max_iters=90000),
        dict(step=[60000, 80000]), steps_per_epoch=100)
    assert (it, mi, ms) == (True, 90000, (60000, 80000))
    assert ep == 900
    # max_epochs CLI override only applies to the epoch-based runner
    it, ep, mi, ms = resolve_runner({}, {}, 50, max_epochs=3)
    assert (it, ep, mi, ms) == (False, 3, None, ())
