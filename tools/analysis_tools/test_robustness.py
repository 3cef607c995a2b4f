#!/usr/bin/env python
"""Corruption-robustness benchmark (reference
`tools/analysis_tools/test_robustness.py` + `robustness_eval.py`).

Evaluates a checkpoint under image corruptions at severities 1..5 and
reports mPC (mean performance under corruption) and rPC (relative).
Corruptions are numpy implementations of the benchmark's common subset —
gaussian_noise, shot_noise, impulse_noise, defocus_blur (box approx),
brightness, contrast, pixelate, jpeg — applied after loading and before
the test pipeline's numerics, like the reference's corrupt() insertion.
"""
import argparse
import io
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis import (  # noqa: E402
    run_inference)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.data import (  # noqa: E402
    build_dataset)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models import (  # noqa: E402
    build_detector)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E402
    Config)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils.checkpoint import (  # noqa: E402
    load_checkpoint)


def corrupt(img: np.ndarray, name: str, severity: int,
            rng: np.random.RandomState) -> np.ndarray:
    """uint8 HWC in, uint8 HWC out."""
    x = img.astype(np.float32) / 255.0
    s = severity
    if name == 'gaussian_noise':
        c = [0.08, 0.12, 0.18, 0.26, 0.38][s - 1]
        x = x + rng.normal(0, c, x.shape)
    elif name == 'shot_noise':
        c = [60, 25, 12, 5, 3][s - 1]
        x = rng.poisson(np.clip(x, 0, 1) * c) / c
    elif name == 'impulse_noise':
        c = [0.03, 0.06, 0.09, 0.17, 0.27][s - 1]
        m = rng.rand(*x.shape[:2])
        x[m < c / 2] = 0.0
        x[m > 1 - c / 2] = 1.0
    elif name == 'defocus_blur':
        k = [3, 4, 6, 8, 10][s - 1]
        pad = k
        xp = np.pad(x, ((pad, pad), (pad, pad), (0, 0)), mode='edge')
        csum = xp.cumsum(0).cumsum(1)
        h, w = x.shape[:2]
        r = k

        def box(y0, x0):
            return (csum[y0 + 2 * r, x0 + 2 * r] - csum[y0, x0 + 2 * r]
                    - csum[y0 + 2 * r, x0] + csum[y0, x0])
        ys = np.arange(h)[:, None]
        xs = np.arange(w)[None, :]
        area = float((2 * r) ** 2)
        x = box(ys + pad - r, xs + pad - r) / area
    elif name == 'brightness':
        c = [0.1, 0.2, 0.3, 0.4, 0.5][s - 1]
        x = x + c
    elif name == 'contrast':
        c = [0.4, 0.3, 0.2, 0.1, 0.05][s - 1]
        x = (x - x.mean()) * c + x.mean()
    elif name == 'pixelate':
        c = [0.6, 0.5, 0.4, 0.3, 0.25][s - 1]
        h, w = x.shape[:2]
        hh, ww = max(int(h * c), 1), max(int(w * c), 1)
        small = x[::max(h // hh, 1), ::max(w // ww, 1)]
        x = np.repeat(np.repeat(small, max(h // hh, 1), 0),
                      max(w // ww, 1), 1)[:h, :w]
    elif name == 'jpeg':
        from PIL import Image
        q = [25, 18, 15, 10, 7][s - 1]
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, 'JPEG', quality=q)
        return np.asarray(Image.open(buf))
    else:
        raise KeyError(name)
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


CORRUPTIONS = ('gaussian_noise', 'shot_noise', 'impulse_noise',
               'defocus_blur', 'brightness', 'contrast', 'pixelate',
               'jpeg')


class _CorruptImage:
    """Pipeline stage inserted right after LoadImageFromFile."""

    def __init__(self, name, severity, seed=0):
        self.name = name
        self.severity = severity
        self.rng = np.random.RandomState(seed)

    def __call__(self, results):
        if self.severity > 0:
            results['img'] = corrupt(results['img'], self.name,
                                     self.severity, self.rng)
        return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('--corruptions', nargs='+', default=list(CORRUPTIONS))
    p.add_argument('--severities', nargs='+', type=int,
                   default=[0, 1, 2, 3, 4, 5])
    p.add_argument('--eval', default='mAP')
    p.add_argument('--out', default='robustness.json')
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    import jax
    import jax.numpy as jnp
    model = build_detector(cfg.model)
    variables = None

    def run_on(ds):
        nonlocal variables
        if variables is None:
            sample = ds[0]
            dummy = {k: jnp.asarray(v)[None] for k, v in sample.items()}
            k = jax.random.PRNGKey(0)
            variables = model.init(
                {'params': k, 'sampler': k, 'dropout': k}, dummy,
                train=True)
            if args.checkpoint and args.checkpoint != 'random':
                state = load_checkpoint(args.checkpoint)
                variables = {'params': state['params'],
                             'batch_stats': state['batch_stats']}
        return run_inference(model, variables, ds)

    table = {}
    clean = None
    for corr in args.corruptions:
        for sev in args.severities:
            if sev == 0 and clean is not None:
                continue
            test_cfg = dict(cfg.data['test'], test_mode=True)
            ds = build_dataset(test_cfg)
            # splice corruption into the pipeline after image loading
            if sev > 0:
                chain = ds.pipeline.transforms
                if type(chain[0]).__name__ == 'MultiScaleFlipAug':
                    chain = chain[0].inner.transforms
                chain.insert(1, _CorruptImage(corr, sev))
            res = run_on(ds)
            m = ds.evaluate(res, metric=args.eval)
            key = next(iter(m))
            if sev == 0:
                clean = m[key]
            else:
                table.setdefault(corr, {})[sev] = m[key]
            print(corr, sev, m)

    mpc = float(np.mean([v for c in table.values() for v in c.values()]))
    report = dict(clean=clean, mPC=mpc,
                  rPC=(mpc / clean if clean else 0.0), table=table)
    with open(args.out, 'w') as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in ('clean', 'mPC', 'rPC')}))


if __name__ == '__main__':
    main()
