#!/usr/bin/env python
"""Supervised training CLI (reference `tools/train.py`)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis import (  # noqa: E402
    train_detector)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E402
    Config)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils.config import (  # noqa: E402
    parse_option_value)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='Train a detector')
    p.add_argument('config', help='config file path')
    p.add_argument('--work-dir', default=None)
    p.add_argument('--resume-from', default=None)
    p.add_argument('--load-from', default=None)
    p.add_argument('--pretrained-backbone', default=None,
                   help='torch .pth with torchvision-R50 weights')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--max-epochs', type=int, default=None)
    p.add_argument('--n-devices', type=int, default=None)
    p.add_argument('--launcher', choices=['none', 'jax'], default='none',
                   help="'jax' → jax.distributed.initialize (multi-host); "
                        "the reference's init_dist launcher "
                        "(tools/DA_train.py:66-70)")
    p.add_argument('--cfg-options', nargs='+', default=[],
                   help='dotted config overrides: key=value')
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict({
            kv.split('=', 1)[0]: parse_option_value(kv.split('=', 1)[1])
            for kv in args.cfg_options})
    work_dir = args.work_dir or os.path.join(
        'work_dirs', os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    cfg.dump(os.path.join(work_dir, 'config.py'))
    # config-level fallbacks, reference runner semantics (cfg.load_from /
    # cfg.resume_from honored when the flag is absent)
    load_from = args.load_from or cfg.get('load_from')
    resume_from = args.resume_from or cfg.get('resume_from')
    metrics = train_detector(
        cfg, work_dir, resume_from=resume_from, load_from=load_from,
        pretrained_backbone=args.pretrained_backbone, seed=args.seed,
        max_epochs=args.max_epochs, n_devices=args.n_devices,
        launcher=None if args.launcher == 'none' else args.launcher,
        log_interval=cfg.get('log_config', {}).get('interval', 50))
    print('final metrics:', metrics)


if __name__ == '__main__':
    main()
