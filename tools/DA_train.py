#!/usr/bin/env python
"""Domain-adaptation training CLI (reference `tools/DA_train.py:184` DA()).

Identical surface to tools/train.py — the two-stream source/target loader is
selected automatically when `data.train` is a ConcatDataset of a source and a
target dataset (the reference wires `BatchSchedulerSampler` the same way,
`mmdet/datasets/builder.py:167`). Kept as a separate entry point for CLI
parity; it additionally prints per-domain dataset sizes like the reference.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from unsupervised_domain_adaptation_object_detection_implementation_tpu.data import (  # noqa: E402
    build_dataset)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E402
    Config)

from train import main as train_main, parse_args  # noqa: E402


def main(argv=None):
    args = parse_args(argv)
    cfg = Config.fromfile(args.config)
    train_cfg = cfg.data['train']
    if train_cfg.get('type') == 'ConcatDataset':
        for sub in train_cfg['datasets']:
            ds = build_dataset(sub)
            print(f"[DA_train] {sub.get('domain', 'source')} dataset: "
                  f"{len(ds)} images")
    train_main(argv)


if __name__ == '__main__':
    main()
