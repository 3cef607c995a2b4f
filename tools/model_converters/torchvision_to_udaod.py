#!/usr/bin/env python
"""Convert a torchvision/torch ResNet checkpoint into this framework's
parameter layout (reference `tools/model_converters/` family — the
detectron/regnet converters map external checkpoints into mmdet naming;
here the target is the flax NHWC tree of `backbones/resnet.py`).

Writes an .npz whose keys are '/'-joined flax paths; load at train time via
`--cfg-options load_backbone=<file>` or `utils.checkpoint.
load_pretrained_backbone`."""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils.checkpoint import (  # noqa: E402
    convert_torch_resnet)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('torch_ckpt', help='.pth state_dict (torchvision resnet)')
    p.add_argument('out', help='output .npz')
    args = p.parse_args()
    import torch
    sd = torch.load(args.torch_ckpt, map_location='cpu')
    if 'state_dict' in sd:
        sd = sd['state_dict']
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, 'numpy')}
    tree = convert_torch_resnet(sd)

    flat = {}

    def walk(node, prefix=''):
        for k, v in node.items():
            key = f'{prefix}/{k}' if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(tree)
    np.savez(args.out, **flat)
    print(f'wrote {args.out} ({len(flat)} arrays)')


if __name__ == '__main__':
    main()
