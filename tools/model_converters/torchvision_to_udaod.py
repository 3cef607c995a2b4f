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
    detect_and_convert)


def strip_selfsup_prefixes(sd, mode):
    """Self-supervised checkpoints wrap the resnet in an encoder module
    (reference `tools/model_converters/selfsup2mmdet.py`): MoCo keys are
    `module.encoder_q.<resnet key>`; SwAV keys are already plain (the
    reference converter is a no-op for swav). Returns torchvision-style
    keys, dropping the projection/fc head."""
    if mode == 'moco':
        sd = {k[len('module.encoder_q.'):]: v for k, v in sd.items()
              if k.startswith('module.encoder_q.')}
    return {k: v for k, v in sd.items() if not k.startswith('fc.')}


def main():
    p = argparse.ArgumentParser()
    p.add_argument('torch_ckpt', help='.pth state_dict (torchvision resnet)')
    p.add_argument('out', help='output .npz')
    p.add_argument('--selfsup', choices=['moco', 'swav'],
                   help='unwrap a self-supervised encoder checkpoint '
                        '(reference selfsup2mmdet.py) before converting')
    args = p.parse_args()
    import torch
    sd = torch.load(args.torch_ckpt, map_location='cpu')
    for wrapper in ('state_dict', 'model_state', 'model'):
        if wrapper in sd and isinstance(sd[wrapper], dict):
            sd = sd[wrapper]       # torch / pycls / microsoft-swin wrappers
    if args.selfsup:
        sd = strip_selfsup_prefixes(sd, args.selfsup)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, 'numpy')}
    # routes resnet / pycls-regnet / swin (ckpt_convert.py:85) /
    # pvt (ckpt_convert.py:12) by key shape
    tree = detect_and_convert(sd)

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
