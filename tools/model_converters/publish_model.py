#!/usr/bin/env python
"""Prepare a checkpoint for release — the reference's
`tools/model_converters/publish_model.py` flow: strip training state
(optimizer moments, step counter), keep only what inference needs
(params + batch_stats; EMA params win if present, matching the
reference's EMA-hook publishing convention), then stamp the output
directory name with the first 8 hex chars of a sha256 over the saved
tree so downloads are self-verifying.
"""

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np  # noqa: E402

from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E402,E501
    load_checkpoint, save_checkpoint)


def tree_sha256(tree) -> str:
    import jax
    h = hashlib.sha256()
    leaves_with_paths = sorted(
        jax.tree_util.tree_flatten_with_path(tree)[0],
        key=lambda kv: jax.tree_util.keystr(kv[0]))
    for path, leaf in leaves_with_paths:
        h.update(jax.tree_util.keystr(path).encode())
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return h.hexdigest()


def main(argv=None):
    p = argparse.ArgumentParser(description='Publish a trained checkpoint')
    p.add_argument('in_ckpt', help='training checkpoint directory (orbax)')
    p.add_argument('out_ckpt', help='output path; -{sha8} is appended')
    p.add_argument('--keep-ema', action='store_true', default=True,
                   help='publish EMA weights when the checkpoint has them')
    p.add_argument('--no-keep-ema', dest='keep_ema', action='store_false')
    args = p.parse_args(argv)

    state = load_checkpoint(args.in_ckpt)
    params = state.get('params')
    if args.keep_ema and state.get('ema_params') is not None:
        params = state['ema_params']
        print('publishing EMA weights')
    slim = dict(params=params, batch_stats=state.get('batch_stats', {}))
    digest = tree_sha256(slim)[:8]
    out = args.out_ckpt.rstrip('/') + f'-{digest}'
    save_checkpoint(out, slim, meta=dict(published=True, sha256_8=digest))
    print(f'published → {out}')
    return out


if __name__ == '__main__':
    main()
