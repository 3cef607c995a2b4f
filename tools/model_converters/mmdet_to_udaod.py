"""Convert a reference (mmdet 2.x) detector checkpoint to this framework.

The reference ships torch ``.pth`` checkpoints whose ``state_dict`` uses
mmdet naming (``backbone.layer1.0.conv1.weight``,
``neck.lateral_convs.0.conv.weight``, ``roi_head.bbox_head.shared_fcs.0``,
…; see `/root/reference/mmdet/models/detectors/two_stage.py` and
`tools/model_converters/upgrade_model_version.py` for the layout). This
converter maps them onto the flax param/batch_stats trees of
``FasterRCNN`` (DC5) / ``FasterRCNNFPN`` / the DA variants' detection core:

- conv ``weight`` (O, I, kh, kw) → ``kernel`` (kh, kw, I, O)
- linear ``weight`` (O, I) → ``kernel`` (I, O)
- BN ``weight/bias`` → FrozenBatchNorm ``scale/bias`` (params) and
  ``running_mean/var`` → ``mean/var`` (batch_stats)
- the FIRST RoI shared FC additionally permutes its input dim from torch's
  channel-major (C, 7, 7) flatten to our channel-last (7, 7, C) flatten —
  without this the loaded head is numerically garbage.

Usage:
    python tools/model_converters/mmdet_to_udaod.py ref.pth out.msgpack \
        --config configs/faster_rcnn/faster_rcnn_r50_fpn_1x.py
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _first_fc(w: np.ndarray, roi_size: int = 7) -> np.ndarray:
    """(O, C*S*S) channel-major → (S*S*C, O) in the x-major (W, H, C)
    flatten order used by `extract_roi_feats(flatten=True)` / the bbox
    head (see ops/roi_align.py:batched_roi_align flatten-order note)."""
    out, flat = w.shape
    c = flat // (roi_size * roi_size)
    w = w.reshape(out, c, roi_size, roi_size)      # O, C, H, W
    w = np.transpose(w, (3, 2, 1, 0))              # W, H, C, O
    return w.reshape(flat, out)


def _mmdet_key(path: Tuple[str, ...]) -> Tuple[str, str]:
    """Our param path → (mmdet module prefix, leaf kind).

    kinds: 'conv' | 'linear' | 'first_fc' | 'bn_w' | 'bn_b' | 'bn_m' | 'bn_v'
    """
    mod, leaf = '/'.join(path[:-1]), path[-1]
    parts = list(path[:-1])

    if parts[0] == 'backbone':
        inner = parts[1:]
        if inner and inner[0].startswith('stem'):
            # ResNetV1d deep stem: our stem{i}/stem_bn{i} ↔ mmdet's
            # nn.Sequential stem: conv at index 3i, BN at 3i+1 (ReLU 3i+2)
            is_bn = inner[0].startswith('stem_bn')
            i = int(inner[0][-1])
            prefix = f'backbone.stem.{3 * i + (1 if is_bn else 0)}'
        else:
            # our flax block keys are 'layer1/0' — mmdet uses 'layer1.0'
            name = '.'.join(inner).replace('/', '.')
            name = name.replace('downsample_conv', 'downsample.0')
            name = name.replace('downsample_bn', 'downsample.1')
            prefix = f'backbone.{name}'
            is_bn = 'bn' in parts[-1] or 'downsample.1' in prefix
    elif parts[0] == 'neck':
        name = parts[1]
        if name.startswith('lateral_'):
            prefix = f'neck.lateral_convs.{name.split("_")[-1]}.conv'
        elif name.startswith('fpn_conv_'):
            prefix = f'neck.fpn_convs.{name.split("_")[-1]}.conv'
        else:
            prefix = f'neck.{name}'
        is_bn = False
    elif parts[0] == 'rpn_head':
        prefix = 'rpn_head.' + '.'.join(parts[1:])
        is_bn = False
    elif parts[0] == 'bbox_head':
        name = parts[1]
        if name.startswith('shared_fc'):
            idx = int(name[len('shared_fc'):]) - 1
            prefix = f'roi_head.bbox_head.shared_fcs.{idx}'
            if idx == 0 and leaf == 'kernel':
                return prefix, 'first_fc'
        else:
            prefix = f'roi_head.bbox_head.{name}'
        is_bn = False
    else:
        prefix = '.'.join(parts)
        is_bn = 'bn' in parts[-1].lower()

    if is_bn:
        kind = {'scale': 'bn_w', 'bias': 'bn_b',
                'mean': 'bn_m', 'var': 'bn_v'}[leaf]
    elif leaf == 'kernel':
        kind = 'conv'  # decided later by rank
    else:
        kind = 'bias'
    return prefix, kind


_SUFFIX = {'bn_w': 'weight', 'bn_b': 'bias', 'bn_m': 'running_mean',
           'bn_v': 'running_var', 'conv': 'weight', 'linear': 'weight',
           'first_fc': 'weight', 'bias': 'bias'}


def convert_mmdet_state(state_dict: Dict[str, Any], variables: Dict[str, Any],
                        strict: bool = False) -> Tuple[Dict[str, Any], list]:
    """Fill our `variables` (params + batch_stats trees) from an mmdet
    state_dict. Returns (new_variables, missing_our_paths)."""
    import jax
    import jax.tree_util as jtu

    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    missing = []

    def fill(collection):
        def one(path, leaf):
            keys = tuple(k.key for k in path)
            prefix, kind = _mmdet_key(keys)
            tk = f'{prefix}.{_SUFFIX[kind]}'
            if tk not in sd:
                missing.append('/'.join(keys))
                return leaf
            w = sd[tk]
            if kind == 'first_fc':
                w = _first_fc(w)
            elif kind == 'conv' and w.ndim == 4:
                w = _conv(w)
            elif kind == 'conv' and w.ndim == 2:
                w = _linear(w)
            assert w.shape == leaf.shape, \
                f'{tk}: {w.shape} vs {"/".join(keys)}: {leaf.shape}'
            return np.asarray(w, dtype=np.asarray(leaf).dtype)
        return jtu.tree_map_with_path(one, collection)

    out = dict(variables)
    out['params'] = fill(variables['params'])
    if 'batch_stats' in variables:
        out['batch_stats'] = fill(variables['batch_stats'])
    if strict and missing:
        raise KeyError(f'unmapped params: {missing[:10]} '
                       f'({len(missing)} total)')
    return out, missing


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('src')
    ap.add_argument('dst')
    ap.add_argument('--config', required=True)
    args = ap.parse_args()

    import torch
    import jax
    import jax.numpy as jnp
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import Config
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.builder import build_detector

    ckpt = torch.load(args.src, map_location='cpu')
    sd = ckpt.get('state_dict', ckpt)
    cfg = Config.fromfile(args.config)
    model = build_detector(cfg.model)
    batch = dict(image=jnp.zeros((1, 64, 64, 3)),
                 gt_bboxes=jnp.zeros((1, 4, 4)),
                 gt_labels=jnp.zeros((1, 4), jnp.int32),
                 gt_valid=jnp.zeros((1, 4), bool),
                 img_shape=jnp.array([[64., 64.]]))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'sampler': jax.random.PRNGKey(1)}, batch)
    variables, missing = convert_mmdet_state(sd, variables)
    if missing:
        print(f'warning: {len(missing)} params had no source '
              f'(e.g. {missing[:5]})')
    import flax.serialization
    with open(args.dst, 'wb') as f:
        f.write(flax.serialization.to_bytes(variables))
    print(f'wrote {args.dst}')


if __name__ == '__main__':
    main()
