"""Checkpoint save/restore (reference: mmcv CheckpointHook + runner.resume,
`da_configs/_base_/default_runtime.py:12`, `apis/train.py:199-202`).

Orbax-backed pytree checkpoints of the full TrainState, plus the
torchvision-R50 weight converter the reference relies on via
`init_cfg=dict(type='Pretrained', checkpoint='torchvision://resnet50')`
(`faster_rcnn_r50_torch_daf.py:19-21`).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(path: str, state: Any, step: Optional[int] = None,
                    meta: Optional[Dict] = None):
    """Save a TrainState (or any pytree) with orbax."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    payload = jax.device_get(state)
    ckptr.save(path, payload, force=True)
    if meta:
        import json
        with open(os.path.join(path, 'graft_meta.json'), 'w') as f:
            json.dump(meta, f)


def load_checkpoint(path: str, target: Any = None) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), item=target)
    return restored


def latest_checkpoint(work_dir: str) -> Optional[str]:
    if not os.path.isdir(work_dir):
        return None
    ckpts = [d for d in os.listdir(work_dir)
             if re.fullmatch(r'ckpt_\d+', d)]
    if not ckpts:
        return None
    best = max(ckpts, key=lambda d: int(d.split('_')[1]))
    return os.path.join(work_dir, best)


# -- torchvision/torch state-dict conversion -------------------------------

def convert_torch_resnet(state_dict: Dict[str, 'np.ndarray']
                         ) -> Dict[str, Any]:
    """Convert a torchvision-style ResNet state dict to our param layout.

    Returns dict(params=..., batch_stats=...) matching
    `models.backbones.resnet.ResNet` ({'conv1': {'kernel'}, 'layer1/0':
    {'conv1': {...}, 'bn1': {...}}, ...}). Conv kernels transpose
    OIHW → HWIO.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, keys, value):
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    for name, w in state_dict.items():
        w = np.asarray(w)
        parts = name.split('.')
        if parts[0] in ('conv1', 'bn1'):
            mod_path = [parts[0]]
            leaf = parts[-1]
        elif parts[0].startswith('layer'):
            block = f'{parts[0]}/{parts[1]}'
            sub = parts[2]
            if sub == 'downsample':
                sub = 'downsample_conv' if parts[3] == '0' else 'downsample_bn'
                leaf = parts[-1]
            else:
                leaf = parts[-1]
            mod_path = [block, sub]
        elif parts[0] == 'fc':
            continue  # classifier head not used
        else:
            continue
        is_bn = 'bn' in mod_path[-1] or mod_path[-1].endswith('_bn')
        if is_bn:
            if leaf == 'weight':
                put(params, mod_path + ['scale'], w)
            elif leaf == 'bias':
                put(params, mod_path + ['bias'], w)
            elif leaf == 'running_mean':
                put(stats, mod_path + ['mean'], w)
            elif leaf == 'running_var':
                put(stats, mod_path + ['var'], w)
        else:
            if leaf == 'weight':           # OIHW → HWIO
                put(params, mod_path + ['kernel'], w.transpose(2, 3, 1, 0))
            elif leaf == 'bias':
                put(params, mod_path + ['bias'], w)
    return dict(params=params, batch_stats=stats)


def convert_pycls_regnet(state_dict: Dict[str, 'np.ndarray']
                         ) -> Dict[str, Any]:
    """Convert a pycls RegNet state dict to our param layout (reference
    `tools/model_converters/regnet2mmdet.py` does pycls→mmdet; the target
    here is `models.backbones.zoo_backbones.RegNet`: `stem_conv/_bn`,
    `s{i}b{j}_{1,2,3}_conv/_bn`, `s{i}b{j}_down_conv/_bn`, 0-indexed).

    pycls names (1-indexed): `stem.{conv,bn}`, `s{i}.b{j}.proj` /
    `s{i}.b{j}.bn` (shortcut), `s{i}.b{j}.f.{a,b,c}` + `{a,b,c}_bn`;
    `head.fc` is dropped. Grouped-conv kernels transpose OIHW→HWIO the
    same as dense ones (flax keeps I/groups on the in-dim).
    """
    f_map = {'a': '1', 'b': '2', 'c': '3'}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for name, w in state_dict.items():
        w = np.asarray(w)
        parts = name.split('.')
        if parts[0] == 'stem':
            mod = 'stem_conv' if parts[1] == 'conv' else 'stem_bn'
        elif parts[0].startswith('s') and parts[0][1:].isdigit():
            si, bj = int(parts[0][1:]) - 1, int(parts[1][1:]) - 1
            base = f's{si}b{bj}'
            if parts[2] == 'proj':
                mod = f'{base}_down_conv'
            elif parts[2] == 'bn':
                mod = f'{base}_down_bn'
            elif parts[2] == 'f':
                sub = parts[3]
                if sub.endswith('_bn'):
                    mod = f'{base}_{f_map[sub[0]]}_bn'
                else:
                    mod = f'{base}_{f_map[sub]}_conv'
            else:
                continue
        else:
            continue  # head.fc etc.
        leaf = parts[-1]
        if mod.endswith('_bn'):
            if leaf == 'weight':
                params.setdefault(mod, {})['scale'] = w
            elif leaf == 'bias':
                params.setdefault(mod, {})['bias'] = w
            elif leaf == 'running_mean':
                stats.setdefault(mod, {})['mean'] = w
            elif leaf == 'running_var':
                stats.setdefault(mod, {})['var'] = w
        elif leaf == 'weight':
            params.setdefault(mod, {})['kernel'] = w.transpose(2, 3, 1, 0)
    return dict(params=params, batch_stats=stats)


def load_pretrained_backbone(variables: Dict, torch_ckpt_path: str,
                             backbone_key: str = 'backbone',
                             trunk_key: Optional[str] = 'trunk') -> Dict:
    """Merge converted torch weights into a model's variables pytree.

    Accepts a `.pth` (torch.load-able) path. Missing/mismatched keys are
    skipped with a warning — same tolerance as mmcv's `load_checkpoint`.
    """
    import torch
    sd = torch.load(torch_ckpt_path, map_location='cpu', weights_only=False)
    if 'state_dict' in sd:
        sd = sd['state_dict']
    if 'model_state' in sd:        # pycls checkpoint wrapper
        sd = sd['model_state']
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, 'numpy')}
    if any(k.startswith('stem.') for k in sd):     # pycls RegNet naming
        converted = convert_pycls_regnet(sd)
    else:
        converted = convert_torch_resnet(sd)

    import copy
    out = copy.deepcopy(jax.device_get(variables))

    def merge(dst, src, path=''):
        for k, v in src.items():
            if k not in dst:
                print(f'[load_pretrained] skip missing {path}/{k}')
                continue
            if isinstance(v, dict):
                merge(dst[k], v, f'{path}/{k}')
            else:
                if np.shape(dst[k]) != np.shape(v):
                    print(f'[load_pretrained] shape mismatch {path}/{k}: '
                          f'{np.shape(dst[k])} vs {np.shape(v)}')
                    continue
                dst[k] = v.astype(np.asarray(dst[k]).dtype)

    root_p = out['params'][backbone_key]
    root_s = out['batch_stats'][backbone_key]
    if trunk_key and trunk_key in root_p:
        root_p = root_p[trunk_key]
        root_s = root_s[trunk_key]
    merge(root_p, converted['params'])
    merge(root_s, converted['batch_stats'])
    return out
