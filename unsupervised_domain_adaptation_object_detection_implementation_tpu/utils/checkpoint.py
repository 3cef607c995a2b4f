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


def _put(tree, keys, value):
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _swin_merge_reorder(w: 'np.ndarray') -> 'np.ndarray':
    """Reorder the 4 patch-merging channel blocks from the official torch
    concat order [(h0,w0),(h1,w0),(h0,w1),(h1,w1)] to this trunk's
    (h_off, w_off)-major order [(h0,w0),(h0,w1),(h1,w0),(h1,w1)]
    (reference analog: `mmdet/models/utils/ckpt_convert.py:90-101`
    `correct_unfold_*_order`, retargeted to our reshape/transpose layout)."""
    c4 = w.shape[-1]
    w = w.reshape(*w.shape[:-1], 4, c4 // 4)
    return w[..., [0, 2, 1, 3], :].reshape(*w.shape[:-2], c4)


def convert_torch_swin(state_dict: Dict[str, 'np.ndarray']) -> Dict[str, Any]:
    """Convert an official (microsoft) Swin Transformer classification
    checkpoint to `models.backbones.swin.SwinTransformer`'s param layout
    (reference `mmdet/models/utils/ckpt_convert.py:85` `swin_converter`).

    Key maps: `patch_embed.proj`→`patch_embed` conv (OIHW→HWIO),
    `layers.{i}.blocks.{j}.*`→`stage{i}/block{j}.*` with qkv/proj/mlp Dense
    transposed, `relative_position_bias_table`→`attn.rel_bias`,
    `layers.{i}.downsample.{norm,reduction}`→`merge_norm{i}`/
    `merge_reduce{i}` with the 4-block channel reorder. The classification
    head and final `norm.*` are dropped (the reference's non-strict load
    drops them the same way; our per-stage `out_norm{i}` stay at init)."""
    params: Dict[str, Any] = {}
    for name, w in state_dict.items():
        w = np.asarray(w)
        parts = name.split('.')
        if parts[0] in ('head', 'norm'):
            continue
        if parts[0] == 'patch_embed':
            if parts[1] == 'proj':
                if parts[2] == 'weight':
                    _put(params, ['patch_embed', 'kernel'],
                         w.transpose(2, 3, 1, 0))
                else:
                    _put(params, ['patch_embed', 'bias'], w)
            elif parts[1] == 'norm':
                _put(params, ['patch_norm',
                              'scale' if parts[2] == 'weight' else 'bias'], w)
            continue
        if parts[0] != 'layers':
            continue
        i = int(parts[1])
        if parts[2] == 'downsample':
            sub, leaf = parts[3], parts[4]
            if sub == 'norm':
                _put(params, [f'merge_norm{i}',
                              'scale' if leaf == 'weight' else 'bias'],
                     _swin_merge_reorder(w))
            elif sub == 'reduction' and leaf == 'weight':
                # (2C, 4C) official -> block-reordered, transposed (4C, 2C)
                _put(params, [f'merge_reduce{i}', 'kernel'],
                     _swin_merge_reorder(w).T)
            continue
        if parts[2] != 'blocks':
            continue
        j = int(parts[3])
        blk = f'stage{i}/block{j}'
        sub = parts[4]
        leaf = parts[-1]
        if sub in ('norm1', 'norm2'):
            _put(params, [blk, sub,
                          'scale' if leaf == 'weight' else 'bias'], w)
        elif sub == 'attn':
            a = parts[5]
            if a == 'relative_position_bias_table':
                _put(params, [blk, 'attn', 'rel_bias'], w)
            elif a in ('qkv', 'proj'):
                if leaf == 'weight':
                    _put(params, [blk, 'attn', a, 'kernel'], w.T)
                else:
                    _put(params, [blk, 'attn', a, 'bias'], w)
            # relative_position_index / attn_mask buffers: recomputed
        elif sub == 'mlp':
            a = parts[5]            # fc1 / fc2
            if leaf == 'weight':
                _put(params, [blk, f'mlp_{a}', 'kernel'], w.T)
            else:
                _put(params, [blk, f'mlp_{a}', 'bias'], w)
    return dict(params=params, batch_stats={})


def convert_torch_pvt(state_dict: Dict[str, 'np.ndarray']) -> Dict[str, Any]:
    """Convert an official PVT v1/v2 classification checkpoint to
    `models.backbones.pvt.PVT`'s param layout (reference
    `mmdet/models/utils/ckpt_convert.py:12` `pvt_convert`).

    `patch_embed{s}.proj`→`patch_embed{s-1}` conv, `.norm`→`embed_norm{s-1}`,
    `pos_embed{s}` (cls token stripped on stage 4)→`pos_embed{s-1}` stored as
    a (1, g, g, C) grid (resized on load), `block{s}.{j}.attn.kv` split into
    our separate `k`/`v` Dense, `attn.sr` conv OIHW→HWIO, `attn.norm`→
    `sr_norm`, `mlp.fc1/fc2`(+`dwconv`)→`fc1/fc2`(+`dwconv`), per-stage
    `norm{s}` (v2)→`out_norm{s-1}`. `head`/`cls_token`/final `norm.` drop."""
    params: Dict[str, Any] = {}
    for name, w in state_dict.items():
        w = np.asarray(w)
        parts = name.split('.')
        if parts[0].startswith('head') or parts[0] == 'cls_token' \
                or name.startswith('norm.'):
            continue
        if parts[0].startswith('pos_embed'):
            s = int(parts[0][len('pos_embed'):])
            n = w.shape[1]
            g = int(round(n ** 0.5))
            if g * g != n:          # leading cls token (stage 4: 1 + 7*7)
                w = w[:, 1:, :]
                n = w.shape[1]
                g = int(round(n ** 0.5))
            params[f'pos_embed{s - 1}'] = w.reshape(1, g, g, w.shape[-1])
            continue
        if parts[0].startswith('patch_embed'):
            s = int(parts[0][len('patch_embed'):]) - 1
            leaf = parts[-1]
            if parts[1] == 'proj':
                if leaf == 'weight':
                    _put(params, [f'patch_embed{s}', 'kernel'],
                         w.transpose(2, 3, 1, 0))
                else:
                    _put(params, [f'patch_embed{s}', 'bias'], w)
            elif parts[1] == 'norm':
                _put(params, [f'embed_norm{s}',
                              'scale' if leaf == 'weight' else 'bias'], w)
            continue
        if parts[0].startswith('norm') and parts[0][4:].isdigit():
            s = int(parts[0][4:]) - 1
            _put(params, [f'out_norm{s}',
                          'scale' if parts[-1] == 'weight' else 'bias'], w)
            continue
        if not parts[0].startswith('block'):
            continue
        s = int(parts[0][len('block'):]) - 1
        j = int(parts[1])
        blk = f'stage{s}/block{j}'
        sub = parts[2]
        leaf = parts[-1]
        if sub in ('norm1', 'norm2'):
            _put(params, [blk, sub,
                          'scale' if leaf == 'weight' else 'bias'], w)
        elif sub == 'attn':
            a = parts[3]
            if a == 'kv':
                c = w.shape[0] // 2
                if leaf == 'weight':
                    _put(params, [blk, 'attn', 'k', 'kernel'], w[:c].T)
                    _put(params, [blk, 'attn', 'v', 'kernel'], w[c:].T)
                else:
                    _put(params, [blk, 'attn', 'k', 'bias'], w[:c])
                    _put(params, [blk, 'attn', 'v', 'bias'], w[c:])
            elif a in ('q', 'proj'):
                if leaf == 'weight':
                    _put(params, [blk, 'attn', a, 'kernel'], w.T)
                else:
                    _put(params, [blk, 'attn', a, 'bias'], w)
            elif a == 'sr':
                if leaf == 'weight':
                    _put(params, [blk, 'attn', 'sr', 'kernel'],
                         w.transpose(2, 3, 1, 0))
                else:
                    _put(params, [blk, 'attn', 'sr', 'bias'], w)
            elif a == 'norm':
                _put(params, [blk, 'attn', 'sr_norm',
                              'scale' if leaf == 'weight' else 'bias'], w)
        elif sub == 'mlp':
            a = parts[3]
            if a == 'dwconv':       # mlp.dwconv.dwconv.{weight,bias}, v2
                if leaf == 'weight':
                    # depthwise (C,1,3,3) OIHW -> flax HWIO (3,3,1,C)
                    _put(params, [blk, 'dwconv', 'kernel'],
                         w.transpose(2, 3, 1, 0))
                else:
                    _put(params, [blk, 'dwconv', 'bias'], w)
            elif leaf == 'weight':
                _put(params, [blk, a, 'kernel'], w.T)
            else:
                _put(params, [blk, a, 'bias'], w)
    return dict(params=params, batch_stats={})


def detect_and_convert(sd: Dict[str, 'np.ndarray']) -> Dict[str, Any]:
    """Route a torch state dict to the right converter by key shape
    (reference `tools/model_converters/` picks by script; here one entry)."""
    if any('relative_position_bias_table' in k for k in sd):
        return convert_torch_swin(sd)
    if any(k.startswith('patch_embed1.') for k in sd):
        return convert_torch_pvt(sd)
    if any(k.startswith('stem.') for k in sd):     # pycls RegNet naming
        return convert_pycls_regnet(sd)
    return convert_torch_resnet(sd)


def load_pretrained_backbone(variables: Dict, torch_ckpt_path: str,
                             backbone_key: str = 'backbone',
                             trunk_key: Optional[str] = 'trunk') -> Dict:
    """Merge converted torch weights into a model's variables pytree.

    Accepts a `.pth` (torch.load-able) path. Missing/mismatched keys are
    skipped with a warning — same tolerance as mmcv's `load_checkpoint`.
    """
    import torch
    sd = torch.load(torch_ckpt_path, map_location='cpu', weights_only=False)
    for wrapper in ('state_dict', 'model_state', 'model'):
        if wrapper in sd and isinstance(sd[wrapper], dict):
            sd = sd[wrapper]       # torch / pycls / microsoft-swin wrappers
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, 'numpy')}
    converted = detect_and_convert(sd)

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
                    if k.startswith('pos_embed') and np.ndim(v) == 4:
                        # pretrained absolute-position grid (224-input) →
                        # bilinear resize to the detection grid (reference
                        # mmdet pvt.py AbsolutePositionEmbedding resize)
                        dst[k] = np.asarray(jax.image.resize(
                            v, np.shape(dst[k]), 'bilinear')).astype(
                                np.asarray(dst[k]).dtype)
                        continue
                    print(f'[load_pretrained] shape mismatch {path}/{k}: '
                          f'{np.shape(dst[k])} vs {np.shape(v)}')
                    continue
                dst[k] = v.astype(np.asarray(dst[k]).dtype)

    root_p = out['params'][backbone_key]
    if trunk_key and trunk_key in root_p:
        root_p = root_p[trunk_key]
    merge(root_p, converted['params'])
    if converted['batch_stats']:
        root_s = out['batch_stats'][backbone_key]
        if trunk_key and trunk_key in root_s:
            root_s = root_s[trunk_key]
        merge(root_s, converted['batch_stats'])
    return out
