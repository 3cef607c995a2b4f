"""Generic trunk factory — backbone×detector combinatorics via config.

TPU-native equivalent of the reference's `build_backbone`
(`mmdet/models/builder.py:20`): every registered backbone shares the
uniform `__call__(x) -> tuple[featmaps]` + `stage_channels()` interface,
so any detector family can swap its trunk through
`model.backbone_cfg=dict(type='Res2Net', ...)` — matching the zoo's
cross-products (e.g. reference `configs/res2net/faster_rcnn_r2_101_fpn_*`,
`configs/hrnet/faster_rcnn_hrnetv2p_w32_*`, `configs/regnet/*`,
`configs/pvt/retinanet_pvt-t_*`).

Reference backbone names that map onto parametrized modules here are
accepted as aliases (ResNeXt = ResNet+groups, reference `resnext.py`;
ResNetV1d = deep_stem+avg_down, reference `resnet.py:ResNetV1d`).
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Any, Dict, Optional

from ...utils.registry import BACKBONES

# reference type name → (registered name, implied kwargs)
BACKBONE_ALIASES: Dict[str, Any] = {
    'ResNeXt': ('ResNet', dict(groups=32, base_width=4)),
    'ResNetV1d': ('ResNet', dict(deep_stem=True, avg_down=True)),
    'Darknet': ('Darknet53', {}),
    'PyramidVisionTransformer': ('PVT', {}),
    'PyramidVisionTransformerV2': ('PVT', dict(v2=True)),
    'DetectoRS_ResNet': ('DetectoRSResNet', {}),
}

# config keys that only make sense for the torch reference — dropped
# silently rather than warned about.
_TORCH_ONLY_KEYS = frozenset({
    'init_cfg', 'norm_eval', 'style', 'pretrained',
    'zero_init_residual',
    'act_cfg', 'pretrain_img_size', 'convert_weights',
})


def _translate_mmdet_keys(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Map reference backbone config idioms onto this build's fields:
    `norm_cfg=dict(type='GN')` → `norm='gn'` (configs/gn*),
    `conv_cfg=dict(type='ConvWS')` → `conv_ws=True` (configs/gn+ws),
    `dcn=dict(type='DCN'|'DCNv2')` → `dcn='dcn'|'dcnv2'` (configs/dcn),
    `plugins=[dict(cfg=..., stages=..., position=...)]` passes through
    frozen (configs/gcnet, configs/empirical_attention)."""
    norm_cfg = cfg.pop('norm_cfg', None)
    if norm_cfg is not None:
        nd = dict(norm_cfg) if not isinstance(norm_cfg, dict) else norm_cfg
        if str(nd.get('type', 'BN')).upper() == 'GN':
            cfg.setdefault('norm', 'gn')
    conv_cfg = cfg.pop('conv_cfg', None)
    if conv_cfg is not None:
        cd = dict(conv_cfg) if not isinstance(conv_cfg, dict) else conv_cfg
        if str(cd.get('type', '')).startswith('ConvWS'):
            cfg.setdefault('conv_ws', True)
    dcn = cfg.pop('dcn', None)
    if dcn is not None:
        if isinstance(dcn, str):          # already this build's form
            cfg.setdefault('dcn', dcn)
        else:
            dd = dict(dcn)
            typ = str(dd.get('type', 'DCN')).lower()
            cfg.setdefault('dcn', 'dcnv2' if typ == 'dcnv2' else 'dcn')
    # mmdet `with_cp=True` IS activation checkpointing (torch.utils
    # .checkpoint per block) — map to jax.checkpoint remat, same semantics
    if cfg.pop('with_cp', False):
        cfg.setdefault('remat', True)
    if 'plugins' in cfg:
        cfg['plugins'] = freeze_trunk_cfg({'p': cfg['plugins']})[0][1]
    return cfg


def freeze_trunk_cfg(cfg):
    """dict config → hashable tuple-of-pairs (Flax module fields must be
    hashable for jit static-arg caching). Lists become tuples, nested
    dicts recurse. ``None`` passes through."""
    if cfg is None or isinstance(cfg, tuple):
        return cfg
    def _f(v):
        if isinstance(v, dict):
            return tuple(sorted((k, _f(x)) for k, x in v.items()))
        if isinstance(v, (list, tuple)):
            return tuple(_f(x) for x in v)
        return v
    return _f(dict(cfg))


def _thaw(cfg) -> Dict[str, Any]:
    """Inverse of freeze_trunk_cfg's top level (values stay tuples —
    build_trunk treats tuples and lists alike)."""
    if isinstance(cfg, tuple):
        return {k: v for k, v in cfg}
    return dict(cfg)


def build_trunk(cfg, *, dtype, **defaults):
    """Build a trunk module.

    ``cfg is None`` → ``ResNet(**defaults)`` (each detector's native
    default shape). ``cfg`` a dict (or frozen tuple-of-pairs from
    :func:`freeze_trunk_cfg`) → the named backbone, with the detector's
    defaults filled in for keys the cfg leaves unset and everything
    filtered to the target's dataclass fields.
    """
    if cfg is None:
        cls = BACKBONES.get('ResNet')
        kwargs = dict(defaults)
        user_keys: set = set()
    else:
        cfg = {k: v for k, v in _thaw(cfg).items()
               if k not in _TORCH_ONLY_KEYS}
        cfg = _translate_mmdet_keys(cfg)
        type_name = cfg.pop('type', 'ResNet')
        reg_name, implied = BACKBONE_ALIASES.get(type_name, (type_name, {}))
        cls = BACKBONES.get(reg_name)
        kwargs = {**implied, **cfg}
        user_keys = set(cfg)
        for k, v in defaults.items():
            kwargs.setdefault(k, v)
    kwargs['dtype'] = dtype
    fields = {f.name for f in dataclasses.fields(cls)}
    bad_user = sorted(user_keys - fields)
    if bad_user:
        warnings.warn(f'{cls.__name__}: ignoring backbone config keys '
                      f'{bad_user}')
    # Detector-supplied geometry the target trunk cannot express is a
    # correctness hazard, not noise: a DC5 detector (strides=(1,2,2,1),
    # dilations=(1,1,1,2) → stride-16 features, anchor stride 16) paired
    # with a trunk that hard-codes stride-32 stages would silently break
    # its anchor/RoI geometry.
    _STANDARD_GEOMETRY = {'strides': (1, 2, 2, 2), 'dilations': (1, 1, 1, 1)}
    for k, std in _STANDARD_GEOMETRY.items():
        v = kwargs.get(k)
        if k not in fields and v is not None and tuple(v) != std:
            warnings.warn(
                f'{cls.__name__} has no `{k}` field but the detector '
                f'requires non-standard {k}={tuple(v)} (DC5-style '
                f'geometry); feature stride will NOT match the '
                f"detector's anchor/RoI configuration")
    # lists from python-dict configs → hashable tuples (static jit args)
    clean = {k: tuple(v) if isinstance(v, list) else v
             for k, v in kwargs.items() if k in fields}
    return cls(**clean)
