"""Model construction from dict configs (reference `mmdet/models/builder.py:48`).

`build_detector(cfg)` accepts either the native flat config (module kwargs)
or a reference-style nested dict (`model = dict(type=..., backbone=...,
rpn_head=..., roi_head=..., train_cfg=..., test_cfg=...)`) and translates it
onto the unified TPU modules. The translation layer keeps the reference's
config surface usable while the module set stays small and static.
"""

from __future__ import annotations

from typing import Any, Dict

from ..utils.registry import DETECTORS
from .dense_heads.rpn_head import ProposalConfig, RPNTrainConfig
from .detectors.faster_rcnn import AnchorConfig
from .roi_heads.standard_roi_head import RoITestConfig, RoITrainConfig

# reference detector type name → (module registry name, variant kwargs)
_REFERENCE_DETECTOR_MAP = {
    'FasterRCNN': ('FasterRCNN', {}),
    'DAFasterRCNN': ('DAFasterRCNN', dict(variant='daf',
                                          instance_mode='grouped')),
    'DAFasterRCNN_Org': ('DAFasterRCNN', dict(variant='daf_org',
                                              instance_mode='plain')),
    'MAFasterRCNN': ('DAFasterRCNN', dict(variant='maf',
                                          instance_mode='split_plain')),
    'FasterRCNN_SWDA': ('DAFasterRCNN', dict(variant='swda',
                                             instance_mode='grouped')),
    'DAFasterRCNN_Deep': ('DAFasterRCNN', dict(variant='deep',
                                               instance_mode='grouped')),
    'DAFasterRCNN_Tri': ('DAFasterRCNN', dict(variant='tri',
                                              instance_mode='grouped',
                                              group_k=10)),
    'CyDAFasterRCNN': ('CyDAFasterRCNN', {}),
    'CyCADA': ('CyDAFasterRCNN', dict(pretraining=True)),
}


# reference bbox_head.loss_bbox type (+reg_decoded_bbox=True) → RoI reg-loss
# family knob (configs/faster_rcnn/faster_rcnn_r50_fpn_{iou,giou,ciou,
# bounded_iou}_1x_coco.py)
_REG_LOSS_MAP = {'IoULoss': 'iou', 'GIoULoss': 'giou', 'CIoULoss': 'ciou',
                 'DIoULoss': 'diou', 'BoundedIoULoss': 'bounded_iou'}


def _reg_loss_kwargs(bbox_head: Dict[str, Any]) -> Dict[str, Any]:
    lb = bbox_head.get('loss_bbox', {})
    name = _REG_LOSS_MAP.get(lb.get('type'))
    if name is None:
        return {}
    return dict(reg_loss=name, reg_loss_weight=lb.get('loss_weight', 1.0))


def _nested_to_kwargs(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Translate a reference-style nested model dict to module kwargs."""
    kwargs: Dict[str, Any] = {}
    backbone = cfg.get('backbone', {})
    if 'depth' in backbone:
        kwargs['backbone_depth'] = backbone['depth']
    if 'frozen_stages' in backbone:
        kwargs['frozen_stages'] = backbone['frozen_stages']
    if backbone.get('trunk_type') or backbone.get('type') == 'SwinTransformer':
        kwargs['backbone_type'] = backbone.get('trunk_type', 'swin')
        # `out_stride` selects the swin tap stage (4/8/16/32); the
        # detector derives out_indices from featmap_stride so RoIAlign,
        # anchors and the tap stay aligned.
        kwargs['featmap_stride'] = backbone.get('out_stride', 32)
    elif backbone.get('type', 'ResNet') != 'ResNet':
        # non-default trunk (Res2Net, HRNet, RegNet, ResNeXt, V1d, PVT, …)
        # → generic swap through backbones/build.py. DA trunk variants
        # (ResNet_DA_*) are handled by the detector itself via `variant`
        # taps, not the generic swap.
        from ..utils.registry import BACKBONES
        from .backbones.build import BACKBONE_ALIASES
        btype = backbone['type']
        if btype != 'DAResNet' and (btype in BACKBONE_ALIASES
                                    or btype in BACKBONES):
            kwargs['backbone_cfg'] = backbone

    rpn = cfg.get('rpn_head', {})
    anch = rpn.get('anchor_generator', {})
    if anch:
        kwargs['anchor_cfg'] = AnchorConfig(
            scales=tuple(anch.get('scales', (2, 4, 8, 16, 32))),
            ratios=tuple(anch.get('ratios', (0.5, 1.0, 2.0))),
            stride=(anch.get('strides', [16]))[0])
        if kwargs.get('backbone_type') == 'swin':
            kwargs['anchor_cfg'] = kwargs['anchor_cfg']._replace(
                stride=kwargs['featmap_stride'])

    roi = cfg.get('roi_head', {})
    bbox_head = roi.get('bbox_head', {})
    if 'num_classes' in bbox_head:
        kwargs['num_classes'] = bbox_head['num_classes']

    train_cfg = cfg.get('train_cfg') or {}
    if train_cfg:
        r = train_cfg.get('rpn', {})
        a = r.get('assigner', {})
        s = r.get('sampler', {})
        kwargs['rpn_train_cfg'] = RPNTrainConfig(
            pos_iou_thr=a.get('pos_iou_thr', 0.7),
            neg_iou_thr=a.get('neg_iou_thr', 0.3),
            min_pos_iou=a.get('min_pos_iou', 0.3),
            match_low_quality=a.get('match_low_quality', True),
            num_samples=s.get('num', 256),
            pos_fraction=s.get('pos_fraction', 0.5),
            allowed_border=r.get('allowed_border', 0))
        p = train_cfg.get('rpn_proposal', {})
        if p:
            kwargs['rpn_proposal_cfg'] = ProposalConfig(
                nms_pre=min(p.get('nms_pre', 4096), 8192),
                max_per_img=p.get('max_per_img', 2000),
                nms_iou_threshold=p.get('nms', {}).get('iou_threshold', 0.7),
                min_bbox_size=p.get('min_bbox_size', 0))
        rc = train_cfg.get('rcnn', {})
        ra = rc.get('assigner', {})
        rs = rc.get('sampler', {})
        stds = tuple(bbox_head.get('bbox_coder', {}).get(
            'target_stds', (0.1, 0.1, 0.2, 0.2)))
        kwargs['roi_train_cfg'] = RoITrainConfig(
            pos_iou_thr=ra.get('pos_iou_thr', 0.5),
            neg_iou_thr=ra.get('neg_iou_thr', 0.5),
            min_pos_iou=ra.get('min_pos_iou', 0.5),
            match_low_quality=ra.get('match_low_quality', False),
            num_samples=rs.get('num', 512),
            pos_fraction=rs.get('pos_fraction', 0.25),
            add_gt_as_proposals=rs.get('add_gt_as_proposals', True),
            target_stds=stds,
            use_sigmoid_cls=bbox_head.get('loss_cls', {}).get(
                'use_sigmoid', True),
            sampler_type=('ohem' if rs.get('type') == 'OHEMSampler'
                          else 'random'),
            **_reg_loss_kwargs(bbox_head))

    test_cfg = cfg.get('test_cfg') or {}
    if test_cfg:
        tr = test_cfg.get('rpn', {})
        kwargs['rpn_test_cfg'] = ProposalConfig(
            nms_pre=min(tr.get('nms_pre', 4096), 8192),
            max_per_img=tr.get('max_per_img', 1000),
            nms_iou_threshold=tr.get('nms', {}).get('iou_threshold', 0.7),
            min_bbox_size=tr.get('min_bbox_size', 0))
        tc = test_cfg.get('rcnn', {})
        tc_nms = tc.get('nms', {})
        kwargs['roi_test_cfg'] = RoITestConfig(
            score_thr=tc.get('score_thr', 0.05),
            nms_iou_threshold=tc_nms.get('iou_threshold', 0.5),
            max_per_img=tc.get('max_per_img', 100),
            nms_type=tc_nms.get('type', 'nms'),
            soft_sigma=tc_nms.get('sigma', 0.5),
            soft_min_score=tc_nms.get('min_score', 1e-3),
            soft_method=tc_nms.get('method', 'linear'))
    return kwargs


def build_detector(cfg: Dict[str, Any]):
    """Build a detector module from a config dict (nested or flat)."""
    cfg = dict(cfg)
    det_type = cfg.pop('type')
    nested = any(k in cfg for k in ('backbone', 'rpn_head', 'roi_head'))
    if det_type in _REFERENCE_DETECTOR_MAP:
        reg_name, extra = _REFERENCE_DETECTOR_MAP[det_type]
    else:
        reg_name, extra = det_type, {}
    if nested:
        kwargs = _nested_to_kwargs(cfg)
    else:
        kwargs = cfg
    kwargs.update(extra)
    if isinstance(kwargs.get('dtype'), str):
        # `--cfg-options model.dtype=bfloat16` CLI override
        import jax.numpy as jnp
        kwargs['dtype'] = jnp.dtype(kwargs['dtype'])
    if isinstance(kwargs.get('backbone_cfg'), dict):
        # Flax module fields must be hashable for jit static-arg caching
        from .backbones.build import freeze_trunk_cfg
        kwargs['backbone_cfg'] = freeze_trunk_cfg(kwargs['backbone_cfg'])
    cls = DETECTORS.get(reg_name)
    # drop kwargs the target family does not take (e.g. swapping
    # `model.type` between families with different knobs via --cfg-options;
    # mmdet configs routinely carry family-specific keys)
    import dataclasses
    if dataclasses.is_dataclass(cls):
        fields = {f.name for f in dataclasses.fields(cls)}
        dropped = sorted(k for k in kwargs if k not in fields)
        if dropped:
            import warnings
            warnings.warn(f'{reg_name}: ignoring config keys {dropped}')
            kwargs = {k: v for k, v in kwargs.items() if k in fields}
        # dict → NamedTuple coercion: flat configs may set sub-configs as
        # dicts (e.g. `train_cfg=dict(loss_cls='ghm')` on RetinaNet);
        # merge them over the field's default NamedTuple. Unknown keys
        # raise (ValueError from _replace) — configs stay honest.
        for f in dataclasses.fields(cls):
            v = kwargs.get(f.name)
            d = f.default
            # config lists → tuples for plain sequence fields (flax module
            # fields must stay hashable for jit static-arg caching)
            if (isinstance(v, list) and isinstance(d, tuple)
                    and not hasattr(d, '_fields')):
                kwargs[f.name] = tuple(v)
                continue
            if (isinstance(v, dict) and isinstance(d, tuple)
                    and hasattr(d, '_fields')):
                kwargs[f.name] = d._replace(
                    **{k: tuple(x) if isinstance(x, list) else x
                       for k, x in v.items()})
    return cls(**kwargs)
