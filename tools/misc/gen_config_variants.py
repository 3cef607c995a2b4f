#!/usr/bin/env python
"""Emit the reference's per-family config variant matrix.

The reference zoo (mmdet 2.19 fork, `/root/reference/configs/`) spans each
family with trunk (R101 / X101-32x4d / X101-64x4d / X101-32x8d / Res2Net /
ResNeSt / HRNet widths / RegNet sizes / PVT sizes), norm provenance (caffe),
schedule (1x / 2x / 20e / mstrain-3x / 90k / fp16) and trick (OHEM, soft-NMS,
DCN, GCB) axes. This tool emits those rows as thin `_base_`-inheriting
configs over this repo's family bases, mirroring the reference's file names
(sans `_coco` suffix) so a reference user finds the same zoo surface.

Every emitted file is exercised by the config sweep
(`tests/test_core/test_config.py::test_all_repo_configs_build_modules`),
which BUILDS the model + trunk, so the axes are live knobs, not comments.

Semantics notes (documented per-file in headers):
- `caffe` rows swap the pixel-normalization constants (BGR, std=1) exactly
  like the reference's `img_norm_cfg`; the torch `style='caffe'` 3x3-stride
  placement is an implementation detail `build_trunk` drops (docs/PARITY.md).
- `syncbn*` tokens are no-ops: trunk norms are frozen-BN/GN; data-parallel
  XLA replicas see identical batch stats by construction.
- mask `poly` rows equal their bitmap twins: masks are box-frame rasters.

Usage:  python tools/misc/gen_config_variants.py [--force] [--list]
"""

import argparse
import os
import sys

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..')
sys.path.insert(0, ROOT)

from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E402
    Config)

CONFIGS = os.path.join(ROOT, 'configs')

# detector-name prefix (longest match wins) -> repo base config
BASES = {
    'cascade_mask_rcnn': 'cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x.py',
    'cascade_rcnn': 'cascade_rcnn/cascade_rcnn_r50_fpn_1x.py',
    'faster_rcnn': 'faster_rcnn/faster_rcnn_r50_fpn_1x.py',
    'mask_rcnn': 'mask_rcnn/mask_rcnn_r50_fpn_1x.py',
    'retinanet_free_anchor': 'free_anchor/retinanet_free_anchor_r50_fpn_1x.py',
    'retinanet': 'retinanet/retinanet_r50_fpn_1x.py',
    'rpn': 'rpn/rpn_r50_fpn_1x.py',
    'fast_rcnn': 'fast_rcnn/fast_rcnn_r50_fpn_1x.py',
    'ms_rcnn': 'ms_rcnn/ms_rcnn_r50_fpn_1x.py',
    'htc_without_semantic': 'htc/htc_r50_fpn_1x.py',
    'htc': 'htc/htc_r50_fpn_1x.py',
    'scnet': 'scnet/scnet_r50_fpn_1x.py',
    'fcos': 'fcos/fcos_r50_fpn_1x.py',
    'fovea_align': 'foveabox/fovea_r50_fpn_4x4_1x.py',
    'fovea': 'foveabox/fovea_r50_fpn_4x4_1x.py',
    'atss': 'atss/atss_r50_fpn_1x.py',
    'gfl': 'gfl/gfl_r50_fpn_1x.py',
    'paa': 'paa/paa_r50_fpn_1x.py',
    'fsaf': 'fsaf/fsaf_r50_fpn_1x.py',
    'vfnet': 'vfnet/vfnet_r50_fpn_1x.py',
    'reppoints_moment': 'reppoints/reppoints_moment_r50_fpn_1x.py',
    'ga_retinanet': 'guided_anchoring/ga_retinanet_r50_fpn_1x.py',
    'ga_faster': 'guided_anchoring/ga_faster_r50_fpn_1x.py',
    'ga_rpn': 'guided_anchoring/ga_rpn_r50_fpn_1x.py',
    'sabl_retinanet': 'sabl/sabl_retinanet_r50_fpn_1x.py',
    'grid_rcnn': 'grid_rcnn/grid_rcnn_r50_fpn_2x.py',
    'libra_faster_rcnn': 'libra_rcnn/libra_faster_rcnn_r50_fpn_1x.py',
    'libra_retinanet': 'retinanet/retinanet_r50_fpn_1x.py',
    'pisa_faster_rcnn': 'pisa/pisa_faster_rcnn_r50_fpn_1x.py',
    'pisa_retinanet': 'pisa/pisa_retinanet_r50_fpn_1x.py',
    'point_rend': 'point_rend/point_rend_r50_fpn_1x.py',
    'panoptic_fpn': 'panoptic_fpn/panoptic_fpn_r50_fpn_1x.py',
    'tridentnet': 'tridentnet/tridentnet_r50_caffe_1x.py',
    'centernet': 'centernet/centernet_r18_140e.py',
    'yolact': 'yolact/yolact_r50_1x.py',
    'solo': 'solo/solo_r50_fpn_1x.py',
    'queryinst': 'queryinst/queryinst_r50_fpn_1x.py',
    'sparse_rcnn': 'sparse_rcnn/sparse_rcnn_r50_fpn_1x.py',
}

# trunk token -> backbone_cfg dict (None = keep the base's trunk)
TRUNKS = {
    'r50': None,
    'r101': dict(type='ResNet', depth=101),
    'r18': dict(type='ResNet', depth=18),
    'r34': dict(type='ResNet', depth=34),
    'x50_32x4d': dict(type='ResNeXt', depth=50, groups=32, base_width=4),
    'x101_32x4d': dict(type='ResNeXt', depth=101, groups=32, base_width=4),
    'x101_32x8d': dict(type='ResNeXt', depth=101, groups=32, base_width=8),
    'x101_64x4d': dict(type='ResNeXt', depth=101, groups=64, base_width=4),
    # reppoints' bare "x101" is 32x4d (reference reppoints config)
    'x101': dict(type='ResNeXt', depth=101, groups=32, base_width=4),
    'r2_101': dict(type='Res2Net', depth=101),
    's50': dict(type='ResNeSt', depth=50),
    's101': dict(type='ResNeSt', depth=101),
    'hrnetv2p_w18': dict(type='HRNet', base_width=18),
    'hrnetv2p_w32': dict(type='HRNet', base_width=32),
    'hrnetv2p_w40': dict(type='HRNet', base_width=40),
    'regnetx-400MF': dict(type='RegNet', arch='regnetx_400mf'),
    'regnetx-800MF': dict(type='RegNet', arch='regnetx_800mf'),
    'regnetx-1.6GF': dict(type='RegNet', arch='regnetx_1.6gf'),
    'regnetx-3.2GF': dict(type='RegNet', arch='regnetx_3.2gf'),
    'regnetx-4GF': dict(type='RegNet', arch='regnetx_4.0gf'),
    'regnetx-6.4GF': dict(type='RegNet', arch='regnetx_6.4gf'),
    'regnetx-8GF': dict(type='RegNet', arch='regnetx_8.0gf'),
    'regnetx-12GF': dict(type='RegNet', arch='regnetx_12gf'),
    'pvt-t': dict(type='PyramidVisionTransformer'),
    'pvt-s': dict(type='PyramidVisionTransformer', depths=(3, 4, 6, 3)),
    'pvt-m': dict(type='PyramidVisionTransformer', depths=(3, 4, 18, 3)),
    'pvt-l': dict(type='PyramidVisionTransformer', depths=(3, 8, 27, 3)),
    'pvtv2-b0': dict(type='PyramidVisionTransformerV2',
                     embed_dims=(32, 64, 160, 256)),
    'pvtv2-b1': dict(type='PyramidVisionTransformerV2'),
    'pvtv2-b2': dict(type='PyramidVisionTransformerV2',
                     depths=(3, 4, 6, 3)),
    'pvtv2-b3': dict(type='PyramidVisionTransformerV2',
                     depths=(3, 4, 18, 3)),
    'pvtv2-b4': dict(type='PyramidVisionTransformerV2',
                     depths=(3, 8, 27, 3)),
    'pvtv2-b5': dict(type='PyramidVisionTransformerV2',
                     depths=(3, 6, 40, 3), mlp_ratios=(4, 4, 4, 4)),
    'swin-t-p4-w7': dict(type='SwinTransformer'),
    'swin-s-p4-w7': dict(type='SwinTransformer', depths=(2, 2, 18, 2)),
}

# schedule token -> (lr steps, max_epochs); None entries keep the base's
SCHEDULES = {
    '1x': None,
    '2x': ([16, 22], 24),
    '20e': ([16, 19], 20),
    '28e': ([24, 27], 28),
    '1.5x': ([12, 16], 18),
    '3x': ([28, 34], 36),          # plain 3x (configs/gn)
    'mstrain3x': ([9, 11], 12),    # common/mstrain_3x: RepeatDataset x3
    '4x': ([32, 44], 48),
    '20-23-24e': ([20, 23], 24),
}

NOOP_TOKENS = {
    'fpn',
    # batch-layout tokens (GPUSxSAMPLES): single-program data layout here
    '4x4', '8x2', '16x1', '8x1', '1x8', '8x8', '16x2', '8x6',
    # head-norm tokens: heads here already use their family's norm choice
    'gn-head', 'gn-neck+head',
    # syncbn: XLA data-parallel replicas compute identical (frozen) stats
    'syncbn-backbone', 'syncbn-backbone+head', 'syncbn-all', 'syncbn',
    'poly',            # masks are box-frame rasters (bitmap==polygon here)
    'align',           # fovea align: deform-align head variant folded in
    'mstest',          # cornernet multi-scale test -> --scale-tta flag
    'contrib',         # torch-weights provenance token
    'gn',              # sabl head GN variant
}

CAFFE_NORM = dict(mean=[103.530, 116.280, 123.675], std=[1.0, 1.0, 1.0],
                  to_rgb=False)


class Skip(Exception):
    pass


def _fmt(obj, indent=0, width=72):
    """Render a python literal the config style: dict(...) keyword form."""
    pad = ' ' * indent
    if isinstance(obj, dict):
        items = [f'{k}={_fmt(v, indent + 4)}' for k, v in obj.items()]
        one = 'dict(' + ', '.join(items) + ')'
        if len(one) + indent <= width and '\n' not in one:
            return one
        inner = (',\n' + pad + '     ').join(items)
        return 'dict(' + inner + ')'
    if isinstance(obj, (list, tuple)):
        items = [_fmt(v, indent + 4) for v in obj]
        one = ('[' + ', '.join(items) + ']') if isinstance(obj, list) \
            else ('(' + ', '.join(items) + (',' if len(obj) == 1 else '') + ')')
        if len(one) + indent <= width and '\n' not in one:
            return one
        inner = (',\n' + pad + ' ').join(items)
        return ('[' + inner + ']') if isinstance(obj, list) else \
            ('(' + inner + ')')
    return repr(obj)


def parse(stem):
    """Reference config stem -> (detector, spec dict)."""
    spec = dict(backbone=None, model=dict(), sched=None, mstrain=None,
                repeat3=False, caffe=False, fp16=False, notes=[],
                classes=None)
    # class-subset suffixes: ..._coco-person(-bicycle-car)
    if stem.endswith('-person'):
        spec['classes'] = ('person',)
        stem = stem[:-len('-person')]
    elif stem.endswith('-person-bicycle-car'):
        spec['classes'] = ('person', 'bicycle', 'car')
        stem = stem[:-len('-person-bicycle-car')]

    det = max((p for p in BASES if stem == p or stem.startswith(p + '_')),
              key=len, default=None)
    if det is None:
        raise Skip('no base for detector prefix')
    rest = stem[len(det):].strip('_')
    rest = rest.replace('20_23_24e', '20-23-24e')
    toks = rest.split('_') if rest else []

    # join multi-part trunk tokens greedily (longest first)
    i = 0
    out = []
    while i < len(toks):
        for n in (3, 2, 1):
            j = '_'.join(toks[i:i + n])
            if j in TRUNKS:
                out.append(('trunk', j))
                i += n
                break
        else:
            out.append(('tok', toks[i]))
            i += 1

    bb = {}
    i = 0
    flat = out
    while i < len(flat):
        kind, t = flat[i]
        nxt = flat[i + 1][1] if i + 1 < len(flat) else None
        if kind == 'trunk':
            cfg = TRUNKS[t]
            if cfg:
                bb.update(cfg)
        elif t == 'caffe':
            spec['caffe'] = True
        elif t in ('dc5', 'c4'):
            # single-level stride-16 trunk family (C4 and DC5 collapse to
            # the same RoI path here; docs/PARITY.md)
            if det != 'faster_rcnn':
                raise Skip(f'{t} trunk only mapped for faster_rcnn')
            spec['model']['type'] = 'FasterRCNN'
            spec['notes'].append(
                f'# {t}: single-level stride-16 trunk (detectors/faster_rcnn.py)')
        elif t in ('dconv', 'mdconv'):
            if nxt not in ('c3-c5', 'c4-c5'):
                raise Skip(f'{t} without stage range')
            typ = 'DCN' if t == 'dconv' else 'DCNv2'
            stages = (False, True, True, True) if nxt == 'c3-c5' \
                else (False, False, True, True)
            if 'type' not in bb:
                bb['type'] = 'ResNet'
                bb['depth'] = 50
            bb['dcn'] = dict(type=typ, deform_groups=1,
                             fallback_on_stride=False)
            bb['stage_with_dcn'] = stages
            i += 2
            continue
        elif t == 'group4':
            if 'dcn' in bb:
                bb['dcn']['deform_groups'] = 4
        elif t in ('r4', 'r16') and nxt == 'gcb':
            ratio = 0.25 if t == 'r4' else 0.0625
            bb.setdefault('type', 'ResNet')
            bb.setdefault('depth', 50)
            bb['plugins'] = [dict(cfg=dict(type='ContextBlock', ratio=ratio),
                                  stages=(False, True, True, True),
                                  position='after_conv3')]
            # consume 'gcb' and its 'c3-c5'
            i += 2
            if i < len(flat) and flat[i][1] == 'c3-c5':
                i += 1
            continue
        elif t == 'gn-all':
            bb.setdefault('type', 'ResNet')
            bb.setdefault('depth', 50)
            bb['norm_cfg'] = dict(type='GN', num_groups=32,
                                  requires_grad=True)
        elif t in ('gn_ws-all', 'ws-all'):  # 'gn_ws-all' splits at '_'
            bb.setdefault('type', 'ResNet')
            bb.setdefault('depth', 50)
            bb['conv_cfg'] = dict(type='ConvWS')
            bb['norm_cfg'] = dict(type='GN', num_groups=32,
                                  requires_grad=True)
        elif t in ('mstrain', 'mstrain-poly', 'mstrain-range'):
            spec['mstrain'] = (640, 800)
            if nxt and '-' in (nxt or '') and \
                    all(p.isdigit() for p in nxt.split('-')):
                lo, hi = (int(p) for p in nxt.split('-'))
                spec['mstrain'] = (lo, hi)
                i += 2
                continue
            if nxt and nxt.isdigit() and i + 2 < len(flat) and \
                    flat[i + 2][1].isdigit():
                spec['mstrain'] = (int(nxt), int(flat[i + 2][1]))
                i += 3
                continue
        elif t == 'ms':
            # sabl "2x_ms_480_960": range follows as two tokens
            if nxt and nxt.isdigit() and i + 2 < len(flat) and \
                    flat[i + 2][1].isdigit():
                spec['mstrain'] = (int(nxt), int(flat[i + 2][1]))
                i += 3
                continue
            spec['mstrain'] = (640, 800)
        elif t == 'fp16':
            spec['fp16'] = True
        elif t == 'ohem':
            spec['model']['roi_train_cfg'] = dict(sampler_type='ohem')
        elif t == 'soft' and nxt == 'nms':
            spec['model']['roi_test_cfg'] = dict(nms_type='soft_nms')
            i += 2
            continue
        elif t == 'without':
            # htc_without_semantic
            spec['model']['with_semantic'] = False
            if nxt == 'semantic':
                i += 2
                continue
        elif t == 'dcnv2':
            bb.setdefault('type', 'ResNet')
            bb.setdefault('depth', bb.get('depth', 18))
            bb['dcn'] = dict(type='DCNv2', deform_groups=1,
                             fallback_on_stride=False)
            bb['stage_with_dcn'] = (False, True, True, True)
        elif t in SCHEDULES:
            spec['sched'] = t
        elif t == '90k':
            spec['sched'] = '90k'
        elif t in NOOP_TOKENS:
            pass
        else:
            raise Skip(f'unsupported token {t!r}')
        i += 1

    if spec['mstrain'] and spec['sched'] == '3x':
        spec['sched'] = 'mstrain3x'
        spec['repeat3'] = True
    if bb:
        spec['backbone'] = bb
    return det, spec


def _patch_pipeline(pipe, caffe=False, mstrain=None):
    out = []
    for step in pipe:
        step = dict(step)
        if caffe and step.get('type') == 'Normalize':
            step.update(CAFFE_NORM)
        if mstrain and step.get('type') == 'Resize' and 'img_scale' in step:
            long_edge = step['img_scale'][0] if isinstance(
                step['img_scale'], (list, tuple)) and not isinstance(
                    step['img_scale'][0], (list, tuple)) else 1333
            step['img_scale'] = [(long_edge, mstrain[0]),
                                 (long_edge, mstrain[1])]
            step['multiscale_mode'] = 'range'
        out.append(step)
    return out


def emit(family, stem, force=False):
    det, spec = parse(stem)
    base_rel = BASES[det]
    out_dir = os.path.join(CONFIGS, family)
    out_path = os.path.join(out_dir, stem + '.py')
    if os.path.exists(out_path) and not force:
        return 'exists'
    base_abs = os.path.join(CONFIGS, base_rel)
    if not os.path.exists(base_abs):
        raise Skip(f'missing base {base_rel}')
    if os.path.abspath(out_path) == os.path.abspath(base_abs):
        return 'is-base'
    base_dirname = os.path.dirname(base_rel)
    ref = f'{family}/{stem}_coco.py' if not stem.endswith(
        ('voc0712', 'cocofmt', 'cityscapes', 'lvis_v1')) \
        else f'{family}/{stem}.py'
    rel = os.path.relpath(os.path.join(CONFIGS, base_rel), out_dir)

    lines = [
        f'# Counterpart of reference configs/{ref}',
        '# (variant row emitted by tools/misc/gen_config_variants.py).',
    ]
    lines += spec['notes']
    if spec['caffe']:
        lines.append("# caffe row: caffe img_norm constants; torch "
                     "style='caffe' stride placement")
        lines.append('# is dropped by build_trunk (docs/PARITY.md).')
    lines.append(f"_base_ = ['{rel}']")

    model = dict(spec['model'])
    if spec['backbone']:
        model['backbone_cfg'] = spec['backbone']
    if model:
        lines.append('model = ' + _fmt(model))

    sched = spec['sched']
    if sched == '90k':
        lines += [
            'lr_config = dict(policy=\'step\', warmup=\'linear\','
            ' warmup_iters=500,',
            '                 warmup_ratio=0.001, step=[60000, 80000])',
            "runner = dict(_delete_=True, type='IterBasedRunner',"
            ' max_iters=90000)',
            'checkpoint_config = dict(interval=10000)',
            "evaluation = dict(interval=10000, metric='bbox')",
        ]
    elif sched and SCHEDULES.get(sched):
        steps, epochs = SCHEDULES[sched]
        lines.append(f'lr_config = dict(step={steps})')
        lines.append(f'runner = dict(max_epochs={epochs})')

    if spec['fp16']:
        lines.append('# reference fp16 -> bf16 compute on TPU '
                     '(apis/train.py fp16 gate)')
        lines.append('fp16 = dict(loss_scale=512.)')

    data_over = {}
    if spec['caffe'] or spec['mstrain'] or spec['repeat3'] or spec['classes']:
        cfg = Config.fromfile(base_abs)
        data = cfg.get('data', {})
        train = dict(data.get('train', {}))
        if 'pipeline' in train and (spec['caffe'] or spec['mstrain']):
            train['pipeline'] = _patch_pipeline(
                train['pipeline'], spec['caffe'], spec['mstrain'])
            data_over['train'] = dict(pipeline=train['pipeline'])
        if spec['classes']:
            data_over.setdefault('train', {})['classes'] = spec['classes']
            for split in ('val', 'test'):
                if split in data:
                    data_over.setdefault(split, {})['classes'] = \
                        spec['classes']
        if spec['repeat3']:
            inner = dict(train)
            inner.pop('times', None)
            if spec['classes']:
                inner['classes'] = spec['classes']
            data_over['train'] = dict(
                _delete_=True, type='RepeatDataset', times=3, dataset=inner)
        if spec['caffe']:
            for split in ('val', 'test'):
                sub = data.get(split)
                if sub and 'pipeline' in sub:
                    d = data_over.setdefault(split, {})
                    d['pipeline'] = _patch_pipeline(sub['pipeline'],
                                                    caffe=True)
    if spec['classes']:
        model.setdefault('num_classes', len(spec['classes']))
        # re-emit model line with num_classes
        for k, ln in enumerate(lines):
            if ln.startswith('model = '):
                lines[k] = 'model = ' + _fmt(model)
                break
        else:
            lines.append('model = ' + _fmt(model))
        lines.append(f'classes = {spec["classes"]!r}')
    if data_over:
        lines.append('data = ' + _fmt(data_over))

    os.makedirs(out_dir, exist_ok=True)
    with open(out_path, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    _selfcheck(out_path)
    return 'wrote'


def _selfcheck(out_path):
    """Load the file just written; delete it and abort on any failure.

    Emission is self-checking: a file this tool cannot `Config.fromfile`
    back must never reach the tree (round-3 lesson: 4 hand-emitted seesaw
    rows with a `{[...]}` set literal shipped unchecked and broke the
    config-sweep tests)."""
    try:
        Config.fromfile(out_path)
    except Exception as e:
        os.remove(out_path)
        raise SystemExit(f'SELF-CHECK FAILED for {out_path}: {e!r}')


# family-dir/stem rows to emit (reference file names, `_coco` dropped)
ROWS = """
faster_rcnn/faster_rcnn_r101_caffe_fpn_1x
faster_rcnn/faster_rcnn_r101_caffe_fpn_mstrain_3x
faster_rcnn/faster_rcnn_r101_fpn_1x
faster_rcnn/faster_rcnn_r101_fpn_2x
faster_rcnn/faster_rcnn_r101_fpn_mstrain_3x
faster_rcnn/faster_rcnn_r50_caffe_c4_1x
faster_rcnn/faster_rcnn_r50_caffe_dc5_1x
faster_rcnn/faster_rcnn_r50_caffe_dc5_mstrain_1x
faster_rcnn/faster_rcnn_r50_caffe_dc5_mstrain_3x
faster_rcnn/faster_rcnn_r50_caffe_fpn_1x
faster_rcnn/faster_rcnn_r50_caffe_fpn_90k
faster_rcnn/faster_rcnn_r50_caffe_fpn_mstrain_1x
faster_rcnn/faster_rcnn_r50_caffe_fpn_mstrain_2x
faster_rcnn/faster_rcnn_r50_caffe_fpn_mstrain_3x
faster_rcnn/faster_rcnn_r50_caffe_fpn_mstrain_90k
faster_rcnn/faster_rcnn_r50_fpn_2x
faster_rcnn/faster_rcnn_r50_fpn_fp16_1x
faster_rcnn/faster_rcnn_r50_fpn_mstrain_3x
faster_rcnn/faster_rcnn_r50_fpn_ohem_1x
faster_rcnn/faster_rcnn_x101_32x4d_fpn_1x
faster_rcnn/faster_rcnn_x101_32x4d_fpn_2x
faster_rcnn/faster_rcnn_x101_32x4d_fpn_mstrain_3x
faster_rcnn/faster_rcnn_x101_32x8d_fpn_mstrain_3x
faster_rcnn/faster_rcnn_x101_64x4d_fpn_1x
faster_rcnn/faster_rcnn_x101_64x4d_fpn_2x
faster_rcnn/faster_rcnn_x101_64x4d_fpn_mstrain_3x
retinanet/retinanet_r101_caffe_fpn_1x
retinanet/retinanet_r101_caffe_fpn_mstrain_3x
retinanet/retinanet_r101_fpn_1x
retinanet/retinanet_r101_fpn_2x
retinanet/retinanet_r101_fpn_mstrain_640-800_3x
retinanet/retinanet_r50_caffe_fpn_1x
retinanet/retinanet_r50_caffe_fpn_mstrain_1x
retinanet/retinanet_r50_caffe_fpn_mstrain_2x
retinanet/retinanet_r50_caffe_fpn_mstrain_3x
retinanet/retinanet_r50_fpn_2x
retinanet/retinanet_r50_fpn_fp16_1x
retinanet/retinanet_r50_fpn_mstrain_640-800_3x
retinanet/retinanet_x101_32x4d_fpn_1x
retinanet/retinanet_x101_32x4d_fpn_2x
retinanet/retinanet_x101_64x4d_fpn_1x
retinanet/retinanet_x101_64x4d_fpn_2x
retinanet/retinanet_x101_64x4d_fpn_mstrain_640-800_3x
mask_rcnn/mask_rcnn_r101_caffe_fpn_1x
mask_rcnn/mask_rcnn_r101_caffe_fpn_mstrain-poly_3x
mask_rcnn/mask_rcnn_r101_fpn_1x
mask_rcnn/mask_rcnn_r101_fpn_2x
mask_rcnn/mask_rcnn_r101_fpn_mstrain-poly_3x
mask_rcnn/mask_rcnn_r50_caffe_fpn_1x
mask_rcnn/mask_rcnn_r50_caffe_fpn_mstrain-poly_1x
mask_rcnn/mask_rcnn_r50_caffe_fpn_mstrain-poly_2x
mask_rcnn/mask_rcnn_r50_caffe_fpn_mstrain-poly_3x
mask_rcnn/mask_rcnn_r50_caffe_fpn_mstrain_1x
mask_rcnn/mask_rcnn_r50_fpn_2x
mask_rcnn/mask_rcnn_r50_fpn_fp16_1x
mask_rcnn/mask_rcnn_r50_fpn_mstrain-poly_3x
mask_rcnn/mask_rcnn_r50_fpn_poly_1x
mask_rcnn/mask_rcnn_x101_32x4d_fpn_1x
mask_rcnn/mask_rcnn_x101_32x4d_fpn_2x
mask_rcnn/mask_rcnn_x101_32x4d_fpn_mstrain-poly_3x
mask_rcnn/mask_rcnn_x101_32x8d_fpn_1x
mask_rcnn/mask_rcnn_x101_32x8d_fpn_mstrain-poly_1x
mask_rcnn/mask_rcnn_x101_32x8d_fpn_mstrain-poly_3x
mask_rcnn/mask_rcnn_x101_64x4d_fpn_1x
mask_rcnn/mask_rcnn_x101_64x4d_fpn_2x
mask_rcnn/mask_rcnn_x101_64x4d_fpn_mstrain-poly_3x
cascade_rcnn/cascade_rcnn_r101_caffe_fpn_1x
cascade_rcnn/cascade_rcnn_r101_fpn_1x
cascade_rcnn/cascade_rcnn_r101_fpn_20e
cascade_rcnn/cascade_rcnn_r50_caffe_fpn_1x
cascade_rcnn/cascade_rcnn_r50_fpn_20e
cascade_rcnn/cascade_rcnn_x101_32x4d_fpn_1x
cascade_rcnn/cascade_rcnn_x101_32x4d_fpn_20e
cascade_rcnn/cascade_rcnn_x101_64x4d_fpn_1x
cascade_rcnn/cascade_rcnn_x101_64x4d_fpn_20e
rpn/rpn_r101_caffe_fpn_1x
rpn/rpn_r101_fpn_1x
rpn/rpn_r101_fpn_2x
rpn/rpn_r50_caffe_fpn_1x
rpn/rpn_r50_fpn_2x
rpn/rpn_x101_32x4d_fpn_1x
rpn/rpn_x101_32x4d_fpn_2x
rpn/rpn_x101_64x4d_fpn_1x
rpn/rpn_x101_64x4d_fpn_2x
fast_rcnn/fast_rcnn_r101_caffe_fpn_1x
fast_rcnn/fast_rcnn_r101_fpn_1x
fast_rcnn/fast_rcnn_r101_fpn_2x
fast_rcnn/fast_rcnn_r50_caffe_fpn_1x
fast_rcnn/fast_rcnn_r50_fpn_2x
ms_rcnn/ms_rcnn_r101_caffe_fpn_1x
ms_rcnn/ms_rcnn_r101_caffe_fpn_2x
ms_rcnn/ms_rcnn_r50_caffe_fpn_1x
ms_rcnn/ms_rcnn_r50_caffe_fpn_2x
ms_rcnn/ms_rcnn_x101_32x4d_fpn_1x
ms_rcnn/ms_rcnn_x101_64x4d_fpn_1x
ms_rcnn/ms_rcnn_x101_64x4d_fpn_2x
hrnet/faster_rcnn_hrnetv2p_w18_1x
hrnet/faster_rcnn_hrnetv2p_w18_2x
hrnet/faster_rcnn_hrnetv2p_w32_2x
hrnet/faster_rcnn_hrnetv2p_w40_1x
hrnet/faster_rcnn_hrnetv2p_w40_2x
hrnet/mask_rcnn_hrnetv2p_w18_1x
hrnet/mask_rcnn_hrnetv2p_w18_2x
hrnet/mask_rcnn_hrnetv2p_w32_1x
hrnet/mask_rcnn_hrnetv2p_w32_2x
hrnet/mask_rcnn_hrnetv2p_w40_1x
hrnet/mask_rcnn_hrnetv2p_w40_2x
hrnet/cascade_rcnn_hrnetv2p_w18_20e
hrnet/cascade_rcnn_hrnetv2p_w32_20e
hrnet/cascade_rcnn_hrnetv2p_w40_20e
hrnet/htc_hrnetv2p_w18_20e
hrnet/htc_hrnetv2p_w32_20e
hrnet/htc_hrnetv2p_w40_20e
hrnet/htc_hrnetv2p_w40_28e
hrnet/htc_x101_64x4d_fpn_16x1_28e
hrnet/fcos_hrnetv2p_w18_gn-head_4x4_1x
hrnet/fcos_hrnetv2p_w18_gn-head_4x4_2x
hrnet/fcos_hrnetv2p_w18_gn-head_mstrain_640-800_4x4_2x
hrnet/fcos_hrnetv2p_w32_gn-head_4x4_2x
hrnet/fcos_hrnetv2p_w32_gn-head_mstrain_640-800_4x4_2x
hrnet/fcos_hrnetv2p_w40_gn-head_mstrain_640-800_4x4_2x
regnet/faster_rcnn_regnetx-1.6GF_fpn_mstrain_3x
regnet/faster_rcnn_regnetx-3.2GF_fpn_2x
regnet/faster_rcnn_regnetx-3.2GF_fpn_mstrain_3x
regnet/faster_rcnn_regnetx-400MF_fpn_mstrain_3x
regnet/faster_rcnn_regnetx-4GF_fpn_mstrain_3x
regnet/faster_rcnn_regnetx-800MF_fpn_mstrain_3x
regnet/mask_rcnn_regnetx-1.6GF_fpn_mstrain-poly_3x
regnet/mask_rcnn_regnetx-12GF_fpn_1x
regnet/mask_rcnn_regnetx-3.2GF_fpn_1x
regnet/mask_rcnn_regnetx-3.2GF_fpn_mstrain_3x
regnet/mask_rcnn_regnetx-400MF_fpn_mstrain-poly_3x
regnet/mask_rcnn_regnetx-4GF_fpn_1x
regnet/mask_rcnn_regnetx-4GF_fpn_mstrain-poly_3x
regnet/mask_rcnn_regnetx-6.4GF_fpn_1x
regnet/mask_rcnn_regnetx-800MF_fpn_mstrain-poly_3x
regnet/mask_rcnn_regnetx-8GF_fpn_1x
regnet/retinanet_regnetx-1.6GF_fpn_1x
regnet/retinanet_regnetx-800MF_fpn_1x
dcn/faster_rcnn_r101_fpn_dconv_c3-c5_1x
dcn/faster_rcnn_x101_32x4d_fpn_dconv_c3-c5_1x
dcn/faster_rcnn_r50_fpn_mdconv_c3-c5_group4_1x
dcn/mask_rcnn_r101_fpn_dconv_c3-c5_1x
dcn/mask_rcnn_r50_fpn_mdconv_c3-c5_1x
dcn/mask_rcnn_r50_fpn_fp16_dconv_c3-c5_1x
dcn/mask_rcnn_r50_fpn_fp16_mdconv_c3-c5_1x
dcn/cascade_rcnn_r101_fpn_dconv_c3-c5_1x
dcn/cascade_rcnn_r50_fpn_dconv_c3-c5_1x
gcnet/mask_rcnn_r101_fpn_r16_gcb_c3-c5_1x
gcnet/mask_rcnn_r101_fpn_r4_gcb_c3-c5_1x
gcnet/mask_rcnn_r101_fpn_syncbn-backbone_1x
gcnet/mask_rcnn_r101_fpn_syncbn-backbone_r16_gcb_c3-c5_1x
gcnet/mask_rcnn_r101_fpn_syncbn-backbone_r4_gcb_c3-c5_1x
gcnet/mask_rcnn_r50_fpn_syncbn-backbone_1x
gcnet/mask_rcnn_r50_fpn_syncbn-backbone_r16_gcb_c3-c5_1x
gcnet/mask_rcnn_r50_fpn_syncbn-backbone_r4_gcb_c3-c5_1x
gcnet/mask_rcnn_x101_32x4d_fpn_syncbn-backbone_1x
gcnet/mask_rcnn_x101_32x4d_fpn_syncbn-backbone_r16_gcb_c3-c5_1x
gcnet/mask_rcnn_x101_32x4d_fpn_syncbn-backbone_r4_gcb_c3-c5_1x
gn/mask_rcnn_r101_fpn_gn-all_2x
gn/mask_rcnn_r101_fpn_gn-all_3x
gn/mask_rcnn_r50_fpn_gn-all_3x
gn/mask_rcnn_r50_fpn_gn-all_contrib_2x
gn/mask_rcnn_r50_fpn_gn-all_contrib_3x
gn+ws/faster_rcnn_r101_fpn_gn_ws-all_1x
gn+ws/faster_rcnn_x101_32x4d_fpn_gn_ws-all_1x
gn+ws/faster_rcnn_x50_32x4d_fpn_gn_ws-all_1x
gn+ws/mask_rcnn_r101_fpn_gn_ws-all_2x
gn+ws/mask_rcnn_r101_fpn_gn_ws-all_20_23_24e
gn+ws/mask_rcnn_r50_fpn_gn_ws-all_20_23_24e
gn+ws/mask_rcnn_x101_32x4d_fpn_gn_ws-all_2x
gn+ws/mask_rcnn_x101_32x4d_fpn_gn_ws-all_20_23_24e
gn+ws/mask_rcnn_x50_32x4d_fpn_gn_ws-all_2x
gn+ws/mask_rcnn_x50_32x4d_fpn_gn_ws-all_20_23_24e
guided_anchoring/ga_faster_r50_caffe_fpn_1x
guided_anchoring/ga_faster_r101_caffe_fpn_1x
guided_anchoring/ga_faster_x101_32x4d_fpn_1x
guided_anchoring/ga_faster_x101_64x4d_fpn_1x
vfnet/vfnet_r2_101_fpn_mdconv_c3-c5_mstrain_2x
regnet/mask_rcnn_regnetx-3.2GF_fpn_mdconv_c3-c5_1x
guided_anchoring/ga_retinanet_r101_caffe_fpn_1x
guided_anchoring/ga_retinanet_r101_caffe_fpn_mstrain_2x
guided_anchoring/ga_retinanet_r50_caffe_fpn_1x
guided_anchoring/ga_retinanet_x101_32x4d_fpn_1x
guided_anchoring/ga_retinanet_x101_64x4d_fpn_1x
guided_anchoring/ga_rpn_r101_caffe_fpn_1x
guided_anchoring/ga_rpn_r50_caffe_fpn_1x
guided_anchoring/ga_rpn_x101_32x4d_fpn_1x
guided_anchoring/ga_rpn_x101_64x4d_fpn_1x
vfnet/vfnet_r101_fpn_1x
vfnet/vfnet_r101_fpn_2x
vfnet/vfnet_r101_fpn_mdconv_c3-c5_mstrain_2x
vfnet/vfnet_r101_fpn_mstrain_2x
vfnet/vfnet_r2_101_fpn_mstrain_2x
vfnet/vfnet_r50_fpn_mdconv_c3-c5_mstrain_2x
vfnet/vfnet_r50_fpn_mstrain_2x
vfnet/vfnet_x101_32x4d_fpn_mdconv_c3-c5_mstrain_2x
vfnet/vfnet_x101_32x4d_fpn_mstrain_2x
vfnet/vfnet_x101_64x4d_fpn_mdconv_c3-c5_mstrain_2x
vfnet/vfnet_x101_64x4d_fpn_mstrain_2x
sabl/sabl_retinanet_r101_fpn_1x
sabl/sabl_retinanet_r101_fpn_gn_1x
sabl/sabl_retinanet_r101_fpn_gn_2x_ms_480_960
sabl/sabl_retinanet_r101_fpn_gn_2x_ms_640_800
sabl/sabl_retinanet_r50_fpn_gn_1x
reppoints/reppoints_moment_r101_fpn_dconv_c3-c5_gn-neck+head_2x
reppoints/reppoints_moment_r101_fpn_gn-neck+head_2x
reppoints/reppoints_moment_r50_fpn_gn-neck+head_1x
reppoints/reppoints_moment_r50_fpn_gn-neck+head_2x
reppoints/reppoints_moment_x101_fpn_dconv_c3-c5_gn-neck+head_2x
pvt/retinanet_pvt-s_fpn_1x
pvt/retinanet_pvt-m_fpn_1x
pvt/retinanet_pvt-l_fpn_1x
pvt/retinanet_pvtv2-b0_fpn_1x
pvt/retinanet_pvtv2-b1_fpn_1x
pvt/retinanet_pvtv2-b2_fpn_1x
pvt/retinanet_pvtv2-b3_fpn_1x
pvt/retinanet_pvtv2-b4_fpn_1x
pvt/retinanet_pvtv2-b5_fpn_1x
fcos/fcos_r101_caffe_fpn_gn-head_1x
fcos/fcos_r101_caffe_fpn_gn-head_mstrain_640-800_2x
fcos/fcos_r50_caffe_fpn_gn-head_1x
fcos/fcos_r50_caffe_fpn_gn-head_4x4_1x
fcos/fcos_r50_caffe_fpn_gn-head_mstrain_640-800_2x
fcos/fcos_x101_64x4d_fpn_gn-head_mstrain_640-800_2x
foveabox/fovea_r101_fpn_4x4_1x
foveabox/fovea_r101_fpn_4x4_2x
foveabox/fovea_r50_fpn_4x4_2x
foveabox/fovea_align_r101_fpn_gn-head_4x4_2x
foveabox/fovea_align_r101_fpn_gn-head_mstrain_640-800_4x4_2x
foveabox/fovea_align_r50_fpn_gn-head_4x4_2x
foveabox/fovea_align_r50_fpn_gn-head_mstrain_640-800_4x4_2x
atss/atss_r101_fpn_1x
gfl/gfl_r101_fpn_dconv_c3-c5_mstrain_2x
gfl/gfl_r101_fpn_mstrain_2x
gfl/gfl_r50_fpn_mstrain_2x
gfl/gfl_x101_32x4d_fpn_dconv_c4-c5_mstrain_2x
gfl/gfl_x101_32x4d_fpn_mstrain_2x
free_anchor/retinanet_free_anchor_r101_fpn_1x
free_anchor/retinanet_free_anchor_x101_32x4d_fpn_1x
fsaf/fsaf_r101_fpn_1x
fsaf/fsaf_x101_64x4d_fpn_1x
paa/paa_r101_fpn_1x
paa/paa_r101_fpn_2x
paa/paa_r101_fpn_mstrain_3x
paa/paa_r50_fpn_1.5x
paa/paa_r50_fpn_2x
paa/paa_r50_fpn_mstrain_3x
htc/htc_r101_fpn_20e
htc/htc_r50_fpn_20e
htc/htc_without_semantic_r50_fpn_1x
htc/htc_x101_32x4d_fpn_16x1_20e
htc/htc_x101_64x4d_fpn_16x1_20e
htc/htc_x101_64x4d_fpn_dconv_c3-c5_mstrain_400_1400_16x1_20e
scnet/scnet_r101_fpn_20e
scnet/scnet_r50_fpn_20e
scnet/scnet_x101_64x4d_fpn_20e
scnet/scnet_x101_64x4d_fpn_8x1_20e
res2net/faster_rcnn_r2_101_fpn_2x
res2net/mask_rcnn_r2_101_fpn_2x
res2net/htc_r2_101_fpn_20e
resnest/faster_rcnn_s101_fpn_syncbn-backbone+head_mstrain-range_1x
resnest/mask_rcnn_s101_fpn_syncbn-backbone+head_mstrain_1x
resnest/mask_rcnn_s50_fpn_syncbn-backbone+head_mstrain_1x
resnest/cascade_rcnn_s101_fpn_syncbn-backbone+head_mstrain-range_1x
resnest/cascade_rcnn_s50_fpn_syncbn-backbone+head_mstrain-range_1x
pisa/pisa_faster_rcnn_x101_32x4d_fpn_1x
pisa/pisa_retinanet_x101_32x4d_fpn_1x
libra_rcnn/libra_faster_rcnn_r101_fpn_1x
libra_rcnn/libra_faster_rcnn_x101_64x4d_fpn_1x
grid_rcnn/grid_rcnn_r101_fpn_gn-head_2x
grid_rcnn/grid_rcnn_x101_32x4d_fpn_gn-head_2x
grid_rcnn/grid_rcnn_x101_64x4d_fpn_gn-head_2x
point_rend/point_rend_r50_caffe_fpn_mstrain_1x
point_rend/point_rend_r50_caffe_fpn_mstrain_3x
panoptic_fpn/panoptic_fpn_r101_fpn_1x
panoptic_fpn/panoptic_fpn_r101_fpn_mstrain_3x
panoptic_fpn/panoptic_fpn_r50_fpn_mstrain_3x
tridentnet/tridentnet_r50_caffe_mstrain_1x
tridentnet/tridentnet_r50_caffe_mstrain_3x
centernet/centernet_r18_dcnv2_140e
yolact/yolact_r101_1x
empirical_attention/faster_rcnn_r50_fpn_attention_0010_dcn_1x
empirical_attention/faster_rcnn_r50_fpn_attention_1111_dcn_1x
cascade_rcnn/cascade_mask_rcnn_r101_caffe_fpn_1x
cascade_rcnn/cascade_mask_rcnn_r101_caffe_fpn_mstrain_3x
cascade_rcnn/cascade_mask_rcnn_r101_fpn_1x
cascade_rcnn/cascade_mask_rcnn_r101_fpn_20e
cascade_rcnn/cascade_mask_rcnn_r101_fpn_mstrain_3x
cascade_rcnn/cascade_mask_rcnn_r50_caffe_fpn_1x
cascade_rcnn/cascade_mask_rcnn_r50_caffe_fpn_mstrain_3x
cascade_rcnn/cascade_mask_rcnn_r50_fpn_20e
cascade_rcnn/cascade_mask_rcnn_r50_fpn_mstrain_3x
cascade_rcnn/cascade_mask_rcnn_x101_32x4d_fpn_1x
cascade_rcnn/cascade_mask_rcnn_x101_32x4d_fpn_20e
cascade_rcnn/cascade_mask_rcnn_x101_32x4d_fpn_mstrain_3x
cascade_rcnn/cascade_mask_rcnn_x101_32x8d_fpn_mstrain_3x
cascade_rcnn/cascade_mask_rcnn_x101_64x4d_fpn_1x
cascade_rcnn/cascade_mask_rcnn_x101_64x4d_fpn_20e
cascade_rcnn/cascade_mask_rcnn_x101_64x4d_fpn_mstrain_3x
hrnet/cascade_mask_rcnn_hrnetv2p_w18_20e
hrnet/cascade_mask_rcnn_hrnetv2p_w32_20e
hrnet/cascade_mask_rcnn_hrnetv2p_w40_20e
regnet/cascade_mask_rcnn_regnetx-400MF_fpn_mstrain_3x
regnet/cascade_mask_rcnn_regnetx-800MF_fpn_mstrain_3x
regnet/cascade_mask_rcnn_regnetx-1.6GF_fpn_mstrain_3x
regnet/cascade_mask_rcnn_regnetx-3.2GF_fpn_mstrain_3x
regnet/cascade_mask_rcnn_regnetx-4GF_fpn_mstrain_3x
dcn/cascade_mask_rcnn_r101_fpn_dconv_c3-c5_1x
dcn/cascade_mask_rcnn_r50_fpn_dconv_c3-c5_1x
dcn/cascade_mask_rcnn_x101_32x4d_fpn_dconv_c3-c5_1x
gcnet/cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_1x
gcnet/cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_dconv_c3-c5_1x
gcnet/cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_dconv_c3-c5_r16_gcb_c3-c5_1x
gcnet/cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_dconv_c3-c5_r4_gcb_c3-c5_1x
gcnet/cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_r16_gcb_c3-c5_1x
gcnet/cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_r4_gcb_c3-c5_1x
res2net/cascade_mask_rcnn_r2_101_fpn_20e
resnest/cascade_mask_rcnn_s101_fpn_syncbn-backbone+head_mstrain_1x
resnest/cascade_mask_rcnn_s50_fpn_syncbn-backbone+head_mstrain_1x
instaboost/mask_rcnn_r101_fpn_instaboost_4x
instaboost/mask_rcnn_x101_64x4d_fpn_instaboost_4x
instaboost/cascade_mask_rcnn_r50_fpn_instaboost_4x
instaboost/cascade_mask_rcnn_r101_fpn_instaboost_4x
instaboost/cascade_mask_rcnn_x101_64x4d_fpn_instaboost_4x
"""

# rows needing custom override bodies (emitted verbatim after the header)
SPECIAL = {
    'instaboost/cascade_mask_rcnn_r50_fpn_instaboost_4x': (
        "_base_ = ['./mask_rcnn_r50_fpn_instaboost_4x.py']\n"
        "model = dict(type='CascadeMaskRCNN')\n"),
    'instaboost/cascade_mask_rcnn_r101_fpn_instaboost_4x': (
        "_base_ = ['./mask_rcnn_r50_fpn_instaboost_4x.py']\n"
        "model = dict(type='CascadeMaskRCNN',\n"
        "             backbone_cfg=dict(type='ResNet', depth=101))\n"),
    'instaboost/cascade_mask_rcnn_x101_64x4d_fpn_instaboost_4x': (
        "_base_ = ['./mask_rcnn_r50_fpn_instaboost_4x.py']\n"
        "model = dict(type='CascadeMaskRCNN',\n"
        "             backbone_cfg=dict(type='ResNeXt', depth=101,\n"
        "                               groups=64, base_width=4))\n"),
    'empirical_attention/faster_rcnn_r50_fpn_attention_0010_dcn_1x': (
        "_base_ = ['./faster_rcnn_r50_fpn_attention_0010_1x.py']\n"
        "model = dict(backbone_cfg=dict(\n"
        "    dcn=dict(type='DCN', deform_groups=1, fallback_on_stride=False),\n"
        "    stage_with_dcn=(False, True, True, True)))\n"),
    'empirical_attention/faster_rcnn_r50_fpn_attention_1111_dcn_1x': (
        "_base_ = ['./faster_rcnn_r50_fpn_attention_1111_1x.py']\n"
        "model = dict(backbone_cfg=dict(\n"
        "    dcn=dict(type='DCN', deform_groups=1, fallback_on_stride=False),\n"
        "    stage_with_dcn=(False, True, True, True)))\n"),
    'instaboost/mask_rcnn_r101_fpn_instaboost_4x': (
        "_base_ = ['./mask_rcnn_r50_fpn_instaboost_4x.py']\n"
        "model = dict(backbone_cfg=dict(type='ResNet', depth=101))\n"),
    'instaboost/mask_rcnn_x101_64x4d_fpn_instaboost_4x': (
        "_base_ = ['./mask_rcnn_r50_fpn_instaboost_4x.py']\n"
        "model = dict(backbone_cfg=dict(type='ResNeXt', depth=101,\n"
        "                               groups=64, base_width=4))\n"),
    'yolact/yolact_r101_1x': (
        "_base_ = ['./yolact_r50_1x.py']\n"
        "model = dict(backbone_cfg=dict(type='ResNet', depth=101))\n"),
    'centernet/centernet_r18_dcnv2_140e': (
        "_base_ = ['./centernet_r18_140e.py']\n"
        "model = dict(backbone_cfg=dict(\n"
        "    type='ResNet', depth=18,\n"
        "    dcn=dict(type='DCNv2', deform_groups=1,\n"
        "             fallback_on_stride=False),\n"
        "    stage_with_dcn=(False, True, True, True)))\n"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--force', action='store_true')
    ap.add_argument('--list', action='store_true')
    args = ap.parse_args()
    rows = [r.strip() for r in ROWS.strip().splitlines() if r.strip()]
    n_wrote = n_exist = n_skip = 0
    for row in rows:
        family, stem = row.split('/', 1)
        if args.list:
            print(row)
            continue
        if row in SPECIAL:
            out_path = os.path.join(CONFIGS, family, stem + '.py')
            if os.path.exists(out_path) and not args.force:
                n_exist += 1
                continue
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            with open(out_path, 'w') as f:
                f.write(f'# Counterpart of reference configs/{family}/'
                        f'{stem}_coco.py\n# (variant row emitted by '
                        f'tools/misc/gen_config_variants.py).\n'
                        + SPECIAL[row])
            _selfcheck(out_path)
            n_wrote += 1
            continue
        try:
            r = emit(family, stem, force=args.force)
        except Skip as e:
            print(f'SKIP {row}: {e}')
            n_skip += 1
            continue
        if r == 'wrote':
            n_wrote += 1
        else:
            n_exist += 1
    print(f'wrote={n_wrote} existing={n_exist} skipped={n_skip} '
          f'total_rows={len(rows)}')


if __name__ == '__main__':
    main()
