#!/usr/bin/env python
"""Segmentation-quality probes on the synthetic COCO-polygon split.

Two modes (VERDICT r4 items 4/6):
- `--mode mask_ap` — mask-IoU AP50 for full-image-mask models (SOLO /
  Decoupled SOLO). The zoo's box rows score SOLO by mask-extent boxes,
  which carries a self-inflicted stride-4 quantization penalty; this
  scores what SOLO actually predicts, the masks (reference counterpart:
  `segm` mAP in `mmdet/datasets/coco.py evaluate`).
- `--mode pq` — panoptic quality for PanopticFPN: predictions fuse via
  `heuristic_fuse`, gt panoptic maps rasterize from the COCO polygons +
  one background stuff class, scored with `pq_compute` (reference
  `mmdet/datasets/coco_panoptic.py` / panopticapi).

Usage:
  python tools/misc/probe_seg_quality.py CONFIG CKPT --mode mask_ap
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np  # noqa: E402


def rasterize_gt(dataset, idx, hw, stride=1):
    """GT instance masks for image `idx` at 1/stride res: (G, H, W) bool."""
    from PIL import Image, ImageDraw
    info = dataset.get_ann_info(idx)
    h, w = hw
    out = []
    for seg in info['masks']:
        img = Image.new('L', (w // stride, h // stride), 0)
        d = ImageDraw.Draw(img)
        for poly in seg:
            pts = [(poly[i] / stride, poly[i + 1] / stride)
                   for i in range(0, len(poly), 2)]
            d.polygon(pts, fill=1)
        out.append(np.asarray(img, bool))
    return np.stack(out) if out else np.zeros((0, h // stride, w // stride),
                                              bool)


def mask_iou(a, b):
    """(P, H, W) × (G, H, W) → (P, G)."""
    a = a.reshape(len(a), -1).astype(np.float32)
    b = b.reshape(len(b), -1).astype(np.float32)
    inter = a @ b.T
    union = a.sum(1)[:, None] + b.sum(1)[None] - inter
    return inter / np.maximum(union, 1.0)


def ap_from_matches(scores, matched, n_gt):
    """VOC-style AP from per-detection (score, tp) pairs."""
    if not len(scores) or n_gt == 0:
        return 0.0
    order = np.argsort(-np.asarray(scores))
    tp = np.asarray(matched, np.float32)[order]
    fp = 1.0 - tp
    tp_c, fp_c = np.cumsum(tp), np.cumsum(fp)
    rec = tp_c / n_gt
    prec = tp_c / np.maximum(tp_c + fp_c, 1e-9)
    ap = 0.0
    for t in np.arange(0.0, 1.01, 0.1):
        p = prec[rec >= t].max() if (rec >= t).any() else 0.0
        ap += p / 11
    return float(ap)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('--mode', choices=['mask_ap', 'pq'], default='mask_ap')
    p.add_argument('--iou-thr', type=float, default=0.5)
    p.add_argument('--cfg-options', nargs='+', default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.data import (  # noqa: E501
        build_dataset)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.builder import (  # noqa: E501
        build_detector)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E501
        Config, load_checkpoint)

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils.config import (  # noqa: E501
            parse_option_value)
        cfg.merge_from_dict({
            kv.split('=', 1)[0]: parse_option_value(kv.split('=', 1)[1])
            for kv in args.cfg_options})
    model = build_detector(dict(cfg.model))
    dataset = build_dataset(dict(cfg.data['test'], test_mode=True))
    state = load_checkpoint(args.checkpoint)
    variables = {'params': state['params'],
                 'batch_stats': state.get('batch_stats', {})}

    @jax.jit
    def predict(batch):
        return model.apply(variables, batch, train=False)

    num_classes = model.num_classes
    per_cls_scores = [[] for _ in range(num_classes)]
    per_cls_tp = [[] for _ in range(num_classes)]
    per_cls_ngt = [0] * num_classes
    pq_args = ([], [], [], [])

    for i in range(len(dataset)):
        sample = dataset[i]
        batch = {k: jnp.asarray(v)[None] for k, v in sample.items()}
        out = jax.device_get(predict(batch))
        info = dataset.get_ann_info(i)
        h, w = [int(x) for x in sample['img_shape']]

        if args.mode == 'mask_ap':
            # predicted full-image masks at stride 4 (SOLO contract)
            pm = out['masks'][0]
            st = (batch['image'].shape[1] + pm.shape[-2] - 1) // pm.shape[-2]
            gt = rasterize_gt(dataset, i, (pm.shape[-2] * st,
                                           pm.shape[-1] * st), stride=st)
            gl = info['labels']
            valid = out['valid'][0]
            scores = out['scores'][0] if 'scores' in out \
                else out['dets'][0][:, 4]
            labels = out['labels'][0]
            for c in range(num_classes):
                gsel = np.where(gl == c)[0]
                per_cls_ngt[c] += len(gsel)
                psel = np.where(valid & (labels == c))[0]
                if not len(psel):
                    continue
                psel = psel[np.argsort(-scores[psel])]
                iou = mask_iou(pm[psel], gt[gsel]) if len(gsel) else \
                    np.zeros((len(psel), 0))
                taken = np.zeros(len(gsel), bool)
                for pi in range(len(psel)):
                    per_cls_scores[c].append(float(scores[psel[pi]]))
                    j = int(np.argmax(iou[pi])) if iou.shape[1] else -1
                    ok = (j >= 0 and iou[pi, j] >= args.iou_thr
                          and not taken[j])
                    if ok:
                        taken[j] = True
                    per_cls_tp[c].append(1.0 if ok else 0.0)
        else:
            from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.panoptic_fpn import (  # noqa: E501
                heuristic_fuse)
            sem = out['semantic'][0]
            pan = heuristic_fuse(
                out['dets'][0], out['labels'][0], out['valid'][0],
                out['masks'][0], sem, (h, w),
                num_things=num_classes, num_stuff=model.num_stuff)
            # gt panoptic map: background stuff id 0 → segment 1;
            # instances get ids 1000+k with their class
            gt_masks = rasterize_gt(dataset, i, (h, w))
            gt_map = np.zeros((h, w), np.int64)
            gt_cats = {1: num_classes}          # stuff: background
            gt_map[:] = 1
            for k, (m, c) in enumerate(zip(gt_masks, info['labels'])):
                gt_map[m] = 1000 + k
                gt_cats[1000 + k] = int(c)
            from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.panoptic_fpn import (  # noqa: E501
                INSTANCE_OFFSET)
            pred_cats = {}
            for sid in np.unique(pan):
                if sid < 0:
                    continue                     # void
                if sid >= INSTANCE_OFFSET:
                    pred_cats[int(sid)] = int(sid % INSTANCE_OFFSET)
                else:
                    # stuff ids are already num_things + stuff_id
                    pred_cats[int(sid)] = int(sid)
            pq_args[0].append(pan.astype(np.int64))
            pq_args[1].append(gt_map)
            pq_args[2].append(pred_cats)
            pq_args[3].append(gt_cats)

    if args.mode == 'mask_ap':
        aps = [ap_from_matches(per_cls_scores[c], per_cls_tp[c],
                               per_cls_ngt[c])
               for c in range(num_classes) if per_cls_ngt[c]]
        print({'mask_AP50': round(float(np.mean(aps)), 4),
               'per_class': [round(a, 4) for a in aps]})
    else:
        from unsupervised_domain_adaptation_object_detection_implementation_tpu.data.datasets.coco_panoptic import (  # noqa: E501
            pq_compute)
        things_mask = np.asarray(
            [True] * num_classes + [False], bool)
        res = pq_compute(pq_args[0], pq_args[1], pq_args[2], pq_args[3],
                         num_classes + 1, things_mask)
        print({k: round(float(v), 4) for k, v in res.items()})


if __name__ == '__main__':
    main()
