"""SSD (reference `mmdet/models/detectors/single_stage.py` + `ssd_head.py`;
lite variant per `configs/ssd/ssdlite_mobilenetv2`).

MobileNetV2 C4/C5 + stride-2 extra convs give a 4-level pyramid; per-level
heads predict softmax classes + deltas over SSD anchors. Hard-negative
mining (3 negatives per positive, ranked by CE loss — the SSD essential)
reuses the static rank-selection machinery.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors.anchor_generator import AnchorGenerator
from ...core.bbox.assigners import max_iou_assign
from ...core.bbox.transforms import bbox2delta, clip_boxes, delta2bbox
from ...core.post.nms import NEG_INF, batched_nms
from ...utils.registry import DETECTORS
from ..backbones.misc_backbones import MobileNetV2
from ..dense_heads.anchor_head import DensePredictConfig
from ..layers.norm import FrozenBatchNorm
from ..losses import smooth_l1_loss
from ..losses.cross_entropy_loss import softmax_cross_entropy


class SSDAnchors(NamedTuple):
    """Per-level SSD anchors: base size + the extra sqrt-scale square."""
    strides: Tuple[int, ...] = (16, 32, 64, 128)
    base_sizes: Tuple[int, ...] = (64, 128, 214, 300)
    ratios: Tuple[float, ...] = (1.0, 2.0, 0.5)

    @property
    def num_anchors(self) -> int:
        return len(self.ratios) + 1

    def flat_anchors(self, sizes) -> np.ndarray:
        out = []
        for (h, w), s, bs, nxt in zip(
                sizes, self.strides, self.base_sizes,
                tuple(self.base_sizes[1:]) + (self.base_sizes[-1] * 3 // 2,)):
            gen = AnchorGenerator(strides=[s], ratios=list(self.ratios),
                                  scales=[bs / s], center_offset=0.5)
            a = gen.grid_priors([(h, w)])[0].reshape(h * w,
                                                     len(self.ratios), 4)
            extra_size = float(np.sqrt(bs * nxt))
            gen2 = AnchorGenerator(strides=[s], ratios=[1.0],
                                   scales=[extra_size / s], center_offset=0.5)
            e = gen2.grid_priors([(h, w)])[0].reshape(h * w, 1, 4)
            out.append(np.concatenate([a, e], axis=1).reshape(-1, 4))
        return np.concatenate(out, axis=0)


@DETECTORS.register_module()
class SSDLite(nn.Module):
    num_classes: int = 80
    anchor_cfg: SSDAnchors = SSDAnchors()
    neg_pos_ratio: int = 3
    test_cfg: DensePredictConfig = DensePredictConfig(
        score_thr=0.02, nms_iou_threshold=0.45, max_per_img=100)
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = MobileNetV2(dtype=self.dtype)
        a = self.anchor_cfg.num_anchors
        self.extra_convs = [
            nn.Conv(256, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                    use_bias=False, dtype=self.dtype, name=f'extra{i}')
            for i in range(2)
        ]
        self.extra_bns = [FrozenBatchNorm(256, name=f'extra{i}_bn')
                          for i in range(2)]
        self.cls_heads = [
            nn.Conv(a * (self.num_classes + 1), (3, 3),
                    padding=[(1, 1)] * 2, dtype=self.dtype,
                    name=f'cls_head{i}') for i in range(4)
        ]
        self.reg_heads = [
            nn.Conv(a * 4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name=f'reg_head{i}') for i in range(4)
        ]

    def _forward_flat(self, image):
        feats = list(self.backbone(image.astype(self.dtype)))[2:]  # C4, C5
        x = feats[-1]
        for conv, bn in zip(self.extra_convs, self.extra_bns):
            x = nn.relu6(bn(conv(x)))
            feats.append(x)
        b = image.shape[0]
        c = self.num_classes + 1
        cls_flat, reg_flat, sizes = [], [], []
        for i, f in enumerate(feats):
            sizes.append((f.shape[-3], f.shape[-2]))
            cls_flat.append(self.cls_heads[i](f).reshape(b, -1, c))
            reg_flat.append(self.reg_heads[i](f).reshape(b, -1, 4))
        anchors = jnp.asarray(self.anchor_cfg.flat_anchors(sizes))
        return (jnp.concatenate(cls_flat, 1), jnp.concatenate(reg_flat, 1),
                anchors)

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, anchors = self._forward_flat(batch['image'])
        c = self.num_classes + 1

        def per_image(cls_i, reg_i, gt, gtl, gtv):
            assign = max_iou_assign(anchors, gt, gtv, gtl,
                                    pos_iou_thr=0.5, neg_iou_thr=0.5,
                                    min_pos_iou=0.0, match_low_quality=True)
            pos = assign.assigned_gt_inds > 0
            neg = assign.assigned_gt_inds == 0
            labels = jnp.where(pos, assign.labels, self.num_classes)
            ce = softmax_cross_entropy(cls_i.astype(jnp.float32), labels)
            # hard-negative mining: top (ratio * n_pos) negatives by loss
            n_pos = jnp.sum(pos)
            order = jnp.argsort(-jnp.where(neg, ce, -jnp.inf))
            rank = jnp.zeros_like(order).at[order].set(
                jnp.arange(order.shape[0]))
            neg_sel = neg & (rank < self.neg_pos_ratio * n_pos)
            w = (pos | neg_sel).astype(jnp.float32)
            cls_l = jnp.sum(ce * w)
            targets = bbox2delta(anchors,
                                 gt[jnp.clip(assign.assigned_gt_inds - 1, 0,
                                             gt.shape[0] - 1)])
            reg_l = smooth_l1_loss(reg_i, targets,
                                   weight=pos[:, None].astype(jnp.float32),
                                   beta=1.0, reduction='sum')
            return cls_l, reg_l, n_pos

        cls_l, reg_l, n_pos = jax.vmap(per_image)(
            cls, reg, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        denom = jnp.maximum(jnp.sum(n_pos), 1.0)
        return dict(loss_cls=jnp.sum(cls_l) / denom,
                    loss_bbox=jnp.sum(reg_l) / denom)

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, anchors = self._forward_flat(batch['image'])
        cfg = self.test_cfg
        c = self.num_classes

        def per_image(cls_i, reg_i, shape_i):
            probs = jax.nn.softmax(cls_i.astype(jnp.float32),
                                   axis=-1)[:, :c]
            flat = probs.reshape(-1)
            flat = jnp.where(flat > cfg.score_thr, flat, NEG_INF)
            k = min(cfg.nms_pre, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            a_idx = idx // c
            labels = (idx % c).astype(jnp.int32)
            boxes = delta2bbox(anchors[a_idx],
                               reg_i[a_idx].astype(jnp.float32))
            boxes = clip_boxes(boxes, shape_i.astype(boxes.dtype))
            keep, _ = batched_nms(boxes, top, labels, cfg.nms_iou_threshold,
                                  cfg.nms_tile)
            kept = jnp.where(keep, top, NEG_INF)
            m = min(cfg.max_per_img, k)
            sc, sel = jax.lax.top_k(kept, m)
            valid = sc > NEG_INF / 2
            dets = jnp.concatenate(
                [boxes[sel] * valid[:, None],
                 jnp.where(valid, sc, 0.0)[:, None]], -1)
            return dets, jnp.where(valid, labels[sel], 0), valid

        dets, labels, valid = jax.vmap(per_image)(cls, reg,
                                                  batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)


class SSDVGGAnchors(NamedTuple):
    """mmcv `SSDAnchorGenerator` semantics (per-level ratio lists): each
    location gets [min-square, sqrt(min*max)-square] plus, per ratio r,
    the (sqrt(r), 1/sqrt(r)) rectangle pair at the min size
    (`mmdet/core/anchor/anchor_generator.py` SSDAnchorGenerator;
    `configs/ssd/ssd300_coco.py` anchor_generator block)."""
    strides: Tuple[int, ...] = (8, 16, 32, 64, 100, 300)
    min_sizes: Tuple[float, ...] = (21, 45, 99, 153, 207, 261)
    max_sizes: Tuple[float, ...] = (45, 99, 153, 207, 261, 315)
    level_ratios: Tuple[Tuple[float, ...], ...] = (
        (2.0,), (2.0, 3.0), (2.0, 3.0), (2.0, 3.0), (2.0,), (2.0,))

    def num_anchors_per_level(self) -> Tuple[int, ...]:
        return tuple(2 + 2 * len(r) for r in self.level_ratios)

    def flat_anchors(self, sizes) -> np.ndarray:
        out = []
        for (h, w), s, mn, mx, ratios in zip(
                sizes, self.strides, self.min_sizes, self.max_sizes,
                self.level_ratios):
            cy = (np.arange(h) + 0.5) * s
            cx = (np.arange(w) + 0.5) * s
            cyx = np.stack(np.meshgrid(cy, cx, indexing='ij'),
                           -1).reshape(-1, 2)
            whs = [(mn, mn), (np.sqrt(mn * mx), np.sqrt(mn * mx))]
            for r in ratios:
                sq = np.sqrt(r)
                whs += [(mn * sq, mn / sq), (mn / sq, mn * sq)]
            lvl = []
            for aw, ah in whs:
                lvl.append(np.stack([cyx[:, 1] - aw / 2, cyx[:, 0] - ah / 2,
                                     cyx[:, 1] + aw / 2, cyx[:, 0] + ah / 2],
                                    -1))
            # anchor-major per location: (loc, A, 4)
            out.append(np.stack(lvl, 1).reshape(-1, 4).astype(np.float32))
        return np.concatenate(out, axis=0)


# 300-input and 512-input presets (mmcv basesize_ratio_range expansions;
# reference `configs/ssd/ssd300_coco.py`, `ssd512_coco.py`, and the VOC
# rows in `configs/pascal_voc/`)
SSD300_COCO = SSDVGGAnchors()
SSD300_VOC = SSDVGGAnchors(
    min_sizes=(30, 60, 111, 162, 213, 264),
    max_sizes=(60, 111, 162, 213, 264, 315))
SSD512_COCO = SSDVGGAnchors(
    strides=(8, 16, 32, 64, 128, 256, 512),
    min_sizes=(20.48, 51.2, 133.12, 215.04, 296.96, 378.88, 460.8),
    max_sizes=(51.2, 133.12, 215.04, 296.96, 378.88, 460.8, 542.72),
    level_ratios=((2.0,), (2.0, 3.0), (2.0, 3.0), (2.0, 3.0), (2.0, 3.0),
                  (2.0,), (2.0,)))
SSD512_VOC = SSDVGGAnchors(
    strides=(8, 16, 32, 64, 128, 256, 512),
    min_sizes=(35.84, 76.8, 153.6, 230.4, 307.2, 384.0, 460.8),
    max_sizes=(76.8, 153.6, 230.4, 307.2, 384.0, 460.8, 537.6),
    level_ratios=((2.0,), (2.0, 3.0), (2.0, 3.0), (2.0, 3.0), (2.0, 3.0),
                  (2.0,), (2.0,)))

_VGG_ANCHOR_PRESETS = {
    (300, 'coco'): SSD300_COCO, (300, 'voc'): SSD300_VOC,
    (512, 'coco'): SSD512_COCO, (512, 'voc'): SSD512_VOC,
}


@DETECTORS.register_module()
class SSD(SSDLite):
    """The reference's headline VGG-16 SSD (`configs/ssd/ssd300_coco.py`,
    `ssd512_coco.py`; detector assembled by `single_stage.py` +
    `ssd_head.py`). Reuses SSDLite's assignment / hard-negative mining /
    predict machinery over the SSDVGG 6- or 7-level tower."""

    input_size: int = 300
    size_preset: str = 'coco'       # 'coco' | 'voc' min/max-size expansion

    def setup(self):
        from ..backbones.zoo_backbones import SSDVGG
        anchors = _VGG_ANCHOR_PRESETS[(self.input_size, self.size_preset)]
        n_extra_levels = len(anchors.strides) - 2
        self.vgg_anchors = anchors
        self.backbone = SSDVGG(num_extras=n_extra_levels,
                               dtype=self.dtype)
        self.cls_heads = [
            nn.Conv(a * (self.num_classes + 1), (3, 3),
                    padding=[(1, 1)] * 2, dtype=self.dtype,
                    name=f'cls_head{i}')
            for i, a in enumerate(anchors.num_anchors_per_level())
        ]
        self.reg_heads = [
            nn.Conv(a * 4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name=f'reg_head{i}')
            for i, a in enumerate(anchors.num_anchors_per_level())
        ]

    def _forward_flat(self, image):
        feats = self.backbone(image.astype(self.dtype))
        b = image.shape[0]
        c = self.num_classes + 1
        cls_flat, reg_flat, sizes = [], [], []
        for i, f in enumerate(feats):
            sizes.append((f.shape[-3], f.shape[-2]))
            cls_flat.append(self.cls_heads[i](f).reshape(b, -1, c))
            reg_flat.append(self.reg_heads[i](f).reshape(b, -1, 4))
        anchors = jnp.asarray(self.vgg_anchors.flat_anchors(sizes))
        return (jnp.concatenate(cls_flat, 1), jnp.concatenate(reg_flat, 1),
                anchors)
