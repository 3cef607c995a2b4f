"""FCOS — anchor-free single-stage family (reference
`mmdet/models/detectors/fcos.py` + `mmdet/models/dense_heads/fcos_head.py`).

Per-location classification + (l, t, r, b) distance regression + centerness,
with scale-range assignment of gt boxes to pyramid levels. All static-shape:
the per-level point sets flatten into one (N, 2) tensor with per-point
regression ranges; "inside gt box & inside scale range & smallest area"
target selection is a dense (N, G) min-reduction.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.bbox.coders import bbox2distance, distance2bbox
from ...core.bbox.transforms import clip_boxes
from ...core.post.nms import NEG_INF, batched_nms
from ...utils.registry import DETECTORS, HEADS
from ..backbones.build import build_trunk
from ..dense_heads.anchor_head import DensePredictConfig, flatten_level_preds
from ..losses import giou_loss, sigmoid_focal_loss
from ..losses.cross_entropy_loss import binary_cross_entropy
from ..necks.fpn import FPN

INF = 1e8
REGRESS_RANGES = ((-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))


@HEADS.register_module()
class FCOSHead(nn.Module):
    """`centerness_on_reg`: the FCOS-improved placement (centerness from
    the reg tower, reference `fcos_head.py` arg; this repo's measured
    default). `dcn_on_last_conv`: swap the last tower conv for DCNv1
    (reference `fcos_center-normbbox-centeronreg-giou_..._dcn_1x` row)."""

    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    centerness_on_reg: bool = True
    dcn_on_last_conv: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        n_plain = self.stacked_convs - (1 if self.dcn_on_last_conv else 0)
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name=f'cls_conv{i}')
                     for i in range(n_plain)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name=f'reg_conv{i}')
                     for i in range(n_plain)]
        if self.dcn_on_last_conv:
            from ..layers.plugins import DeformConv
            i = self.stacked_convs - 1
            cls_dcn = DeformConv(self.feat_channels, dtype=self.dtype,
                                 name=f'cls_conv{i}_dcn')
            cls_off = nn.Conv(18, (3, 3), padding=[(1, 1)] * 2,
                              kernel_init=nn.initializers.zeros,
                              dtype=self.dtype, name=f'cls_conv{i}_offset')
            reg_dcn = DeformConv(self.feat_channels, dtype=self.dtype,
                                 name=f'reg_conv{i}_dcn')
            reg_off = nn.Conv(18, (3, 3), padding=[(1, 1)] * 2,
                              kernel_init=nn.initializers.zeros,
                              dtype=self.dtype, name=f'reg_conv{i}_offset')
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                          bias_init=nn.initializers.constant(-4.595),
                          dtype=self.dtype, name='fcos_cls')
        reg_out = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name='fcos_reg')
        ctr_out = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name='fcos_centerness')
        cls_s, reg_s, ctr_s = [], [], []
        for lvl, f in enumerate(feats):
            c, r = f, f
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            if self.dcn_on_last_conv:
                c = nn.relu(cls_dcn(c, cls_off(c)))
                r = nn.relu(reg_dcn(r, reg_off(r)))
            scale = self.param(f'scale_{lvl}', nn.initializers.ones, ())
            cls_s.append(cls_out(c))
            reg_s.append(jnp.exp(reg_out(r).astype(jnp.float32) *
                                 scale.astype(jnp.float32)))
            ctr_s.append(ctr_out(r if self.centerness_on_reg else c))
        return tuple(cls_s), tuple(reg_s), tuple(ctr_s)


def fcos_points(featmap_sizes, strides) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flat (N, 2) centers, (N,) strides, (N, 2) regress ranges."""
    pts, strs, ranges = [], [], []
    for (h, w), s, rng in zip(featmap_sizes, strides, REGRESS_RANGES):
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
        p = np.stack([xs.ravel() * s + s // 2, ys.ravel() * s + s // 2], -1)
        pts.append(p.astype(np.float32))
        strs.append(np.full((h * w,), s, np.float32))
        ranges.append(np.tile(np.asarray(rng, np.float32), (h * w, 1)))
    return (np.concatenate(pts), np.concatenate(strs), np.concatenate(ranges))


def fcos_loss(cls_logits, reg_dists, ctr_logits, points, strides, ranges,
              gt_bboxes, gt_labels, gt_valid, num_classes,
              center_sampling: bool = False,
              center_sample_radius: float = 1.5) -> Dict[str, jnp.ndarray]:
    """FCOS target assignment + losses (reference `fcos_head.py` get_targets:
    center-inside-box, scale-range filter, min-area tie-break;
    `center_sampling` restricts positives to a ±radius·stride box around the
    gt center, clipped to the gt — the `fcos_center*` config rows)."""

    def per_image(cls_i, reg_i, ctr_i, gt, gtl, gtv):
        # distances from every point to every gt: (N, G, 4)
        d = jnp.stack([
            points[:, None, 0] - gt[None, :, 0],
            points[:, None, 1] - gt[None, :, 1],
            gt[None, :, 2] - points[:, None, 0],
            gt[None, :, 3] - points[:, None, 1],
        ], axis=-1)
        inside = d.min(axis=-1) > 0
        if center_sampling:
            cx = (gt[None, :, 0] + gt[None, :, 2]) * 0.5
            cy = (gt[None, :, 1] + gt[None, :, 3]) * 0.5
            rad = strides[:, None] * center_sample_radius
            x_lo = jnp.maximum(cx - rad, gt[None, :, 0])
            x_hi = jnp.minimum(cx + rad, gt[None, :, 2])
            y_lo = jnp.maximum(cy - rad, gt[None, :, 1])
            y_hi = jnp.minimum(cy + rad, gt[None, :, 3])
            in_center = ((points[:, None, 0] > x_lo) &
                         (points[:, None, 0] < x_hi) &
                         (points[:, None, 1] > y_lo) &
                         (points[:, None, 1] < y_hi))
            inside = inside & in_center
        maxd = d.max(axis=-1)
        in_range = (maxd >= ranges[:, None, 0]) & (maxd <= ranges[:, None, 1])
        areas = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
        cand = inside & in_range & gtv[None, :]
        area_mat = jnp.where(cand, areas[None, :], INF)
        min_area = area_mat.min(axis=1)
        matched = jnp.argmin(area_mat, axis=1)
        pos = min_area < INF
        labels = jnp.where(pos, gtl[matched], num_classes)

        cls_l = sigmoid_focal_loss(cls_i, labels, reduction='sum')
        target_d = bbox2distance(points, gt[matched])
        # centerness target; negatives have points outside their matched box
        # (negative distances) — clamp the ratio product before the sqrt so
        # masked-out rows stay finite (NaN·0 would poison the sum)
        lr = target_d[:, [0, 2]]
        tb = target_d[:, [1, 3]]
        ratio = (lr.min(-1) / jnp.maximum(lr.max(-1), 1e-6)) * \
            (tb.min(-1) / jnp.maximum(tb.max(-1), 1e-6))
        ctr_target = jnp.sqrt(jnp.clip(ratio, 0.0, 1.0))
        pos_f = pos.astype(jnp.float32)
        boxes_pred = distance2bbox(points, reg_i * strides[:, None])
        boxes_tgt = gt[matched]
        reg_l = giou_loss(boxes_pred, boxes_tgt, weight=pos_f * ctr_target,
                          reduction='sum')
        ctr_l = binary_cross_entropy(ctr_i[:, 0], ctr_target,
                                     weight=pos_f, reduction='sum')
        return cls_l, reg_l, ctr_l, jnp.sum(pos_f), jnp.sum(pos_f * ctr_target)

    cls_l, reg_l, ctr_l, n_pos, ctr_sum = jax.vmap(per_image)(
        cls_logits, reg_dists, ctr_logits, gt_bboxes, gt_labels, gt_valid)
    denom = jnp.maximum(jnp.sum(n_pos), 1.0)
    return dict(loss_cls=jnp.sum(cls_l) / denom,
                loss_bbox=jnp.sum(reg_l) / jnp.maximum(jnp.sum(ctr_sum), 1e-6),
                loss_centerness=jnp.sum(ctr_l) / denom)


@DETECTORS.register_module()
class FCOS(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    # trick knobs (reference fcos_center* rows): see FCOSHead / fcos_loss
    center_sampling: bool = False
    center_sample_radius: float = 1.5
    centerness_on_reg: bool = True
    # this head already regresses stride-normalized distances (exp·scale
    # then ×stride) — the reference's norm_on_bbox=True parametrization;
    # the knob is accepted for config parity and documented here.
    norm_on_bbox: bool = True
    dcn_on_last_conv: bool = False
    test_cfg: DensePredictConfig = DensePredictConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = FPN(in_channels=self.backbone.stage_channels(),
                        out_channels=256, num_outs=5, start_level=1,
                        add_extra_convs='on_output',
                        relu_before_extra_convs=True, dtype=self.dtype)
        self.bbox_head = FCOSHead(num_classes=self.num_classes,
                                  centerness_on_reg=self.centerness_on_reg,
                                  dcn_on_last_conv=self.dcn_on_last_conv,
                                  dtype=self.dtype)

    def _forward_flat(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        cls_lv, reg_lv, ctr_lv = self.bbox_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        pts, strs, rngs = fcos_points(sizes, self.strides)
        cls = flatten_level_preds(cls_lv, self.num_classes)
        reg = flatten_level_preds(reg_lv, 4)
        ctr = flatten_level_preds(ctr_lv, 1)
        return (cls, reg, ctr, jnp.asarray(pts), jnp.asarray(strs),
                jnp.asarray(rngs))

    def loss(self, batch):
        cls, reg, ctr, pts, strs, rngs = self._forward_flat(batch['image'])
        return fcos_loss(cls, reg, ctr, pts, strs, rngs, batch['gt_bboxes'],
                         batch['gt_labels'], batch['gt_valid'],
                         self.num_classes,
                         center_sampling=self.center_sampling,
                         center_sample_radius=self.center_sample_radius)

    def predict(self, batch):
        cls, reg, ctr, pts, strs, _ = self._forward_flat(batch['image'])
        cfg = self.test_cfg

        def per_image(cls_i, reg_i, ctr_i, shape_i):
            probs = jax.nn.sigmoid(cls_i.astype(jnp.float32)) * \
                jax.nn.sigmoid(ctr_i.astype(jnp.float32))
            flat = probs.reshape(-1)
            flat = jnp.where(flat > cfg.score_thr, flat, NEG_INF)
            k = min(cfg.nms_pre, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            p_idx = idx // self.num_classes
            labels = (idx % self.num_classes).astype(jnp.int32)
            boxes = distance2bbox(pts[p_idx],
                                  reg_i[p_idx] * strs[p_idx, None])
            boxes = clip_boxes(boxes, shape_i.astype(boxes.dtype))
            keep, _ = batched_nms(boxes, top, labels, cfg.nms_iou_threshold,
                                  cfg.nms_tile)
            kept = jnp.where(keep, top, NEG_INF)
            m = min(cfg.max_per_img, k)
            sc, sel = jax.lax.top_k(kept, m)
            valid = sc > NEG_INF / 2
            dets = jnp.concatenate(
                [boxes[sel] * valid[:, None],
                 jnp.where(valid, sc, 0.0)[:, None]], axis=-1)
            return dets, jnp.where(valid, labels[sel], 0), valid

        dets, labels, valid = jax.vmap(per_image)(
            cls, reg, ctr, batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
