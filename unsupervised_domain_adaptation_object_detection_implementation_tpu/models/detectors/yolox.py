"""YOLOX (reference `mmdet/models/detectors/yolox.py`,
`mmdet/models/dense_heads/yolox_head.py`, SimOTA assignment).

CSPDarknet-P5 → YOLOX-PAFPN → decoupled anchor-free head (per-level cls /
reg / obj branches), SimOTA dynamic-k label assignment, losses = BCE(cls,
IoU-aware one-hot) + 5·(1−IoU²) + BCE(obj), optional L1 on raw offsets
(reference flips `use_l1` on for the final epochs via a hook; here it is a
static flag — rebuild the train step to switch).

TPU notes: priors of all levels flatten to one static (N, 4) tensor;
SimOTA is the dense static-shape version (`core/bbox/sim_ota.py`); per-image
assignment vmaps over the batch.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.bbox.sim_ota import sim_ota_assign
from ...core.bbox.transforms import clip_boxes
from ...core.post.nms import NEG_INF, batched_nms
from ...utils.registry import DETECTORS, HEADS
from ..backbones.csp_darknet import ConvBN, CSPDarknet
from ..dense_heads.anchor_head import DensePredictConfig, flatten_level_preds
from ..losses.iou_loss import _aligned_iou_terms
from ..necks.yolox_pafpn import YOLOXPAFPN


@HEADS.register_module()
class YOLOXHead(nn.Module):
    """Decoupled per-level head (`yolox_head.py:131`): two stacked 3×3
    ConvBN branches (cls / reg), 1×1 predictors for cls, reg(4), obj(1).
    Conv weights are per-level (not shared), as in the reference."""
    num_classes: int = 80
    feat_channels: int = 128
    stacked_convs: int = 2
    num_levels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = True):
        cls_s, reg_s, obj_s = [], [], []
        for lvl, f in enumerate(feats):
            c, r = f, f
            for i in range(self.stacked_convs):
                c = ConvBN(self.feat_channels, 3, dtype=self.dtype,
                           name=f'cls_conv{lvl}_{i}')(c, train)
                r = ConvBN(self.feat_channels, 3, dtype=self.dtype,
                           name=f'reg_conv{lvl}_{i}')(r, train)
            cls_s.append(nn.Conv(
                self.num_classes, (1, 1), dtype=self.dtype,
                bias_init=nn.initializers.constant(-4.595),
                name=f'cls_pred{lvl}')(c))
            reg_s.append(nn.Conv(4, (1, 1), dtype=self.dtype,
                                 name=f'reg_pred{lvl}')(r))
            obj_s.append(nn.Conv(
                1, (1, 1), dtype=self.dtype,
                bias_init=nn.initializers.constant(-4.595),
                name=f'obj_pred{lvl}')(r))
        return tuple(cls_s), tuple(reg_s), tuple(obj_s)


def yolox_priors(featmap_sizes, strides) -> np.ndarray:
    """Flat (N, 4) [cx, cy, stride, stride] priors with offset 0 (the
    reference's `MlvlPointGenerator(strides, offset=0)`)."""
    out = []
    for (h, w), s in zip(featmap_sizes, strides):
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
        p = np.stack([xs.ravel() * s, ys.ravel() * s,
                      np.full(h * w, s), np.full(h * w, s)], -1)
        out.append(p.astype(np.float32))
    return np.concatenate(out)


def yolox_decode(priors: jnp.ndarray, reg: jnp.ndarray) -> jnp.ndarray:
    """(dx, dy, logw, logh) → xyxy (`yolox_head.py:298` _bbox_decode)."""
    xy = reg[..., :2] * priors[..., 2:] + priors[..., :2]
    wh = jnp.exp(reg[..., 2:]) * priors[..., 2:]
    return jnp.concatenate([xy - wh * 0.5, xy + wh * 0.5], -1)


def _bce(logits, targets):
    """Elementwise sigmoid BCE."""
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def yolox_loss(cls_logits, reg_preds, obj_logits, priors, gt_bboxes,
               gt_labels, gt_valid, num_classes, use_l1: bool = False
               ) -> Dict[str, jnp.ndarray]:
    """Losses over the flat prior set (`yolox_head.py:325-421`)."""
    decoded = yolox_decode(priors[None], reg_preds.astype(jnp.float32))

    def assign_one(cls_i, obj_i, dec_i, gt, gtl, gtv):
        scores = jax.nn.sigmoid(cls_i.astype(jnp.float32)) * \
            jax.nn.sigmoid(obj_i.astype(jnp.float32))[:, None]
        # assignment uses 0.5-offset centers (`yolox_head.py:456-459`)
        off = jnp.concatenate(
            [priors[:, :2] + priors[:, 2:] * 0.5, priors[:, 2:]], -1)
        return sim_ota_assign(jax.lax.stop_gradient(scores), off,
                              jax.lax.stop_gradient(dec_i), gt, gtl, gtv)

    res = jax.vmap(assign_one)(cls_logits, obj_logits[..., 0], decoded,
                               gt_bboxes, gt_labels, gt_valid)
    fg = res.fg_mask.astype(jnp.float32)                       # (B, N)
    num_pos = jnp.maximum(fg.sum(), 1.0)

    # cls: BCE vs IoU-weighted one-hot at positives
    onehot = jax.nn.one_hot(
        jnp.take_along_axis(gt_labels, res.matched_gt, axis=1), num_classes)
    cls_tgt = onehot * res.matched_iou[..., None]
    loss_cls = (_bce(cls_logits.astype(jnp.float32), cls_tgt)
                * fg[..., None]).sum() / num_pos

    # obj: BCE vs fg mask over every prior
    loss_obj = _bce(obj_logits[..., 0].astype(jnp.float32), fg).sum() / \
        num_pos

    # bbox: 1 − IoU² at positives (IoULoss mode='square', weight 5)
    tgt_boxes = jnp.take_along_axis(
        gt_bboxes, res.matched_gt[..., None], axis=1)
    iou, *_ = _aligned_iou_terms(decoded, tgt_boxes, eps=1e-16)
    loss_bbox = 5.0 * ((1.0 - iou ** 2) * fg).sum() / num_pos

    out = dict(loss_cls=loss_cls, loss_obj=loss_obj, loss_bbox=loss_bbox)
    if use_l1:
        cxcy = (tgt_boxes[..., :2] + tgt_boxes[..., 2:]) * 0.5
        wh = tgt_boxes[..., 2:] - tgt_boxes[..., :2]
        l1_tgt = jnp.concatenate(
            [(cxcy - priors[None, :, :2]) / priors[None, :, 2:],
             jnp.log(wh / priors[None, :, 2:] + 1e-8)], -1)
        out['loss_l1'] = (jnp.abs(reg_preds.astype(jnp.float32) - l1_tgt)
                          * fg[..., None]).sum() / num_pos
    return out


@DETECTORS.register_module()
class YOLOX(nn.Module):
    """YOLOX-s by default (deepen 0.33 / widen 0.5)."""
    num_classes: int = 80
    deepen_factor: float = 0.33
    widen_factor: float = 0.5
    strides: Tuple[int, ...] = (8, 16, 32)
    use_l1: bool = False
    test_cfg: DensePredictConfig = DensePredictConfig(
        score_thr=0.01, nms_iou_threshold=0.65)
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = CSPDarknet(deepen_factor=self.deepen_factor,
                                   widen_factor=self.widen_factor,
                                   dtype=self.dtype)
        width = int(256 * self.widen_factor)
        self.neck = YOLOXPAFPN(
            in_channels=self.backbone.stage_channels(),
            out_channels=width, num_csp_blocks=max(
                round(3 * self.deepen_factor), 1), dtype=self.dtype)
        self.bbox_head = YOLOXHead(num_classes=self.num_classes,
                                   feat_channels=width,
                                   num_levels=len(self.strides),
                                   dtype=self.dtype)

    def _forward_flat(self, image, train: bool):
        feats = self.neck(self.backbone(image.astype(self.dtype), train),
                          train)
        cls_lv, reg_lv, obj_lv = self.bbox_head(feats, train)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        priors = jnp.asarray(yolox_priors(sizes, self.strides))
        cls = flatten_level_preds(cls_lv, self.num_classes)
        reg = flatten_level_preds(reg_lv, 4)
        obj = flatten_level_preds(obj_lv, 1)
        return cls, reg, obj, priors

    def loss(self, batch):
        cls, reg, obj, priors = self._forward_flat(batch['image'], True)
        return yolox_loss(cls, reg, obj, priors, batch['gt_bboxes'],
                          batch['gt_labels'], batch['gt_valid'],
                          self.num_classes, self.use_l1)

    def predict(self, batch):
        cls, reg, obj, priors = self._forward_flat(batch['image'], False)
        cfg = self.test_cfg
        boxes_all = yolox_decode(priors[None], reg.astype(jnp.float32))

        def per_image(cls_i, obj_i, boxes_i, shape_i):
            probs = jax.nn.sigmoid(cls_i.astype(jnp.float32)) * \
                jax.nn.sigmoid(obj_i.astype(jnp.float32))[:, None]
            flat = probs.reshape(-1)
            flat = jnp.where(flat > cfg.score_thr, flat, NEG_INF)
            k = min(cfg.nms_pre, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            p_idx = idx // self.num_classes
            labels = (idx % self.num_classes).astype(jnp.int32)
            boxes = clip_boxes(boxes_i[p_idx], shape_i.astype(jnp.float32))
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

        dets, labels, valid = jax.vmap(per_image)(
            cls, obj[..., 0], boxes_all, batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
