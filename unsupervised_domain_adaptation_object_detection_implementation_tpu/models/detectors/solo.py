"""SOLO (reference `mmdet/models/detectors/solo.py` +
`mmdet/models/dense_heads/solo_head.py`).

Segment Objects by LOcations: each S×S grid cell predicts a class score
and a full-image instance mask for any object whose center falls in its
cell. `decoupled=True` selects Decoupled SOLO (reference
`decoupled_solo_head.py`): separable x/y mask branches recombined into
the coupled S² layout. Targets use the center-region rule (σ=0.2) and
scale ranges; mask loss is Dice over positive cells.

TPU shape: the (S², H, W) mask tower is one conv stack; target building is
a dense (G, S²) matrix; Dice reduces over static mask pixels with cell
validity weights.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.registry import DETECTORS, HEADS
from ..backbones.build import build_trunk
from ..losses import sigmoid_focal_loss
from ..losses.extra_losses import dice_loss
from ..necks.fpn import FPN

SOLO_SCALE_RANGES = ((1, 96), (48, 192), (96, 384), (192, 768), (384, 2048))


@HEADS.register_module()
class SOLOHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    grid_sizes: Sequence[int] = (40, 36, 24, 16, 12)
    mask_stride: int = 4
    # Decoupled SOLO (reference `decoupled_solo_head.py`): the mask
    # branch predicts S x-masks + S y-masks per level; cell (y, x)'s mask
    # prob is sigmoid(mask_y[y])·sigmoid(mask_x[x]). Recombined here into
    # the coupled head's S² logit layout (exact logit of the product), so
    # the loss/predict paths are shared.
    decoupled: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, mask_hw):
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             use_bias=False, dtype=self.dtype,
                             name=f'cls_conv{i}')
                     for i in range(self.stacked_convs)]
        mask_convs = [nn.Conv(self.feat_channels, (3, 3),
                              padding=[(1, 1)] * 2, use_bias=False,
                              dtype=self.dtype, name=f'mask_conv{i}')
                      for i in range(self.stacked_convs)]
        # reference SOLOHead stacks conv+GN(32)+ReLU (mmdet solo_head.py
        # norm_cfg=GN) — the norms matter for mask-branch optimization
        cls_gn = [nn.GroupNorm(32, dtype=self.dtype, name=f'cls_gn{i}')
                  for i in range(self.stacked_convs)]
        mask_gn = [nn.GroupNorm(32, dtype=self.dtype, name=f'mask_gn{i}')
                   for i in range(self.stacked_convs)]
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                          bias_init=nn.initializers.constant(-4.595),
                          dtype=self.dtype, name='solo_cls')

        cls_lv, mask_lv = [], []
        for li, f in enumerate(feats):
            s = self.grid_sizes[li]
            b, h, w, c = f.shape
            # cls branch on the S×S grid
            cg = jax.image.resize(f, (b, s, s, c), method='bilinear')
            for conv, gn in zip(cls_convs, cls_gn):
                cg = nn.relu(gn(conv(cg)))
            cls_lv.append(cls_out(cg))                     # (B, S, S, C)

            # mask branch with coord-conv at shared mask resolution
            ys = jnp.linspace(-1, 1, h)
            xs = jnp.linspace(-1, 1, w)
            yy, xx = jnp.meshgrid(ys, xs, indexing='ij')
            coords = jnp.broadcast_to(
                jnp.stack([xx, yy], -1)[None], (b, h, w, 2))
            mg = jnp.concatenate([f, coords.astype(f.dtype)], -1)
            for conv, gn in zip(mask_convs, mask_gn):
                mg = nn.relu(gn(conv(mg)))
            mg = jax.image.resize(
                mg, (b, mask_hw[0], mask_hw[1], self.feat_channels),
                method='bilinear')
            if self.decoupled:
                mx = nn.Conv(s, (1, 1), dtype=self.dtype,
                             name=f'solo_mask_x_{li}')(mg)
                my = nn.Conv(s, (1, 1), dtype=self.dtype,
                             name=f'solo_mask_y_{li}')(mg)
                p = (jax.nn.sigmoid(my.astype(jnp.float32))[..., :, None]
                     * jax.nn.sigmoid(mx.astype(jnp.float32))[..., None, :])
                p = jnp.clip(p, 1e-6, 1 - 1e-6)
                logit = jnp.log(p / (1 - p))               # (B,Hm,Wm,S,S)
                mask_lv.append(logit.reshape(*logit.shape[:-2], s * s))
            else:
                mask_out = nn.Conv(s * s, (1, 1), dtype=self.dtype,
                                   name=f'solo_mask_{li}')
                mask_lv.append(mask_out(mg))               # (B, Hm, Wm, S²)
        return cls_lv, mask_lv


@DETECTORS.register_module()
class SOLO(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    grid_sizes: Sequence[int] = (40, 36, 24, 16, 12)
    # DecoupledSOLO rows (reference configs/solo/decoupled_solo_*): x/y
    # separable mask branches recombined in SOLOHead
    decoupled: bool = False
    sigma: float = 0.2
    score_thr: float = 0.1
    mask_thr: float = 0.5
    max_per_img: int = 100
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = FPN(in_channels=self.backbone.stage_channels(),
                        out_channels=256, num_outs=5, dtype=self.dtype)
        self.head = SOLOHead(num_classes=self.num_classes,
                             grid_sizes=self.grid_sizes,
                             decoupled=self.decoupled, dtype=self.dtype)

    def _forward(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        mask_hw = (image.shape[1] // 4, image.shape[2] // 4)
        return self.head(feats, mask_hw), mask_hw

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        (cls_lv, mask_lv), mask_hw = self._forward(batch['image'])
        gt = batch['gt_bboxes']
        gtl = batch['gt_labels']
        gtv = batch['gt_valid']
        # gt masks rasterized at the shared mask resolution: (B, G, Hm, Wm)
        gm = batch['gt_masks_full'].astype(jnp.float32) \
            if 'gt_masks_full' in batch else None

        total_cls, total_dice, total_pos = 0.0, 0.0, 0.0
        for li, (cls_map, mask_map) in enumerate(zip(cls_lv, mask_lv)):
            s = self.grid_sizes[li]
            lo, hi = SOLO_SCALE_RANGES[li]

            def per_image(cls_i, mask_i, gt_i, gtl_i, gtv_i, gm_i):
                # gt center cells
                cx = (gt_i[:, 0] + gt_i[:, 2]) / 2
                cy = (gt_i[:, 1] + gt_i[:, 3]) / 2
                w = gt_i[:, 2] - gt_i[:, 0]
                h = gt_i[:, 3] - gt_i[:, 1]
                area = jnp.sqrt(jnp.maximum(w * h, 0.0))
                in_scale = (area >= lo) & (area <= hi) & gtv_i
                img_h = mask_hw[0] * 4.0
                img_w = mask_hw[1] * 4.0
                # center region ±σ/2
                x_lo = jnp.clip(((cx - w * self.sigma / 2) / img_w * s),
                                0, s - 1).astype(jnp.int32)
                x_hi = jnp.clip(((cx + w * self.sigma / 2) / img_w * s),
                                0, s - 1).astype(jnp.int32)
                y_lo = jnp.clip(((cy - h * self.sigma / 2) / img_h * s),
                                0, s - 1).astype(jnp.int32)
                y_hi = jnp.clip(((cy + h * self.sigma / 2) / img_h * s),
                                0, s - 1).astype(jnp.int32)
                cells_y = jnp.arange(s)[:, None]
                cells_x = jnp.arange(s)[None, :]
                # (G, S, S) positive cell mask
                claims = ((cells_y[None] >= y_lo[:, None, None])
                          & (cells_y[None] <= y_hi[:, None, None])
                          & (cells_x[None] >= x_lo[:, None, None])
                          & (cells_x[None] <= x_hi[:, None, None])
                          & in_scale[:, None, None])
                area_k = jnp.where(in_scale, area, jnp.inf)
                key = jnp.where(claims, area_k[:, None, None], jnp.inf)
                best = jnp.argmin(key, axis=0)              # (S, S)
                pos = jnp.any(claims, axis=0)
                labels = jnp.where(pos, gtl_i[best], self.num_classes)
                cls_l = sigmoid_focal_loss(
                    cls_i.reshape(s * s, -1), labels.reshape(-1),
                    reduction='sum')

                if gm_i is not None:
                    m_pred = mask_map_t = mask_i.transpose(2, 0, 1)
                    tgt = gm_i[best.reshape(-1)]            # (S², Hm, Wm)
                    d = dice_loss(m_pred.reshape(s * s, -1),
                                  tgt.reshape(s * s, -1))
                    dice_l = jnp.sum(d * pos.reshape(-1))
                else:
                    dice_l = 0.0 * cls_l
                return cls_l, dice_l, jnp.sum(pos.astype(jnp.float32))

            gm_b = gm if gm is not None else \
                jnp.zeros((gt.shape[0], gt.shape[1], *mask_hw))
            c_l, d_l, n_p = jax.vmap(per_image)(
                cls_map, mask_map, gt, gtl, gtv, gm_b)
            total_cls = total_cls + jnp.sum(c_l)
            total_dice = total_dice + jnp.sum(d_l)
            total_pos = total_pos + jnp.sum(n_p)

        denom = jnp.maximum(total_pos, 1.0)
        return dict(loss_cls=total_cls / denom,
                    loss_mask=3.0 * total_dice / denom)

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        (cls_lv, mask_lv), mask_hw = self._forward(batch['image'])
        b = batch['image'].shape[0]
        C = self.num_classes

        scores_all, masks_all = [], []
        for li, (cls_map, mask_map) in enumerate(zip(cls_lv, mask_lv)):
            s = self.grid_sizes[li]
            scores_all.append(jax.nn.sigmoid(
                cls_map.astype(jnp.float32)).reshape(b, s * s, C))
            masks_all.append(jax.nn.sigmoid(
                mask_map.astype(jnp.float32)).transpose(0, 3, 1, 2))
        scores = jnp.concatenate(scores_all, axis=1)        # (B, N, C)
        masks = jnp.concatenate(masks_all, axis=1)          # (B, N, Hm, Wm)

        k = self.max_per_img

        def per_image(sc, mk):
            flat = sc.reshape(-1)
            top, idx = jax.lax.top_k(flat, k)                # sorted desc
            cell = idx // C
            labels = (idx % C).astype(jnp.int32)
            sel_m = mk[cell]                                 # (k, Hm, Wm)
            bin_m = sel_m > self.mask_thr
            # maskness rescoring (SOLO get_seg)
            maskness = jnp.sum(sel_m * bin_m, axis=(1, 2)) / \
                jnp.maximum(jnp.sum(bin_m, axis=(1, 2)), 1.0)
            final = top * maskness
            # matrix NMS over binary masks (SOLO's matrix_nms, gaussian
            # decay): overlapping lower-scored instances are decayed by
            # min_i exp(-(iou_ij² - cmax_i²)/σ) over higher-scored i
            flat_m = bin_m.reshape(k, -1).astype(jnp.float32)
            inter = flat_m @ flat_m.T
            areas = jnp.sum(flat_m, axis=1)
            union = areas[:, None] + areas[None, :] - inter
            iou = inter / jnp.maximum(union, 1.0)
            same = labels[:, None] == labels[None, :]
            upper = jnp.triu(jnp.ones((k, k), bool), 1)      # i<j, i stronger
            dec_iou = jnp.where(upper & same, iou, 0.0)
            cmax = jnp.max(dec_iou, axis=0)                  # per j
            sigma = 2.0
            decay = jnp.exp(-(dec_iou ** 2) / sigma) / \
                jnp.exp(-(cmax[None, :] ** 2) / sigma)
            decay = jnp.min(jnp.where(upper & same, decay, 1.0), axis=0)
            final = final * decay
            valid = final > self.score_thr
            return bin_m, final, labels, valid

        bin_m, sc, labels, valid = jax.vmap(per_image)(scores, masks)
        # boxes from mask extents at stride 4, robust to stray pixels: the
        # extent is where the cumulative row/col mass passes 2% of the
        # total (exact tight bbox for clean masks)
        stride = 4.0

        def extents(mass):                                   # (B, k, L)
            cum = jnp.cumsum(mass, axis=-1)
            tot = cum[..., -1:]
            lo = jnp.argmax(cum >= 0.02 * tot, axis=-1)
            hi = jnp.argmax(cum >= (1.0 - 0.02) * tot, axis=-1) + 1
            return lo, hi

        mass_y = jnp.sum(bin_m, axis=3).astype(jnp.float32)  # (B, k, Hm)
        mass_x = jnp.sum(bin_m, axis=2).astype(jnp.float32)  # (B, k, Wm)
        y1, y2 = extents(mass_y)
        x1, x2 = extents(mass_x)
        nonempty = jnp.any(bin_m, axis=(2, 3))
        boxes = jnp.stack([x1, y1, x2, y2], -1).astype(jnp.float32) * stride
        boxes = boxes * nonempty[..., None]
        valid = valid & nonempty
        dets = jnp.concatenate(
            [boxes, jnp.where(valid, sc, 0.0)[..., None]], -1)
        return dict(masks=bin_m, scores=sc, labels=labels, valid=valid,
                    dets=dets)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
