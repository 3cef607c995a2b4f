"""YOLOv3 (reference `mmdet/models/detectors/yolo.py` +
`mmdet/models/necks/yolo_neck.py` + `mmdet/models/dense_heads/yolo_head.py`).

Static-shape target assignment: each gt's responsible anchor = best
shape-IoU among the 9 anchor shapes, placed at the gt's center cell of that
anchor's level. The ragged "scatter into responsible cells" becomes a
fixed-size `.at[idx].set` with a trash slot absorbing padded gts.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.post.nms import NEG_INF, batched_nms
from ...core.bbox.transforms import clip_boxes
from ...utils.registry import DETECTORS, HEADS
from ..backbones.misc_backbones import Darknet53
from ..dense_heads.anchor_head import DensePredictConfig
from ..layers.norm import FrozenBatchNorm
from ..losses.cross_entropy_loss import binary_cross_entropy

# anchor (w, h) shapes per level, finest (stride 8) first — mmdet ordering
ANCHOR_SHAPES = (
    ((10, 13), (16, 30), (33, 23)),        # stride 8
    ((30, 61), (62, 45), (59, 119)),       # stride 16
    ((116, 90), (156, 198), (373, 326)),   # stride 32
)
STRIDES = (8, 16, 32)


def _conv_block(x, ch, name, dtype):
    x = nn.Conv(ch, (1, 1), use_bias=False, dtype=dtype, name=f'{name}_c1')(x)
    x = nn.leaky_relu(FrozenBatchNorm(ch, name=f'{name}_b1')(x), 0.1)
    x = nn.Conv(ch * 2, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                dtype=dtype, name=f'{name}_c2')(x)
    x = nn.leaky_relu(FrozenBatchNorm(ch * 2, name=f'{name}_b2')(x), 0.1)
    x = nn.Conv(ch, (1, 1), use_bias=False, dtype=dtype, name=f'{name}_c3')(x)
    x = nn.leaky_relu(FrozenBatchNorm(ch, name=f'{name}_b3')(x), 0.1)
    return x


@HEADS.register_module()
class YOLOV3Neck(nn.Module):
    """Top-down detection blocks with upsample+concat (reference yolo_neck).

    `channels` are the (d3, d4, d5) detection-block widths — (128, 256, 512)
    for Darknet-53, (96, 96, 96) for the MobileNetV2 rows (reference
    configs/yolo/yolov3_mobilenetv2_*: neck out_channels=[96, 96, 96])."""

    channels: Tuple[int, int, int] = (128, 256, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        c3, c4, c5 = feats
        ch3, ch4, ch5 = self.channels
        d5 = _conv_block(c5, ch5, 'det5', self.dtype)
        u4 = nn.Conv(ch4, (1, 1), use_bias=False, dtype=self.dtype,
                     name='lat4')(d5)
        u4 = nn.leaky_relu(FrozenBatchNorm(ch4, name='lat4_bn')(u4), 0.1)
        u4 = jax.image.resize(u4, (*u4.shape[:-3], c4.shape[-3],
                                   c4.shape[-2], ch4), 'nearest')
        d4 = _conv_block(jnp.concatenate([u4, c4], -1), ch4, 'det4',
                         self.dtype)
        u3 = nn.Conv(ch3, (1, 1), use_bias=False, dtype=self.dtype,
                     name='lat3')(d4)
        u3 = nn.leaky_relu(FrozenBatchNorm(ch3, name='lat3_bn')(u3), 0.1)
        u3 = jax.image.resize(u3, (*u3.shape[:-3], c3.shape[-3],
                                   c3.shape[-2], ch3), 'nearest')
        d3 = _conv_block(jnp.concatenate([u3, c3], -1), ch3, 'det3',
                         self.dtype)
        return d3, d4, d5


@DETECTORS.register_module()
class YOLOV3(nn.Module):
    """`backbone_cfg=dict(type='MobileNetV2', ...)` swaps the trunk
    (reference configs/yolo/yolov3_mobilenetv2_*: MobileNetV2 out_indices
    (2, 4, 6) → our strides 8/16/32 maps, neck/head widths 96)."""

    num_classes: int = 80
    backbone_cfg: Any = None
    neck_channels: Tuple[int, int, int] = (128, 256, 512)
    test_cfg: DensePredictConfig = DensePredictConfig()
    dtype: Any = jnp.float32

    def setup(self):
        if self.backbone_cfg is None:
            self.backbone = Darknet53(dtype=self.dtype)
        else:
            from ..backbones.build import build_trunk
            self.backbone = build_trunk(self.backbone_cfg, dtype=self.dtype)
        self.neck = YOLOV3Neck(channels=self.neck_channels, dtype=self.dtype)
        self.head_convs = [
            nn.Conv(ch * 2, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name=f'head{i}_conv')
            for i, ch in enumerate(self.neck_channels)
        ]
        self.head_bns = [
            FrozenBatchNorm(ch * 2, name=f'head{i}_bn')
            for i, ch in enumerate(self.neck_channels)
        ]
        self.head_preds = [
            nn.Conv(3 * (5 + self.num_classes), (1, 1), dtype=self.dtype,
                    name=f'head{i}_pred')
            for i in range(3)
        ]

    def _heads(self, dets):
        outs = []
        for i, d in enumerate(dets):
            h = nn.leaky_relu(self.head_bns[i](self.head_convs[i](d)), 0.1)
            outs.append(self.head_preds[i](h))
        return outs

    def _forward(self, image):
        feats = self.backbone(image.astype(self.dtype))
        if len(feats) > 3:   # generic trunks emit strides 4/8/16/32
            feats = feats[-3:]
        dets = self.neck(feats)
        return self._heads(dets)

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        preds = self._forward(batch['image'])        # per level (B,H,W,3*(5+C))
        b = preds[0].shape[0]
        c = self.num_classes
        sizes = [(p.shape[1], p.shape[2]) for p in preds]
        # flatten all levels: (B, N, 5+C); anchor grid metadata as constants
        flat, metas = [], []
        for lvl, p in enumerate(preds):
            h, w = sizes[lvl]
            flat.append(p.reshape(b, h * w * 3, 5 + c))
            ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
            for k in range(3):
                pass
            grid = np.stack(np.broadcast_arrays(
                xs[..., None], ys[..., None],
                np.arange(3)[None, None, :]), -1).reshape(-1, 3)
            aw = np.asarray([ANCHOR_SHAPES[lvl][k][0] for k in range(3)])
            ah = np.asarray([ANCHOR_SHAPES[lvl][k][1] for k in range(3)])
            meta = np.concatenate([
                grid[:, :2] * STRIDES[lvl] + STRIDES[lvl] / 2,   # center xy
                np.tile(aw, h * w)[:, None], np.tile(ah, h * w)[:, None],
                np.full((h * w * 3, 1), STRIDES[lvl]),
            ], axis=1)
            metas.append(meta)
        pred = jnp.concatenate(flat, axis=1)                 # (B, N, 5+C)
        meta = jnp.asarray(np.concatenate(metas, axis=0))    # (N, 5)
        n = pred.shape[1]

        # per-level flat offsets for scatter targets
        lvl_offsets = np.cumsum([0] + [h * w * 3 for h, w in sizes])[:-1]
        shapes_flat = jnp.asarray(
            [s for lvl in ANCHOR_SHAPES for s in lvl], jnp.float32)  # (9, 2)

        def per_image(pred_i, gt, gtl, gtv):
            # responsible anchor per gt: best shape IoU among the 9 shapes
            gw = gt[:, 2] - gt[:, 0]
            gh = gt[:, 3] - gt[:, 1]
            inter = jnp.minimum(gw[:, None], shapes_flat[None, :, 0]) * \
                jnp.minimum(gh[:, None], shapes_flat[None, :, 1])
            union = gw[:, None] * gh[:, None] + \
                shapes_flat[None, :, 0] * shapes_flat[None, :, 1] - inter
            siou = inter / jnp.maximum(union, 1e-6)
            best = jnp.argmax(siou, axis=1)                   # (G,) in 0..8
            lvl = best // 3
            k = best % 3
            cx = (gt[:, 0] + gt[:, 2]) * 0.5
            cy = (gt[:, 1] + gt[:, 3]) * 0.5
            stride = jnp.asarray(STRIDES, jnp.float32)[lvl]
            ws = jnp.asarray([wd for _, wd in sizes], jnp.float32)
            # cell index within level
            hw_w = jnp.asarray([w for _, w in sizes], jnp.int32)[lvl]
            ci = jnp.floor(cx / stride).astype(jnp.int32)
            cj = jnp.floor(cy / stride).astype(jnp.int32)
            idx = jnp.asarray(lvl_offsets, jnp.int32)[lvl] + \
                (cj * hw_w + ci) * 3 + k
            idx = jnp.where(gtv, idx, n)                      # trash slot

            obj_t = jnp.zeros((n + 1,)).at[idx].set(1.0)[:n]
            cls_t = jnp.zeros((n + 1,), jnp.int32).at[idx].set(gtl)[:n]
            # xy offsets within cell, wh log targets
            tx = cx / stride - jnp.floor(cx / stride)
            ty = cy / stride - jnp.floor(cy / stride)
            tw = jnp.log(jnp.maximum(gw, 1.0) /
                         shapes_flat[best, 0])
            th = jnp.log(jnp.maximum(gh, 1.0) / shapes_flat[best, 1])
            box_t = jnp.zeros((n + 1, 4)).at[idx].set(
                jnp.stack([tx, ty, tw, th], -1))[:n]

            obj_logit = pred_i[:, 4]
            obj_loss = binary_cross_entropy(obj_logit, obj_t,
                                            reduction='sum')
            pos = obj_t
            xy_loss = binary_cross_entropy(
                pred_i[:, 0:2], box_t[:, 0:2], weight=pos[:, None],
                reduction='sum')
            wh_loss = jnp.sum(((pred_i[:, 2:4] - box_t[:, 2:4])**2) *
                              pos[:, None]) * 0.5
            cls_loss = binary_cross_entropy(
                pred_i[:, 5:], cls_t, weight=pos, reduction='sum')
            return obj_loss, xy_loss, wh_loss, cls_loss, jnp.sum(pos)

        o, xy, wh, cl, npos = jax.vmap(per_image)(
            pred, batch['gt_bboxes'], batch['gt_labels'], batch['gt_valid'])
        denom = jnp.maximum(jnp.sum(npos), 1.0)
        return dict(loss_conf=jnp.sum(o) / (b * 1000.0),
                    loss_xy=jnp.sum(xy) / denom,
                    loss_wh=jnp.sum(wh) / denom,
                    loss_cls=jnp.sum(cl) / denom)

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        preds = self._forward(batch['image'])
        b = preds[0].shape[0]
        c = self.num_classes
        boxes_all, scores_all = [], []
        for lvl, p in enumerate(preds):
            h, w = p.shape[1], p.shape[2]
            p = p.reshape(b, h, w, 3, 5 + c).astype(jnp.float32)
            ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
            grid = jnp.asarray(np.stack([xs, ys], -1), jnp.float32)
            s = STRIDES[lvl]
            xy = (jax.nn.sigmoid(p[..., 0:2]) + grid[None, :, :, None, :]) * s
            shapes = jnp.asarray(ANCHOR_SHAPES[lvl], jnp.float32)
            wh = jnp.exp(jnp.clip(p[..., 2:4], -8, 8)) * shapes[None, None,
                                                                None, :, :]
            boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)
            conf = jax.nn.sigmoid(p[..., 4:5])
            cls = jax.nn.sigmoid(p[..., 5:]) * conf
            boxes_all.append(boxes.reshape(b, -1, 4))
            scores_all.append(cls.reshape(b, -1, c))
        boxes = jnp.concatenate(boxes_all, 1)
        scores = jnp.concatenate(scores_all, 1)
        cfg = self.test_cfg

        def per_image(boxes_i, scores_i, shape_i):
            flat = scores_i.reshape(-1)
            flat = jnp.where(flat > cfg.score_thr, flat, NEG_INF)
            kk = min(cfg.nms_pre, flat.shape[0])
            top, idx = jax.lax.top_k(flat, kk)
            bi = idx // c
            labels = (idx % c).astype(jnp.int32)
            bxs = clip_boxes(boxes_i[bi], shape_i.astype(jnp.float32))
            keep, _ = batched_nms(bxs, top, labels, cfg.nms_iou_threshold,
                                  cfg.nms_tile)
            kept = jnp.where(keep, top, NEG_INF)
            m = min(cfg.max_per_img, kk)
            sc, sel = jax.lax.top_k(kept, m)
            valid = sc > NEG_INF / 2
            dets = jnp.concatenate(
                [bxs[sel] * valid[:, None],
                 jnp.where(valid, sc, 0.0)[:, None]], -1)
            return dets, jnp.where(valid, labels[sel], 0), valid

        dets, labels, valid = jax.vmap(per_image)(boxes, scores,
                                                  batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
