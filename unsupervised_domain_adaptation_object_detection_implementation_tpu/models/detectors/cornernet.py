"""CornerNet (reference `mmdet/models/detectors/cornernet.py` +
`mmdet/models/dense_heads/corner_head.py`).

Detect objects as paired top-left / bottom-right corners on an Hourglass
backbone: per-corner class heatmaps (gaussian-focal), 1-d associative
embeddings (pull/push), and sub-pixel offsets (L1). Decoding pairs the
top-k corners of each type by class agreement, geometric validity and
embedding distance — all dense (K×K) masks, no ragged grouping.

The corner pools are the `corner_pool` cummax op.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import corner_pool
from ...utils.registry import DETECTORS, HEADS
from ..backbones.hourglass import HourglassNet
from ..losses import gaussian_focal_loss
from ..losses.extra_losses import ae_loss


class CornerPredictor(nn.Module):
    """One corner branch: pool-fused conv + heatmap/embedding/offset heads
    (`corner_head.py:_make_layers`)."""

    num_classes: int = 80
    direction: str = 'tl'      # 'tl' = top+left pools, 'br' = bottom+right
    feat: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d1, d2 = (('top', 'left') if self.direction == 'tl'
                  else ('bottom', 'right'))
        p1 = nn.relu(nn.Conv(128, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name='p1_conv')(x))
        p2 = nn.relu(nn.Conv(128, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name='p2_conv')(x))
        pooled = corner_pool(p1, d1) + corner_pool(p2, d2)
        p = nn.Conv(self.feat, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name='p_out')(pooled)
        aux = nn.Conv(self.feat, (1, 1), dtype=self.dtype,
                      name='aux')(x)
        out = nn.relu(p + aux)
        out = nn.relu(nn.Conv(self.feat, (3, 3), padding=[(1, 1)] * 2,
                              dtype=self.dtype, name='out_conv')(out))

        def head(name, ch, bias=0.0):
            h = nn.relu(nn.Conv(self.feat, (3, 3), padding=[(1, 1)] * 2,
                                dtype=self.dtype, name=f'{name}_1')(out))
            return nn.Conv(ch, (1, 1), dtype=self.dtype,
                           bias_init=nn.initializers.constant(bias),
                           name=f'{name}_2')(h).astype(jnp.float32)

        heat = head('heat', self.num_classes, bias=-2.19)
        emb = head('emb', 1)
        off = head('off', 2)
        return heat, emb, off


@DETECTORS.register_module()
class CornerNet(nn.Module):
    num_classes: int = 80
    stage_channels: Sequence[int] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Sequence[int] = (2, 2, 2, 2, 2, 4)
    downsample_times: int = 5
    num_stacks: int = 2
    corner_topk: int = 100
    max_per_img: int = 100
    score_thr: float = 0.05
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = HourglassNet(
            downsample_times=self.downsample_times,
            num_stacks=self.num_stacks,
            stage_channels=self.stage_channels,
            stage_blocks=self.stage_blocks, dtype=self.dtype)
        self.tl_heads = [CornerPredictor(num_classes=self.num_classes,
                                         direction='tl', dtype=self.dtype,
                                         name=f'tl{i}')
                         for i in range(self.num_stacks)]
        self.br_heads = [CornerPredictor(num_classes=self.num_classes,
                                         direction='br', dtype=self.dtype,
                                         name=f'br{i}')
                         for i in range(self.num_stacks)]

    def _forward(self, image):
        feats = self.backbone(image.astype(self.dtype))
        outs = []
        for i, f in enumerate(feats):
            outs.append((self.tl_heads[i](f), self.br_heads[i](f)))
        return outs

    @staticmethod
    def _gaussian_targets(heat_shape, corners, labels, valid, radius=2):
        """(H, W, C) gaussian heatmap from padded (G, 2) corner coords."""
        h, w, c = heat_shape
        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)
        d2 = (ys[None, :, None] - corners[:, None, None, 1]) ** 2 + \
            (xs[None, None, :] - corners[:, None, 0, None]) ** 2
        g = jnp.exp(-d2 / (2 * radius ** 2)) * valid[:, None, None]
        onehot = jax.nn.one_hot(labels, c) * valid[:, None]
        return jnp.clip(jnp.einsum('ghw,gc->hwc', g, onehot), 0, 1)

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        outs = self._forward(batch['image'])
        stride = 4.0
        gt = batch['gt_bboxes'] / stride
        gtl = batch['gt_labels']
        gtv = batch['gt_valid']
        tl_xy = gt[..., 0:2]
        br_xy = gt[..., 2:4]

        losses = {}
        for si, ((tl_h, tl_e, tl_o), (br_h, br_e, br_o)) in enumerate(outs):
            h, w, c = tl_h.shape[1:]

            def per_image(tlh, tle, tlo, brh, bre, bro, tlc, brc, gl, gv):
                tgt_tl = self._gaussian_targets((h, w, c), tlc, gl, gv)
                tgt_br = self._gaussian_targets((h, w, c), brc, gl, gv)
                det_l = gaussian_focal_loss(jax.nn.sigmoid(tlh), tgt_tl,
                                            reduction='sum') \
                    + gaussian_focal_loss(jax.nn.sigmoid(brh), tgt_br,
                                          reduction='sum')

                xi_tl = jnp.clip(tlc[:, 0].astype(jnp.int32), 0, w - 1)
                yi_tl = jnp.clip(tlc[:, 1].astype(jnp.int32), 0, h - 1)
                xi_br = jnp.clip(brc[:, 0].astype(jnp.int32), 0, w - 1)
                yi_br = jnp.clip(brc[:, 1].astype(jnp.int32), 0, h - 1)
                e_tl = tle[yi_tl, xi_tl, 0]
                e_br = bre[yi_br, xi_br, 0]
                pull, push = ae_loss(e_tl, e_br, gv)

                o_tl = tlo[yi_tl, xi_tl]                     # (G, 2)
                o_br = bro[yi_br, xi_br]
                t_tl = tlc - jnp.floor(tlc)
                t_br = brc - jnp.floor(brc)
                gvf = gv.astype(jnp.float32)[:, None]
                off_l = jnp.sum(jnp.abs(o_tl - t_tl) * gvf) + \
                    jnp.sum(jnp.abs(o_br - t_br) * gvf)
                n = jnp.maximum(jnp.sum(gv), 1.0)
                return det_l / n, pull, push, off_l / n

            det_l, pull, push, off_l = jax.vmap(per_image)(
                tl_h, tl_e, tl_o, br_h, br_e, br_o, tl_xy, br_xy, gtl, gtv)
            tag = f's{si}.' if si < len(outs) - 1 else ''
            losses[f'{tag}loss_heatmap'] = jnp.mean(det_l)
            losses[f'{tag}loss_pull'] = 0.1 * jnp.mean(pull)
            losses[f'{tag}loss_push'] = 0.1 * jnp.mean(push)
            losses[f'{tag}loss_offset'] = jnp.mean(off_l)
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        outs = self._forward(batch['image'])
        (tl_h, tl_e, tl_o), (br_h, br_e, br_o) = outs[-1]
        stride = 4.0
        K = self.corner_topk
        C = self.num_classes

        def nms_peak(heat):
            m = jax.lax.reduce_window(heat, -jnp.inf, jax.lax.max,
                                      (3, 3, 1), (1, 1, 1), 'SAME')
            return jnp.where(heat == m, heat, -jnp.inf)

        def per_image(tlh, tle, tlo, brh, bre, bro, shape_i):
            h, w, _ = tlh.shape
            tls = jax.nn.sigmoid(tlh)
            brs = jax.nn.sigmoid(brh)
            tl_flat = nms_peak(tls).reshape(-1)
            br_flat = nms_peak(brs).reshape(-1)
            tl_sc, tl_idx = jax.lax.top_k(tl_flat, K)
            br_sc, br_idx = jax.lax.top_k(br_flat, K)

            def unpack(idx, off):
                cls = idx % C
                pix = idx // C
                y = (pix // w).astype(jnp.float32)
                x = (pix % w).astype(jnp.float32)
                o = off[pix // w, pix % w]
                return cls, x + o[:, 0], y + o[:, 1]

            tl_c, tl_x, tl_y = unpack(tl_idx, tlo)
            br_c, br_x, br_y = unpack(br_idx, bro)
            e_tl = tle[(tl_idx // C) // w, (tl_idx // C) % w, 0]
            e_br = bre[(br_idx // C) // w, (br_idx // C) % w, 0]

            # (K, K) pairing
            same_cls = tl_c[:, None] == br_c[None, :]
            geom = (br_x[None, :] > tl_x[:, None]) & \
                (br_y[None, :] > tl_y[:, None])
            dist = jnp.abs(e_tl[:, None] - e_br[None, :])
            score = (tl_sc[:, None] + br_sc[None, :]) / 2
            ok = same_cls & geom & (dist < 0.5)
            score = jnp.where(ok, score, -1.0)

            flat = score.reshape(-1)
            k2 = min(self.max_per_img, flat.shape[0])
            top, idx2 = jax.lax.top_k(flat, k2)
            ti = idx2 // K
            bi = idx2 % K
            boxes = jnp.stack([tl_x[ti], tl_y[ti], br_x[bi], br_y[bi]],
                              -1) * stride
            valid = top > self.score_thr
            dets = jnp.concatenate(
                [boxes * valid[:, None],
                 jnp.where(valid, top, 0.0)[:, None]], -1)
            return dets, jnp.where(valid, tl_c[ti].astype(jnp.int32), 0), \
                valid

        dets, labels, valid = jax.vmap(per_image)(
            tl_h, tl_e, tl_o, br_h, br_e, br_o, batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
