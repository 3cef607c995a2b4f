"""CentripetalNet (reference `mmdet/models/dense_heads/centripetal_head.py`
+ `configs/centripetalnet/`).

CornerNet's hourglass + corner pools, but corners are paired by
CENTRIPETAL SHIFTS instead of associative embeddings: each corner
predicts a 2-d shift pointing at the box center (plus a guiding shift
supervising the feature adaption in the reference — folded into the same
head here); a tl/br pair is valid when both shifted centers land close to
each other. Dense (K, K) pairing like our CornerNet — no ragged grouping.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import corner_pool
from ...utils.registry import DETECTORS
from ..losses import gaussian_focal_loss
from .cornernet import CornerNet


class CentripetalPredictor(nn.Module):
    """Corner branch with heat / offset / centripetal-shift heads
    (`centripetal_head.py:44`)."""

    num_classes: int = 80
    direction: str = 'tl'
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
        aux = nn.Conv(self.feat, (1, 1), dtype=self.dtype, name='aux')(x)
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
        off = head('off', 2)
        # log-scale centripetal shift (reference predicts log shifts)
        shift = head('shift', 2)
        return heat, off, shift


@DETECTORS.register_module()
class CentripetalNet(CornerNet):
    """Hourglass CornerNet chassis with centripetal-shift pairing."""

    centripetal_thr: float = 0.5       # relative center-distance gate

    def setup(self):
        from ..backbones.hourglass import HourglassNet
        self.backbone = HourglassNet(
            downsample_times=self.downsample_times,
            num_stacks=self.num_stacks,
            stage_channels=self.stage_channels,
            stage_blocks=self.stage_blocks, dtype=self.dtype)
        self.tl_heads = [CentripetalPredictor(
            num_classes=self.num_classes, direction='tl', dtype=self.dtype,
            name=f'tl{i}') for i in range(self.num_stacks)]
        self.br_heads = [CentripetalPredictor(
            num_classes=self.num_classes, direction='br', dtype=self.dtype,
            name=f'br{i}') for i in range(self.num_stacks)]

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        outs = self._forward(batch['image'])
        stride = 4.0
        gt = batch['gt_bboxes'] / stride
        gtl = batch['gt_labels']
        gtv = batch['gt_valid']
        tl_xy = gt[..., 0:2]
        br_xy = gt[..., 2:4]
        ctr = (gt[..., 0:2] + gt[..., 2:4]) / 2

        losses = {}
        for si, ((tl_h, tl_o, tl_s), (br_h, br_o, br_s)) in enumerate(outs):
            h, w, c = tl_h.shape[1:]

            def per_image(tlh, tlo, tls, brh, bro, brs, tlc, brc, cc,
                          gl, gv):
                tgt_tl = self._gaussian_targets((h, w, c), tlc, gl, gv)
                tgt_br = self._gaussian_targets((h, w, c), brc, gl, gv)
                det_l = gaussian_focal_loss(jax.nn.sigmoid(tlh), tgt_tl,
                                            reduction='sum') \
                    + gaussian_focal_loss(jax.nn.sigmoid(brh), tgt_br,
                                          reduction='sum')

                def at(m, xy):
                    xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, w - 1)
                    yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, h - 1)
                    return m[yi, xi]

                gvf = gv.astype(jnp.float32)[:, None]
                o_tl = at(tlo, tlc)
                o_br = at(bro, brc)
                off_l = jnp.sum(jnp.abs(o_tl - (tlc - jnp.floor(tlc)))
                                * gvf) \
                    + jnp.sum(jnp.abs(o_br - (brc - jnp.floor(brc))) * gvf)

                # centripetal shift targets: log(center - corner)
                s_tl = at(tls, tlc)
                s_br = at(brs, brc)
                t_tl = jnp.log(jnp.maximum(cc - tlc, 1e-3))
                t_br = jnp.log(jnp.maximum(brc - cc, 1e-3))
                sh_l = jnp.sum(jnp.abs(s_tl - t_tl) * gvf) \
                    + jnp.sum(jnp.abs(s_br - t_br) * gvf)
                n = jnp.maximum(jnp.sum(gv), 1.0)
                return det_l / n, off_l / n, sh_l / n

            det_l, off_l, sh_l = jax.vmap(per_image)(
                tl_h, tl_o, tl_s, br_h, br_o, br_s, tl_xy, br_xy, ctr,
                gtl, gtv)
            tag = f's{si}.' if si < len(outs) - 1 else ''
            losses[f'{tag}loss_heatmap'] = jnp.mean(det_l)
            losses[f'{tag}loss_offset'] = jnp.mean(off_l)
            losses[f'{tag}loss_centripetal'] = 0.05 * jnp.mean(sh_l)
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        outs = self._forward(batch['image'])
        (tl_h, tl_o, tl_s), (br_h, br_o, br_s) = outs[-1]
        stride = 4.0
        K = self.corner_topk
        C = self.num_classes

        def nms_peak(heat):
            m = jax.lax.reduce_window(heat, -jnp.inf, jax.lax.max,
                                      (3, 3, 1), (1, 1, 1), 'SAME')
            return jnp.where(heat == m, heat, -jnp.inf)

        def per_image(tlh, tlo, tls, brh, bro, brs, shape_i):
            h, w, _ = tlh.shape
            tl_flat = nms_peak(jax.nn.sigmoid(tlh)).reshape(-1)
            br_flat = nms_peak(jax.nn.sigmoid(brh)).reshape(-1)
            tl_sc, tl_idx = jax.lax.top_k(tl_flat, K)
            br_sc, br_idx = jax.lax.top_k(br_flat, K)

            def unpack(idx, off, sh, sign):
                cls = idx % C
                pix = idx // C
                y = (pix // w).astype(jnp.float32)
                x = (pix % w).astype(jnp.float32)
                o = off[pix // w, pix % w]
                s = jnp.exp(sh[pix // w, pix % w])
                cx = x + o[:, 0] + sign * s[:, 0]
                cy = y + o[:, 1] + sign * s[:, 1]
                return cls, x + o[:, 0], y + o[:, 1], cx, cy

            tl_c, tl_x, tl_y, tl_cx, tl_cy = unpack(tl_idx, tlo, tls, +1)
            br_c, br_x, br_y, br_cx, br_cy = unpack(br_idx, bro, brs, -1)

            same_cls = tl_c[:, None] == br_c[None, :]
            geom = (br_x[None, :] > tl_x[:, None]) & \
                (br_y[None, :] > tl_y[:, None])
            # shifted centers must agree within a fraction of the box size
            bw = jnp.maximum(br_x[None, :] - tl_x[:, None], 1e-3)
            bh = jnp.maximum(br_y[None, :] - tl_y[:, None], 1e-3)
            dcx = jnp.abs(tl_cx[:, None] - br_cx[None, :]) / bw
            dcy = jnp.abs(tl_cy[:, None] - br_cy[None, :]) / bh
            ok = same_cls & geom & (dcx < self.centripetal_thr) & \
                (dcy < self.centripetal_thr)
            score = jnp.where(ok, (tl_sc[:, None] + br_sc[None, :]) / 2,
                              -1.0)

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
            tl_h, tl_o, tl_s, br_h, br_o, br_s, batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)
