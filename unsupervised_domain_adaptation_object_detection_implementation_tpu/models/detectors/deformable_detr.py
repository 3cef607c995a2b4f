"""Deformable DETR (reference
`mmdet/models/detectors/deformable_detr.py` +
`mmdet/models/utils/transformer.py:DeformableDetrTransformer` +
`mmdet/models/dense_heads/deformable_detr_head.py`).

Multi-scale deformable attention replaces dense attention: each query
samples 4 points per head per level via `ms_deform_attn_core` (the XLA
4-tap-gather equivalent of the CUDA kernel). Decoder reference points are
sigmoid-space and iteratively refined by each layer's box head
(`with_box_refine=True` path). Classification is sigmoid-focal, matching
cost focal-style; Hungarian matching runs in-jit like `detr.py`.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from optax import assignment as optax_assignment

from ...core.bbox.transforms import clip_boxes
from ...ops import ms_deform_attn_core
from ...utils.registry import DETECTORS
from ..backbones.build import build_trunk
from ..losses import giou_loss, sigmoid_focal_loss
from ..necks.zoo_necks import ChannelMapper
from .detr import (_cxcywh_to_xyxy, _xyxy_to_cxcywh,
                   sine_positional_encoding, DETRTestConfig)


def _proposal_sine_embed(boxes: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(B, N, 4) normalized cxcywh → (B, N, 2·dim) sine embedding of the
    four coordinates (reference `deformable_transformer.py`
    get_proposal_pos_embed: dim/2 features per coordinate)."""
    quarter = dim // 2
    temp = (10000.0 ** (2 * (jnp.arange(quarter // 2)) / quarter)
            ).astype(jnp.float32)
    ang = boxes[..., None] * (2 * np.pi) / temp        # (B, N, 4, q/2)
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return emb.reshape(*boxes.shape[:-1], -1)          # (B, N, 4·q = 2·dim)


class MSDeformAttnLayer(nn.Module):
    """One deformable attention block: sampling offsets + weights are
    linear functions of the query (`transformer.py:MultiScaleDeformableAttention`)."""

    dim: int = 256
    heads: int = 8
    levels: int = 4
    points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, value, ref_points, spatial_shapes):
        """query (B, Q, D); value (B, N, D); ref_points (B, Q, L, 2) in
        [0,1]; spatial_shapes static list of (H, W)."""
        b, q, _ = query.shape
        m, L, P = self.heads, self.levels, self.points
        d = self.dim // m
        v = nn.Dense(self.dim, dtype=self.dtype, name='value_proj')(value)
        v = v.reshape(b, -1, m, d)
        off = nn.Dense(m * L * P * 2, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       name='sampling_offsets')(query)
        off = off.reshape(b, q, m, L, P, 2).astype(jnp.float32)
        aw = nn.Dense(m * L * P, dtype=self.dtype,
                      kernel_init=nn.initializers.zeros,
                      name='attention_weights')(query)
        aw = jax.nn.softmax(aw.reshape(b, q, m, L * P).astype(jnp.float32),
                            axis=-1).reshape(b, q, m, L, P)
        # normalize offsets by each level's size
        wh = jnp.asarray([[w_, h_] for h_, w_ in spatial_shapes],
                         jnp.float32)                       # (L, 2)
        locs = ref_points[:, :, None, :, None, :] + \
            off / wh[None, None, None, :, None, :]
        out = ms_deform_attn_core(v, spatial_shapes, locs, aw)
        return nn.Dense(self.dim, dtype=self.dtype,
                        name='output_proj')(out.astype(self.dtype))


class DeformableEncoderLayer(nn.Module):
    dim: int = 256
    levels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ref_points, spatial_shapes, pos):
        h = MSDeformAttnLayer(dim=self.dim, levels=self.levels,
                              dtype=self.dtype, name='attn')(
            x + pos, x, ref_points, spatial_shapes)
        x = nn.LayerNorm(dtype=self.dtype, name='norm1')(x + h)
        f = nn.Dense(1024, dtype=self.dtype, name='ffn1')(x)
        f = nn.Dense(self.dim, dtype=self.dtype, name='ffn2')(nn.relu(f))
        return nn.LayerNorm(dtype=self.dtype, name='norm2')(x + f)


class DeformableDecoderLayer(nn.Module):
    dim: int = 256
    levels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, memory, ref_points, spatial_shapes, q_pos):
        sa = nn.MultiHeadDotProductAttention(num_heads=8, dtype=self.dtype,
                                             name='self_attn')
        h = nn.LayerNorm(dtype=self.dtype, name='norm1')(
            q + sa(q + q_pos, q + q_pos, q))
        ca = MSDeformAttnLayer(dim=self.dim, levels=self.levels,
                               dtype=self.dtype, name='cross_attn')(
            h + q_pos, memory, ref_points, spatial_shapes)
        h = nn.LayerNorm(dtype=self.dtype, name='norm2')(h + ca)
        f = nn.Dense(1024, dtype=self.dtype, name='ffn1')(h)
        f = nn.Dense(self.dim, dtype=self.dtype, name='ffn2')(nn.relu(f))
        return nn.LayerNorm(dtype=self.dtype, name='norm3')(h + f)


@DETECTORS.register_module()
class DeformableDETR(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    embed_dim: int = 256
    num_queries: int = 300
    enc_layers: int = 6
    dec_layers: int = 6
    num_levels: int = 4
    cls_weight: float = 2.0
    l1_weight: float = 5.0
    giou_weight: float = 2.0
    aux_loss: bool = True
    # reference configs/deformable_detr row triple: plain
    # (with_box_refine=False), `_refine` (True, the default here), and
    # `_twostage_refine` (as_two_stage=True — encoder tokens propose the
    # initial query boxes, reference `deformable_detr_head.py`
    # gen_encoder_output_proposals path)
    with_box_refine: bool = True
    as_two_stage: bool = False
    test_cfg: DETRTestConfig = DETRTestConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = ChannelMapper(
            in_channels=self.backbone.stage_channels()[1:],
            out_channels=self.embed_dim, kernel_size=1,
            num_outs=self.num_levels, dtype=self.dtype)
        self.encoder = [DeformableEncoderLayer(dim=self.embed_dim,
                                               levels=self.num_levels,
                                               dtype=self.dtype,
                                               name=f'enc{i}')
                        for i in range(self.enc_layers)]
        self.decoder = [DeformableDecoderLayer(dim=self.embed_dim,
                                               levels=self.num_levels,
                                               dtype=self.dtype,
                                               name=f'dec{i}')
                        for i in range(self.dec_layers)]
        self.query_embed = self.param(
            'query_embed', nn.initializers.normal(1.0),
            (self.num_queries, self.embed_dim * 2))
        self.level_embed = self.param(
            'level_embed', nn.initializers.normal(1.0),
            (self.num_levels, self.embed_dim))
        self.ref_point_head = nn.Dense(2, dtype=self.dtype,
                                       name='ref_point_head')
        if self.as_two_stage:
            # encoder-proposal scoring + delta heads (reference
            # `deformable_transformer.py` enc_output / pos_trans path)
            self.enc_cls = nn.Dense(self.num_classes, dtype=self.dtype,
                                    bias_init=nn.initializers.constant(
                                        -4.595), name='enc_cls')
            self.enc_box = [nn.Dense(self.embed_dim, dtype=self.dtype,
                                     name='enc_box_0'),
                            nn.Dense(self.embed_dim, dtype=self.dtype,
                                     name='enc_box_1'),
                            nn.Dense(4, dtype=self.dtype,
                                     name='enc_box_out')]
            self.pos_trans = nn.Dense(self.embed_dim * 2, dtype=self.dtype,
                                      name='pos_trans')
        self.cls_heads = [nn.Dense(self.num_classes, dtype=self.dtype,
                                   bias_init=nn.initializers.constant(
                                       -4.595), name=f'cls{i}')
                          for i in range(self.dec_layers)]
        self.box_heads = [
            [nn.Dense(self.embed_dim, dtype=self.dtype,
                      name=f'box{i}_0'),
             nn.Dense(self.embed_dim, dtype=self.dtype,
                      name=f'box{i}_1'),
             nn.Dense(4, dtype=self.dtype, name=f'box{i}_out')]
            for i in range(self.dec_layers)]

    def _box_mlp(self, heads, t):
        t = nn.relu(heads[0](t))
        t = nn.relu(heads[1](t))
        return heads[2](t).astype(jnp.float32)

    def _forward(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        spatial_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        b = feats[0].shape[0]
        tokens, poss = [], []
        for li, f in enumerate(feats):
            h, w = f.shape[1:3]
            tokens.append(f.reshape(b, h * w, -1))
            pe = sine_positional_encoding(h, w, self.embed_dim)
            poss.append(jnp.asarray(pe, self.dtype).reshape(1, h * w, -1)
                        + self.level_embed[li][None, None].astype(self.dtype))
        mem = jnp.concatenate(tokens, axis=1)
        pos = jnp.concatenate([jnp.broadcast_to(p, (b, *p.shape[1:]))
                               for p in poss], axis=1)

        # encoder reference points: each token's own normalized center,
        # tiled across levels
        refs = []
        for h, w in spatial_shapes:
            ys, xs = np.meshgrid((np.arange(h) + 0.5) / h,
                                 (np.arange(w) + 0.5) / w, indexing='ij')
            refs.append(np.stack([xs.ravel(), ys.ravel()], -1))
        enc_ref = jnp.asarray(np.concatenate(refs), jnp.float32)
        enc_ref = jnp.broadcast_to(
            enc_ref[None, :, None, :],
            (b, enc_ref.shape[0], self.num_levels, 2))

        for layer in self.encoder:
            mem = layer(mem, enc_ref, spatial_shapes, pos)

        enc_out = None
        if self.as_two_stage:
            # per-token base proposal: own center, wh = 0.05·2^lvl
            # (reference gen_encoder_output_proposals), refined by the
            # enc box MLP; top-num_queries tokens become the queries.
            whs = []
            for li, (h, w) in enumerate(spatial_shapes):
                whs.append(np.full((h * w, 2), 0.05 * (2.0 ** li),
                                   np.float32))
            base = jnp.concatenate(
                [enc_ref[..., 0, :],
                 jnp.broadcast_to(jnp.asarray(np.concatenate(whs))[None],
                                  (b, mem.shape[1], 2))], axis=-1)
            base_logit = jnp.log(jnp.clip(base / (1 - base), 1e-6, 1e6))
            delta = self._box_mlp(self.enc_box, mem)
            enc_boxes = jax.nn.sigmoid(delta + base_logit)
            enc_logits = self.enc_cls(mem).astype(jnp.float32)
            _, topk = jax.lax.top_k(enc_logits.max(-1), self.num_queries)

            def take(arr):
                return jnp.take_along_axis(arr, topk[..., None], axis=1)
            sel_box = take(enc_boxes)
            enc_out = (take(enc_logits), sel_box)
            ref = jax.lax.stop_gradient(sel_box[..., :2])
            pe = _proposal_sine_embed(jax.lax.stop_gradient(sel_box),
                                      self.embed_dim)
            q_pos, q = jnp.split(
                self.pos_trans(pe.astype(self.dtype)), 2, axis=-1)
        else:
            q_pos, q_feat = jnp.split(
                self.query_embed[None].astype(self.dtype), 2, axis=-1)
            q = jnp.broadcast_to(q_feat,
                                 (b, self.num_queries, self.embed_dim))
            q_pos = jnp.broadcast_to(q_pos,
                                     (b, self.num_queries, self.embed_dim))
            # initial reference points from query pos embedding
            ref = jax.nn.sigmoid(
                self.ref_point_head(q_pos).astype(jnp.float32))

        cls_all, box_all = [], []
        for li, layer in enumerate(self.decoder):
            ref_l = jnp.broadcast_to(
                ref[:, :, None, :],
                (b, self.num_queries, self.num_levels, 2))
            q = layer(q, mem, ref_l, spatial_shapes, q_pos)
            delta = self._box_mlp(self.box_heads[li], q)
            ref_logit = jnp.log(jnp.clip(ref / (1 - ref), 1e-6, 1e6))
            xy = jax.nn.sigmoid(delta[..., :2] + ref_logit)
            wh = jax.nn.sigmoid(delta[..., 2:])
            box = jnp.concatenate([xy, wh], axis=-1)
            cls_all.append(self.cls_heads[li](q).astype(jnp.float32))
            box_all.append(box)
            if self.with_box_refine:
                ref = jax.lax.stop_gradient(xy)    # iterative refinement
        return cls_all, box_all, enc_out

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls_all, box_all, enc_out = self._forward(batch['image'])
        if enc_out is not None:
            # encoder-proposal aux loss, same matcher as a decoder layer
            # (reference DeformableDETRHead loss_single on enc_outputs)
            cls_all = [enc_out[0]] + list(cls_all)
            box_all = [enc_out[1]] + list(box_all)
        hw = batch['img_shape'].astype(jnp.float32)
        scale = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], -1)
        gt_norm = _xyxy_to_cxcywh(batch['gt_bboxes'] / scale[:, None, :])

        losses: Dict[str, jnp.ndarray] = {}
        layers = range(len(cls_all)) if self.aux_loss else \
            [len(cls_all) - 1]
        for li in layers:
            c_l, l_l, g_l = jax.vmap(
                lambda c, b_, gn, gl, gv: _focal_layer_loss(
                    c, b_, gn, gl, gv, self.num_classes, self.cls_weight,
                    self.l1_weight, self.giou_weight)
            )(cls_all[li], box_all[li], gt_norm, batch['gt_labels'],
              batch['gt_valid'])
            tag = '' if li == len(cls_all) - 1 else f'd{li}.'
            losses[f'{tag}loss_cls'] = jnp.mean(c_l)
            losses[f'{tag}loss_bbox'] = jnp.mean(l_l)
            losses[f'{tag}loss_iou'] = jnp.mean(g_l)
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls_all, box_all, _ = self._forward(batch['image'])
        probs = jax.nn.sigmoid(cls_all[-1])
        hw = batch['img_shape'].astype(jnp.float32)
        scale = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], -1)
        boxes = _cxcywh_to_xyxy(box_all[-1]) * scale[:, None, :]
        k = min(self.test_cfg.max_per_img, self.num_queries)

        def per_image(p, b_, shape_i):
            flat = p.reshape(-1)
            top, idx = jax.lax.top_k(flat, k)
            qi = idx // self.num_classes
            labels = (idx % self.num_classes).astype(jnp.int32)
            bx = clip_boxes(b_[qi], shape_i.astype(jnp.float32))
            valid = top > self.test_cfg.score_thr
            dets = jnp.concatenate(
                [bx * valid[:, None],
                 jnp.where(valid, top, 0.0)[:, None]], -1)
            return dets, labels, valid

        dets, labels, valid = jax.vmap(per_image)(probs, boxes,
                                                  batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)


def _focal_layer_loss(cls, box, gt_norm, gt_labels, gt_valid, num_classes,
                      cls_weight=2.0, l1_weight=5.0, giou_weight=2.0,
                      return_match=False):
    """Hungarian loss with sigmoid-focal classification
    (`deformable_detr_head.py` / `match_costs.py:FocalLossCost`)."""
    q = cls.shape[0]
    g = gt_norm.shape[0]
    p = jax.nn.sigmoid(cls)
    gl = jnp.clip(gt_labels, 0, num_classes - 1)
    # focal-style matching cost
    alpha, gamma = 0.25, 2.0
    pos_cost = -alpha * ((1 - p[:, gl]) ** gamma) * \
        jnp.log(jnp.clip(p[:, gl], 1e-8, None))
    neg_cost = -(1 - alpha) * (p[:, gl] ** gamma) * \
        jnp.log(jnp.clip(1 - p[:, gl], 1e-8, None))
    cost_cls = pos_cost - neg_cost
    cost_l1 = jnp.sum(jnp.abs(box[:, None, :] - gt_norm[None, :, :]), -1)
    bx = _cxcywh_to_xyxy(box)
    gx = _cxcywh_to_xyxy(gt_norm)
    cost_giou = giou_loss(jnp.broadcast_to(bx[:, None], (q, g, 4)),
                          jnp.broadcast_to(gx[None, :], (q, g, 4)),
                          reduction='none') - 1.0
    cost = cls_weight * cost_cls + l1_weight * cost_l1 + \
        giou_weight * cost_giou
    cost = jnp.where(gt_valid[None, :], cost, 1e6)
    qi, gi = optax_assignment.hungarian_algorithm(cost)
    pair_valid = gt_valid[gi]
    labels = jnp.full((q,), num_classes, jnp.int32)
    labels = labels.at[qi].set(jnp.where(pair_valid, gl[gi], num_classes))
    loss_cls = sigmoid_focal_loss(cls, labels, reduction='sum') / \
        jnp.maximum(jnp.sum(pair_valid), 1.0)
    w = pair_valid.astype(jnp.float32)
    loss_l1 = jnp.sum(jnp.sum(jnp.abs(box[qi] - gt_norm[gi]), -1) * w)
    loss_giou = jnp.sum(giou_loss(_cxcywh_to_xyxy(box[qi]),
                                  _cxcywh_to_xyxy(gt_norm[gi]),
                                  reduction='none') * w)
    n = jnp.maximum(jnp.sum(w), 1.0)
    if return_match:
        # per-query matched gt index (or -1) for mask supervision consumers
        # (QueryInst); scatter of the Hungarian pairing back onto queries
        match = jnp.full((q,), -1, jnp.int32)
        match = match.at[qi].set(jnp.where(pair_valid, gi, -1))
        return (cls_weight * loss_cls, l1_weight * loss_l1 / n,
                giou_weight * loss_giou / n, match)
    return (cls_weight * loss_cls, l1_weight * loss_l1 / n,
            giou_weight * loss_giou / n)
