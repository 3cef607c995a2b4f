"""DETR (reference `mmdet/models/detectors/detr.py` +
`mmdet/models/dense_heads/detr_head.py` + `models/utils/transformer.py`).

Set prediction with a transformer encoder/decoder over C5 tokens and learned
object queries. The bipartite Hungarian matching — the reference runs
scipy's solver on CPU per image — runs INSIDE the jitted step via
`optax.assignment.hungarian_algorithm` (vmapped over the batch, static
(Q, G) cost shapes; padded gt columns carry a large constant cost and are
masked out of the loss). NMS-free inference.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from optax import assignment as optax_assignment

from ...core.bbox.transforms import clip_boxes
from ...utils.registry import DETECTORS
from ..backbones.build import build_trunk
from ..losses import giou_loss, l1_loss
from ..losses.cross_entropy_loss import softmax_cross_entropy


def sine_positional_encoding(h: int, w: int, dim: int) -> np.ndarray:
    """2D sine PE (reference `positional_encoding.py`), (H, W, dim)."""
    half = dim // 2
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing='ij')
    temp = 10000 ** (2 * (np.arange(half // 2) // 1) / half)
    out = []
    for coord in (ys, xs):
        ang = coord[..., None] / temp
        out.append(np.sin(ang))
        out.append(np.cos(ang))
    return np.concatenate(out, axis=-1)[:, :, :dim]


class TransformerLayer(nn.Module):
    dim: int = 256
    heads: int = 8
    ffn_dim: int = 2048
    decoder: bool = False
    # Decoder layer 0 receives x = 0 (DETR's zero content queries), so its
    # self-attention output is a CONSTANT across queries (v = x = 0 ⇒ only
    # biases survive) and norm1 sees an exactly-zero input — a degenerate
    # LayerNorm whose 1/√ε backward inflates two bias grads ~1000×, which
    # under the reference recipe (global clip 0.1 + AdamW) scales every
    # OTHER grad below Adam's ε and freezes training (measured: query_embed
    # unchanged after 600 steps). Skipping the block there is functionally
    # equivalent up to a learned constant (absorbed by later biases).
    skip_self_attn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, memory=None, q_pos=None, m_pos=None):
        """x: (B, Q, D) queries; memory: (B, N, D) encoder tokens."""
        def with_pos(t, p):
            return t if p is None else t + p

        if self.skip_self_attn:
            h = x
        else:
            sa = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=self.dtype, name='self_attn')
            h = nn.LayerNorm(dtype=self.dtype, name='norm1')(
                x + sa(with_pos(x, q_pos), with_pos(x, q_pos), x))
        if self.decoder:
            ca = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=self.dtype, name='cross_attn')
            h = nn.LayerNorm(dtype=self.dtype, name='norm2')(
                h + ca(with_pos(h, q_pos), with_pos(memory, m_pos), memory))
        ffn = nn.Dense(self.ffn_dim, dtype=self.dtype, name='ffn1')
        ffn2 = nn.Dense(self.dim, dtype=self.dtype, name='ffn2')
        return nn.LayerNorm(dtype=self.dtype, name='norm3')(
            h + ffn2(nn.relu(ffn(h))))


class DETRTestConfig(NamedTuple):
    max_per_img: int = 100
    score_thr: float = 0.0


@DETECTORS.register_module()
class DETR(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    embed_dim: int = 256
    num_queries: int = 100
    enc_layers: int = 6
    dec_layers: int = 6
    cls_weight: float = 1.0
    l1_weight: float = 5.0
    giou_weight: float = 2.0
    bg_weight: float = 0.1
    aux_loss: bool = True
    test_cfg: DETRTestConfig = DETRTestConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(3,),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.input_proj = nn.Dense(self.embed_dim, dtype=self.dtype)
        self.query_embed = self.param(
            'query_embed', nn.initializers.normal(1.0),
            (self.num_queries, self.embed_dim))
        self.encoder = [TransformerLayer(dim=self.embed_dim,
                                         dtype=self.dtype,
                                         name=f'enc{i}')
                        for i in range(self.enc_layers)]
        self.decoder = [TransformerLayer(dim=self.embed_dim, decoder=True,
                                         skip_self_attn=(i == 0),
                                         dtype=self.dtype,
                                         name=f'dec{i}')
                        for i in range(self.dec_layers)]
        self.cls_head = nn.Dense(self.num_classes + 1, dtype=self.dtype)
        self.box_mlp = [nn.Dense(self.embed_dim, dtype=self.dtype,
                                 name=f'box{i}') for i in range(2)] + \
            [nn.Dense(4, dtype=self.dtype, name='box_out')]

    def _forward(self, image):
        (c5,) = self.backbone(image.astype(self.dtype))
        b, h, w, _ = c5.shape
        tokens = self.input_proj(c5.reshape(b, h * w, -1))
        pos = jnp.asarray(sine_positional_encoding(h, w, self.embed_dim),
                          self.dtype).reshape(1, h * w, -1)
        mem = tokens
        for layer in self.encoder:
            mem = layer(mem, q_pos=pos)
        q = jnp.zeros((b, self.num_queries, self.embed_dim), self.dtype)
        q_pos = self.query_embed[None].astype(self.dtype)
        outs = []
        for layer in self.decoder:
            q = layer(q, memory=mem, q_pos=q_pos, m_pos=pos)
            outs.append(q)
        cls_all, box_all = [], []
        for q_out in outs:
            cls_all.append(self.cls_head(q_out).astype(jnp.float32))
            t = q_out
            for i, fc in enumerate(self.box_mlp):
                t = fc(t)
                if i < len(self.box_mlp) - 1:
                    t = nn.relu(t)
            box_all.append(jax.nn.sigmoid(t.astype(jnp.float32)))  # cxcywh
        return cls_all, box_all


    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls_all, box_all = self._forward(batch['image'])
        hw = batch['img_shape'].astype(jnp.float32)
        scale = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], -1)
        gt_xyxy = batch['gt_bboxes'] / scale[:, None, :]
        gt_norm = _xyxy_to_cxcywh(gt_xyxy)

        losses: Dict[str, jnp.ndarray] = {}
        layers = range(len(cls_all)) if self.aux_loss else \
            [len(cls_all) - 1]
        weights = (self.num_classes, self.cls_weight, self.l1_weight,
                   self.giou_weight, self.bg_weight)
        for li in layers:
            c_l, l_l, g_l = jax.vmap(
                lambda c, b_, gn, gl, gv: detr_layer_loss(
                    c, b_, gn, gl, gv, *weights)
            )(cls_all[li], box_all[li], gt_norm, batch['gt_labels'],
              batch['gt_valid'])
            tag = '' if li == len(cls_all) - 1 else f'd{li}.'
            losses[f'{tag}loss_cls'] = jnp.mean(c_l)
            losses[f'{tag}loss_bbox'] = jnp.mean(l_l)
            losses[f'{tag}loss_iou'] = jnp.mean(g_l)
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls_all, box_all = self._forward(batch['image'])
        cls, box = cls_all[-1], box_all[-1]
        probs = jax.nn.softmax(cls, axis=-1)[..., :self.num_classes]
        hw = batch['img_shape'].astype(jnp.float32)
        scale = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], -1)
        boxes = _cxcywh_to_xyxy(box) * scale[:, None, :]

        k = min(self.test_cfg.max_per_img, self.num_queries)

        def per_image(p, b_, shape_i):
            flat = p.reshape(-1)
            top, idx = jax.lax.top_k(flat, k)
            qi = idx // self.num_classes
            labels = (idx % self.num_classes).astype(jnp.int32)
            bx = clip_boxes(b_[qi], shape_i.astype(jnp.float32))
            valid = top > self.test_cfg.score_thr
            dets = jnp.concatenate(
                [bx * valid[:, None], jnp.where(valid, top, 0.0)[:, None]],
                -1)
            return dets, labels, valid

        dets, labels, valid = jax.vmap(per_image)(probs, boxes,
                                                  batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)


def detr_layer_loss(cls, box, gt_norm, gt_labels, gt_valid, num_classes,
                    cls_weight=1.0, l1_weight=5.0, giou_weight=2.0,
                    bg_weight=0.1):
    """Hungarian-matched DETR loss for one decoder layer (per image)."""
    q = cls.shape[0]
    g = gt_norm.shape[0]
    probs = jax.nn.softmax(cls, axis=-1)
    cost_cls = -probs[:, jnp.clip(gt_labels, 0, num_classes - 1)]
    cost_l1 = jnp.sum(jnp.abs(box[:, None, :] - gt_norm[None, :, :]),
                      axis=-1)
    bx = _cxcywh_to_xyxy(box)
    gx = _cxcywh_to_xyxy(gt_norm)
    cost_giou = giou_loss(
        jnp.broadcast_to(bx[:, None], (q, g, 4)),
        jnp.broadcast_to(gx[None, :], (q, g, 4)),
        reduction='none') - 1.0                      # in [-1, 1]
    cost = cls_weight * cost_cls + l1_weight * cost_l1 + \
        giou_weight * cost_giou
    cost = jnp.where(gt_valid[None, :], cost, 1e6)
    qi, gi = optax_assignment.hungarian_algorithm(cost)
    # matched pairs: one per gt column (rectangular Q >= G)
    pair_valid = gt_valid[gi]
    labels = jnp.full((q,), num_classes, jnp.int32)
    labels = labels.at[qi].set(
        jnp.where(pair_valid, gt_labels[gi], num_classes))
    cls_w = jnp.where(labels == num_classes, bg_weight, 1.0)
    loss_cls = jnp.sum(softmax_cross_entropy(cls, labels) * cls_w) / \
        jnp.maximum(jnp.sum(cls_w), 1.0)
    w = pair_valid.astype(jnp.float32)
    loss_l1 = jnp.sum(jnp.sum(jnp.abs(box[qi] - gt_norm[gi]), -1) * w)
    loss_giou = jnp.sum(
        giou_loss(_cxcywh_to_xyxy(box[qi]), _cxcywh_to_xyxy(gt_norm[gi]),
                  reduction='none') * w)
    n = jnp.maximum(jnp.sum(w), 1.0)
    return (cls_weight * loss_cls, l1_weight * loss_l1 / n,
            giou_weight * loss_giou / n)


def _cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def _xyxy_to_cxcywh(b):
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1)
