"""Domain-adaptive Faster R-CNN detectors.

One unified module covering the reference's detector family (all of
`mmdet/models/detectors/`): DAFasterRCNN (`DAFaster_rcnn.py:12`, flagship),
DAFasterRCNN_Org (`DAFaster_rcnn_Orig.py:12`), MAFasterRCNN
(`MAFaster_rcnn.py:12`), FasterRCNN_SWDA (`DAFaster_rcnn_SWDA.py:12`),
DAFasterRCNN_Deep (`DAFaster_rcnn_Deep.py:12`), DAFasterRCNN_Tri
(`DAFaster_rcnn_Tri.py:12`). Variants differ only in backbone taps,
instance-loss mode and λ weights — exactly the knobs exposed here.

Training semantics (batched/masked; reference file:line in parens):
- supervised RPN + RoI losses masked to source rows (`rpn_head_da.py:146-168`,
  `standard_roi_head_da_v5.py:180-228`);
- image-level global CE per tap, scaled by λ_global (`DAFaster_rcnn.py:181`);
- patch least-squares loss per pixel tap, λ_patch (`:186-189`);
- grouped/plain instance alignment, λ_local (`:191-194`, `:232-327`);
- DAF-org consistency regularizer (`DAFaster_rcnn_Orig.py:161-175`).

Inference is vanilla Faster R-CNN (`DAFaster_rcnn.py:342-347`): the DA heads
are never built into the predict graph.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

import flax.linen as nn

from ...utils.registry import DETECTORS
from ..backbones.da_resnet import DAResNet, Tap, VARIANT_TAPS
from ..da.heads import InstanceAlignmentHead
from ..da.losses import (consistency_loss, global_alignment_loss,
                         grouped_instance_loss, image_da_loss, patch_ls_loss)
from ..dense_heads.rpn_head import (ProposalConfig, RPNHead, RPNTrainConfig,
                                    rpn_loss, rpn_proposals)
from ..losses import softmax_cross_entropy
from ..roi_heads.bbox_head import Shared2FCBBoxHead
from ..roi_heads.standard_roi_head import (RoITestConfig, RoITrainConfig,
                                           bbox_loss, extract_roi_feats,
                                           roi_head_predict, sample_rois)
from .faster_rcnn import AnchorConfig


class DALossWeights(NamedTuple):
    """λs — reference `DAFaster_rcnn.py:174-177` (fixed; the adaptive
    variant at `:57-65` is disabled there and not reproduced)."""
    global_: float = 0.1
    patch: float = 0.1
    local: float = 0.2
    consistency: float = 0.1


@DETECTORS.register_module()
class DAFasterRCNN(nn.Module):
    num_classes: int = 8
    variant: str = 'daf'            # daf | daf_org | maf | swda | deep | tri
    instance_mode: str = 'grouped'  # grouped | split_plain | plain | none
    # reference `DAFaster_rcnn.py:group(k=20)` pads/completes to 20 reps per
    # domain bucket (its inner k-means quirkily reduces to 10 when >20 rois
    # exist; we keep a uniform k — documented deviation, see PARITY.md)
    group_k: int = 20
    backbone_depth: int = 50
    backbone_type: str = 'resnet'   # 'resnet' | 'swin'
    frozen_stages: int = 1
    loss_weights: DALossWeights = DALossWeights()
    quirk_detach: bool = False
    anchor_cfg: AnchorConfig = AnchorConfig()
    rpn_train_cfg: RPNTrainConfig = RPNTrainConfig()
    rpn_proposal_cfg: ProposalConfig = ProposalConfig()
    rpn_test_cfg: ProposalConfig = ProposalConfig(nms_pre=4096,
                                                 max_per_img=1000)
    roi_train_cfg: RoITrainConfig = RoITrainConfig()
    roi_test_cfg: RoITestConfig = RoITestConfig()
    featmap_stride: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        # Swin trunk: pick the tap stage whose stride matches
        # `featmap_stride` (swin stages run at strides 4/8/16/32, vs the
        # DC5-style resnet trunk whose stage 3 is already stride 16). A
        # stride-16 tap (stage 2) is the recipe that matches the
        # reference's DeepAlign stride-16 layout
        # (`resnet_da_deep.py:1110-1175`); stride-32 anchors on the tiny
        # synth objects produce zero positive RPN samples.
        if self.backbone_type == 'swin':
            out_indices = (max(0, self.featmap_stride.bit_length() - 3),)
        else:
            out_indices = (3,)
        self.backbone = DAResNet(
            depth=self.backbone_depth, frozen_stages=self.frozen_stages,
            taps=VARIANT_TAPS[self.variant], trunk_type=self.backbone_type,
            out_indices=out_indices, dtype=self.dtype)
        self.rpn_head = RPNHead(
            feat_channels=2048, num_anchors=self.anchor_cfg.num_anchors,
            dtype=self.dtype)
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes, dtype=self.dtype)
        if self.instance_mode in ('grouped', 'split_plain'):
            self.local_da_fore = InstanceAlignmentHead(name='local_da_fore')
            self.local_da_back = InstanceAlignmentHead(name='local_da_back')
        elif self.instance_mode == 'plain':
            self.local_da = InstanceAlignmentHead(use_nonlocal=False,
                                                  name='local_da')

    def _anchors_for(self, feat):
        h, w = feat.shape[-3], feat.shape[-2]
        return jnp.asarray(self.anchor_cfg.grid_anchors(h, w))

    # ---- training ------------------------------------------------------
    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        domain = batch['domain']
        source_mask = (domain == 0).astype(jnp.float32)

        (feat,), da_out = self.backbone(batch['image'].astype(self.dtype),
                                        train=True)

        # --- supervised detection path (source-masked) -------------------
        anchors = self._anchors_for(feat)
        rpn_cls, rpn_reg = self.rpn_head(feat)
        losses = rpn_loss(rpn_cls, rpn_reg, anchors, batch['gt_bboxes'],
                          batch['gt_valid'], batch['img_shape'],
                          self.make_rng('sampler'), self.rpn_train_cfg,
                          loss_weight_mask=source_mask)
        losses = dict(loss_rpn_cls=losses['loss_rpn_cls'],
                      loss_rpn_bbox=losses['loss_rpn_bbox'])
        proposals, _, prop_valid = rpn_proposals(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_reg),
            anchors, batch['img_shape'], self.rpn_proposal_cfg)
        sampled = sample_rois(proposals, prop_valid, batch['gt_bboxes'],
                              batch['gt_labels'], batch['gt_valid'],
                              self.make_rng('sampler'), self.num_classes,
                              self.roi_train_cfg)
        roi_feats = extract_roi_feats(feat, sampled.rois, self.featmap_stride,
                                      flatten=True)
        cls, reg, shared_feat = self.bbox_head(roi_feats)
        losses.update(bbox_loss(cls, reg, sampled, self.num_classes,
                                self.roi_train_cfg,
                                loss_weight_mask=source_mask))

        # --- adversarial alignment losses --------------------------------
        w = self.loss_weights
        global_terms, patch_terms, image_maps = [], [], []
        for name, out in da_out.items():
            if name.startswith(('global', 'srm')):
                global_terms.append(global_alignment_loss(
                    out, domain, self.quirk_detach))
            elif name.startswith('pixel'):
                patch_terms.append(patch_ls_loss(
                    out, domain, quirk_sigmoid_shift=self.quirk_detach))
            elif name.startswith('image'):
                image_maps.append(out)
        if global_terms:
            losses['globle_da_loss'] = w.global_ * sum(global_terms)
        if patch_terms:
            losses['patch_bottom_loss'] = w.patch * sum(patch_terms)
        if image_maps:
            losses['img_da_loss'] = w.global_ * sum(
                image_da_loss(m, domain) for m in image_maps)

        if self.instance_mode == 'grouped':
            ins = grouped_instance_loss(
                self.local_da_fore, self.local_da_back,
                shared_feat, cls, sampled.label_valid, domain,
                k=self.group_k, quirk_detach=self.quirk_detach)
            losses['local_da_loss'] = w.local * ins
        elif self.instance_mode == 'split_plain':
            losses['local_da_loss'] = w.local * self._split_plain_loss(
                shared_feat, cls, sampled.label_valid, domain)
        elif self.instance_mode == 'plain':
            ins_logits = self.local_da(
                shared_feat.reshape(-1, shared_feat.shape[-1]))
            b, s = sampled.label_valid.shape
            ins_logits = ins_logits.reshape(b, s, 2)
            dom_t = jnp.broadcast_to(domain[:, None], (b, s))
            v = sampled.label_valid.astype(jnp.float32)
            ce = softmax_cross_entropy(ins_logits, dom_t) * v
            losses['local_da_loss'] = w.local * jnp.sum(ce) / \
                jnp.maximum(jnp.sum(v), 1.0)
            if image_maps:
                losses['consist_loss'] = w.consistency * consistency_loss(
                    image_maps[0], ins_logits, sampled.label_valid, domain)

        return losses

    def _split_plain_loss(self, shared_feat, cls, valid, domain):
        """MAF-style fg/bg split instance CE without k-means grouping
        (`MAFaster_rcnn.py:168-297`, grouping commented out at `:221-224`)."""
        b, s, d = shared_feat.shape
        probs = jax.nn.softmax(cls, axis=-1)
        is_fg = (1.0 - probs[..., -1]) >= 0.5
        dom_t = jnp.broadcast_to(domain[:, None], (b, s))
        flat_feats = shared_feat.reshape(-1, d)
        total = 0.0
        for fg, head in ((True, self.local_da_fore),
                         (False, self.local_da_back)):
            mask = (valid & (is_fg == fg)).reshape(-1).astype(jnp.float32)
            logits = head(flat_feats)
            ce = softmax_cross_entropy(logits, dom_t.reshape(-1)) * mask
            total = total + jnp.sum(ce) / jnp.maximum(jnp.sum(mask), 1.0)
        return total

    # ---- inference (vanilla Faster R-CNN) -------------------------------
    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        (feat,), _ = self.backbone(batch['image'].astype(self.dtype),
                                   train=False, with_da=False)
        anchors = self._anchors_for(feat)
        rpn_cls, rpn_reg = self.rpn_head(feat)
        proposals, _, prop_valid = rpn_proposals(
            rpn_cls, rpn_reg, anchors, batch['img_shape'], self.rpn_test_cfg)
        return roi_head_predict(
            self.bbox_head, feat, proposals, prop_valid, batch['img_shape'],
            self.num_classes, self.featmap_stride,
            reg_class_agnostic=False,
            target_stds=self.roi_train_cfg.target_stds,
            use_sigmoid_cls=self.roi_train_cfg.use_sigmoid_cls,
            cfg=self.roi_test_cfg)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
