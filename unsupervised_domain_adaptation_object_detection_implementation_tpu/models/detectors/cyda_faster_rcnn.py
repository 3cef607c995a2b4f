"""CycleGAN-based domain adaptation detectors.

Covers the reference `CyDAFasterRCNN` (`mmdet/models/detectors/
CyDAFaster_rcnn.py:9`: detection on translated images + global DA CE + GAN +
cycle losses at `:142-146`) and `CyCADA` (`CyCADA.py:9`: translation
pretraining, detector losses neutralized at `:100-158`).

Structural redesign vs the reference:
- the CycleGAN lives beside the trunk, not inside a forked ResNet copy
  (`resnet_da_v3.py:626` bakes generators into `ResNet_DA_v3`);
- the interleaved [s, t, s, t, ...] batch layout makes per-domain paths
  static slices (`img[0::2]` = source rows) instead of python branching;
- adversarial optimization is two explicit parameter groups updated in ONE
  jitted step (`apis.train_state.make_gan_train_step`): generator-side terms
  and discriminator terms (`disc_loss_*`) are separated by key prefix, with
  stop_gradient isolating the fakes in the D objective. XLA CSEs the shared
  forward subgraphs, so the two grad passes cost far less than 2×.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import DETECTORS
from ..backbones.da_resnet import DAResNet, Tap
from ..da.cyclegan import PatchDiscriminator, ResnetGenerator
from ..da.losses import global_alignment_loss
from ..losses.gan_loss import cycle_consistency_loss, gan_lsgan_loss
from ..dense_heads.rpn_head import (ProposalConfig, RPNHead, RPNTrainConfig,
                                    rpn_loss, rpn_proposals)
from ..roi_heads.bbox_head import Shared2FCBBoxHead
from ..roi_heads.standard_roi_head import (RoITestConfig, RoITrainConfig,
                                           bbox_loss, extract_roi_feats,
                                           roi_head_predict, sample_rois)
from .faster_rcnn import AnchorConfig

DISC_KEYS = ('disc_s', 'disc_t')


@DETECTORS.register_module()
class CyDAFasterRCNN(nn.Module):
    num_classes: int = 8
    pretraining: bool = False        # True = CyCADA translation phase
    cycle_weight: float = 10.0
    gan_weight: float = 1.0
    global_weight: float = 0.1
    gen_blocks: int = 6
    backbone_depth: int = 50
    frozen_stages: int = 1
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
        self.gen_s2t = ResnetGenerator(n_blocks=self.gen_blocks)
        self.gen_t2s = ResnetGenerator(n_blocks=self.gen_blocks)
        self.disc_s = PatchDiscriminator()
        self.disc_t = PatchDiscriminator()
        self.backbone = DAResNet(
            depth=self.backbone_depth, frozen_stages=self.frozen_stages,
            taps=(Tap(3, 'global', 'cbam'),), dtype=self.dtype)
        self.rpn_head = RPNHead(
            feat_channels=2048, num_anchors=self.anchor_cfg.num_anchors,
            dtype=self.dtype)
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes, dtype=self.dtype)

    def _anchors_for(self, feat):
        h, w = feat.shape[-3], feat.shape[-2]
        return jnp.asarray(self.anchor_cfg.grid_anchors(h, w))

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        img = batch['image']
        domain = batch['domain']
        b = img.shape[0]
        assert b % 2 == 0, 'CyDA needs interleaved [s,t,...] batches'
        # static per-domain split (two-stream layout: even rows = source)
        src = img[0::2]
        tgt = img[1::2]

        # scale normalized images into tanh range and back
        scale = 2.7  # ~max |value| of ImageNet-normalized pixels
        fake_t = self.gen_s2t(src / scale) * scale
        fake_s = self.gen_t2s(tgt / scale) * scale
        rec_s = self.gen_t2s(fake_t / scale) * scale
        rec_t = self.gen_s2t(fake_s / scale) * scale

        losses: Dict[str, jnp.ndarray] = {}
        losses['cycle_loss'] = (
            cycle_consistency_loss(src, rec_s, self.cycle_weight) +
            cycle_consistency_loss(tgt, rec_t, self.cycle_weight))
        losses['gan_g_loss'] = self.gan_weight * (
            gan_lsgan_loss(self.disc_t(fake_t), True) +
            gan_lsgan_loss(self.disc_s(fake_s), True))
        # discriminator objective — fakes detached (D must not train G)
        losses['disc_loss'] = 0.5 * (
            gan_lsgan_loss(self.disc_t(tgt), True) +
            gan_lsgan_loss(self.disc_t(jax.lax.stop_gradient(fake_t)), False) +
            gan_lsgan_loss(self.disc_s(src), True) +
            gan_lsgan_loss(self.disc_s(jax.lax.stop_gradient(fake_s)), False))

        if self.pretraining:   # CyCADA: translation phase only
            return losses

        # detection on [translated source | raw target]
        det_img = img.at[0::2].set(fake_t)
        source_mask = (domain == 0).astype(jnp.float32)
        (feat,), da_out = self.backbone(det_img.astype(self.dtype), train=True)
        anchors = self._anchors_for(feat)
        rpn_cls, rpn_reg = self.rpn_head(feat)
        losses.update(rpn_loss(
            rpn_cls, rpn_reg, anchors, batch['gt_bboxes'], batch['gt_valid'],
            batch['img_shape'], self.make_rng('sampler'), self.rpn_train_cfg,
            loss_weight_mask=source_mask))
        proposals, _, prop_valid = rpn_proposals(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_reg),
            anchors, batch['img_shape'], self.rpn_proposal_cfg)
        sampled = sample_rois(proposals, prop_valid, batch['gt_bboxes'],
                              batch['gt_labels'], batch['gt_valid'],
                              self.make_rng('sampler'), self.num_classes,
                              self.roi_train_cfg)
        roi_feats = extract_roi_feats(feat, sampled.rois, self.featmap_stride,
                                      flatten=True)
        cls, reg, _ = self.bbox_head(roi_feats)
        losses.update(bbox_loss(cls, reg, sampled, self.num_classes,
                                self.roi_train_cfg,
                                loss_weight_mask=source_mask))
        for name, out in da_out.items():
            if name.startswith('global'):
                losses['globle_da_loss'] = self.global_weight * \
                    global_alignment_loss(out, domain)
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Vanilla two-stage inference — no translation at test time
        (reference `CyDAFaster_rcnn.py` inherits simple_test)."""
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

    def translate(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Source→target translation of a full batch (CyCADA export path)."""
        scale = 2.7
        return self.gen_s2t(batch['image'] / scale) * scale

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
