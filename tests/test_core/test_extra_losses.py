"""Golden-value tests for the second-wave losses, incl. a torch
transcription of seesaw (`mmdet/models/losses/seesaw_loss.py:12`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.losses import (
    seesaw_ce_loss, dice_loss, ae_loss,
    knowledge_distillation_kl_div_loss, mse_loss, isr_p_weights,
    carl_weights)


class TestSeesaw:
    def test_vs_torch_transcription(self):
        torch = pytest.importorskip('torch')
        import torch.nn.functional as F
        rs = np.random.RandomState(0)
        N, C = 12, 6
        logits = rs.randn(N, C).astype(np.float32)
        labels = rs.randint(0, C, N)
        cum = rs.randint(0, 100, C).astype(np.float32)
        p, q, eps = 0.8, 2.0, 1e-2

        t_logits = torch.from_numpy(logits)
        t_labels = torch.from_numpy(labels)
        t_cum = torch.from_numpy(cum)
        onehot = F.one_hot(t_labels, C)
        seesaw = t_logits.new_ones(onehot.size())
        ratio = t_cum[None, :].clamp(min=1) / t_cum[:, None].clamp(min=1)
        idx = (ratio < 1.0).float()
        sw = ratio.pow(p) * idx + (1 - idx)
        seesaw = seesaw * sw[t_labels.long(), :]
        scores = F.softmax(t_logits.detach(), dim=1)
        self_sc = scores[torch.arange(N), t_labels.long()]
        sm = scores / self_sc[:, None].clamp(min=eps)
        idx = (sm > 1.0).float()
        seesaw = seesaw * (sm.pow(q) * idx + (1 - idx))
        adj = t_logits + (seesaw.log() * (1 - onehot))
        gold = F.cross_entropy(adj, t_labels, reduction='none').numpy()

        ours = np.asarray(seesaw_ce_loss(jnp.asarray(logits),
                                         jnp.asarray(labels),
                                         jnp.asarray(cum), p, q, eps))
        np.testing.assert_allclose(ours, gold, atol=1e-5)

    def test_rare_class_mitigated(self):
        # label = common class: the rare competitor's logit gets the
        # mitigation factor (cum_rare/cum_common)^p < 1, lowering the loss
        # (less suppression pressure on the rare class)
        logits = jnp.zeros((1, 2))
        cum = jnp.asarray([1000.0, 1.0])
        l_common = seesaw_ce_loss(logits, jnp.asarray([0]), cum)
        l_base = seesaw_ce_loss(logits, jnp.asarray([0]),
                                jnp.asarray([1.0, 1.0]))
        assert float(l_common[0]) < float(l_base[0])


class TestDice:
    def test_perfect_prediction_near_zero(self):
        t = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8) > 0.5,
                        jnp.float32)
        logits = (t * 2 - 1) * 20.0
        l = dice_loss(logits, t)
        assert float(l.max()) < 1e-2

    def test_vs_hand_value(self):
        pred = jnp.asarray([[100.0, -100.0]])   # sigmoid -> [1, 0]
        tgt = jnp.asarray([[1.0, 1.0]])
        # dice = 2*1 / (1 + 2) = 2/3 -> loss ~ 1/3 (eps-shifted)
        l = float(dice_loss(pred, tgt, eps=0.0)[0])
        assert abs(l - (1 - 2 / 3)) < 1e-4


class TestAELoss:
    def test_identical_embeddings_pull_zero(self):
        tl = jnp.asarray([1.0, 5.0, 0.0])
        br = jnp.asarray([1.0, 5.0, 0.0])
        valid = jnp.asarray([True, True, False])
        pull, push = ae_loss(tl, br, valid)
        assert float(pull) == 0.0
        # embeddings 1 and 5 are far apart -> push 0 at margin 1
        assert float(push) == 0.0

    def test_close_objects_pushed(self):
        tl = jnp.asarray([1.0, 1.2])
        br = jnp.asarray([1.0, 1.2])
        pull, push = ae_loss(tl, br, jnp.asarray([True, True]))
        # means 1.0 and 1.2 -> margin violation 0.8 each way / (2*1)
        np.testing.assert_allclose(float(push), 0.8, atol=1e-5)

    def test_single_object_no_push(self):
        pull, push = ae_loss(jnp.asarray([1.0]), jnp.asarray([3.0]),
                             jnp.asarray([True]))
        np.testing.assert_allclose(float(pull), 2.0, atol=1e-5)  # (±1)²·2/1
        assert float(push) == 0.0


class TestKDAndMSE:
    def test_kd_zero_when_equal(self):
        x = jnp.asarray(np.random.RandomState(1).randn(4, 10),
                        jnp.float32)
        l = knowledge_distillation_kl_div_loss(x, x, T=2.0)
        assert float(jnp.abs(l).max()) < 1e-5

    def test_kd_positive_and_scaled(self):
        a = jnp.zeros((1, 4))
        b = jnp.asarray([[10.0, 0, 0, 0]])
        l2 = knowledge_distillation_kl_div_loss(a, b, T=2.0)
        assert float(l2[0]) > 0

    def test_mse(self):
        assert float(mse_loss(jnp.asarray([2.0]), jnp.asarray([0.5]))[0]) \
            == 2.25


class TestPISA:
    def test_isr_higher_iou_higher_weight(self):
        scores = jnp.zeros((4,))
        ious = jnp.asarray([0.9, 0.6, 0.95, 0.5])
        labels = jnp.asarray([0, 0, 1, 1])
        valid = jnp.ones((4,), bool)
        w = np.asarray(isr_p_weights(scores, ious, labels, valid,
                                     num_classes=2))
        assert w[0] > w[1]          # class 0: higher IoU ranks first
        assert w[2] > w[3]
        np.testing.assert_allclose(w.sum(), 4.0, rtol=1e-5)  # renormalized

    def test_carl_monotone(self):
        s = jnp.asarray([0.9, 0.1, 0.5])
        v = jnp.ones((3,), bool)
        w = np.asarray(carl_weights(s, v))
        assert w[0] > w[2] > w[1]
        np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-5)
