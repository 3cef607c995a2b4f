"""CycleGAN DA detector tests: translation shapes, two-group training step,
discriminator/generator separation."""

import numpy as np
import jax
import jax.numpy as jnp

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.cyda_faster_rcnn import (
    CyDAFasterRCNN, DISC_KEYS)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.da.cyclegan import (
    ResnetGenerator, PatchDiscriminator)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads.rpn_head import (
    ProposalConfig)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.roi_heads.standard_roi_head import (
    RoITrainConfig, RoITestConfig)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis import (
    OptimizerSpec, create_gan_train_state, make_gan_train_step)

from .test_forward import demo_batch

SMALL = dict(
    backbone_depth=18, num_classes=3, gen_blocks=2,
    rpn_proposal_cfg=ProposalConfig(nms_pre=128, max_per_img=32,
                                    nms_tile=128),
    rpn_test_cfg=ProposalConfig(nms_pre=128, max_per_img=32, nms_tile=128),
    roi_train_cfg=RoITrainConfig(num_samples=16),
    roi_test_cfg=RoITestConfig(max_per_img=8, nms_pre=128, nms_tile=128),
)


def test_generator_discriminator_shapes():
    k = jax.random.PRNGKey(0)
    g = ResnetGenerator(base=16, n_blocks=2)
    x = jnp.ones((1, 32, 32, 3))
    v = g.init(k, x)
    y = g.apply(v, x)
    assert y.shape == x.shape
    assert float(jnp.abs(y).max()) <= 1.0  # tanh bounded
    d = PatchDiscriminator(base=16)
    vd = d.init(k, x)
    logits = d.apply(vd, x)
    assert logits.shape[-1] == 1


def _init(model, batch):
    k = jax.random.PRNGKey(0)
    return model.init({'params': k, 'sampler': k, 'dropout': k}, batch,
                      train=True)


def test_cyda_loss_terms():
    model = CyDAFasterRCNN(**SMALL)
    batch = demo_batch(b=2, h=32, w=32)
    variables = _init(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    expected = {'cycle_loss', 'gan_g_loss', 'disc_loss', 'loss_rpn_cls',
                'loss_rpn_bbox', 'loss_cls', 'loss_bbox', 'globle_da_loss'}
    assert set(losses) == expected
    for key, v in losses.items():
        assert np.isfinite(float(v)), key


def test_cycada_pretraining_mode():
    model = CyDAFasterRCNN(pretraining=True, **SMALL)
    batch = demo_batch(b=2, h=32, w=32)
    variables = _init(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    assert set(losses) == {'cycle_loss', 'gan_g_loss', 'disc_loss'}


def test_gan_train_step_two_groups():
    model = CyDAFasterRCNN(pretraining=True, **SMALL)
    batch = demo_batch(b=2, h=32, w=32)
    variables = _init(model, batch)
    state, tx_main, tx_disc = create_gan_train_state(
        model, variables,
        OptimizerSpec(lr=0.05, warmup_iters=0, warmup_ratio=1.0))
    step = jax.jit(make_gan_train_step(model, tx_main, tx_disc))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics['loss']))
    # both groups updated
    for key in DISC_KEYS:
        d0 = jax.tree_util.tree_leaves(state.params[key])[0]
        d1 = jax.tree_util.tree_leaves(new_state.params[key])[0]
        assert np.abs(np.asarray(d0) - np.asarray(d1)).max() > 0
    g0 = jax.tree_util.tree_leaves(state.params['gen_s2t'])[0]
    g1 = jax.tree_util.tree_leaves(new_state.params['gen_s2t'])[0]
    assert np.abs(np.asarray(g0) - np.asarray(g1)).max() > 0


def test_cyda_predict_vanilla():
    model = CyDAFasterRCNN(**SMALL)
    batch = demo_batch(b=2, h=32, w=32)
    variables = _init(model, batch)
    dets = model.apply(variables, batch, train=False)
    assert dets['dets'].shape == (2, 8, 5)
