"""Unit tests for DA losses, clustering, and GRL adversarial direction."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.da import (
    global_alignment_loss, patch_ls_loss, consistency_loss,
    grouped_instance_loss, masked_kmeans, group_representatives,
    InstanceAlignmentHead, GlobalAlignmentHead, PixelAlignmentHead, SRMHead)


def test_global_alignment_loss_values():
    logits = jnp.array([[10., -10.], [-10., 10.]])
    domain = jnp.array([0, 1])
    assert float(global_alignment_loss(logits, domain)) == \
        pytest.approx(0.0, abs=1e-3)
    flipped = float(global_alignment_loss(logits, 1 - domain))
    assert flipped > 5.0


def test_global_alignment_quirk_detach():
    logits = jnp.array([[1., -1.]])
    domain = jnp.array([0])
    g = jax.grad(lambda l: global_alignment_loss(l, domain,
                                                 quirk_detach=True))(logits)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_patch_ls_loss_direction():
    # confident "source" logit map on a source image → low loss
    logit = jnp.full((1, 4, 4, 1), -10.0)   # sigmoid ≈ 0
    src = jnp.array([0])
    tgt = jnp.array([1])
    assert float(patch_ls_loss(logit, src)) == pytest.approx(0.0, abs=1e-3)
    assert float(patch_ls_loss(logit, tgt)) == pytest.approx(0.5, abs=1e-3)


def test_masked_kmeans_clusters():
    rng = np.random.RandomState(0)
    a = rng.randn(10, 8) + np.array([10.0] + [0] * 7)
    b = rng.randn(10, 8) + np.array([-10.0] + [0] * 7)
    feats = jnp.asarray(np.vstack([a, b, np.zeros((4, 8))]), jnp.float32)
    mask = jnp.asarray([True] * 20 + [False] * 4)
    cents = np.asarray(masked_kmeans(feats, mask, k=2, iters=5))
    signs = sorted(np.sign(cents[:, 0]).tolist())
    assert signs == [-1.0, 1.0]   # one centroid per blob


def test_group_representatives_padding():
    feats = jnp.asarray(np.random.RandomState(0).randn(8, 4), jnp.float32)
    mask = jnp.asarray([True, True, False, False, False, False, False, False])
    scores = jnp.asarray([0.9, 0.1, 0, 0, 0, 0, 0, 0])
    reps, valid = group_representatives(feats, mask, scores, k=4)
    assert reps.shape == (4, 4)
    assert bool(valid.all())
    # slots beyond the 2 valid rows are copies of the top-scoring feat
    np.testing.assert_allclose(np.asarray(reps[2]), np.asarray(feats[0]))
    np.testing.assert_allclose(np.asarray(reps[3]), np.asarray(feats[0]))


def test_group_representatives_empty_bucket():
    feats = jnp.zeros((4, 4))
    mask = jnp.zeros((4,), bool)
    reps, valid = group_representatives(feats, mask, jnp.zeros((4,)), k=2)
    assert not bool(valid.any())


def test_grouped_instance_loss_finite_and_grads():
    k = jax.random.PRNGKey(0)
    head_f = InstanceAlignmentHead()
    head_b = InstanceAlignmentHead()
    feats = jax.random.normal(k, (2, 8, 1024))
    vf = head_f.init({'params': k, 'dropout': k}, feats[0])
    vb = head_b.init({'params': k, 'dropout': k}, feats[0])
    cls = jax.random.normal(k, (2, 8, 3))
    valid = jnp.ones((2, 8), bool)
    domain = jnp.array([0, 1])

    def loss(vf_params):
        return grouped_instance_loss(
            lambda x: head_f.apply({'params': vf_params}, x,
                                   rngs={'dropout': k}),
            lambda x: head_b.apply(vb, x, rngs={'dropout': k}),
            feats, cls, valid, domain, k=4)

    val, g = jax.value_and_grad(loss)(vf['params'])
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(x)) for x in jax.tree_util.tree_leaves(g))


def test_consistency_loss():
    img_map = jnp.zeros((1, 4, 4, 1))          # sigmoid = 0.5
    ins = jnp.zeros((1, 6, 2))                  # sigmoid = 0.5
    v = jnp.ones((1, 6), bool)
    out = float(consistency_loss(img_map, ins, v, jnp.array([0])))
    assert out == pytest.approx(0.0, abs=1e-4)


def test_grl_adversarial_direction_in_head():
    """Trunk features receive NEGATED gradients through alignment heads:
    the loss decreases for the head params but the input gradient points
    toward INCREASING domain confusion."""
    k = jax.random.PRNGKey(0)
    head = SRMHead(channels=16)
    x = jax.random.normal(k, (2, 4, 4, 16))
    v = head.init({'params': k, 'dropout': k}, x)
    domain = jnp.array([0, 1])

    def loss_wrt_input(xx):
        logits = head.apply(v, xx, train=False,
                            mutable=False)
        return float('nan') * 0 + global_alignment_loss(logits, domain)

    def loss_no_grl(xx):
        # bypass GRL by negating twice
        from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.layers.grl import gradient_reverse
        return loss_wrt_input(gradient_reverse(xx, -1.0))

    g_with = jax.grad(loss_wrt_input)(x)
    g_without = jax.grad(loss_no_grl)(x)
    np.testing.assert_allclose(np.asarray(g_with), -np.asarray(g_without),
                               atol=1e-6)


def test_quirk_detach_blocks_trunk_gradients():
    """quirk_detach=True reproduces the reference's detached DA losses
    (`DAFaster_rcnn.py:325`, `resnet_da.py:846-849`): no gradient reaches
    the trunk through global/grouped-instance terms."""
    import jax
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models import DAFasterRCNN
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads.rpn_head import (
        ProposalConfig)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.roi_heads.standard_roi_head import (
        RoITrainConfig, RoITestConfig)
    from .test_forward import demo_batch, SMALL, init_model

    batch = demo_batch()
    batch = dict(batch, domain=jnp.ones((2,), jnp.int32))  # target-only rows
    for quirk, expect_zero in [(True, True), (False, False)]:
        model = DAFasterRCNN(quirk_detach=quirk, **SMALL)
        variables = init_model(model, batch)
        k = jax.random.PRNGKey(1)

        def da_only_loss(params):
            out, _ = model.apply(
                {'params': params,
                 'batch_stats': variables['batch_stats']},
                batch, train=True, rngs={'sampler': k, 'dropout': k},
                mutable=['batch_stats'])
            # supervised losses are 0 (all-target) → total = DA terms only
            return out['globle_da_loss'] + out['local_da_loss']

        g = jax.grad(da_only_loss)(variables['params'])
        trunk = g['backbone']['trunk']
        l4 = next(kk for kk in trunk if kk.startswith('layer4'))
        gmax = max(float(np.abs(np.asarray(v)).max())
                   for v in jax.tree_util.tree_leaves(trunk[l4]))
        if expect_zero:
            assert gmax == 0.0
        else:
            assert gmax > 0.0


def test_train_step_determinism():
    """Same seed → bitwise-identical metrics (set_random_seed equivalent)."""
    import jax
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models import DAFasterRCNN
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis import (
        OptimizerSpec, create_train_state, make_train_step)
    from .test_forward import demo_batch, SMALL, init_model

    model = DAFasterRCNN(**SMALL)
    batch = demo_batch()
    variables = init_model(model, batch)
    outs = []
    for _ in range(2):
        state, tx = create_train_state(model, variables, OptimizerSpec())
        step = jax.jit(make_train_step(model, tx))
        state, m1 = step(state, batch, jax.random.PRNGKey(7))
        state, m2 = step(state, batch, jax.random.PRNGKey(7))
        outs.append((float(m1['loss']), float(m2['loss'])))
    assert outs[0] == outs[1]
