"""Forward tests for the region-proposal-centric wave: standalone RPN,
FastRCNN (precomputed proposals), GA-RPN / GA-RetinaNet, CascadeRPN."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors import (
    RPN, CascadeRPN, FastRCNN, GARetinaNet, GARPN)


def _batch(b=1, size=64, g=4):
    return dict(
        image=jnp.asarray(np.random.RandomState(0).rand(b, size, size, 3),
                          jnp.float32),
        gt_bboxes=jnp.broadcast_to(
            jnp.asarray([[4, 4, 30, 30], [10, 10, 50, 40],
                         [0, 0, 0, 0], [0, 0, 0, 0]], jnp.float32),
            (b, g, 4)),
        gt_labels=jnp.zeros((b, g), jnp.int32),
        gt_valid=jnp.broadcast_to(jnp.asarray([True, True, False, False]),
                                  (b, g)),
        img_shape=jnp.full((b, 2), float(size)),
    )


@pytest.mark.parametrize('cls', [RPN, GARPN, GARetinaNet, CascadeRPN],
                         ids=lambda c: c.__name__)
def test_train_and_inference_forward(cls):
    m = cls(num_classes=4, backbone_depth=18)
    batch = _batch()
    rngs = {'params': jax.random.PRNGKey(0),
            'sampler': jax.random.PRNGKey(1)}
    v = m.init(rngs, batch)
    losses = m.apply(v, batch, rngs={'sampler': jax.random.PRNGKey(2)})
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)
    preds = m.apply(v, batch, train=False)
    assert preds['dets'].shape[-1] == 5
    assert preds['labels'].shape == preds['valid'].shape


def test_fast_rcnn_with_precomputed_proposals():
    m = FastRCNN(num_classes=4, backbone_depth=18)
    batch = _batch()
    p = 32
    props = jnp.tile(jnp.asarray([[2, 2, 34, 34]], jnp.float32), (p, 1))
    jitter = jnp.arange(p, dtype=jnp.float32)[:, None] * jnp.asarray(
        [[1.0, 0.5, -0.5, -1.0]])
    batch['proposals'] = jnp.clip(props + jitter, 0, 63)[None]
    batch['proposals_valid'] = jnp.ones((1, p), bool)
    rngs = {'params': jax.random.PRNGKey(0),
            'sampler': jax.random.PRNGKey(1)}
    v = m.init(rngs, batch)
    losses = m.apply(v, batch, rngs={'sampler': jax.random.PRNGKey(2)})
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)
    preds = m.apply(v, batch, train=False)
    assert preds['dets'].shape[-1] == 5


def test_ga_loc_targets_make_positives():
    """A gt centered on the image must produce at least one positive
    location, so loss_shape gets a nonzero denominator path."""
    m = GARetinaNet(num_classes=4, backbone_depth=18)
    batch = _batch()
    rngs = {'params': jax.random.PRNGKey(0),
            'sampler': jax.random.PRNGKey(1)}
    v = m.init(rngs, batch)
    losses = m.apply(v, batch, rngs={'sampler': jax.random.PRNGKey(2)})
    assert float(losses['loss_loc']) > 0
