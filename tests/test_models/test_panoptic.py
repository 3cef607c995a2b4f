"""PanopticFPN: train losses (incl. semantic), predict + heuristic fusion."""
import jax
import jax.numpy as jnp
import numpy as np

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors import (
    INSTANCE_OFFSET, PanopticFPN, heuristic_fuse)


def _batch(b=1, size=64, g=4):
    rs = np.random.RandomState(0)
    return dict(
        image=jnp.asarray(rs.rand(b, size, size, 3), jnp.float32),
        gt_bboxes=jnp.broadcast_to(
            jnp.asarray([[4, 4, 30, 30], [10, 10, 50, 40],
                         [0, 0, 0, 0], [0, 0, 0, 0]], jnp.float32),
            (b, g, 4)),
        gt_labels=jnp.zeros((b, g), jnp.int32),
        gt_valid=jnp.broadcast_to(jnp.asarray([True, True, False, False]),
                                  (b, g)),
        gt_masks=jnp.ones((b, g, 28, 28), jnp.float32),
        gt_semantic_seg=jnp.asarray(
            rs.randint(0, 4, (b, size, size)), jnp.int32),
        img_shape=jnp.full((b, 2), float(size)),
    )


def test_panoptic_fpn_train_and_fuse():
    m = PanopticFPN(num_classes=4, num_stuff=3, backbone_depth=18)
    batch = _batch()
    rngs = {'params': jax.random.PRNGKey(0),
            'sampler': jax.random.PRNGKey(1)}
    v = m.init(rngs, batch)
    losses = m.apply(v, batch, rngs={'sampler': jax.random.PRNGKey(2)})
    assert 'loss_semantic' in losses and 'loss_mask' in losses
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)

    preds = m.apply(v, batch, train=False)
    assert preds['semantic'].shape[-1] == 4          # stuff + 1
    pan = heuristic_fuse(
        np.asarray(preds['dets'][0]), np.asarray(preds['labels'][0]),
        np.asarray(preds['valid'][0]), np.asarray(preds['masks'][0]),
        np.asarray(preds['semantic'][0]), (64, 64),
        num_things=4, num_stuff=3, stuff_area_limit=16)
    assert pan.shape == (64, 64)


def test_heuristic_fuse_instance_priority():
    """Higher-score instance keeps contested pixels; stuff fills the rest."""
    dets = np.asarray([[0, 0, 32, 32, 0.9], [16, 16, 48, 48, 0.5]],
                      np.float32)
    labels = np.asarray([1, 2])
    valid = np.asarray([True, True])
    masks = np.ones((2, 28, 28), np.float32)
    semantic = np.zeros((16, 16, 4), np.float32)
    semantic[..., 0] = 1.0                            # stuff 0 everywhere
    pan = heuristic_fuse(dets, labels, valid, masks, semantic, (64, 64),
                         num_things=4, num_stuff=3, stuff_area_limit=16)
    assert pan[8, 8] == 1 + INSTANCE_OFFSET * 1       # first instance
    assert pan[40, 40] == 2 + INSTANCE_OFFSET * 2     # second instance
    assert pan[60, 60] == 4 + 0                       # stuff 0 → 4+0
