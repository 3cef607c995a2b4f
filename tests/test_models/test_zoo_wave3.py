"""Forward tests for detector wave 3: NASFCOS, LAD, TridentFasterRCNN,
QueryInst, SCNet."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors import (
    LAD, NASFCOS, QueryInst, SCNet, TridentFasterRCNN)


def _batch(b=1, size=64, g=4, masks=False):
    d = dict(
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
    if masks:
        d['gt_masks'] = jnp.ones((b, g, 28, 28), jnp.float32)
    return d


def _rngs():
    return {'params': jax.random.PRNGKey(0),
            'sampler': jax.random.PRNGKey(1)}


def test_nasfcos():
    m = NASFCOS(num_classes=4, backbone_depth=18)
    batch = _batch()
    v = m.init(_rngs(), batch)
    losses = m.apply(v, batch)
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)
    preds = m.apply(v, batch, train=False)
    assert preds['dets'].shape[-1] == 5


def test_lad_teacher_drives_assignment_not_grads():
    m = LAD(num_classes=4, backbone_depth=18, teacher_depth=18)
    batch = _batch()
    v = m.init(_rngs(), batch)
    losses = m.apply(v, batch)
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)

    def total(p):
        out = m.apply({'params': p, **{k: v[k] for k in v if k != 'params'}},
                      batch)
        return sum(jnp.sum(x) for x in out.values())

    g = jax.grad(total)(v['params'])
    t_mx = max(float(jnp.abs(l).max())
               for l in jax.tree_util.tree_leaves(g['teacher']))
    assert t_mx == 0.0


def test_trident():
    m = TridentFasterRCNN(num_classes=4, backbone_depth=50)
    batch = _batch()
    v = m.init(_rngs(), batch)
    losses = m.apply(v, batch, rngs={'sampler': jax.random.PRNGKey(2)})
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)
    # trident stage weights shared: layer3 blocks hold ONE conv2 kernel
    l3 = v['params']['backbone']['layer3/0']
    assert 'conv2_w' in l3
    preds = m.apply(v, batch, train=False)
    assert preds['dets'].shape[-1] == 5


def test_queryinst():
    m = QueryInst(num_classes=4, backbone_depth=18, num_stages=2,
                  num_proposals=8)
    batch = _batch(masks=True)
    v = m.init(_rngs(), batch)
    losses = m.apply(v, batch)
    assert 'loss_mask' in losses
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)
    preds = m.apply(v, batch, train=False)
    assert 'masks' in preds and preds['dets'].shape[-1] == 5


def test_scnet():
    m = SCNet(num_classes=4, backbone_depth=18, num_samples=32)
    batch = _batch(masks=True)
    v = m.init(_rngs(), batch)
    losses = m.apply(v, batch, rngs={'sampler': jax.random.PRNGKey(2)})
    assert 'loss_glbctx' in losses and 'loss_mask' in losses
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)
    preds = m.apply(v, batch, train=False)
    assert 'masks' in preds


def test_pisa_retinanet():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors import PISARetinaNet
    m = PISARetinaNet(num_classes=4, backbone_depth=18)
    batch = _batch()
    v = m.init(_rngs(), batch)
    losses = m.apply(v, batch)
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)
    preds = m.apply(v, batch, train=False)
    assert preds['dets'].shape[-1] == 5


def test_pisa_ssdlite():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors import PISASSDLite
    m = PISASSDLite(num_classes=4)
    batch = _batch(size=128)
    v = m.init(_rngs(), batch)
    losses = m.apply(v, batch)
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)


def test_centripetalnet():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors import CentripetalNet
    m = CentripetalNet(num_classes=4, stage_channels=(32, 32, 48),
                       stage_blocks=(1, 1, 1), downsample_times=2,
                       num_stacks=1, corner_topk=16, max_per_img=16)
    batch = _batch()
    v = m.init(_rngs(), batch)
    losses = m.apply(v, batch)
    assert 'loss_centripetal' in losses
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)
    preds = m.apply(v, batch, train=False)
    assert preds['dets'].shape[-1] == 5


def test_detectors_htc_rfp_sac():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.necks import DetectoRSHTC
    m = DetectoRSHTC(num_classes=4, backbone_depth=50, num_samples=32,
                     with_semantic=False)
    batch = _batch(masks=True)
    v = m.init(_rngs(), batch)
    # RFP shares one backbone across both steps: params hold ONE rfp trunk
    assert 'rfp' in v['params'] and 'backbone' in v['params']['rfp']
    losses = m.apply(v, batch, rngs={'sampler': jax.random.PRNGKey(2)})
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)
    preds = m.apply(v, batch, train=False)
    assert preds['dets'].shape[-1] == 5
