"""Detector forward/train/predict integration tests.

Mirrors the reference `tests/test_models/test_forward.py` strategy
(`_demo_mm_inputs:440`): fabricate deterministic fake batches, run train
forward (finite loss dict) and test forward (detections) with no data or
weights. Adds what the reference never had: DA-variant coverage and a
multi-device sharded train step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models import (
    FasterRCNN, DAFasterRCNN)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads.rpn_head import (
    ProposalConfig)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.roi_heads.standard_roi_head import (
    RoITrainConfig, RoITestConfig)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis import (
    OptimizerSpec, create_train_state, make_train_step)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.parallel import (
    make_mesh, shard_batch, replicate_state)


def demo_batch(b=2, h=64, w=96, g=10, num_classes=3, seed=0):
    """Deterministic fake two-stream batch (the `_demo_mm_inputs` analogue)."""
    rng = np.random.RandomState(seed)
    boxes = rng.uniform(0, 40, (b, g, 4)).astype(np.float32)
    boxes[..., 2:] += boxes[..., :2] + 8
    return dict(
        image=jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        img_shape=jnp.asarray([[h, w]] * b, jnp.int32),
        gt_bboxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(rng.randint(0, num_classes, (b, g)), jnp.int32),
        gt_valid=jnp.asarray(
            np.arange(g)[None, :] < rng.randint(1, 4, (b, 1))),
        domain=jnp.asarray([i % 2 for i in range(b)], jnp.int32),
    )


SMALL = dict(
    backbone_depth=18, num_classes=3,
    rpn_proposal_cfg=ProposalConfig(nms_pre=256, max_per_img=64,
                                    nms_tile=128),
    rpn_test_cfg=ProposalConfig(nms_pre=256, max_per_img=64, nms_tile=128),
    roi_train_cfg=RoITrainConfig(num_samples=32),
    roi_test_cfg=RoITestConfig(max_per_img=10, nms_pre=128, nms_tile=128),
)


def init_model(model, batch):
    k = jax.random.PRNGKey(0)
    return model.init({'params': k, 'sampler': k, 'dropout': k}, batch,
                      train=True)


def test_faster_rcnn_train_and_test_forward():
    model = FasterRCNN(**SMALL)
    batch = demo_batch()
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    assert set(losses) == {'loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls',
                           'loss_bbox'}
    for v in losses.values():
        assert np.isfinite(float(v))
    dets = model.apply(variables, batch, train=False)
    assert dets['dets'].shape == (2, 10, 5)
    assert dets['labels'].shape == (2, 10)


@pytest.mark.parametrize('variant,instance_mode,expected_extra', [
    ('daf', 'grouped', {'globle_da_loss', 'patch_bottom_loss',
                        'local_da_loss'}),
    ('maf', 'split_plain', {'globle_da_loss', 'local_da_loss'}),
    ('swda', 'grouped', {'globle_da_loss', 'patch_bottom_loss',
                         'local_da_loss'}),
    ('daf_org', 'plain', {'img_da_loss', 'local_da_loss', 'consist_loss'}),
    ('deep', 'grouped', {'globle_da_loss', 'patch_bottom_loss',
                         'local_da_loss'}),
])
def test_da_variants_train_forward(variant, instance_mode, expected_extra):
    model = DAFasterRCNN(variant=variant, instance_mode=instance_mode,
                         **SMALL)
    batch = demo_batch()
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    base = {'loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls', 'loss_bbox'}
    assert set(losses) == base | expected_extra
    for key, v in losses.items():
        assert np.isfinite(float(v)), key


def test_da_source_only_supervision():
    """Supervised losses must ignore target rows: an all-target batch gives
    zero supervised loss (the reference zero-fills instead,
    `DAFaster_rcnn.py:144-147`)."""
    model = DAFasterRCNN(**SMALL)
    batch = demo_batch()
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(1)
    batch_tgt = dict(batch, domain=jnp.ones((2,), jnp.int32))
    losses, _ = model.apply(variables, batch_tgt, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    assert float(losses['loss_rpn_cls']) == 0.0
    assert float(losses['loss_cls']) == 0.0
    # adversarial losses still active
    assert float(losses['globle_da_loss']) > 0.0


def test_train_step_updates_params_and_respects_freezing():
    model = DAFasterRCNN(**SMALL)
    batch = demo_batch()
    variables = init_model(model, batch)
    state, tx = create_train_state(
        model, variables,
        OptimizerSpec(lr=0.1, warmup_iters=0, warmup_ratio=1.0),
        frozen_stages=1)
    step = jax.jit(make_train_step(model, tx))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics['loss']))
    p0 = variables['params']['backbone']['trunk']
    p1 = new_state.params['backbone']['trunk']
    # frozen stem/layer1 unchanged
    np.testing.assert_array_equal(
        np.asarray(p0['conv1']['kernel']), np.asarray(p1['conv1']['kernel']))
    # live layer4 changed (block modules are named 'layer4/<i>')
    l4_key = next(k for k in p0 if k.startswith('layer4'))
    l4_0 = jax.tree_util.tree_leaves(p0[l4_key])[0]
    l4_1 = jax.tree_util.tree_leaves(p1[l4_key])[0]
    assert np.abs(np.asarray(l4_0) - np.asarray(l4_1)).max() > 0


def test_multichip_sharded_train_step():
    """The fake-cluster test the reference lacks (SURVEY.md §4): full DA
    train step over an 8-device mesh with the two-stream batch sharded on
    'data'."""
    assert len(jax.devices()) >= 8, 'conftest must provide 8 CPU devices'
    model = DAFasterRCNN(**SMALL)
    batch = demo_batch(b=8)
    variables = init_model(model, batch)
    state, tx = create_train_state(model, variables, OptimizerSpec())
    mesh = make_mesh(8)
    with mesh:
        sharded = shard_batch(
            {k: np.asarray(v) for k, v in batch.items()}, mesh)
        state = replicate_state(state, mesh)
        step = jax.jit(make_train_step(model, tx))
        new_state, metrics = step(state, sharded, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics['loss']))
        # params remain replicated (single shard each)
        leaf = jax.tree_util.tree_leaves(new_state.params)[0]
        assert leaf.sharding.is_fully_replicated


def test_bf16_train_and_predict():
    """bf16 compute path: finite losses and valid detections (losses are
    computed in fp32 internally)."""
    model = DAFasterRCNN(dtype=jnp.bfloat16, **SMALL)
    batch = demo_batch()
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    for key, v in losses.items():
        assert v.dtype == jnp.float32, key
        assert np.isfinite(float(v)), key
    dets = model.apply(variables, batch, train=False)
    assert dets['dets'].dtype == jnp.float32


def test_retinanet_forward():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models import RetinaNet
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads.anchor_head import (
        MultiAnchorConfig, DensePredictConfig)
    model = RetinaNet(
        backbone_depth=18, num_classes=3,
        anchor_cfg=MultiAnchorConfig(strides=(8, 16, 32, 64, 128)),
        test_cfg=DensePredictConfig(nms_pre=200, max_per_img=10,
                                    nms_tile=128))
    batch = demo_batch(h=64, w=64)
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    assert set(losses) == {'loss_cls', 'loss_bbox'}
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    dets = model.apply(variables, batch, train=False)
    assert dets['dets'].shape == (2, 10, 5)


def test_faster_rcnn_fpn_forward():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models import FasterRCNNFPN
    model = FasterRCNNFPN(
        backbone_depth=18, num_classes=3,
        rpn_proposal_cfg=ProposalConfig(nms_pre=256, max_per_img=64,
                                        nms_tile=128),
        rpn_test_cfg=ProposalConfig(nms_pre=256, max_per_img=64,
                                    nms_tile=128),
        roi_train_cfg=RoITrainConfig(num_samples=32, use_sigmoid_cls=False),
        roi_test_cfg=RoITestConfig(max_per_img=10, nms_pre=128,
                                   nms_tile=128))
    batch = demo_batch(h=64, w=64)
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    assert set(losses) == {'loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls',
                           'loss_bbox'}
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    dets = model.apply(variables, batch, train=False)
    assert dets['dets'].shape == (2, 10, 5)


def test_swin_backbone_and_deepalign_swin():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.backbones.swin import (
        SwinTransformer)
    model = SwinTransformer(embed_dims=32, depths=(1, 1, 2, 1),
                            num_heads=(1, 2, 4, 8), window_size=4)
    x = jnp.ones((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(v, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 32), (1, 8, 8, 64), (1, 4, 4, 128), (1, 2, 2, 256)]

    # DeepAlign on a Swin trunk (BASELINE.json target config), stride 32
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.faster_rcnn import (
        AnchorConfig)
    det = DAFasterRCNN(
        variant='deep', backbone_type='swin', featmap_stride=32,
        anchor_cfg=AnchorConfig(stride=32), num_classes=3,
        rpn_proposal_cfg=ProposalConfig(nms_pre=128, max_per_img=32,
                                        nms_tile=128),
        rpn_test_cfg=ProposalConfig(nms_pre=128, max_per_img=32,
                                    nms_tile=128),
        roi_train_cfg=RoITrainConfig(num_samples=16),
        roi_test_cfg=RoITestConfig(max_per_img=8, nms_pre=128, nms_tile=128))
    batch = demo_batch(h=64, w=64)
    variables = init_model(det, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = det.apply(variables, batch, train=True,
                          rngs={'sampler': k, 'dropout': k},
                          mutable=['batch_stats'])
    for key, v_ in losses.items():
        assert np.isfinite(float(v_)), key
    assert 'globle_da_loss' in losses and 'patch_bottom_loss' in losses


def test_mask_rcnn_c4_forward():
    """Shared-res5 C4 assembly (reference
    `configs/_base_/models/mask_rcnn_r50_caffe_c4.py:37-48`): RoI trunk is
    res5 at stride 2 on 14×14 crops; mask branch reuses the shared feats."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.mask_rcnn_c4 import (
        MaskRCNNC4)
    model = MaskRCNNC4(**SMALL)
    batch = demo_batch()
    batch['gt_masks'] = jnp.ones((2, 10, 28, 28), jnp.float32)
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k},
                            mutable=['batch_stats'])
    assert {'loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls', 'loss_bbox',
            'loss_mask'} <= set(losses)
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    # res5 params live under the RoI head's shared trunk, not the backbone
    assert 'shared_head' in variables['params']
    assert 'stage3' not in str(variables['params']['backbone'].keys())
    dets = model.apply(variables, batch, train=False)
    assert dets['dets'].shape[-1] == 5
    assert dets['masks'].shape[-2:] == (14, 14)


def test_deepalign_swin_stride16_tap():
    """featmap_stride=16 on the swin trunk must tap stage 2 (stride 16,
    384 ch) so RoIAlign/anchors/tap stay aligned — the r5 fix for the
    stride-32 recipe whose anchors never matched small objects
    (synth_swin_deepalign.py v2)."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.faster_rcnn import (
        AnchorConfig)
    det = DAFasterRCNN(
        variant='deep', backbone_type='swin', featmap_stride=16,
        anchor_cfg=AnchorConfig(stride=16), num_classes=3,
        rpn_proposal_cfg=ProposalConfig(nms_pre=128, max_per_img=32,
                                        nms_tile=128),
        rpn_test_cfg=ProposalConfig(nms_pre=128, max_per_img=32,
                                    nms_tile=128),
        roi_train_cfg=RoITrainConfig(num_samples=16),
        roi_test_cfg=RoITestConfig(max_per_img=8, nms_pre=128, nms_tile=128))
    batch = demo_batch(h=64, w=64)
    variables = init_model(det, batch)
    # the tap must be the stride-16 stage: backbone params exist for
    # out_norm2-normalised features feeding a 384-dim path, and the loss
    # step runs finite end to end
    k = jax.random.PRNGKey(1)
    losses, _ = det.apply(variables, batch, train=True,
                          rngs={'sampler': k, 'dropout': k},
                          mutable=['batch_stats'])
    for key, v_ in losses.items():
        assert np.isfinite(float(v_)), key


def test_fcos_forward():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.fcos import FCOS
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads.anchor_head import (
        DensePredictConfig)
    model = FCOS(backbone_depth=18, num_classes=3,
                 test_cfg=DensePredictConfig(nms_pre=200, max_per_img=10,
                                             nms_tile=128))
    batch = demo_batch(h=64, w=64)
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    assert set(losses) == {'loss_cls', 'loss_bbox', 'loss_centerness'}
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    dets = model.apply(variables, batch, train=False)
    assert dets['dets'].shape == (2, 10, 5)


def test_cascade_rcnn_forward():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.cascade_rcnn import (
        CascadeRCNN)
    model = CascadeRCNN(
        backbone_depth=18, num_classes=3, num_samples=16,
        rpn_proposal_cfg=ProposalConfig(nms_pre=256, max_per_img=32,
                                        nms_tile=128),
        rpn_test_cfg=ProposalConfig(nms_pre=256, max_per_img=32,
                                    nms_tile=128),
        roi_test_cfg=RoITestConfig(max_per_img=8, nms_pre=128, nms_tile=128))
    batch = demo_batch(h=64, w=64)
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    # rpn + 3 stages x (cls, bbox)
    assert {'loss_rpn_cls', 'loss_rpn_bbox', 's0.loss_cls', 's1.loss_cls',
            's2.loss_cls', 's0.loss_bbox', 's1.loss_bbox',
            's2.loss_bbox'} <= set(losses)
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    dets = model.apply(variables, batch, train=False)
    assert dets['dets'].shape == (2, 8, 5)


def test_dp_tp_mesh_train_step():
    """2-D (data × model) mesh: batch sharded on data, bbox-head FCs
    tensor-parallel on model — GSPMD inserts the collectives."""
    import numpy as onp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.parallel.shardings import (
        param_shardings)
    assert len(jax.devices()) >= 8
    devices = onp.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ('data', 'model'))
    model = DAFasterRCNN(**SMALL)
    batch = demo_batch(b=8)
    variables = init_model(model, batch)
    state, tx = create_train_state(model, variables, OptimizerSpec())
    step = jax.jit(make_train_step(model, tx))
    with mesh:
        p_shard = param_shardings(state.params, mesh)
        params = jax.tree_util.tree_map(jax.device_put, state.params, p_shard)
        fc1 = params['bbox_head']['shared_fc1']['kernel']
        assert not fc1.sharding.is_fully_replicated  # actually TP-sharded
        repl = NamedSharding(mesh, P())
        state = state._replace(
            params=params,
            batch_stats=jax.tree_util.tree_map(
                lambda x: jax.device_put(x, repl), state.batch_stats),
            opt_state=jax.tree_util.tree_map(
                lambda x: jax.device_put(x, repl), state.opt_state),
            step=jax.device_put(state.step, repl))
        sharded = {k: jax.device_put(onp.asarray(v),
                                     NamedSharding(mesh, P('data')))
                   for k, v in batch.items()}
        new_state, metrics = step(state, sharded, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics['loss']))


def test_yolov3_forward():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.yolov3 import (
        YOLOV3)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads.anchor_head import (
        DensePredictConfig)
    model = YOLOV3(num_classes=3,
                   test_cfg=DensePredictConfig(nms_pre=200, max_per_img=10,
                                               nms_tile=128))
    batch = demo_batch(h=64, w=64)
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    assert set(losses) == {'loss_conf', 'loss_xy', 'loss_wh', 'loss_cls'}
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    dets = model.apply(variables, batch, train=False)
    assert dets['dets'].shape == (2, 10, 5)


def test_atss_forward():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.atss import ATSS
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads.anchor_head import (
        DensePredictConfig)
    model = ATSS(backbone_depth=18, num_classes=3, topk=4,
                 test_cfg=DensePredictConfig(nms_pre=200, max_per_img=10,
                                             nms_tile=128))
    batch = demo_batch(h=64, w=64)
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    assert set(losses) == {'loss_cls', 'loss_bbox', 'loss_centerness'}
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    dets = model.apply(variables, batch, train=False)
    assert dets['dets'].shape == (2, 10, 5)


def test_centernet_forward():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.centernet import (
        CenterNet, CenterNetTestConfig)
    model = CenterNet(backbone_depth=18, num_classes=3,
                      test_cfg=CenterNetTestConfig(topk=20))
    batch = demo_batch(h=64, w=64)
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    assert set(losses) == {'loss_center_heatmap', 'loss_wh', 'loss_offset'}
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    dets = model.apply(variables, batch, train=False)
    assert dets['dets'].shape == (2, 20, 5)


def test_ssdlite_forward():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.ssd import (
        SSDLite, SSDAnchors)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads.anchor_head import (
        DensePredictConfig)
    model = SSDLite(num_classes=3,
                    anchor_cfg=SSDAnchors(strides=(16, 32, 64, 128),
                                          base_sizes=(12, 24, 40, 56)),
                    test_cfg=DensePredictConfig(nms_pre=200, max_per_img=10,
                                                nms_tile=128))
    batch = demo_batch(h=128, w=128)
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    assert set(losses) == {'loss_cls', 'loss_bbox'}
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    dets = model.apply(variables, batch, train=False)
    assert dets['dets'].shape == (2, 10, 5)


def test_detr_forward():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.detr import (
        DETR, DETRTestConfig)
    model = DETR(backbone_depth=18, num_classes=3, num_queries=16,
                 enc_layers=2, dec_layers=2, embed_dim=64,
                 test_cfg=DETRTestConfig(max_per_img=10))
    batch = demo_batch(h=64, w=64)
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    # final layer + 1 aux layer
    assert {'loss_cls', 'loss_bbox', 'loss_iou', 'd0.loss_cls'} <= set(losses)
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    dets = model.apply(variables, batch, train=False)
    assert dets['dets'].shape == (2, 10, 5)


def test_detr_hungarian_matches_perfect_predictions():
    """With predictions exactly on the gt boxes the matched L1/GIoU losses
    are ~0 — verifies the in-jit Hungarian matching end-to-end."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.detr import (
        detr_layer_loss, _xyxy_to_cxcywh)
    gt = jnp.asarray([[[4., 4., 20., 20.], [30., 10., 50., 40.]]])
    gt_norm = _xyxy_to_cxcywh(gt / 64.0)
    gtl = jnp.asarray([[1, 2]])
    gtv = jnp.asarray([[True, True]])
    # predictions: queries 5 and 2 sit exactly on the gts, confident classes
    box = jnp.zeros((8, 4)).at[5].set(gt_norm[0, 0]).at[2].set(gt_norm[0, 1])
    box = jnp.clip(box, 1e-3, 1.0)
    cls = jnp.full((8, 4), 0.0).at[:, 3].set(5.0)   # default: background
    cls = cls.at[5].set(jnp.array([0., 10., 0., 0.]))
    cls = cls.at[2].set(jnp.array([0., 0., 10., 0.]))
    c_l, l_l, g_l = detr_layer_loss(cls, box, gt_norm[0], gtl[0], gtv[0],
                                    num_classes=3)
    assert float(l_l) < 1e-3
    assert float(g_l) < 1e-3
    assert float(c_l) < 0.1


def test_gfl_forward():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.gfl import GFL
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads.anchor_head import (
        DensePredictConfig)
    model = GFL(backbone_depth=18, num_classes=3, topk=4, reg_max=8,
                test_cfg=DensePredictConfig(nms_pre=200, max_per_img=10,
                                            nms_tile=128))
    batch = demo_batch(h=64, w=64)
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    assert set(losses) == {'loss_cls', 'loss_bbox', 'loss_dfl'}
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    dets = model.apply(variables, batch, train=False)
    assert dets['dets'].shape == (2, 10, 5)


def test_fcos_tricks_forward():
    """FCOS trick knobs (reference fcos_center-normbbox-centeronreg-giou
    rows): center sampling + DCN-on-last-conv + centerness placement."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.fcos import FCOS
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads.anchor_head import (
        DensePredictConfig)
    model = FCOS(backbone_depth=18, num_classes=3,
                 center_sampling=True, dcn_on_last_conv=True,
                 centerness_on_reg=False,
                 test_cfg=DensePredictConfig(nms_pre=200, max_per_img=10,
                                             nms_tile=128))
    batch = demo_batch(h=64, w=64)
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(1)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    assert set(losses) == {'loss_cls', 'loss_bbox', 'loss_centerness'}
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    # dcn offset conv params exist
    head = variables['params']['bbox_head']
    assert any('dcn' in key for key in head), sorted(head)[:8]


def test_yolov3_mobilenetv2_forward():
    """MobileNetV2-trunk YOLOv3 (reference configs/yolo/yolov3_mobilenetv2_*:
    neck/head widths 96, strides 8/16/32 taps)."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.yolov3 import YOLOV3
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads.anchor_head import (
        DensePredictConfig)
    model = YOLOV3(num_classes=3, backbone_cfg=dict(type='MobileNetV2'),
                   neck_channels=(96, 96, 96),
                   test_cfg=DensePredictConfig(nms_pre=100, max_per_img=10,
                                               nms_tile=64))
    batch = demo_batch(h=64, w=64)
    variables = init_model(model, batch)
    k = jax.random.PRNGKey(0)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k}, mutable=['batch_stats'])
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    dets = model.apply(variables, batch, train=False)
    assert dets['dets'].shape == (2, 10, 5)
