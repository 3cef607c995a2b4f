"""Round-4 variant knobs, driven end to end (init → loss → finite).

Covers the reference rows closed this round: RepPoints transform_method
(`configs/reppoints/reppoints_{minmax,partial_minmax}_*`), Decoupled SOLO
(`configs/solo/decoupled_solo_*`), Deformable DETR plain/two-stage
(`configs/deformable_detr/*`), PISA SSD/Mask R-CNN (`configs/pisa/*`),
cascade seesaw (`configs/seesaw_loss/cascade_*`), SABL two-stage
(`configs/sabl/sabl_{faster,cascade}_*`), VGG16 trunk
(`configs/pascal_voc/faster_vgg16_voc0712.py`), neck_channels
(`configs/fpg/*chn128*`), Res2Net/RegNet DCN stages
(`configs/vfnet/vfnet_r2_101_*mdconv*`, `configs/regnet/*mdconv*`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models import (  # noqa: E501
    build_detector)

RS = np.random.RandomState(0)


def make_batch(h=64, w=64, masks=False, full=False, proposals=False):
    b = dict(image=jnp.asarray(RS.rand(1, h, w, 3), jnp.float32),
             img_shape=jnp.array([[h, w]]),
             gt_bboxes=jnp.array([[[4., 4., 28., 24.],
                                   [30., 30., 60., 50.]]]),
             gt_labels=jnp.array([[0, 1]]),
             gt_valid=jnp.array([[True, True]]))
    if masks:
        b['gt_masks'] = jnp.ones((1, 2, 28, 28), jnp.float32)
    if full:
        b['gt_masks_full'] = jnp.ones((1, 2, h // 4, w // 4), jnp.float32)
    if proposals:
        xy = np.sort(RS.rand(1, 64, 2, 2) * 60, 2)
        b['proposals'] = jnp.asarray(
            np.stack([xy[..., 0, 0], xy[..., 0, 1],
                      xy[..., 1, 0], xy[..., 1, 1]], -1), jnp.float32)
        b['proposals_valid'] = jnp.ones((1, 64), bool)
    return b


CASES = [
    ('pisa_mask', dict(type='PISAMaskRCNN', num_classes=3,
                       backbone_depth=18, frozen_stages=-1),
     dict(masks=True)),
    ('cascade_seesaw', dict(type='CascadeMaskRCNN', num_classes=3,
                            backbone_depth=18, loss_cls='seesaw',
                            normed_mask=True, num_samples=32),
     dict(masks=True)),
    ('solo_decoupled', dict(type='SOLO', num_classes=3, backbone_depth=18,
                            decoupled=True), dict(full=True)),
    ('reppoints_minmax', dict(type='RepPoints', num_classes=3,
                              backbone_depth=18,
                              transform_method='minmax'), {}),
    ('ddetr_plain', dict(type='DeformableDETR', num_classes=3,
                         backbone_depth=18, num_queries=20, enc_layers=1,
                         dec_layers=2, with_box_refine=False), {}),
    ('ddetr_twostage', dict(type='DeformableDETR', num_classes=3,
                            backbone_depth=18, num_queries=20,
                            enc_layers=1, dec_layers=2,
                            as_two_stage=True), {}),
    ('vgg16_fpn', dict(type='FasterRCNNFPN', num_classes=3,
                       backbone_cfg=dict(type='VGG', depth=16)), {}),
    ('chn128', dict(type='FasterRCNNFPN', num_classes=3,
                    backbone_depth=18, neck_channels=128), {}),
    ('pisa_ssd', dict(type='PISASSD', num_classes=3, input_size=300),
     dict(h=128, w=128)),
    ('fast_bfp', dict(type='FastRCNN', num_classes=3, backbone_depth=18,
                      neck_type='BFP'), dict(proposals=True)),
    ('res2net_dcn', dict(type='FasterRCNNFPN', num_classes=3,
                         backbone_cfg=dict(
                             type='Res2Net', depth=50, dcn='dcnv2',
                             stage_with_dcn=(False, True, True, True))),
     {}),
    ('regnet_dcn', dict(type='FasterRCNNFPN', num_classes=3,
                        backbone_cfg=dict(
                            type='RegNet', arch='regnetx_400mf',
                            dcn='dcnv2',
                            stage_with_dcn=(False, True, True, True))),
     {}),
    ('sabl_faster', dict(type='SABLFasterRCNN', num_classes=3,
                         backbone_depth=18), {}),
    ('sabl_cascade', dict(type='SABLFasterRCNN', num_classes=3,
                          backbone_depth=18, cascade=True), {}),
    # deformable RoI pooling + GRoIE extractor knobs (VERDICT r4 item 2:
    # configs/dcn/faster_rcnn_r50_fpn_{dpool,mdpool}_1x_coco.py,
    # configs/groie/) — the op-level parity lives in
    # tests/test_ops/test_deform_roi_pool.py
    ('dpool', dict(type='FasterRCNNFPN', num_classes=3,
                   backbone_depth=18, roi_layer='dpool'), {}),
    ('mdpool', dict(type='FasterRCNNFPN', num_classes=3,
                    backbone_depth=18, roi_layer='mdpool'), {}),
    ('groie', dict(type='FasterRCNNFPN', num_classes=3,
                   backbone_depth=18, roi_extractor_type='groie'), {}),
]


@pytest.mark.slow
@pytest.mark.parametrize('name,mcfg,bkw', CASES,
                         ids=[c[0] for c in CASES])
def test_variant_loss_is_finite(name, mcfg, bkw):
    model = build_detector(mcfg)
    batch = make_batch(**bkw)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'sampler': jax.random.PRNGKey(1)},
                           batch, train=True)
    out = model.apply(variables, batch, train=True,
                      rngs={'sampler': jax.random.PRNGKey(2)},
                      mutable=list(variables.keys() - {'params'}))
    losses = out[0] if isinstance(out, tuple) else out
    total = sum(float(v) for v in losses.values())
    assert np.isfinite(total), (name, losses)


@pytest.mark.slow
@pytest.mark.parametrize('name,mcfg,bkw',
                         [CASES[5], CASES[12], CASES[13], CASES[14],
                          CASES[16]],
                         ids=['ddetr_twostage', 'sabl_faster',
                              'sabl_cascade', 'dpool', 'groie'])
def test_variant_predict_shapes(name, mcfg, bkw):
    model = build_detector(mcfg)
    batch = make_batch(**{k: v for k, v in bkw.items()
                          if k in ('h', 'w', 'masks', 'full')})
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'sampler': jax.random.PRNGKey(1)},
                           batch, train=True)
    pred = model.apply(variables, batch, train=False)
    assert pred['dets'].shape[-1] == 5
    assert pred['dets'].shape[:2] == pred['labels'].shape
