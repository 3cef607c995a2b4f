"""Round-5 parity sub-assemblies (the three PARITY ⚠️ rows closed this
round, VERDICT r4 item 5), driven end to end (init → loss finite →
predict shapes):

- MaskRCNNC4 — shared-res5 RoI trunk
  (reference `configs/_base_/models/mask_rcnn_r50_caffe_c4.py:37-48`)
- CRPNFasterRCNN — CascadeRPN embedded in the two-stage loss path
  (reference `configs/cascade_rpn/crpn_faster_rcnn_r50_caffe_fpn_1x_coco.py`)
- NASFCOS head_type='nas' — searched NASFCOSHead branch
  (reference `configs/nas_fcos/nas_fcos_nashead_..._coco.py`)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models import (  # noqa: E501
    build_detector)

RS = np.random.RandomState(3)


def make_batch(h=64, w=64, masks=False):
    b = dict(image=jnp.asarray(RS.rand(1, h, w, 3), jnp.float32),
             img_shape=jnp.array([[h, w]]),
             gt_bboxes=jnp.array([[[4., 4., 28., 24.],
                                   [30., 30., 60., 50.]]]),
             gt_labels=jnp.array([[0, 1]]),
             gt_valid=jnp.array([[True, True]]))
    if masks:
        b['gt_masks'] = jnp.ones((1, 2, 28, 28), jnp.float32)
    return b


CASES = [
    ('mask_rcnn_c4', dict(type='MaskRCNNC4', num_classes=3,
                          backbone_depth=18, frozen_stages=-1),
     dict(masks=True)),
    ('crpn_faster', dict(type='CRPNFasterRCNN', num_classes=3,
                         backbone_depth=18, frozen_stages=-1), {}),
    ('nas_fcos_nashead', dict(type='NASFCOS', num_classes=3,
                              backbone_depth=18, head_type='nas',
                              frozen_stages=-1), {}),
    # the rpn_r50_caffe_c4 spelling (reference
    # configs/rpn/rpn_r50_caffe_c4_1x_coco.py)
    ('rpn_c4', dict(type='RPN', backbone_depth=18, c4=True,
                    frozen_stages=-1), {}),
]


@pytest.mark.slow
@pytest.mark.parametrize('name,mcfg,bkw', CASES, ids=[c[0] for c in CASES])
def test_assembly_loss_and_predict(name, mcfg, bkw):
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
    pred = model.apply(variables, batch, train=False)
    assert pred['dets'].shape[-1] == 5
