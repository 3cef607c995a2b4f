"""TTA merging: flip + multi-scale (reference `MultiScaleFlipAug` +
`core/post_processing/merge_augs.py`)."""

import numpy as np
import jax.numpy as jnp

from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis.test import (
    _merge_aug_results, _rescaled_batch, run_inference)


def test_merge_aug_results_dedups_across_augs():
    a = [[np.array([[0., 0., 10., 10., 0.9]], np.float32)]]
    b = [[np.array([[0.5, 0., 10., 10., 0.8],       # near-duplicate of a
                    [50., 50., 60., 60., 0.7]], np.float32)]]
    merged = _merge_aug_results([a, b], thr=0.5)
    assert len(merged) == 1 and len(merged[0]) == 1
    dets = merged[0][0]
    # duplicate suppressed, distinct box kept, scores descending
    assert dets.shape == (2, 5)
    assert dets[:, 4].max() == np.float32(0.9)
    assert {round(float(d), 1) for d in dets[:, 0]} == {0.0, 50.0}


def test_rescaled_batch_shapes_and_factors():
    batch = dict(image=np.zeros((2, 64, 96, 3), np.float32),
                 img_shape=np.asarray([[60, 90], [64, 96]], np.int32),
                 scale_factor=np.ones((2, 4), np.float32))
    nb, (ry, rx) = _rescaled_batch(batch, 1.5)
    assert nb['image'].shape == (2, 96, 160, 3)   # 96,144 → pad to ÷32
    np.testing.assert_allclose([ry, rx], [1.5, 1.5])
    assert nb['img_shape'].tolist() == [[90, 135], [96, 144]]
    # downscale pads back to a smaller canvas
    nb2, (ry2, rx2) = _rescaled_batch(batch, 0.5)
    assert nb2['image'].shape == (2, 32, 64, 3)
    assert np.all(nb2['img_shape'] <= [32, 64])


def test_run_inference_scale_tta_smoke():
    """End-to-end scale-TTA over the committed fixture dataset with a tiny
    detector — results stay in the per-class list format."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.data import (
        build_dataset)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models import (
        FasterRCNN)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads.rpn_head import (
        ProposalConfig)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.roi_heads.standard_roi_head import (
        RoITrainConfig, RoITestConfig)
    import jax

    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='Resize', img_scale=(96, 64), keep_ratio=True),
        dict(type='Normalize'),
        dict(type='Pad', size=(64, 96)),
        dict(type='PackDetInputs', max_gt=10),
    ]
    ds = build_dataset(dict(
        type='DADataset', domain='source',
        ann_file='tests/data/voc_source/ImageSets/Main/train.txt',
        img_prefix='tests/data/voc_source',
        classes=('car', 'person'), pipeline=pipeline))
    model = FasterRCNN(
        backbone_depth=18, num_classes=2,
        rpn_proposal_cfg=ProposalConfig(nms_pre=128, max_per_img=32,
                                        nms_tile=128),
        rpn_test_cfg=ProposalConfig(nms_pre=128, max_per_img=32,
                                    nms_tile=128),
        roi_train_cfg=RoITrainConfig(num_samples=16),
        roi_test_cfg=RoITestConfig(max_per_img=5, nms_pre=64, nms_tile=128))
    sample = ds[0]
    dummy = {k: jnp.asarray(v)[None] for k, v in sample.items()}
    k = jax.random.PRNGKey(0)
    variables = model.init({'params': k, 'sampler': k, 'dropout': k}, dummy,
                           train=True)
    results = run_inference(model, variables, ds, samples_per_batch=2,
                            scale_tta=(0.75,))
    assert len(results) == len(ds)
    for per_img in results:
        assert len(per_img) == 2
        for det in per_img:
            assert det.ndim == 2 and det.shape[1] == 5
