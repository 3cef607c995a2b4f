"""Async inference API (reference `mmdet/apis/inference.py:155`
`async_inference_detector` + `tests/test_runtime/test_async.py`): the
coroutine must return results identical to the sync path on the same
random-init tiny detector. Full detector compiles → slow lane."""
import asyncio
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..', '..'))
CONFIG = os.path.join(REPO, 'configs', 'da', 'faster_rcnn_r18_tiny_fixture.py')


def test_async_matches_sync():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis import (  # noqa: E501
        async_inference_detector, inference_detector, init_detector)
    os.chdir(REPO)
    bundle = init_detector(CONFIG, checkpoint=None)
    img = np.random.RandomState(0).randint(
        0, 255, (48, 64, 3), np.uint8)
    sync_res = inference_detector(bundle, img)
    async_res = asyncio.run(async_inference_detector(bundle, img))
    assert len(sync_res) == len(async_res)
    for a, b in zip(sync_res, async_res):
        np.testing.assert_allclose(a, b)
