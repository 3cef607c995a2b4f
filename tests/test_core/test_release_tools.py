"""Release/converter tools (reference `tools/model_converters/
publish_model.py`, `tools/dataset_converters/cityscapes.py`)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..', '..'))


def test_publish_model_strips_train_state(tmp_path):
    sys.path.insert(0, os.path.join(REPO, 'tools', 'model_converters'))
    import publish_model
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E501
        load_checkpoint, save_checkpoint)
    state = dict(step=np.int32(7),
                 params={'w': np.arange(4, dtype=np.float32)},
                 batch_stats={'m': np.zeros(2, np.float32)},
                 opt_state={'mu': np.ones(4, np.float32)},
                 ema_params={'w': np.arange(4, dtype=np.float32) * 2})
    src = str(tmp_path / 'ckpt')
    save_checkpoint(src, state)
    out = publish_model.main([src, str(tmp_path / 'pub')])
    published = load_checkpoint(out)
    assert set(published.keys()) == {'params', 'batch_stats'}
    # EMA weights win by default
    np.testing.assert_array_equal(published['params']['w'],
                                  state['ema_params']['w'])
    # deterministic hash suffix
    assert os.path.basename(out).split('-')[-1] == \
        publish_model.tree_sha256(dict(
            params=state['ema_params'],
            batch_stats=state['batch_stats']))[:8]


def test_cityscapes_to_coco_roundtrip(tmp_path):
    root = tmp_path / 'cs'
    (root / 'gtFine' / 'val' / 'aachen').mkdir(parents=True)
    (root / 'leftImg8bit' / 'val' / 'aachen').mkdir(parents=True)
    base = 'aachen_000000_000019'
    ann = dict(imgWidth=64, imgHeight=48, objects=[
        dict(label='car', polygon=[[5, 5], [25, 5], [25, 20], [5, 20]]),
        dict(label='persongroup',
             polygon=[[30, 10], [40, 10], [40, 30], [30, 30]]),
        dict(label='sky', polygon=[[0, 0], [63, 0], [63, 10], [0, 10]]),
    ])
    with open(root / 'gtFine' / 'val' / 'aachen' /
              f'{base}_gtFine_polygons.json', 'w') as f:
        json.dump(ann, f)
    img = root / 'leftImg8bit' / 'val' / 'aachen' / f'{base}_leftImg8bit.png'
    try:
        from PIL import Image
        Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(img)
        have_pil = True
    except ImportError:
        img.write_bytes(b'x')
        have_pil = False

    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, 'tools', 'dataset_converters',
                      'cityscapes_to_coco.py'),
         str(root), str(tmp_path / 'annotations'), '--splits', 'val'],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    coco = json.load(open(tmp_path / 'annotations' /
                          'instancesonly_filtered_gtFine_val.json'))
    assert len(coco['images']) == 1
    assert len(coco['annotations']) == 2          # sky dropped
    labels = {a['category_id']: a for a in coco['annotations']}
    cats = {c['id']: c['name'] for c in coco['categories']}
    assert sorted(cats[i] for i in labels) == ['car', 'person']
    person = [a for a in coco['annotations']
              if cats[a['category_id']] == 'person'][0]
    assert person['iscrowd'] == 1                 # persongroup → crowd
    car = [a for a in coco['annotations']
           if cats[a['category_id']] == 'car'][0]
    assert car['bbox'] == [5, 5, 20, 15]

    # the converted file loads through CityscapesDataset and the crowd
    # instance is excluded from training boxes
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.data import (  # noqa: E501
        build_dataset)
    ds = build_dataset(dict(
        type='CityscapesDataset',
        ann_file=str(tmp_path / 'annotations' /
                     'instancesonly_filtered_gtFine_val.json'),
        img_prefix=str(root / 'leftImg8bit' / 'val') + '/',
        pipeline=[dict(type='LoadImageFromFile'),
                  dict(type='LoadAnnotations', with_bbox=True),
                  dict(type='Resize', img_scale=(64, 48), keep_ratio=True),
                  dict(type='Normalize'),
                  dict(type='Pad', size=(48, 64)),
                  dict(type='PackDetInputs', max_gt=10)]))
    if not have_pil:
        pytest.skip('PIL unavailable — no decodable image')
    s = ds[0]
    assert int(np.asarray(s['gt_valid']).sum()) == 1
