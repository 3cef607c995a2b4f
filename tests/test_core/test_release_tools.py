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


def test_create_result_gif(tmp_path):
    """demo/create_result_gif.py (reference demo/create_result_gif.py):
    frames of mixed sizes pad to one canvas; output is an animated GIF."""
    sys.path.insert(0, os.path.join(REPO, 'demo'))
    import create_result_gif as crg
    from PIL import Image
    d = tmp_path / 'imgs'
    d.mkdir()
    for i, size in enumerate([(40, 30), (30, 40), (40, 40)]):
        arr = np.full(size[::-1] + (3,), i * 60, np.uint8)
        Image.fromarray(arr).save(d / f'res_{i}.png')
    frames = crg.load_frames(str(d))
    assert len(frames) == 3
    assert len({f.size for f in frames}) == 1  # common canvas
    out = str(tmp_path / 'r.gif')
    crg.create_gif(frames, out, duration=0.1)
    g = Image.open(out)
    assert g.format == 'GIF' and getattr(g, 'n_frames', 1) == 3


def test_selfsup_prefix_strip():
    """--selfsup moco unwraps module.encoder_q.* and drops the head
    (reference tools/model_converters/selfsup2mmdet.py)."""
    sys.path.insert(0, os.path.join(REPO, 'tools', 'model_converters'))
    import torchvision_to_udaod as tv
    sd = {'module.encoder_q.conv1.weight': 1,
          'module.encoder_q.fc.weight': 2,
          'module.encoder_k.conv1.weight': 3,
          'queue': 4}
    out = tv.strip_selfsup_prefixes(sd, 'moco')
    assert out == {'conv1.weight': 1}
    # swav: keys already plain; only the projection head is dropped
    out = tv.strip_selfsup_prefixes(
        {'conv1.weight': 1, 'fc.w': 2}, 'swav')
    assert out == {'conv1.weight': 1}


def test_convert_pycls_regnet_full_tree():
    """pycls→flax RegNet conversion (reference regnet2mmdet.py role):
    every converted path/shape must land on the real RegNet variable
    tree — a missing or misnamed module would be silently skipped by
    load_pretrained_backbone's tolerant merge."""
    import jax
    import jax.numpy as jnp
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.backbones.zoo_backbones import (  # noqa: E501
        RegNet)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils.checkpoint import (  # noqa: E501
        convert_pycls_regnet)

    net = RegNet(arch='regnetx_400mf')
    var = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3), jnp.float32)))

    # emit a pycls-style state dict from the flax tree's own shapes
    sd = {}
    f_inv = {'1': 'a', '2': 'b', '3': 'c'}
    for mod, leaves in var['params'].items():
        if mod == 'stem_conv':
            py = 'stem.conv'
        elif mod == 'stem_bn':
            py = 'stem.bn'
        else:
            base, kind = mod.rsplit('_', 1)       # s0b1_2 → (s0b1_2, conv)
            s = base.split('b')[0]
            b = base.split('b')[1].split('_')[0]
            pos = base.split('_')[1]              # 1/2/3/down
            sb = f's{int(s[1:]) + 1}.b{int(b) + 1}'
            if pos == 'down':
                py = f'{sb}.proj' if kind == 'conv' else f'{sb}.bn'
            else:
                py = f'{sb}.f.{f_inv[pos]}' + ('' if kind == 'conv'
                                               else '_bn')
        for leaf, v in leaves.items():
            if leaf == 'kernel':
                sd[f'{py}.weight'] = np.zeros(
                    np.asarray(v.shape)[[3, 2, 0, 1]], np.float32)
            elif leaf == 'scale':
                sd[f'{py}.weight'] = np.zeros(v.shape, np.float32)
            else:
                sd[f'{py}.bias'] = np.zeros(v.shape, np.float32)
    for mod, leaves in var['batch_stats'].items():
        if mod == 'stem_bn':
            py = 'stem.bn'
        else:
            pos = mod.split('_')[1]               # 1/2/3/down
            sb = f's{int(mod[1:mod.index("b")]) + 1}.' \
                 f'b{int(mod[mod.index("b") + 1:mod.index("_")]) + 1}'
            py = f'{sb}.bn' if pos == 'down' else f'{sb}.f.{f_inv[pos]}_bn'
        sd[f'{py}.running_mean'] = np.zeros(leaves['mean'].shape, np.float32)
        sd[f'{py}.running_var'] = np.ones(leaves['var'].shape, np.float32)
    sd['head.fc.weight'] = np.zeros((1000, 400), np.float32)  # dropped

    out = convert_pycls_regnet(sd)

    def paths(tree, pre=''):
        for k, v in tree.items():
            key = f'{pre}/{k}' if pre else k
            if isinstance(v, dict):
                yield from paths(v, key)
            else:
                yield key, tuple(getattr(v, 'shape', np.shape(v)))

    assert dict(paths(out['params'])) == dict(paths(var['params']))
    assert dict(paths(out['batch_stats'])) == \
        dict(paths(var['batch_stats']))
