"""C2F dress rehearsal (VERDICT r3 item 7): the exact flagship
Cityscapes→Foggy command path, end to end, on a synthetic
Cityscapes-layout tree.

Real Cityscapes cannot be mounted in this environment, so this slow-lane
test verifies the one-command flow the day data exists:

  1. fabricate a tiny Cityscapes root (``leftImg8bit/``,
     ``leftImg8bit_foggy/``, ``gtFine/*_gtFine_polygons.json`` — the
     layout `tools/dataset_converters/cityscapes_to_voc.py` consumes,
     reference `tools/dataset_converters/cityscapes.py`),
  2. run ``tools/misc/prepare_c2foggy.py`` → the three VOC trees,
  3. link ``data/VOCdevkit`` and run the flagship
     ``tools/DA_train.py configs/da/faster_rcnn_r50_daf_c2f.py`` for one
     epoch (reference flow `tools/DA_train.py:184-305`),
  4. assert a checkpoint + a finite logged loss + an eval mAP line.

Everything runs in a subprocess with cwd inside tmp_path so the repo
tree stays clean; only schedule length is overridden (1 epoch)."""
import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..', '..'))

CITIES = {'train': 'aachen', 'val': 'frankfurt'}
BETA = 0.02


def _png(path, rs, w=256, h=128, boxes=()):
    """Write a small PNG with bright rectangles on noise (PIL, like
    tools/misc/make_synthetic_da_dataset.py)."""
    from PIL import Image
    img = (rs.rand(h, w, 3) * 60).astype(np.uint8)
    for (x1, y1, x2, y2) in boxes:
        img[y1:y2, x1:x2] = (220, 40, 40)
    Image.fromarray(img).save(path)


def _make_cityscapes(root, n_train=8, n_val=3):
    rs = np.random.RandomState(0)
    w, h = 256, 128
    for split, n in (('train', n_train), ('val', n_val)):
        city = CITIES[split]
        for d in ('leftImg8bit', 'leftImg8bit_foggy', 'gtFine'):
            os.makedirs(os.path.join(root, d, split, city), exist_ok=True)
        for i in range(n):
            base = f'{city}_{i:06d}_000019'
            x1 = int(rs.randint(10, w // 2))
            y1 = int(rs.randint(10, h // 2))
            box = (x1, y1, x1 + 48, y1 + 32)
            _png(os.path.join(root, 'leftImg8bit', split, city,
                              base + '_leftImg8bit.png'), rs, w, h, [box])
            _png(os.path.join(root, 'leftImg8bit_foggy', split, city,
                              base + f'_leftImg8bit_foggy_beta_{BETA}.png'),
                 rs, w, h, [box])
            poly = [[box[0], box[1]], [box[2], box[1]],
                    [box[2], box[3]], [box[0], box[3]]]
            ann = {'imgWidth': w, 'imgHeight': h,
                   'objects': [{'label': 'car', 'polygon': poly},
                               {'label': 'persongroup',
                                'polygon': [[p[0] // 2, p[1] // 2]
                                            for p in poly]}]}
            with open(os.path.join(root, 'gtFine', split, city,
                                   base + '_gtFine_polygons.json'),
                      'w') as f:
                json.dump(ann, f)


def _run(cmd, cwd):
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=1',
               PYTHONPATH=REPO)
    r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                       text=True, timeout=1500)
    assert r.returncode == 0, (
        f'{cmd}\n--- stdout ---\n{r.stdout[-4000:]}\n'
        f'--- stderr ---\n{r.stderr[-4000:]}')
    return r.stdout


@pytest.mark.slow
def test_c2f_flagship_command_end_to_end(tmp_path):
    cs_root = tmp_path / 'cityscapes'
    _make_cityscapes(str(cs_root))

    out_root = tmp_path / 'c2f_voc'
    out = _run([sys.executable,
                os.path.join(REPO, 'tools', 'misc', 'prepare_c2foggy.py'),
                str(cs_root), str(out_root)], cwd=str(tmp_path))
    assert 'CityScapes-VOC2012/train.txt: 8 images' in out
    assert 'Foggy-CityScapes-VOC2012/test.txt: 3 images' in out
    # converter output is the exact layout c2foggy.py consumes
    assert (out_root / 'CityScapes-VOC2012' / 'JPEGImages').is_dir()
    assert (out_root / 'Foggy-CityScapes-VOC2012' / 'Annotations').is_dir()

    # the documented link step, inside tmp cwd so the repo stays clean
    os.makedirs(tmp_path / 'data', exist_ok=True)
    os.symlink(str(out_root), str(tmp_path / 'data' / 'VOCdevkit'))

    work = tmp_path / 'work_dirs' / 'daf_c2f'
    out = _run([sys.executable,
                os.path.join(REPO, 'tools', 'DA_train.py'),
                os.path.join(REPO, 'configs', 'da',
                             'faster_rcnn_r50_daf_c2f.py'),
                '--work-dir', str(work),
                '--cfg-options', 'runner.max_epochs=1',
                'evaluation.interval=1'], cwd=str(tmp_path))
    assert '[DA_train] source dataset: 8 images' in out
    assert '[DA_train] target dataset: 8 images' in out

    ckpts = [p for p in os.listdir(work) if p.startswith('ckpt')]
    assert ckpts, f'no checkpoint in {work}: {os.listdir(work)}'
    loss_vals, map_vals = [], []
    with open(work / 'train_log.jsonl') as f:
        for line in f:
            rec = json.loads(line)
            for k, v in rec.items():
                if k.startswith('loss'):
                    loss_vals.append(float(v))
                if re.search(r'mAP|AP50', k):
                    map_vals.append(float(v))
    assert loss_vals and all(np.isfinite(loss_vals)), loss_vals
    assert map_vals, 'eval ran but logged no mAP/AP50'
