"""Smoke tests for the dataset-converter and misc CLIs (reference
`tools/dataset_converters/pascal_voc.py`, `images2coco.py`,
`tools/misc/print_config.py`, `browse_dataset.py`) on the committed
VOC fixture."""
import json
import os
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..', '..'))
CONFIG = os.path.join(REPO, 'configs', 'da', 'faster_rcnn_r18_tiny_fixture.py')
VOC = os.path.join(REPO, 'tests', 'data', 'voc_source')
sys.path.insert(0, os.path.join(REPO, 'tools', 'dataset_converters'))
sys.path.insert(0, os.path.join(REPO, 'tools', 'misc'))


@pytest.fixture(autouse=True)
def _repo_cwd():
    os.chdir(REPO)


def test_voc_to_coco_roundtrip(tmp_path, monkeypatch):
    import voc_to_coco
    out = tmp_path / 'train.json'
    monkeypatch.setattr(sys, 'argv', [
        'voc_to_coco', VOC, 'train', str(out),
        '--classes', 'person'])
    voc_to_coco.main()
    coco = json.loads(out.read_text())
    assert set(coco) >= {'images', 'annotations', 'categories'}
    assert len(coco['images']) > 0 and len(coco['annotations']) > 0
    # every annotation references a real image and a real category
    img_ids = {im['id'] for im in coco['images']}
    cat_ids = {c['id'] for c in coco['categories']}
    for a in coco['annotations']:
        assert a['image_id'] in img_ids and a['category_id'] in cat_ids
        x, y, w, h = a['bbox']
        assert w > 0 and h > 0


def test_images2coco(tmp_path, monkeypatch):
    import images2coco
    out = tmp_path / 'imgs.json'
    monkeypatch.setattr(sys, 'argv', [
        'images2coco', os.path.join(VOC, 'JPEGImages'), str(out),
        '--classes', 'a,b'])
    images2coco.main()
    coco = json.loads(out.read_text())
    assert len(coco['images']) > 0 and coco['annotations'] == []
    assert all(im['width'] > 0 and im['height'] > 0
               for im in coco['images'])


def test_print_config(monkeypatch, capsys):
    import print_config
    monkeypatch.setattr(sys, 'argv', [
        'print_config', CONFIG, '--cfg-options', 'runner.max_epochs=99'])
    print_config.main()
    out = capsys.readouterr().out
    assert 'max_epochs' in out and '99' in out


def test_browse_dataset(tmp_path, monkeypatch):
    import browse_dataset
    out = tmp_path / 'vis'
    monkeypatch.setattr(sys, 'argv', [
        'browse_dataset', CONFIG, '--split', 'train',
        '--out-dir', str(out), '--n', '2'])
    browse_dataset.main()
    assert len(os.listdir(out)) > 0
