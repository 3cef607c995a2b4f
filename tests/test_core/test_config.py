"""Config loader: _base_ inheritance, merge, dotted overrides
(mirrors `tests/test_runtime/test_config.py` intent)."""

import os

import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (
    Config, merge_dict)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils.registry import Registry


def test_merge_dict_recursive():
    base = dict(model=dict(backbone=dict(depth=50, norm='BN'), head=dict(n=2)))
    over = dict(model=dict(backbone=dict(depth=101)))
    merged = merge_dict(base, over)
    assert merged['model']['backbone']['depth'] == 101
    assert merged['model']['backbone']['norm'] == 'BN'
    assert merged['model']['head']['n'] == 2


def test_merge_dict_delete():
    base = dict(model=dict(a=1, b=2))
    over = dict(model=dict(_delete_=True, c=3))
    merged = merge_dict(base, over)
    assert merged['model'] == dict(c=3)


def test_config_base_inheritance(tmp_path):
    (tmp_path / 'base.py').write_text(
        "model = dict(type='FasterRCNN', backbone=dict(depth=50))\n"
        "lr = 0.01\n")
    (tmp_path / 'child.py').write_text(
        "_base_ = ['base.py']\n"
        "model = dict(backbone=dict(depth=101))\n")
    cfg = Config.fromfile(str(tmp_path / 'child.py'))
    assert cfg.model.type == 'FasterRCNN'
    assert cfg.model.backbone.depth == 101
    assert cfg.lr == 0.01


def test_config_dotted_override(tmp_path):
    (tmp_path / 'c.py').write_text("model = dict(backbone=dict(depth=50))\n")
    cfg = Config.fromfile(str(tmp_path / 'c.py'))
    cfg.merge_from_dict({'model.backbone.depth': 18, 'new_key': 'x'})
    assert cfg.model.backbone.depth == 18
    assert cfg.new_key == 'x'


def test_registry_build():
    reg = Registry('test')

    @reg.register_module()
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = reg.build(dict(type='Foo', a=1))
    assert obj.a == 1 and obj.b == 2
    with pytest.raises(KeyError):
        reg.get('Bar')


def test_all_repo_configs_load():
    """Every config in configs/ must load and expose a model dict
    (the reference's config-sweep regression test)."""
    root = os.path.join(os.path.dirname(__file__), '..', '..', 'configs')
    count = 0
    for dirpath, _, files in os.walk(root):
        if '_base_' in dirpath:
            continue
        for f in files:
            if f.endswith('.py'):
                cfg = Config.fromfile(os.path.join(dirpath, f))
                assert 'model' in cfg, f
                assert 'type' in cfg.model, f
                count += 1
    assert count >= 1
