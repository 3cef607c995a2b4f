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
        # configs/common mirrors the reference's shared _base_ blocks
        # (no model key, inherited by other families)
        if '_base_' in dirpath or dirpath.endswith(os.sep + 'common'):
            continue
        for f in files:
            if f.endswith('.py'):
                cfg = Config.fromfile(os.path.join(dirpath, f))
                assert 'model' in cfg, f
                assert 'type' in cfg.model, f
                count += 1
    assert count >= 1


def test_all_repo_configs_build_modules():
    """Every config's model dict must BUILD into a detector module (not just
    load) — catches bad field names in backbone_cfg/nested dicts."""
    import warnings
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.builder import (
        build_detector)
    root = os.path.join(os.path.dirname(__file__), '..', '..', 'configs')
    count = 0
    for dirpath, _, files in os.walk(root):
        if '_base_' in dirpath or dirpath.endswith(os.sep + 'common'):
            continue
        for f in sorted(files):
            if not f.endswith('.py'):
                continue
            cfg = Config.fromfile(os.path.join(dirpath, f))
            with warnings.catch_warnings():
                # unknown USER keys in a config are bugs, not noise
                warnings.simplefilter('error', UserWarning)
                model = build_detector(cfg.model)
            assert model is not None, f
            bb = getattr(model, 'backbone_cfg', None)
            if bb is not None:
                assert isinstance(bb, tuple), f  # frozen → hashable
                # construct the trunk too — build_trunk is where unknown
                # backbone-key / geometry-drop warnings fire (setup() is
                # lazy, so build_detector alone cannot catch them)
                import jax.numpy as jnp
                from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.backbones.build import (
                    build_trunk)
                with warnings.catch_warnings():
                    warnings.simplefilter('error', UserWarning)
                    build_trunk(bb, dtype=jnp.float32)
            count += 1
    assert count >= 390
