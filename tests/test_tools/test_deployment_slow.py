"""Slow-lane smoke tests for the deployment + flops CLIs (reference
`tools/deployment/pytorch2onnx.py` / `deployment/test.py` roles,
`tools/analysis_tools/get_flops.py`): export the tiny fixture detector to
a StableHLO serving artifact, reload it codelessly, and evaluate it
against the fixture dataset. Full detector compiles → marked slow."""
import os
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..', '..'))
CONFIG = os.path.join(REPO, 'configs', 'da', 'faster_rcnn_r18_tiny_fixture.py')
sys.path.insert(0, os.path.join(REPO, 'tools', 'deployment'))
sys.path.insert(0, os.path.join(REPO, 'tools', 'analysis_tools'))


@pytest.fixture(autouse=True)
def _repo_cwd():
    os.chdir(REPO)


def test_export_then_evaluate_artifact(tmp_path, monkeypatch, capsys):
    import export_serving
    import test_exported
    art = str(tmp_path / 'det.jaxexport')
    # random-init weights: the invariant under test is the export→codeless
    # reload→dataset-eval round trip, not accuracy
    export_serving.export(CONFIG, checkpoint=None, out_path=art,
                          batch=1, height=64, width=96)  # fixture canvas
    assert os.path.getsize(art) > 0
    monkeypatch.setattr(sys, 'argv', ['test_exported', CONFIG, art,
                                      '--eval', 'mAP'])
    test_exported.main()
    out = capsys.readouterr().out
    assert 'mAP' in out


def test_get_flops(monkeypatch, capsys):
    import get_flops
    monkeypatch.setattr(sys, 'argv',
                        ['get_flops', CONFIG, '--shape', '128', '192'])
    get_flops.main()
    out = capsys.readouterr().out
    assert 'GFLOPs' in out and 'params' in out


def test_image_demo(tmp_path, monkeypatch, capsys):
    """demo/image_demo.py end-to-end (checkpoint optional → random init;
    the invariant is config→init_detector→inference→drawn panel)."""
    sys.path.insert(0, os.path.join(REPO, 'demo'))
    import image_demo
    img = os.path.join(REPO, 'tests', 'data', 'voc_source', 'JPEGImages',
                       'voc_000.jpg')
    out = str(tmp_path / 'demo.jpg')
    monkeypatch.setattr(sys, 'argv',
                        ['image_demo', img, CONFIG, '--out-file', out])
    image_demo.main()
    assert os.path.exists(out) and os.path.getsize(out) > 0
    assert 'detections' in capsys.readouterr().out
