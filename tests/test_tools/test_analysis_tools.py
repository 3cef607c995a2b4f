"""Smoke tests for the analysis-tool CLIs (reference
`tools/analysis_tools/` — mmdet ships these untested; we pin each one to
the committed 2-image VOC fixture so refactors of the dataset/eval APIs
can't silently break the tool surface).

Each test drives the tool's real `main()` with monkeypatched argv — the
same code path a user runs."""
import json
import os
import pickle
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..', '..'))
TOOLS = os.path.join(REPO, 'tools', 'analysis_tools')
CONFIG = os.path.join(REPO, 'configs', 'da', 'faster_rcnn_r18_tiny_fixture.py')
sys.path.insert(0, TOOLS)


@pytest.fixture(scope='module')
def fixture_dataset():
    os.chdir(REPO)  # fixture config uses repo-relative data paths
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.data import (  # noqa: E501
        build_dataset)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E501
        Config)
    cfg = Config.fromfile(CONFIG)
    return cfg, build_dataset(dict(cfg.data['test'], test_mode=True))


def perfect_results(dataset):
    """Per-image per-class (N,5) arrays echoing the GT at score 0.9."""
    n_cls = len(dataset.CLASSES)
    out = []
    for i in range(len(dataset)):
        ann = dataset.get_ann_info(i)
        per_class = []
        for c in range(n_cls):
            b = ann['bboxes'][ann['labels'] == c]
            per_class.append(
                np.hstack([b, np.full((len(b), 1), 0.9)]).astype(np.float32)
                if len(b) else np.zeros((0, 5), np.float32))
        out.append(per_class)
    return out


def test_eval_metric_perfect_results(fixture_dataset, tmp_path, monkeypatch,
                                     capsys):
    _, ds = fixture_dataset
    pkl = tmp_path / 'res.pkl'
    pkl.write_bytes(pickle.dumps(perfect_results(ds)))
    import eval_metric
    monkeypatch.setattr(sys, 'argv',
                        ['eval_metric', CONFIG, str(pkl), '--eval', 'mAP'])
    eval_metric.main()
    out = capsys.readouterr().out
    assert 'mAP' in out and '1.0' in out   # GT echoed back → perfect score


def test_confusion_matrix_diagonal(fixture_dataset, tmp_path, monkeypatch,
                                   capsys):
    _, ds = fixture_dataset
    from confusion_matrix import compute_confusion
    mat = compute_confusion(perfect_results(ds), ds)
    n = len(ds.CLASSES)
    off_diag = mat[:n, :n] - np.diag(np.diag(mat[:n, :n]))
    assert np.all(off_diag == 0) and np.trace(mat[:n, :n]) > 0
    assert mat[n, :].sum() == 0 and mat[:, n].sum() == 0  # no FP/missed
    # and the CLI wrapper end-to-end
    pkl = tmp_path / 'res.pkl'
    pkl.write_bytes(pickle.dumps(perfect_results(ds)))
    import confusion_matrix
    monkeypatch.setattr(sys, 'argv',
                        ['confusion_matrix', CONFIG, str(pkl)])
    confusion_matrix.main()
    assert ds.CLASSES[0] in capsys.readouterr().out


def test_analyze_logs_plots(tmp_path, monkeypatch):
    log = tmp_path / 'train_log.jsonl'
    with open(log, 'w') as f:
        for ep in (1, 2, 3):
            f.write(json.dumps(dict(mode='train', epoch=ep, iter=10,
                                    loss=1.0 / ep, loss_cls=0.5 / ep)) + '\n')
            f.write(json.dumps(dict(mode='val', epoch=ep,
                                    mAP=0.2 * ep)) + '\n')
    import analyze_logs
    out = tmp_path / 'curve.png'
    monkeypatch.setattr(sys, 'argv',
                        ['analyze_logs', str(log), '--keys', 'loss',
                         '--plot-out', str(out)])
    analyze_logs.main()
    assert out.exists() and out.stat().st_size > 0


def test_analyze_results_writes_panels(fixture_dataset, tmp_path,
                                       monkeypatch):
    _, ds = fixture_dataset
    pkl = tmp_path / 'res.pkl'
    pkl.write_bytes(pickle.dumps(perfect_results(ds)))
    import analyze_results
    show = tmp_path / 'panels'
    monkeypatch.setattr(sys, 'argv',
                        ['analyze_results', CONFIG, str(pkl),
                         '--show-dir', str(show), '--topk', '2'])
    analyze_results.main()
    written = [f for f in os.listdir(show) if f.endswith(('.png', '.jpg'))]
    assert written, 'no visualization panels written'


def test_optimize_anchors_runs(monkeypatch, capsys):
    import optimize_anchors
    monkeypatch.setattr(sys, 'argv',
                        ['optimize_anchors', CONFIG, '--n-anchors', '3',
                         '--iters', '5', '--split', 'train'])
    optimize_anchors.main()
    assert 'anchor' in capsys.readouterr().out.lower()


def test_coco_error_analysis_runs(fixture_dataset, tmp_path, monkeypatch,
                                  capsys):
    _, ds = fixture_dataset
    pkl = tmp_path / 'res.pkl'
    pkl.write_bytes(pickle.dumps(perfect_results(ds)))
    import coco_error_analysis
    monkeypatch.setattr(sys, 'argv',
                        ['coco_error_analysis', CONFIG, str(pkl),
                         '--out', str(tmp_path / 'err')])
    coco_error_analysis.main()
    out = capsys.readouterr().out
    # perfect results → every error-removal stage stays at 1.0
    assert '"C75": 1.0' in out and '"FN": 1.0' in out


def test_robustness_eval_aggregation(tmp_path, monkeypatch, capsys):
    """robustness_eval.py mPC/rPC table from a synthetic robustness.json
    (reference tools/analysis_tools/robustness_eval.py)."""
    import robustness_eval
    rep = dict(clean=0.8,
               table={'gaussian_noise': {'1': 0.6, '2': 0.4},
                      'fog': {'1': 0.7, '2': 0.5}},
               mPC=0.55, rPC=0.6875)
    path = tmp_path / 'robustness.json'
    path.write_text(json.dumps(rep))
    monkeypatch.setattr(sys, 'argv',
                        ['robustness_eval', str(path),
                         '--severities', '1', '2'])
    robustness_eval.main()
    out = capsys.readouterr().out
    assert 'mPC: 0.5500' in out and 'rPC: 0.6875' in out
    assert 'gaussian_noise' in out and 'fog' in out
