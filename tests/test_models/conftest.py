"""Every model-forward test compiles a full detector on CPU (30-300 s per
family) — mark this directory `slow` so a fast CI lane exists
(`pytest -m "not slow"`), addressing the suite-wall-time gap flagged in
round-1 review. Cheap structural tests stay in the fast lane.

NOTE: pytest_collection_modifyitems is a session-scope hook (it receives
ALL collected items, not just this directory's) — filter by path."""

import pathlib

import pytest

_THIS_DIR = pathlib.Path(__file__).parent
_FAST_FILES = {'test_trunk_swap.py', 'test_da_losses.py'}


def pytest_collection_modifyitems(items):
    for item in items:
        p = pathlib.Path(str(item.path))
        if p.parent == _THIS_DIR and p.name not in _FAST_FILES:
            item.add_marker(pytest.mark.slow)
