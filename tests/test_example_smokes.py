"""Smoke coverage for the examples without dedicated floor tests.

Each runs end to end at reduced settings (marked slow: several minutes
total on the CPU mesh); the point is import + full-flow execution, not
accuracy -- the workflow examples with regression floors live in
test_workflow_examples.py.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

_CASES = [  # (example, args, accepts --out)
    ("tutorial_count", ["--epochs", "1", "--arrays", "2"], True),
    ("tutorial_image", ["--epochs", "1"], True),
    ("tutorial_multimodal", ["--epochs", "1"], True),
    ("register_pca", ["--epochs", "1", "--arrays", "3"], False),
    ("selfsup_counts_from_img", ["--epochs", "1"], False),
    ("multimodal_smoke", ["--n-genes", "64"], False),
    ("scbert_count",
     ["--steps", "2", "--vocab", "128", "--sim-genes", "16"], True),
    ("serve_http", ["--requests", "3"], True),
]


@pytest.mark.slow
@pytest.mark.parametrize("name,args,has_out", _CASES, ids=[c[0] for c in _CASES])
def test_example_runs(name, args, has_out, monkeypatch, tmp_path):
    import importlib

    mod = importlib.import_module(name)
    if has_out:
        args = args + ["--out", str(tmp_path)]
    monkeypatch.setattr(sys, "argv", [name] + args)
    mod.main()
