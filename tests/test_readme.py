"""The README never lies: its code blocks run against the real API.

Two pins:
  * the quickstart ```python``` block is executed VERBATIM (free variables --
    the dataset paths and a label grid -- are bound by the test, every API
    call comes from the README text), so any signature drift in the
    documented surface fails here before a user hits it;
  * every ``python -m gridnext_tpu ...`` command line in the README is
    checked against the actual argparse surface (subcommand exists, every
    ``--flag`` is a real option of that subcommand), placeholders and all.
"""

import re
import shlex
from pathlib import Path

README = Path(__file__).resolve().parents[1] / "README.md"


def _code_blocks(lang):
    return re.findall(rf"```{lang}\n(.*?)```", README.read_text(), re.S)


def test_quickstart_python_block_runs_verbatim(tmp_path, monkeypatch):
    from gridnext_tpu.data.simulate import simulate_spaceranger_dir
    from gridnext_tpu.io import find_position_file

    blocks = _code_blocks("python")
    assert blocks, "README has no python block"
    quickstart = blocks[0]
    # guard against silently testing the wrong block
    assert "create_visium_dataset" in quickstart

    sims = [simulate_spaceranger_dir(tmp_path / f"a{i}", seed=i, n_genes=24,
                                     n_classes=3) for i in range(2)]

    # the free variables a reader supplies from their own cohort
    env = {
        "spaceranger_dirs": [s["spaceranger_dir"] for s in sims],
        "annots": [s["annot_file"] for s in sims],
        "label_grid": sims[0]["label_grid"],
        "position_file": str(find_position_file(sims[0]["spaceranger_dir"])),
    }
    monkeypatch.chdir(tmp_path)  # the block writes "out.csv"
    exec(compile(quickstart, str(README) + "::quickstart", "exec"), env)

    out = tmp_path / "out.csv"
    assert out.exists() and out.stat().st_size > 0
    y_true, y_pred, y_smax = env["y_true"], env["y_pred"], env["y_smax"]
    assert y_true.shape == y_pred.shape
    assert y_smax.shape == (len(y_true), len(env["grids"].classes))
    # two trained stages on separable synthetic classes must beat chance
    assert (y_true == y_pred).mean() > 1.0 / len(env["grids"].classes)


def _iter_cli_lines(text):
    """Yield shell commands from ``bash`` blocks, continuations joined."""
    for block in _code_blocks("bash"):
        pending = ""
        for raw in block.splitlines():
            line = pending + raw.strip()
            if line.endswith("\\"):
                pending = line[:-1] + " "
                continue
            pending = ""
            if line:
                yield line


def test_readme_cli_lines_match_parser():
    from gridnext_tpu.cli import build_parser

    import argparse

    ap = build_parser()
    sub = next(a for a in ap._actions
               if isinstance(a, argparse._SubParsersAction))
    global_opts = set(ap._option_string_actions)

    checked = 0
    for line in _iter_cli_lines(README.read_text()):
        tokens = shlex.split(line, comments=True)
        if tokens[:3] != ["python", "-m", "gridnext_tpu"]:
            continue
        tokens = tokens[3:]
        # global options (e.g. --profile-dir DIR) come before the subcommand
        while tokens and tokens[0].startswith("-"):
            tok = tokens.pop(0)
            opt = tok.split("=", 1)[0]
            assert opt in global_opts, f"{line!r}: unknown global {opt}"
            takes_value = ap._option_string_actions[opt].nargs != 0
            if takes_value and "=" not in tok and tokens:
                tokens.pop(0)  # its value
        assert tokens, f"{line!r}: no subcommand"
        cmd = tokens.pop(0)
        assert cmd in sub.choices, f"{line!r}: unknown subcommand {cmd}"
        opts = set(sub.choices[cmd]._option_string_actions) | global_opts
        for tok in tokens:
            if tok.startswith("--"):
                flag = tok.split("=", 1)[0]
                assert flag in opts, f"{line!r}: unknown flag {flag} for {cmd}"
        checked += 1
    # the README documents the whole command surface; a refactor that drops
    # the bash blocks (or renames the module) should fail loudly here
    assert checked >= 8, f"only {checked} CLI lines found in README"


def test_api_md_is_current(tmp_path):
    """docs/api.md matches what tools/gen_api_docs.py generates today.

    The reference doc is committed (users read it without running anything),
    so surface changes must regenerate it; this pins that contract.
    """
    import importlib.util

    repo = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "gen_api_docs", repo / "tools" / "gen_api_docs.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = tmp_path / "api.md"
    mod.main(out_path=str(out))
    fresh = out.read_text()
    committed = (repo / "docs" / "api.md").read_text()
    assert fresh == committed, (
        "docs/api.md is stale; regenerate with `python tools/gen_api_docs.py`")
