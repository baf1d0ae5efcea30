"""Regression tests for the round-3 CLI review findings.

Each test pins one fixed behavior: mesh-spec validation, the shared
patch-cache suffix contract, --min-detection flag semantics, Loupe-CSV
naming under duplicate array basenames, the register unknown-model guard,
prepare-time patch validation, and the joint-stage scBERT freeze policy.
"""
import json
import os
from argparse import Namespace

import numpy as np
import pytest


def test_parse_mesh_rejects_nonpositive():
    from gridnext_tpu import cli

    with pytest.raises(SystemExit):
        cli._parse_mesh(Namespace(mesh="data=0"))
    with pytest.raises(SystemExit):
        cli._parse_mesh(Namespace(mesh="data=-2,spot=2"))
    # well-formed specs still parse
    assert cli._parse_mesh(Namespace(mesh="data=2,spot=4")) == {
        "data": 2, "spot": 4}
    assert cli._parse_mesh(Namespace(mesh="auto")) == "auto"


def test_checked_mesh_shape_clean_exit_on_bad_mesh():
    """A mesh the device pool can't satisfy exits cleanly (no raw
    ValueError traceback from _resolve_mesh escaping the CLI)."""
    from gridnext_tpu import cli

    with pytest.raises(SystemExit):
        cli._checked_mesh_shape(Namespace(mesh="data=999"))


def test_patch_cache_suffix_contract():
    """THE cache-naming helper: px/um, window, and HD compositions — the
    single source both the dataset factory and CLI `prepare` consume."""
    from gridnext_tpu.pipeline import patch_cache_suffix

    assert patch_cache_suffix(patch_size_px=128) == "_patches128px"
    assert patch_cache_suffix(patch_size_um=55.0) == "_patches55um"
    assert (patch_cache_suffix(patch_size_px=128, window_size_px=192)
            == "_patches128px_w192")
    assert (patch_cache_suffix(patch_size_px=32, hd_binning="square_016um",
                               hd_dims=(12, 10))
            == "_square_016um_12x10_patches32px")
    with pytest.raises(ValueError):  # HD caches are dims-specific
        patch_cache_suffix(patch_size_px=32, hd_binning="square_016um")


def test_min_detection_default_resolution(tmp_path, capsys):
    from gridnext_tpu import cli

    assert cli._min_detection(Namespace(min_detection=None)) == 0.02
    assert cli._min_detection(Namespace(min_detection=0.05)) == 0.05
    assert cli._min_detection(Namespace()) == 0.02

    # the existing-cache note fires ONLY when the user actually passed
    # --min-detection (argparse default is None, not 0.02)
    cache = tmp_path / "a.unified.tsv.gz"
    cache.write_text("x")
    cli._warn_existing_caches(Namespace(min_detection=None), [str(cache)])
    assert "no effect" not in capsys.readouterr().out
    cli._warn_existing_caches(Namespace(min_detection=0.1), [str(cache)])
    assert "no effect" in capsys.readouterr().out


def test_write_loupe_duplicate_basenames(tmp_path):
    """Cohorts of '.../outs' dirs (the standard Spaceranger layout) must not
    overwrite each other's Loupe CSVs — duplicates are index-prefixed."""
    from gridnext_tpu import cli
    from gridnext_tpu.data.simulate import simulate_spaceranger_dir

    dirs = []
    for i, run in enumerate(("runA", "runB")):
        d = tmp_path / run / "outs"
        simulate_spaceranger_dir(str(d), seed=i, n_genes=10, n_classes=2)
        dirs.append(str(d))
    out = tmp_path / "regout"
    args = Namespace(spaceranger=dirs, out=str(out))
    label = np.zeros((200, 200), np.int32)  # all-background is valid output
    for i, srd in enumerate(dirs):
        cli._write_loupe(label, srd, args, ["x", "y"], index=i)
    files = sorted(os.listdir(out))
    assert len(files) == 2 and files[0] != files[1]
    assert files == ["00_outs_loupe.csv", "01_outs_loupe.csv"]


def test_register_unknown_model_exits(tmp_path):
    """A model.json with an unexpected "model" value exits with a clear
    message instead of falling through to the CountMLP path and dying in
    flax (mirrors export's explicit refusal)."""
    import jax.numpy as jnp

    from gridnext_tpu import cli
    from gridnext_tpu.train.loops import TrainState, save_checkpoint

    mdir = tmp_path / "model"
    mdir.mkdir()
    state = TrainState(params={"w": np.zeros(3, np.float32)},
                       batch_stats=None, opt_state=(),
                       step=jnp.zeros((), jnp.int32), extra_vars={})
    save_checkpoint(str(mdir / "g_state.msgpack"), state)
    (mdir / "model.json").write_text(
        json.dumps({"model": "SomethingNew", "classes": ["a", "b"]}))
    args = Namespace(model=str(mdir), spaceranger=[str(tmp_path)],
                     images=None, out=str(tmp_path / "o.csv"),
                     slide_batch=4, mesh=None)
    with pytest.raises(SystemExit) as ei:
        cli._cmd_register(args)
    assert "SomethingNew" in str(ei.value)


def test_prepare_rejects_invalid_patch_args(tmp_path):
    """`prepare` validates patch/window args BEFORE the expensive
    extraction — a cache train-image would refuse must not be built."""
    from gridnext_tpu import cli
    from gridnext_tpu.data.simulate import simulate_spaceranger_dir

    d = tmp_path / "a0"
    sim = simulate_spaceranger_dir(str(d), seed=0, n_genes=10, n_classes=2,
                                   image=True)
    base = Namespace(spaceranger=[str(d)], hd_binning=None,
                     min_detection=None, images=[sim["image_file"]])
    with pytest.raises(SystemExit):  # too small for any f's downsampling
        cli._cmd_prepare(Namespace(**vars(base), patch_px=16,
                                   window_px=None))
    with pytest.raises(SystemExit):  # window smaller than patch
        cli._cmd_prepare(Namespace(**vars(base), patch_px=128, window_px=64))
    assert not [p for p in os.listdir(d) if "_patches" in p]


def test_gridwise_optimizer_frozen_f_labels():
    """frozen_f_labels carries a per-subtree freeze into the joint stage:
    'frozen' scBERT leaves get zero updates even with f_lr set, while
    trainable scBERT leaves, the other f, and g all move."""
    import jax
    import jax.numpy as jnp

    from gridnext_tpu.train.loops import make_gridwise_optimizer

    params = {
        "count_classifier": {"head": {"kernel": jnp.ones(2)},
                             "body": {"kernel": jnp.ones(2)}},
        "image_classifier": {"kernel": jnp.ones(2)},
        "corrector": {"kernel": jnp.ones(2)},
    }

    def scbert_labels(p):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: ("train" if str(path[0].key) == "head"
                             else "frozen"), p)

    tx = make_gridwise_optimizer(
        1e-1, f_lr=1e-1, frozen_f_labels={"count_classifier": scbert_labels})
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    assert np.all(np.asarray(updates["count_classifier"]["body"]["kernel"])
                  == 0.0)
    assert np.any(np.asarray(updates["count_classifier"]["head"]["kernel"])
                  != 0.0)
    assert np.any(np.asarray(updates["image_classifier"]["kernel"]) != 0.0)
    assert np.any(np.asarray(updates["corrector"]["kernel"]) != 0.0)

    # without the freeze map the labels fall back to plain f/g
    tx2 = make_gridwise_optimizer(1e-1, f_lr=None)
    up2, _ = tx2.update(grads, tx2.init(params), params)
    assert np.all(np.asarray(up2["count_classifier"]["body"]["kernel"])
                  == 0.0)  # f_lr=None -> whole f frozen
    assert np.any(np.asarray(up2["corrector"]["kernel"]) != 0.0)
