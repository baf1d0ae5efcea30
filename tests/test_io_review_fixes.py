"""Regression tests for the round-3 io/simulate/graph/observability review.

Pins: cross-array-consistent simulated image palette, tissue_fraction
validation, deterministic position-file discovery, Loupe delimiter threading
on grid datasets, numeric Loupe labels in to_splotch_annots, the
mismatched-barcode guard, the graph feature-axis guard, zero-labeled-node
accuracy, MetricsLogger type preservation, config tuple round-trip, and the
bench retry clamp.
"""
import gzip
import json
import os

import numpy as np
import pytest


def test_simulate_palette_consistent_across_arrays(tmp_path):
    """Layer_k paints the SAME color on every simulated array (a property of
    the tissue, like the gene signatures) so cross-array image train/val
    generalization is meaningful."""
    import pandas as pd
    from PIL import Image

    from gridnext_tpu.data.simulate import simulate_spaceranger_dir

    centers = {}
    for i in range(2):
        sim = simulate_spaceranger_dir(str(tmp_path / f"a{i}"), seed=i,
                                       n_genes=8, n_classes=3, image=True)
        img = np.asarray(Image.open(sim["image_file"]))
        pos = pd.read_csv(sim["position_file"], index_col=0, header=0)
        annot = pd.read_csv(sim["annot_file"], index_col=0, header=0)
        lbl = annot.iloc[:, 0]
        # median color of a small window at each class's first spot center
        colors = {}
        for cls in sorted(lbl.unique()):
            b = lbl[lbl == cls].index[0]
            y = int(pos.loc[b, "pxl_row_in_fullres"])
            x = int(pos.loc[b, "pxl_col_in_fullres"])
            colors[cls] = np.median(img[y - 1:y + 2, x - 1:x + 2], (0, 1))
        centers[i] = colors
    assert set(centers[0]) == set(centers[1])
    for cls in centers[0]:
        # JPEG quantization allows small drift; cross-array color identity
        assert np.abs(centers[0][cls] - centers[1][cls]).max() < 25, cls


def test_simulate_rejects_degenerate_tissue(tmp_path):
    from gridnext_tpu.data.simulate import simulate_spaceranger_dir

    with pytest.raises(ValueError):
        simulate_spaceranger_dir(str(tmp_path / "z"), tissue_fraction=0.0)
    with pytest.raises(ValueError):
        simulate_spaceranger_dir(str(tmp_path / "z2"), tissue_fraction=1.5)


def test_find_position_file_prefers_v2_deterministically(tmp_path):
    from gridnext_tpu.io.spaceranger import find_position_file

    spatial = tmp_path / "outs" / "spatial"
    spatial.mkdir(parents=True)
    (spatial / "tissue_positions_list.csv").write_text("v1\n")
    (spatial / "tissue_positions.csv").write_text("barcode,v2\n")
    assert find_position_file(str(tmp_path)).endswith("tissue_positions.csv")


def test_countgrid_loupe_delim(tmp_path):
    """A ';'-delimited Loupe export parses identically to the ','-default on
    the GRID dataset (the spot datasets already honored the delimiter)."""
    from gridnext_tpu.data.datasets import CountGridDataset
    from gridnext_tpu.data.simulate import simulate_spaceranger_dir
    from gridnext_tpu.io import prepare_count_files

    sim = simulate_spaceranger_dir(str(tmp_path / "a0"), seed=0,
                                   n_genes=8, n_classes=3)
    (cache,) = prepare_count_files([sim["spaceranger_dir"]])
    semi = tmp_path / "semi.csv"
    semi.write_text(open(sim["annot_file"]).read().replace(",", ";"))

    ref = CountGridDataset([cache], annot_files=[sim["annot_file"]],
                           position_files=[sim["position_file"]])
    alt = CountGridDataset([cache], annot_files=[str(semi)],
                           position_files=[sim["position_file"]],
                           loupe_delim=";")
    (xr, yr), (xa, ya) = ref[0], alt[0]
    assert list(ref.classes) == list(alt.classes)
    np.testing.assert_array_equal(yr, ya)
    np.testing.assert_array_equal(xr, xa)


def test_to_splotch_annots_numeric_labels(tmp_path):
    """Numeric Loupe cluster IDs become one-hot classes (not silently
    dropped), matching the grid readers' _label_str coercion."""
    import pandas as pd

    from gridnext_tpu.data.simulate import simulate_spaceranger_dir
    from gridnext_tpu.io.annotations import to_splotch_annots

    sim = simulate_spaceranger_dir(str(tmp_path / "a0"), seed=0,
                                   n_genes=8, n_classes=3)
    annot = pd.read_csv(sim["annot_file"])
    annot["AARs"] = annot["AARs"].map(
        lambda s: int(s.replace("Layer", "")))  # int64 column
    numeric = tmp_path / "numeric.csv"
    annot.to_csv(numeric, index=False)

    dest = tmp_path / "splotch"
    dest.mkdir()
    to_splotch_annots([str(numeric)], [sim["spaceranger_dir"]], str(dest))
    out = pd.read_csv(dest / "numeric.tsv", sep="\t", index_col=0)
    # read_csv re-parses the written string labels as ints; compare as str
    assert sorted(map(str, out.index)) == ["1", "2", "3"]
    assert int(out.values.sum()) == len(annot)  # every spot one-hot

    # a barcode with no positions row is a loud mismatch, not a KeyError
    bad = annot.copy()
    bad.loc[0, "Barcode"] = "NOT-A-BARCODE-1"
    badfile = tmp_path / "bad.csv"
    bad.to_csv(badfile, index=False)
    with pytest.raises(ValueError, match="mismatch"):
        to_splotch_annots([str(badfile)], [sim["spaceranger_dir"]],
                          str(dest), include_annots=["1", "2", "3"])


def test_graph_feature_axis_guard(tmp_path):
    from gridnext_tpu.data.graph_data import visium_to_graphdata
    from gridnext_tpu.data.simulate import simulate_spaceranger_dir

    a = simulate_spaceranger_dir(str(tmp_path / "a"), seed=0, n_genes=8,
                                 n_classes=2)
    b = simulate_spaceranger_dir(str(tmp_path / "b"), seed=1, n_genes=9,
                                 n_classes=2)
    with pytest.raises(ValueError, match="feature axes differ"):
        visium_to_graphdata([a["spaceranger_dir"], b["spaceranger_dir"]],
                            [a["annot_file"], b["annot_file"]])


def test_graph_node_loss_zero_labeled():
    import jax.numpy as jnp

    from gridnext_tpu.models.graph import graph_node_loss

    logits = jnp.zeros((4, 3))
    y = -jnp.ones((4,), jnp.int32)  # all padding/unlabeled
    loss, corr, n = graph_node_loss(logits, y)
    assert float(loss) == 0.0 and int(n) == 0
    acc = corr / jnp.maximum(n, 1)  # the documented guard pattern
    assert np.isfinite(float(acc))


def test_metrics_logger_preserves_types(tmp_path):
    from gridnext_tpu.observability import MetricsLogger

    p = tmp_path / "m.jsonl"
    with MetricsLogger(str(p)) as ml:
        ml.log(step=1, flag=True, tag="007", loss=np.float32(1.5))
    rec = json.loads(p.read_text().splitlines()[0])
    assert rec["flag"] is True          # not 1.0
    assert rec["tag"] == "007"          # leading zero kept
    assert rec["loss"] == 1.5           # numerics still floats


def test_load_config_restores_tuples(tmp_path):
    from gridnext_tpu.config import DenseNetConfig, load_config, save_config

    cfg = DenseNetConfig()
    p = tmp_path / "c.json"
    save_config(cfg, p)
    loaded = load_config(DenseNetConfig, p)
    assert loaded == cfg
    assert isinstance(loaded.block_config, tuple)
    hash(loaded.block_config)  # usable as a jit-static argument


def test_bench_retry_attempts_clamped(monkeypatch):
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import _retry

    monkeypatch.setenv("GNX_BENCH_ATTEMPTS", "0")
    assert _retry(lambda: 42) == 42  # clamps to one attempt, still runs


def test_bench_tree_cache_roundtrip(tmp_path):
    """bench's distill-artifact cache: pytrees round-trip by flattened leaf
    order, f16-stored leaves restore to the template dtype, template-less
    names load as float32 lists."""
    import sys

    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp

    from bench import _tree_load, _tree_save

    tree = {"a": {"k": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
            "b": jnp.full((4,), 2.5, jnp.float32)}
    lst = [np.full((2, 2), 3.0, np.float32), np.full((3,), 7.0, np.float32)]
    p = str(tmp_path / "cache.npz")
    _tree_save(p, {"t": tree, "k": lst, "__f16__": ("t",)})
    out = _tree_load(p, {"t": jax.eval_shape(lambda: tree), "k": None})
    assert out["t"]["a"]["k"].dtype == jnp.float32  # f16 storage, f32 restore
    np.testing.assert_allclose(out["t"]["a"]["k"], tree["a"]["k"])
    np.testing.assert_allclose(out["t"]["b"], 2.5)
    np.testing.assert_allclose(out["k"][1], 7.0)


def test_bench_regression_gate_maps_legacy_value(capsys, tmp_path,
                                                 monkeypatch):
    """_compare_to_prior maps a pre-r5 artifact's `value` (the exact-
    DenseNet route) onto exact_densenet121_spots_per_sec and flags >10%
    drops route-to-route."""
    import json as _json
    import sys

    sys.path.insert(0, "/root/repo")
    import bench

    prior = {"n": 1, "parsed": {"value": 20000.0,
                                "scbert_pretrain_ms_per_step": 150.0}}
    (tmp_path / "BENCH_r01.json").write_text(_json.dumps(prior))
    monkeypatch.setattr(bench.os.path, "dirname",
                        lambda p: str(tmp_path))
    bench._compare_to_prior({"exact_densenet121_spots_per_sec": 15000.0,
                             "value": 190000.0,
                             "scbert_pretrain_ms_per_step": 180.0})
    err = capsys.readouterr().err
    assert "exact_densenet121_spots_per_sec: 20000 -> 15000" in err
    assert err.count("REGRESSION >10%") == 2  # exact -25%, scbert +20%


def test_bench_emits_partial_json_on_exception(monkeypatch, capsys):
    """The one-JSON-line contract survives an uncaught exception: a fatal
    error in the headline bench still emits the (partial) artifact before
    the process dies (bench main's try/finally)."""
    import json as _json
    import signal
    import sys

    sys.path.insert(0, "/root/repo")
    import bench

    saved = (signal.getsignal(signal.SIGTERM), signal.getsignal(signal.SIGINT))
    monkeypatch.setattr(bench, "_EMITTED", False)

    def boom(*a, **k):
        raise RuntimeError("synthetic fatal headline failure")

    monkeypatch.setattr(bench, "bench_tpu_image", boom)
    try:
        with pytest.raises(RuntimeError):
            bench.main()
    finally:
        signal.signal(signal.SIGTERM, saved[0])
        signal.signal(signal.SIGINT, saved[1])
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    d = _json.loads(line)
    assert d["metric"] == ("full_slide_registration_spots_per_sec"
                           "_image_f_plus_g")
    assert "value" in d and "vs_baseline" in d
