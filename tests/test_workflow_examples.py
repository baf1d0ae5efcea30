"""Regression floors for the research-workflow artifacts (BASELINE configs 4-5).

Each example runs end to end on simulated data at reduced settings; the
floors are far below the measured values (bin 1.0/1.0, markers 1.0/0.97,
concat ~parity with pca) so they catch breakage, not noise.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def test_bin_classifier_floor():
    import bin_classifier

    m = bin_classifier.main(["--epochs", "3", "--arrays", "3"])
    assert m["acc_f"] > 0.8 and m["acc_g"] > 0.8


def test_marker_genes_floor():
    import register_marker_genes

    m = register_marker_genes.main(["--epochs", "3", "--arrays", "3"])
    assert m["n_markers"] == 12
    assert m["acc_f"] > 0.7 and m["acc_g"] > 0.7


@pytest.mark.slow
def test_register_concat_floor():
    import register_concat

    m = register_concat.main(["--epochs", "2", "--arrays", "3"])
    # fusion must at least be competitive with its better unimodal input
    assert m["acc_concat"] > 0.6


def test_scbert_pretrain_floor():
    import scbert_pretrain

    losses = scbert_pretrain.main(["--steps", "8", "--vocab", "512",
                                   "--sim-genes", "64"])
    assert losses[-1] < losses[0] * 0.7  # masked-bin CE must drop materially


@pytest.mark.slow
def test_cli_train_mm_register_end_to_end(tmp_path):
    """CLI multimodal flow: train-mm (count-f + image-f -> GridNetHexMM g)
    then register with both modalities."""
    import sys

    import pandas as pd

    from gridnext_tpu import cli
    from gridnext_tpu.data import simulate_spaceranger_dir

    sims = [simulate_spaceranger_dir(tmp_path / f"a{i}", seed=i, n_genes=15,
                                     n_classes=3, image=True,
                                     spot_spacing_px=20) for i in range(2)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    imgs = [s["image_file"] for s in sims]

    argv_bak = sys.argv
    try:
        sys.argv = (["x", "train-mm", "--spaceranger"] + dirs +
                    ["--annots"] + annots + ["--images"] + imgs +
                    ["--out", str(tmp_path / "model"), "--epochs", "1",
                     "--patch-px", "32", "--patch-chunk", "1664",
                     "--min-detection", "0", "--batch-size", "64", "--f", "tpu"])
        cli.main()
        sys.argv = ["x", "register", "--spaceranger", dirs[0],
                    "--images", imgs[0], "--model", str(tmp_path / "model"),
                    "--out", str(tmp_path / "loupe.csv")]
        cli.main()
    finally:
        sys.argv = argv_bak
    df = pd.read_csv(tmp_path / "loupe.csv")
    assert len(df) > 1000

    # MM deployment artifact: export the grid->labels forward and check it
    # reproduces the register CSV's per-class counts from the same grids
    import json
    from collections import Counter

    import jax.numpy as jnp
    import numpy as np

    from gridnext_tpu.data import create_visium_dataset
    from gridnext_tpu.serving import load_exported_registration

    art = tmp_path / "mm.hlo"
    try:
        sys.argv = ["x", "export", "--model", str(tmp_path / "model"),
                    "--out", str(art)]
        cli.main()
    finally:
        sys.argv = argv_bak
    side = json.loads((tmp_path / "mm.hlo.json").read_text())
    assert side["model"] == "GridNetHexMM" and not side["explicit_fg"]
    mm = create_visium_dataset(dirs, spatial=True, use_count=True,
                               use_image=True, fullres_image_files=imgs,
                               patch_size_px=32, minimum_detection_rate=None)
    (xi, xc), _ = mm[0]
    fn = load_exported_registration(art.read_bytes())
    labels = np.asarray(fn(jnp.asarray(xi[None]),
                           jnp.asarray(np.log1p(xc)[None],
                                       jnp.float32)))[0]
    got = [side["classes"][v - 1] for v in labels[labels > 0]]
    assert len(got) == len(df)
    assert Counter(got) == Counter(df["AARs"])

    # evaluate on the MM model: metrics JSON over both modalities; --f-only
    # must refuse (MM patch predictions concat both modalities' outputs)
    try:
        sys.argv = (["x", "evaluate", "--model", str(tmp_path / "model"),
                     "--spaceranger"] + dirs + ["--annots"] + annots +
                    ["--images"] + imgs +
                    ["--out", str(tmp_path / "mm_metrics.json")])
        cli.main()
        sys.argv = sys.argv + ["--f-only"]
        with pytest.raises(SystemExit, match="multimodal"):
            cli.main()
    finally:
        sys.argv = argv_bak
    m = json.loads((tmp_path / "mm_metrics.json").read_text())
    assert m["model"] == "GridNetHexMM" and m["n_arrays"] == 2
    assert 0.0 <= m["accuracy"] <= 1.0


@pytest.mark.slow
def test_cli_train_mm_scbert_count_f(tmp_path):
    """CLI --count-f scbert: counts reindex into the gene2vec space (IDs ->
    symbols via features.tsv.gz), a small scBERT trains as the count-f, the
    MM g uses count_chunk, and register rebuilds the same transform+model
    from checkpoint metadata."""
    import json
    import sys

    import pandas as pd

    from gridnext_tpu import cli
    from gridnext_tpu.data import simulate_spaceranger_dir
    from gridnext_tpu.models.scbert import load_gene2vec_names

    g2v = load_gene2vec_names()
    sims = [simulate_spaceranger_dir(tmp_path / f"a{i}", seed=i, n_genes=15,
                                     n_classes=3, image=True,
                                     spot_spacing_px=20,
                                     gene_names=g2v[:15]) for i in range(2)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    imgs = [s["image_file"] for s in sims]

    # fabricate a 'pretrained' scBERT checkpoint: fresh init (depth=1,
    # vocab=64) saved as a TrainState msgpack. --scbert-ckpt must load it,
    # and --scbert-finetune must freeze everything but norm/last-layer/head.
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gridnext_tpu.models import scBERT
    from gridnext_tpu.train import create_train_state, load_checkpoint
    from gridnext_tpu.train.loops import save_checkpoint

    f_pre = scBERT(n_genes=64, dim=16, depth=1, heads=2, n_classes=3,
                   generalized_attention=True)
    pre_state = create_train_state(f_pre, jax.random.key(9),
                                   jnp.zeros((1, 64), jnp.float32),
                                   optax.adam(1e-3))
    ckpt_path = tmp_path / "scbert_pre.msgpack"
    save_checkpoint(ckpt_path, pre_state, include_opt_state=False)

    argv_bak = sys.argv
    try:
        sys.argv = (["x", "train-mm", "--spaceranger"] + dirs +
                    ["--annots"] + annots + ["--images"] + imgs +
                    ["--out", str(tmp_path / "model"), "--epochs", "1",
                     "--patch-px", "32", "--patch-chunk", "1664",
                     "--min-detection", "0", "--batch-size", "64",
                     "--f", "tpu", "--count-f", "scbert",
                     "--scbert-vocab", "64", "--scbert-dim", "16",
                     "--scbert-depth", "1", "--scbert-heads", "2",
                     "--count-chunk", "416",
                     "--scbert-ckpt", str(ckpt_path), "--scbert-finetune"])
        cli.main()
        meta = json.load(open(tmp_path / "model" / "model.json"))
        assert meta["count_f"] == "scbert" and meta["scbert_vocab"] == 64
        assert meta["log1p"] is False and meta["count_chunk"] == 416
        # freeze policy: token embedding stayed at the pretrained values,
        # the classifier head trained away from them
        trained = load_checkpoint(tmp_path / "model" / "f_count_state.msgpack")
        emb = "token_emb"  # frozen under the depth-1 policy
        lm_t = trained["params"]["performer_lm"]
        lm_p = jax.device_get(pre_state.params)["performer_lm"]
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(lm_t[emb])[0]),
            np.asarray(jax.tree_util.tree_leaves(lm_p[emb])[0]))
        head_t = np.concatenate([np.ravel(a) for a in
                                 jax.tree_util.tree_leaves(trained["params"]["to_out"])])
        head_p = np.concatenate([np.ravel(a) for a in
                                 jax.tree_util.tree_leaves(
                                     jax.device_get(pre_state.params)["to_out"])])
        assert not np.allclose(head_t, head_p)
        sys.argv = ["x", "register", "--spaceranger", dirs[0],
                    "--images", imgs[0], "--model", str(tmp_path / "model"),
                    "--out", str(tmp_path / "loupe.csv")]
        cli.main()
    finally:
        sys.argv = argv_bak
    df = pd.read_csv(tmp_path / "loupe.csv")
    assert len(df) > 1000
    assert set(df["AARs"].unique()) <= {"Layer1", "Layer2", "Layer3"}

    # scBERT MM export: the artifact takes an EXPLICIT fg-mask input (the
    # gene2vec reindex changes the zero support) and must reproduce the
    # register CSV's per-class counts from raw-count foreground
    from collections import Counter

    import jax.numpy as jnp

    from gridnext_tpu.data import create_visium_dataset
    from gridnext_tpu.serving import load_exported_registration

    art = tmp_path / "scbert_mm.hlo"
    try:
        sys.argv = ["x", "export", "--model", str(tmp_path / "model"),
                    "--out", str(art)]
        cli.main()
    finally:
        sys.argv = argv_bak
    side = json.load(open(str(art) + ".json"))
    assert side["explicit_fg"] is True
    assert side["grid_shapes"][1] == [78, 64, 64]   # gene2vec space
    mm = create_visium_dataset(dirs, spatial=True, use_count=True,
                               use_image=True, fullres_image_files=imgs,
                               patch_size_px=32, minimum_detection_rate=None)
    (xi, xc), _ = mm[0]
    fg = (xc.sum(-1) > 0).astype(np.int32)          # RAW-count tissue mask
    transform, _ = cli._scbert_count_transform(dirs, None, 64)
    fn = load_exported_registration(art.read_bytes())
    labels = np.asarray(fn(jnp.asarray(xi[None]),
                           jnp.asarray(transform(xc)[None], jnp.float32),
                           jnp.asarray(fg[None])))[0]
    got = [side["classes"][v - 1] for v in labels[labels > 0]]
    assert len(got) == len(df)
    assert Counter(got) == Counter(df["AARs"])


def test_visium_hd_example_floor():
    """Square-lattice HD workflow: bins classified well above 4-class chance
    and direct-coordinate Loupe export round-trips to real-HD barcodes."""
    import pandas as pd

    import visium_hd

    m = visium_hd.main(["--epochs", "6", "--arrays", "3",
                        "--grid", "32", "28"])
    assert m["grid"] == (32, 28)
    assert m["acc_g"] > 0.5
    df = pd.read_csv(m["loupe_csv"])
    assert df["Barcode"].str.startswith("s_016um_").all()


def test_graph_gcn_example_floor():
    import graph_gcn

    m = graph_gcn.main(["--steps", "50", "--arrays", "2"])
    assert m["acc"] > 0.6  # 4-class chance is 0.25


@pytest.mark.slow
def test_cli_train_mm_hd_square_end_to_end(tmp_path):
    """CLI multimodal flow on a square HD lattice: train-mm --hd-binning
    --grid-dims (GridNetMM, Cartesian corrector) then register."""
    import json
    import sys

    import pandas as pd

    from gridnext_tpu import cli
    from gridnext_tpu.data import simulate_spaceranger_dir

    binning = "square_016um"
    sims = [simulate_spaceranger_dir(tmp_path / f"a{i}", seed=i, n_genes=12,
                                     n_classes=3, spaceranger_version="hd",
                                     hd_grid=(14, 12), hd_binning=binning,
                                     image=True, spot_spacing_px=12)
            for i in range(2)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    imgs = [s["image_file"] for s in sims]

    argv_bak = sys.argv
    try:
        sys.argv = (["x", "train-mm", "--hd-binning", binning,
                     "--grid-dims", "auto", "--spaceranger"] + dirs +
                    ["--annots"] + annots + ["--images"] + imgs +
                    ["--out", str(tmp_path / "model"), "--epochs", "1",
                     "--patch-px", "32", "--patch-chunk", "168",
                     "--min-detection", "0", "--batch-size", "32",
                     "--f", "tpu"])
        cli.main()
        sys.argv = ["x", "register", "--spaceranger", dirs[0],
                    "--images", imgs[0], "--model", str(tmp_path / "model"),
                    "--out", str(tmp_path / "loupe.csv")]
        cli.main()
    finally:
        sys.argv = argv_bak

    meta = json.loads((tmp_path / "model" / "model.json").read_text())
    assert meta["model"] == "GridNetMM"
    assert meta["grid_dims"] == [14, 12]
    df = pd.read_csv(tmp_path / "loupe.csv")
    assert df["Barcode"].str.startswith("s_016um_").all()
    assert len(df) == int((sims[0]["label_grid"] > 0).sum())


def test_register_hvgs_floor():
    import register_hvgs

    m = register_hvgs.main(["--epochs", "3", "--arrays", "3"])
    assert m["n_hvgs"] == 24
    assert m["acc_f"] > 0.6 and m["acc_g"] > 0.6


@pytest.mark.slow
def test_scbert_mm_fullscale_smoke():
    """The full-scale artifact's machinery at reduced dims (full scale runs
    on the real TPU; ms/array recorded in docs/roadmap.md)."""
    import scbert_mm_fullscale

    r = scbert_mm_fullscale.main(["--grid", "4", "4", "--vocab", "256",
                                  "--image-px", "32", "--patch-chunk", "8",
                                  "--depth", "2"])
    assert r["forward_ms_per_array"] > 0
    assert r["train_ms_per_array"] > 0


@pytest.mark.slow
def test_train_image_fullscale_smoke():
    """The classic-Visium image-training artifact at reduced dims (full
    78x64 DenseNet-121 scale runs on the real TPU; ms/array in
    docs/roadmap.md). Covers both optimizer modes."""
    import train_image_fullscale

    r = train_image_fullscale.main(["--grid", "6", "8", "--patch-px", "32",
                                    "--patch-chunk", "16",
                                    "--f-arch", "tiny"])
    assert r["forward_ms_per_array"] > 0
    assert r["train_ms_per_array"] > 0
    r = train_image_fullscale.main(["--grid", "6", "8", "--patch-px", "32",
                                    "--patch-chunk", "16",
                                    "--f-arch", "tiny", "--g-only"])
    assert r["train_ms_per_array"] > 0


@pytest.mark.slow
def test_visium_hd_fullscale_smoke():
    """The HD capture-area-scale training artifact at reduced dims (full
    384x384 scale runs on the real TPU; ms/array in docs/roadmap.md)."""
    import visium_hd_fullscale

    r = visium_hd_fullscale.main(["--grid", "8", "8", "--patch-px", "32",
                                  "--patch-chunk", "16"])
    assert r["forward_ms_per_array"] > 0
    assert r["train_ms_per_array"] > 0


@pytest.mark.slow
def test_scbert_pretrain_fullscale_smoke():
    """The full-scale MLM pretraining machinery at reduced dims (full
    16,906-token scale runs on the real TPU; ms/step in docs/roadmap.md)."""
    import scbert_pretrain_fullscale

    r = scbert_pretrain_fullscale.main(["--vocab", "256", "--depth", "2",
                                        "--batch", "2",
                                        "--timed-steps", "1"])
    assert r["ms_per_step"] > 0 and r["tokens_per_sec"] > 0


@pytest.mark.slow
def test_artifact_timing_smoke():
    """The deployment-artifact measurement machinery at reduced dims: the
    export/reload path must reproduce the live labels exactly (asserted
    inside) and report coherent timings (TPU numbers in docs/roadmap.md)."""
    import artifact_timing

    r = artifact_timing.main(["--small", "--skip-portable", "--calls", "1",
                              "--repeats", "2"])
    assert r["blob_mb"] > 0 and r["deserialize_s"] > 0
    assert r["chained_live_ms_slide"] > 0
    assert r["chained_artifact_ms_slide"] > 0


def test_register_cv_floor():
    import register_cv

    m = register_cv.main(["--epochs", "4", "--subjects", "3"])
    assert m["n_folds"] == 3 and m["shape"] == (3, 4)
    # fresh-per-fold training must actually learn: mean val loss drops
    assert m["final_val_mean"] < m["first_val_mean"]


@pytest.mark.slow
def test_distill_serving_example():
    """The distillation recipe example end to end: distilled student
    must agree with its teacher on the served slide."""
    import distill_serving

    r = distill_serving.main(["--steps", "200", "--teacher-steps", "80",
                              "--arrays", "2"])
    assert r["agreement"] >= 0.95
