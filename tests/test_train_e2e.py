"""End-to-end slice: synthetic pseudo-Visium -> count grids -> f -> hex g ->
masked gridwise training -> foreground predictions -> Loupe export.

This is the integration test the reference lacks (SURVEY.md section 4): the
Tutorial_visium_count flow replayed on simulated data.
"""

import os

import numpy as np
import pytest

from gridnext_tpu import geometry as G
from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
from gridnext_tpu.evaluate import all_fgd_predictions, to_loupe_annots
from gridnext_tpu.io import find_position_file
from gridnext_tpu.models import CountMLP, GridNetHex
from gridnext_tpu.train import train_gridwise, train_spotwise
from gridnext_tpu.train.loops import load_checkpoint


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    root = tmp_path_factory.mktemp("visium_e2e")
    sims = [simulate_spaceranger_dir(root / f"a{i}", seed=i, n_genes=30,
                                     n_classes=3) for i in range(3)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]

    gdat = create_visium_dataset(dirs, use_count=True, use_image=False,
                                 spatial=True, annot_files=annots,
                                 minimum_detection_rate=None)
    pdat = create_visium_dataset(dirs, use_count=True, use_image=False,
                                 spatial=False, annot_files=annots,
                                 minimum_detection_rate=None)
    return {"sims": sims, "gdat": gdat, "pdat": pdat, "dirs": dirs}


def test_train_spotwise_learns(sim):
    X, Y = sim["pdat"].materialize()
    X = np.log1p(X)
    n_train = int(0.8 * len(X))
    dls = {"train": (X[:n_train], Y[:n_train]), "val": (X[n_train:], Y[n_train:])}

    f = CountMLP(n_classes=3)
    state, val_hist, train_hist = train_spotwise(
        f, dls, num_epochs=3, batch_size=256, verbose=False)
    assert len(val_hist) == 3 and len(train_hist) == 3
    # synthetic classes are separable; loss must drop materially
    assert val_hist[-1] < val_hist[0] * 0.9


def test_train_gridwise_and_predict(sim, tmp_path):
    import jax

    from gridnext_tpu.train import create_train_state, load_f_params, make_gridwise_optimizer

    # Tutorial workflow: pretrain f spotwise, compose into g, train g.
    Xs, Ys = sim["pdat"].materialize()
    Xs = np.log1p(Xs)
    f = CountMLP(n_classes=3)
    f_state, _, _ = train_spotwise(f, {"train": (Xs, Ys), "val": None},
                                   num_epochs=3, batch_size=256, verbose=False)

    Xg, Yg = sim["gdat"].materialize()
    Xg = np.log1p(Xg)
    dls = {"train": (Xg[:2], Yg[:2]), "val": (Xg[2:], Yg[2:])}

    g = GridNetHex(patch_classifier=f, n_classes=3)
    tx = make_gridwise_optimizer(1e-3, f_lr=1e-4)
    g_state = create_train_state(g, jax.random.key(0), np.asarray(Xg[:1]), tx)
    g_state = load_f_params(g_state, f_state.variables())

    ckpt = tmp_path / "g.msgpack"
    state, val_hist, train_hist = train_gridwise(
        g, dls, state=g_state, tx=tx, num_epochs=4,
        outfile=str(ckpt), verbose=False)
    assert len(val_hist) == 4 and len(train_hist) == 4
    assert os.path.exists(ckpt)

    # checkpoint roundtrips
    payload = load_checkpoint(str(ckpt))
    assert "params" in payload and "batch_stats" in payload

    # predictions over foreground
    y_true, y_pred, y_smax = all_fgd_predictions((Xg, Yg), g, state.variables())
    n_fg = int((Yg > 0).sum())
    assert y_true.shape == (n_fg,)
    assert y_smax.shape == (n_fg, 3)
    np.testing.assert_allclose(y_smax.sum(1), 1.0, atol=1e-5)
    acc = (y_true == y_pred).mean()
    assert acc > 0.5  # separable synthetic data, a few epochs

    # f-only path
    y_true_f, y_pred_f, _ = all_fgd_predictions((Xg, Yg), g, state.variables(),
                                                f_only=True)
    assert y_true_f.shape == (n_fg,)

    # Loupe export roundtrip
    label_grid = np.zeros(Yg.shape[1:], dtype=np.int64)
    # rebuild a (H, W) prediction grid for array 0
    logits = g.apply(state.variables(), Xg[:1], train=False)
    label_grid = np.where(Yg[0] > 0, np.asarray(logits[0]).argmax(-1) + 1, 0)
    out_csv = tmp_path / "loupe.csv"
    pos_file = find_position_file(sim["dirs"][0])
    to_loupe_annots(label_grid, pos_file, out_csv,
                    annot_names=sim["gdat"].classes)

    import pandas as pd
    df = pd.read_csv(out_csv)
    assert list(df.columns) == ["Barcode", "AARs"]
    n_tissue = int((sim["sims"][0]["label_grid"] > 0).sum())
    assert len(df) == n_tissue
    assert set(df["AARs"].dropna().unique()) <= set(sim["gdat"].classes) | {""}


def test_gridwise_f_frozen_by_default(sim):
    import jax

    Xg, Yg = sim["gdat"].materialize()
    Xg = np.log1p(Xg)
    dls = {"train": (Xg[:2], Yg[:2]), "val": (Xg[2:], Yg[2:])}

    f = CountMLP(n_classes=3)
    g = GridNetHex(patch_classifier=f, n_classes=3)

    from gridnext_tpu.train.loops import create_train_state, make_gridwise_optimizer
    tx = make_gridwise_optimizer(1e-3, f_lr=None)
    state0 = create_train_state(g, jax.random.key(0),
                                np.asarray(Xg[:1]), tx)
    f_params_before = jax.device_get(state0.params["patch_classifier"])

    state, _, _ = train_gridwise(g, dls, num_epochs=1, state=state0, tx=tx,
                                 verbose=False)
    f_params_after = jax.device_get(state.params["patch_classifier"])
    for a, b in zip(jax.tree_util.tree_leaves(f_params_before),
                    jax.tree_util.tree_leaves(f_params_after)):
        np.testing.assert_array_equal(a, b)
