"""Marker-gene registration (register_marker_genes.ipynb workflow).

Instead of the full transcriptome, f/g run over a small curated marker-gene
panel (the notebook uses ~25 literature markers; here the panel is selected
by per-class fold change on the training arrays -- same effect: a
biologically-focused low-dimensional count input). Exercises the
``select_genes`` path of the dataset layer (count_datasets.py:197 analog).

Run: PYTHONPATH=. python examples/register_marker_genes.py [--epochs N]
"""

import argparse
import os
import tempfile

import numpy as np


def select_marker_genes(X, Y, gene_names, per_class: int = 3):
    """Top fold-change genes per class over foreground training spots."""
    fg = Y > 0
    Xf, Yf = X[fg], Y[fg]
    classes = np.unique(Yf)
    log_means = np.stack([np.log1p(Xf[Yf == c].mean(0)) for c in classes])
    rest = (log_means.sum(0, keepdims=True) - log_means) / (len(classes) - 1)
    fold = log_means - rest  # (n_classes, n_genes) log fold change vs rest
    markers = []
    for ci in range(len(classes)):
        added = 0
        for gi in np.argsort(fold[ci])[::-1]:
            if gene_names[gi] not in markers:
                markers.append(gene_names[gi])
                added += 1
            if added == per_class:
                break
    return markers


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--arrays", type=int, default=4)
    ap.add_argument("--per-class", type=int, default=3)
    args = ap.parse_args(argv)
    out = tempfile.mkdtemp(prefix="gridnext_markers_")

    import jax

    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
    from gridnext_tpu.evaluate import all_fgd_predictions
    from gridnext_tpu.models import CountMLP, GridNetHex
    from gridnext_tpu.train import (create_train_state, load_f_params,
                                    make_gridwise_optimizer, train_gridwise,
                                    train_spotwise)

    sims = [simulate_spaceranger_dir(os.path.join(out, f"a{i}"), seed=i,
                                     n_genes=80, n_classes=4)
            for i in range(args.arrays)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    n_val = 1

    # full-transcriptome grids only to pick the marker panel on TRAIN arrays
    full = create_visium_dataset(dirs, annot_files=annots, use_count=True,
                                 use_image=False, spatial=True,
                                 minimum_detection_rate=None)
    Xg_full, Yg = full.materialize()
    import pandas as pd

    cf0 = full.count_files[0]
    gene_names = list(pd.read_csv(cf0, sep="\t", index_col=0, usecols=[0]).index)
    markers = select_marker_genes(
        Xg_full[n_val:].reshape(-1, Xg_full.shape[-1]),
        Yg[n_val:].reshape(-1), gene_names, per_class=args.per_class)
    print(f"marker panel ({len(markers)}): {markers}")

    # the registered datasets see ONLY the marker panel (select_genes path)
    gdat = create_visium_dataset(dirs, annot_files=annots, use_count=True,
                                 use_image=False, spatial=True,
                                 select_genes=markers,
                                 minimum_detection_rate=None)
    Xg, Yg2 = gdat.materialize()
    np.testing.assert_array_equal(Yg, Yg2)
    assert Xg.shape[-1] == len(markers)
    Xg = np.log1p(Xg)
    n_classes = len(gdat.classes)

    fg = Yg[n_val:] > 0
    Xs, Ys = Xg[n_val:][fg], (Yg[n_val:][fg] - 1).astype(np.int64)
    f = CountMLP(n_classes=n_classes)
    f_state, *_ = train_spotwise(f, {"train": (Xs, Ys), "val": None},
                                 num_epochs=args.epochs, batch_size=128,
                                 verbose=False)
    y_true_f, y_pred_f, _ = all_fgd_predictions(
        (Xg[:n_val], Yg[:n_val]),
        GridNetHex(patch_classifier=f, n_classes=n_classes),
        {"params": {"patch_classifier": f_state.params},
         "batch_stats": {"patch_classifier": f_state.batch_stats}},
        f_only=True)
    acc_f = float((y_true_f == y_pred_f).mean())

    g = GridNetHex(patch_classifier=f, n_classes=n_classes)
    tx = make_gridwise_optimizer(1e-3, f_lr=1e-4)
    state = create_train_state(g, jax.random.key(0), Xg[:1], tx)
    state = load_f_params(state, f_state.variables())
    state, *_ = train_gridwise(
        g, {"train": (Xg[n_val:], Yg[n_val:]), "val": (Xg[:n_val], Yg[:n_val])},
        state=state, tx=tx, num_epochs=args.epochs, verbose=False)
    y_true, y_pred, _ = all_fgd_predictions((Xg[:n_val], Yg[:n_val]), g,
                                            state.variables())
    acc_g = float((y_true == y_pred).mean())
    print(f"marker-gene f val acc: {acc_f:.3f}   g val acc: {acc_g:.3f}")
    return {"acc_f": acc_f, "acc_g": acc_g, "n_markers": len(markers)}


if __name__ == "__main__":
    main()
