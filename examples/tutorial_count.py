"""Count-modality tutorial: the Tutorial_visium_count.ipynb workflow on
simulated data (no downloads).

Train a CountMLP spot classifier f, compose it into GridNetHex, train the
hexagonal corrector g, evaluate, and export Loupe annotations.

Run: PYTHONPATH=. python examples/tutorial_count.py [--epochs N] [--out DIR]
"""

import argparse
import os
import tempfile

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--arrays", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or tempfile.mkdtemp(prefix="gridnext_tutorial_")

    import jax

    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
    from gridnext_tpu.evaluate import all_fgd_predictions, to_loupe_annots
    from gridnext_tpu.io import find_position_file
    from gridnext_tpu.models import CountMLP, GridNetHex
    from gridnext_tpu.plotting import performance_curves
    from gridnext_tpu.train import (create_train_state, load_f_params,
                                    make_gridwise_optimizer, train_gridwise,
                                    train_spotwise)

    # --- simulate a small cohort -------------------------------------------
    sims = [simulate_spaceranger_dir(os.path.join(out, f"array{i}"), seed=i,
                                     n_genes=60, n_classes=4)
            for i in range(args.arrays)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]

    # --- datasets (generates .unified.tsv.gz caches on first run) ----------
    spots = create_visium_dataset(dirs, annot_files=annots, use_count=True,
                                  use_image=False, spatial=False,
                                  minimum_detection_rate=None)
    grids = create_visium_dataset(dirs, annot_files=annots, use_count=True,
                                  use_image=False, spatial=True,
                                  minimum_detection_rate=None)
    class_names = list(grids.classes)
    print(f"{len(spots)} spots, {len(grids)} arrays, classes: {class_names}")

    # --- 1) train f spotwise ------------------------------------------------
    Xs, Ys = spots.materialize()
    Xs = np.log1p(Xs)
    n_val = len(Xs) // 5
    f = CountMLP(n_classes=len(class_names))
    f_state, f_val, f_train = train_spotwise(
        f, {"train": (Xs[n_val:], Ys[n_val:]), "val": (Xs[:n_val], Ys[:n_val])},
        learning_rate=1e-4, num_epochs=args.epochs, batch_size=128,
        outfile=os.path.join(out, "tutorial_f_count.msgpack"))

    # --- 2) train g gridwise -------------------------------------------------
    Xg, Yg = grids.materialize()
    Xg = np.log1p(Xg)
    g = GridNetHex(patch_classifier=f, n_classes=len(class_names))
    tx = make_gridwise_optimizer(1e-3)
    state = create_train_state(g, jax.random.key(0), Xg[:1], tx)
    state = load_f_params(state, f_state.variables())
    state, g_val, g_train = train_gridwise(
        g, {"train": (Xg[1:], Yg[1:]), "val": (Xg[:1], Yg[:1])},
        state=state, tx=tx, num_epochs=args.epochs,
        outfile=os.path.join(out, "tutorial_g_count.msgpack"))

    # --- 3) evaluate + export -----------------------------------------------
    y_true, y_pred, y_smax = all_fgd_predictions((Xg, Yg), g, state.variables())
    acc = float((y_true == y_pred).mean())
    print(f"foreground registration accuracy: {acc:.3f}")

    import matplotlib
    matplotlib.use("Agg")
    fig, ax, mauroc, mauprc = performance_curves(y_true, y_smax,
                                                 class_names=class_names)
    fig.savefig(os.path.join(out, "performance_curves.png"))
    print(f"macro AUROC {mauroc[0]:.3f}, macro AUPRC {mauprc[0]:.3f}")

    logits = g.apply(state.variables(), Xg[:1], train=False)
    label_grid = np.where(Yg[0] > 0, np.asarray(logits[0]).argmax(-1) + 1, 0)
    to_loupe_annots(label_grid, find_position_file(dirs[0]),
                    os.path.join(out, "array0_loupe.csv"),
                    annot_names=class_names)
    print(f"outputs in {out}")


if __name__ == "__main__":
    main()
