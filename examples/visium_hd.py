"""Visium HD workflow: square-lattice binned outputs end to end.

Simulates true square-lattice HD arrays (binned-output layout with parquet
positions + per-binning MEX and real-HD barcode names), builds square HD
count grids through ``create_visium_dataset(hd_binning=..., grid_dims=...)``,
trains CountMLP f + the Cartesian GridNet corrector g (hex taps assume the
Visium pseudo-hex packing; HD bins are square), and exports
direct-coordinate Loupe annotations.

The reference only reads HD positions (utils.py:253-287) and has no HD
training path; this is an extension demonstrated on simulated data.

Run: PYTHONPATH=. python examples/visium_hd.py [--epochs N] [--out DIR]
"""

import argparse
import os
import tempfile

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--arrays", type=int, default=4)
    ap.add_argument("--grid", type=int, nargs=2, default=(32, 28),
                    metavar=("H", "W"))
    ap.add_argument("--binning", default="square_016um")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    out = args.out or tempfile.mkdtemp(prefix="gridnext_hd_")

    import jax

    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
    from gridnext_tpu.evaluate import all_fgd_predictions, to_loupe_annots
    from gridnext_tpu.io import find_position_file
    from gridnext_tpu.models import CountMLP, GridNet
    from gridnext_tpu.train import (create_train_state, load_f_params,
                                    make_gridwise_optimizer, train_gridwise,
                                    train_spotwise)

    # --- simulate a square-lattice HD cohort ---------------------------------
    sims = [simulate_spaceranger_dir(os.path.join(out, f"array{i}"), seed=i,
                                     n_genes=60, n_classes=4,
                                     spaceranger_version="hd",
                                     hd_grid=tuple(args.grid),
                                     hd_binning=args.binning)
            for i in range(args.arrays)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]

    # --- datasets: HD binned outputs -> square grids -------------------------
    kw = dict(annot_files=annots, use_count=True, use_image=False,
              hd_binning=args.binning, minimum_detection_rate=None)
    spots = create_visium_dataset(dirs, spatial=False, **kw)
    grids = create_visium_dataset(dirs, spatial=True, grid_dims="auto", **kw)
    class_names = list(grids.classes)
    print(f"{len(spots)} bins, {len(grids)} arrays, "
          f"grid {grids.h_st}x{grids.w_st}, classes: {class_names}")

    # --- 1) train f binwise ---------------------------------------------------
    Xs, Ys = spots.materialize()
    Xs = np.log1p(Xs)
    n_val = len(Xs) // 5
    f = CountMLP(n_classes=len(class_names))
    f_state, *_ = train_spotwise(
        f, {"train": (Xs[n_val:], Ys[n_val:]), "val": (Xs[:n_val], Ys[:n_val])},
        learning_rate=1e-4, num_epochs=args.epochs, batch_size=128)

    # --- 2) train the Cartesian corrector g gridwise -------------------------
    Xg, Yg = grids.materialize()
    Xg = np.log1p(Xg)
    g = GridNet(patch_classifier=f, n_classes=len(class_names))
    tx = make_gridwise_optimizer(1e-3)
    state = create_train_state(g, jax.random.key(0), Xg[:1], tx)
    state = load_f_params(state, f_state.variables())
    state, *_ = train_gridwise(
        g, {"train": (Xg[1:], Yg[1:]), "val": (Xg[:1], Yg[:1])},
        state=state, tx=tx, num_epochs=args.epochs,
        outfile=os.path.join(out, "hd_g_count.msgpack"))

    # --- 3) evaluate + direct-coordinate Loupe export ------------------------
    y_true, y_pred, _ = all_fgd_predictions((Xg, Yg), g, state.variables())
    acc_g = float((y_true == y_pred).mean())
    print(f"foreground registration accuracy: {acc_g:.3f}")

    logits = g.apply(state.variables(), Xg[:1], train=False)
    label_grid = np.where(Yg[0] > 0, np.asarray(logits[0]).argmax(-1) + 1, 0)
    loupe_csv = os.path.join(out, "array0_loupe.csv")
    to_loupe_annots(label_grid,
                    find_position_file(dirs[0], hd_binning=args.binning),
                    loupe_csv, annot_names=class_names, hex_coords=False)
    print(f"outputs in {out}")
    return {"acc_g": acc_g, "grid": (grids.h_st, grids.w_st),
            "loupe_csv": loupe_csv}


if __name__ == "__main__":
    main()
