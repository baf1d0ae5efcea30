"""HVG registration (register_hvgs.ipynb workflow; BASELINE config 5).

Select the top highly-variable genes on the TRAINING arrays (Seurat-flavor
binned normalized dispersion, ``workflows.hvg`` -- the scanpy-free analog of
the notebook's ``sc.pp.highly_variable_genes``), then train f (CountMLP) and
g (GridNetHex) over the HVG panel via the dataset layer's ``select_genes``
path -- the same select-then-register flow as the notebook (2k HVGs on
Maynard DLPFC, best val acc 0.7084; cf. SURVEY.md §6).

Run: PYTHONPATH=. python examples/register_hvgs.py [--epochs N]
"""

import argparse
import os
import tempfile

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--arrays", type=int, default=4)
    ap.add_argument("--n-hvgs", type=int, default=24)
    args = ap.parse_args(argv)
    out = tempfile.mkdtemp(prefix="gridnext_hvgs_")

    import jax

    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
    from gridnext_tpu.evaluate import all_fgd_predictions
    from gridnext_tpu.models import CountMLP, GridNetHex
    from gridnext_tpu.train import (create_train_state, load_f_params,
                                    make_gridwise_optimizer, train_gridwise,
                                    train_spotwise)
    from gridnext_tpu.workflows.hvg import select_hvgs_from_count_files

    sims = [simulate_spaceranger_dir(os.path.join(out, f"a{i}"), seed=i,
                                     n_genes=80, n_classes=4)
            for i in range(args.arrays)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    n_val = 1

    # build the unified caches once (also binds the cohort gene axis)
    full = create_visium_dataset(dirs, annot_files=annots, use_count=True,
                                 use_image=False, spatial=True,
                                 minimum_detection_rate=None)
    # HVG selection sees TRAIN arrays only (val arrays stay held out, like
    # the notebook fitting on its 10 train sections)
    hvgs = select_hvgs_from_count_files(full.count_files[n_val:],
                                        n_top_genes=args.n_hvgs, n_bins=5)
    print(f"selected {len(hvgs)} HVGs: {hvgs[:8]}...")

    # the registered datasets see ONLY the HVG panel (select_genes path)
    gdat = create_visium_dataset(dirs, annot_files=annots, use_count=True,
                                 use_image=False, spatial=True,
                                 select_genes=hvgs,
                                 minimum_detection_rate=None)
    Xg, Yg = gdat.materialize()
    assert Xg.shape[-1] == len(hvgs)
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
    print(f"hvg f val acc: {acc_f:.3f}   g val acc: {acc_g:.3f}")
    return {"acc_f": acc_f, "acc_g": acc_g, "n_hvgs": len(hvgs)}


if __name__ == "__main__":
    main()
