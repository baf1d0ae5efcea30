"""Binary classification over PC features (bin_classifier_features.ipynb).

The notebook's GM/WM task: collapse the multi-class annotations into two
super-classes, featurize counts with cohort PCA, train the standard MLP f
spotwise and the hex g gridwise with n_classes=2. On BA44 data the notebook
reports best spotwise val acc 0.9646 (BASELINE.md).

Run: PYTHONPATH=. python examples/bin_classifier.py [--epochs N]
"""

import argparse
import os
import tempfile

import numpy as np


def binarize_annots(annot_files, out_dir, split: int):
    """Rewrite Loupe annotation CSVs with two super-classes (GM-like/WM-like):
    simulated bands Layer1..Layer{split} -> 'GM', the rest -> 'WM'."""
    import pandas as pd

    out_files = []
    os.makedirs(out_dir, exist_ok=True)
    for af in annot_files:
        df = pd.read_csv(af)
        label_col = df.columns[-1]
        band = df[label_col].str.extract(r"(\d+)$")[0].astype(float)
        if band.isna().any():
            bad = df[label_col][band.isna()].unique()[:5]
            raise ValueError(
                f"{af}: labels without a trailing band number: {list(bad)}")
        df[label_col] = np.where(band <= split, "GM", "WM")
        dst = os.path.join(out_dir, os.path.basename(af))
        df.to_csv(dst, index=False)
        out_files.append(dst)
    return out_files


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--arrays", type=int, default=4)
    ap.add_argument("--variance", type=float, default=0.5)
    args = ap.parse_args(argv)
    out = tempfile.mkdtemp(prefix="gridnext_bin_")

    import jax

    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
    from gridnext_tpu.evaluate import all_fgd_predictions
    from gridnext_tpu.models import CountMLP, GridNetHex
    from gridnext_tpu.train import (create_train_state, load_f_params,
                                    make_gridwise_optimizer, train_gridwise,
                                    train_spotwise)
    from gridnext_tpu.workflows import fit_pca, n_pcs_for_variance, pca_transform

    sims = [simulate_spaceranger_dir(os.path.join(out, f"a{i}"), seed=i,
                                     n_genes=80, n_classes=4)
            for i in range(args.arrays)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = binarize_annots([s["annot_file"] for s in sims],
                             os.path.join(out, "binary_annots"), split=2)
    n_val = 1

    gdat = create_visium_dataset(dirs, annot_files=annots, use_count=True,
                                 use_image=False, spatial=True,
                                 minimum_detection_rate=None)
    assert list(gdat.classes) == ["GM", "WM"]
    Xg, Yg = gdat.materialize()
    Xg = np.log1p(Xg)

    # cohort PCA on training foreground (fit_pca_unified_cortex recipe)
    pca = fit_pca(Xg[n_val:][Yg[n_val:] > 0])
    n_pcs = n_pcs_for_variance(pca, args.variance)
    Xp = np.asarray(pca_transform(Xg.reshape(-1, Xg.shape[-1]),
                                  pca.components_, pca.mean_, n_pcs=n_pcs))
    Xp = Xp.reshape(Xg.shape[:3] + (n_pcs,)).astype(np.float32)
    Xp[~(Yg > 0)] = 0.0
    print(f"{n_pcs} PCs explain >{args.variance:.0%} of variance")

    # spotwise binary f (notebook cell 4: npcs->500->100->100->50->2)
    fg_tr, fg_va = Yg[n_val:] > 0, Yg[:n_val] > 0
    f = CountMLP(n_classes=2)
    f_state, val_hist, _ = train_spotwise(
        f, {"train": (Xp[n_val:][fg_tr], (Yg[n_val:][fg_tr] - 1).astype(np.int64)),
            "val": (Xp[:n_val][fg_va], (Yg[:n_val][fg_va] - 1).astype(np.int64))},
        num_epochs=args.epochs, batch_size=128, verbose=False)

    # gridwise g on top (notebook cell 6)
    g = GridNetHex(patch_classifier=f, n_classes=2)
    tx = make_gridwise_optimizer(1e-3)
    state = create_train_state(g, jax.random.key(0), Xp[:1], tx)
    state = load_f_params(state, f_state.variables())
    state, *_ = train_gridwise(
        g, {"train": (Xp[n_val:], Yg[n_val:]), "val": (Xp[:n_val], Yg[:n_val])},
        state=state, tx=tx, num_epochs=args.epochs, verbose=False)
    y_true, y_pred, _ = all_fgd_predictions((Xp[:n_val], Yg[:n_val]), g,
                                            state.variables())
    acc_g = float((y_true == y_pred).mean())

    y_true_f, y_pred_f, _ = all_fgd_predictions((Xp[:n_val], Yg[:n_val]), g,
                                                state.variables(), f_only=True)
    acc_f = float((y_true_f == y_pred_f).mean())
    print(f"binary GM/WM: f val acc {acc_f:.3f}, g val acc {acc_g:.3f}")
    return {"acc_f": acc_f, "acc_g": acc_g}


if __name__ == "__main__":
    main()
