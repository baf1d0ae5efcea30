"""PCA registration + cross-modality consensus (register_pca.ipynb workflow).

Count arrays are reduced to principal components fit on the training cohort,
a CountMLP f + hex g registers on the PC features, and (when image data is
simulated too) the count-g and image-g softmax outputs are averaged into a
consensus prediction -- the register_pca research workflow on simulated data.

Run: PYTHONPATH=. python examples/register_pca.py [--epochs N]
"""

import argparse
import os
import tempfile

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--arrays", type=int, default=4)
    ap.add_argument("--variance", type=float, default=0.5)
    args = ap.parse_args()
    out = tempfile.mkdtemp(prefix="gridnext_pca_")

    import jax

    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
    from gridnext_tpu.evaluate import (all_fgd_predictions, consensus_softmax,
                                       flatten_foreground)
    from gridnext_tpu.models import CountMLP, GridNetHex
    from gridnext_tpu.train import (create_train_state,
                                    make_gridwise_optimizer, train_gridwise)
    from gridnext_tpu.workflows import (fit_pca, n_pcs_for_variance,
                                        pca_transform)

    sims = [simulate_spaceranger_dir(os.path.join(out, f"a{i}"), seed=i,
                                     n_genes=80, n_classes=4)
            for i in range(args.arrays)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]

    gdat = create_visium_dataset(dirs, annot_files=annots, use_count=True,
                                 use_image=False, spatial=True,
                                 minimum_detection_rate=None)
    Xg, Yg = gdat.materialize()
    Xg = np.log1p(Xg)
    n_classes = len(gdat.classes)
    n_val = 1

    # --- PCA fit on the TRAINING arrays' foreground spots -------------------
    fg_train = Yg[n_val:] > 0
    pca = fit_pca(Xg[n_val:][fg_train])
    n_pcs = n_pcs_for_variance(pca, args.variance)
    print(f"{n_pcs} PCs explain >{args.variance:.0%} of variance")

    # on-device PC featurization of every grid
    Xp = np.asarray(pca_transform(Xg.reshape(-1, Xg.shape[-1]),
                                  pca.components_, pca.mean_, n_pcs=n_pcs))
    Xp = Xp.reshape(Xg.shape[:3] + (n_pcs,)).astype(np.float32)
    Xp[~(Yg > 0)] = 0.0  # background spots carry no features

    def pretrain_f(X, Y, n_classes, seed=0):
        """Spotwise pretraining of f on foreground spots (tutorial workflow)."""
        from gridnext_tpu.train import train_spotwise

        fg = Y[n_val:] > 0
        Xs = X[n_val:][fg]
        Ys = (Y[n_val:][fg] - 1).astype(np.int64)
        f = CountMLP(n_classes=n_classes)
        f_state, *_ = train_spotwise(
            f, {"train": (Xs, Ys), "val": None}, num_epochs=args.epochs,
            batch_size=128, verbose=False, rng=jax.random.key(seed))
        return f, f_state

    # --- g over PC features --------------------------------------------------
    from gridnext_tpu.train import load_f_params

    f, f_state = pretrain_f(Xp, Yg, n_classes, seed=0)
    g = GridNetHex(patch_classifier=f, n_classes=n_classes)
    tx = make_gridwise_optimizer(1e-3, f_lr=1e-4)
    state = create_train_state(g, jax.random.key(0), Xp[:1], tx)
    state = load_f_params(state, f_state.variables())
    state, val_hist, _ = train_gridwise(
        g, {"train": (Xp[n_val:], Yg[n_val:]), "val": (Xp[:n_val], Yg[:n_val])},
        state=state, tx=tx, num_epochs=args.epochs, verbose=False)

    y_true, y_pred, smax_pca = all_fgd_predictions(
        (Xp[:n_val], Yg[:n_val]), g, state.variables())
    acc_pca = float((y_true == y_pred).mean())
    print(f"g_pca val registration accuracy: {acc_pca:.3f}")

    # --- second modality: raw-count g, then consensus ------------------------
    f2, f2_state = pretrain_f(Xg, Yg, n_classes, seed=1)
    g2 = GridNetHex(patch_classifier=f2, n_classes=n_classes)
    tx2 = make_gridwise_optimizer(1e-3, f_lr=1e-4)
    state2 = create_train_state(g2, jax.random.key(1), Xg[:1], tx2)
    state2 = load_f_params(state2, f2_state.variables())
    state2, _, _ = train_gridwise(
        g2, {"train": (Xg[n_val:], Yg[n_val:]), "val": (Xg[:n_val], Yg[:n_val])},
        state=state2, tx=tx2, num_epochs=args.epochs, verbose=False)
    _, y_pred2, smax_raw = all_fgd_predictions(
        (Xg[:n_val], Yg[:n_val]), g2, state2.variables())
    acc_raw = float((y_true == y_pred2).mean())
    print(f"g_raw val registration accuracy: {acc_raw:.3f}")

    consensus = consensus_softmax([smax_pca, smax_raw])
    acc_cons = float((consensus.argmax(1) == y_true).mean())
    print(f"consensus(g_pca + g_raw) accuracy: {acc_cons:.3f}")


if __name__ == "__main__":
    main()
