"""Feature-concat fusion registration (register_concat.ipynb workflow).

Two unimodal pipelines are trained first -- count-PCA (CountMLP f + hex g)
and image (small DenseNet f + hex g) -- then their per-spot LOGIT MAPS are
channel-concatenated and a fusion corrector (ConcatGridNet: Cartesian 3/5/5/3
convs, identity f; notebook cell 4) is trained over the concatenated grids.
BASELINE config 4: on Maynard data the notebook reports g_concat 0.839 vs
g_pca 0.815 fgd accuracy.

Run: PYTHONPATH=. python examples/register_concat.py [--epochs N]
"""

import argparse
import os
import tempfile

import numpy as np


def train_fg_pipeline(X, Y, n_classes, f, *, epochs, seed, patch_chunk=None,
                      grid_g: bool = True):
    """Spotwise-pretrain f on foreground spots; optionally train hex g.

    Returns per-array logit maps -- the '..._logits_oddr.npy' artifacts the
    notebook's ConcatDataset consumes (cell 3). ``grid_g=False`` emits f-only
    patch-prediction maps (used for the image modality to keep the example
    CI-sized on this 1-CPU container: gridwise image training backprops f
    over 4,992 patches/array/epoch).
    """
    import jax

    from gridnext_tpu.models import GridNetHex
    from gridnext_tpu.train import (create_train_state, load_f_params,
                                    make_gridwise_optimizer, train_gridwise,
                                    train_spotwise)

    n_val = 1
    fg = Y[n_val:] > 0
    Xs = X[n_val:][fg]
    Ys = (Y[n_val:][fg] - 1).astype(np.int64)
    f_state, *_ = train_spotwise(f, {"train": (Xs, Ys), "val": None},
                                 num_epochs=epochs, batch_size=128,
                                 verbose=False, rng=jax.random.key(seed))

    g = GridNetHex(patch_classifier=f, n_classes=n_classes,
                   patch_chunk=patch_chunk)
    if grid_g:
        tx = make_gridwise_optimizer(1e-3, f_lr=1e-4)
        state = create_train_state(g, jax.random.key(seed), X[:1], tx)
        state = load_f_params(state, f_state.variables())
        state, *_ = train_gridwise(
            g, {"train": (X[n_val:], Y[n_val:]), "val": (X[:n_val], Y[:n_val])},
            state=state, tx=tx, num_epochs=epochs, verbose=False)
        variables, method = state.variables(), None
    else:
        variables = {"params": {"patch_classifier": f_state.params}}
        if f_state.batch_stats:
            variables["batch_stats"] = {"patch_classifier": f_state.batch_stats}
        method = "patch_predictions"

    apply_kw = {"method": method} if method else {}
    logits = np.concatenate(
        [np.asarray(g.apply(variables, X[i:i + 1], train=False, **apply_kw))
         for i in range(len(X))])
    return logits  # (N, H, W, C)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--arrays", type=int, default=4)
    ap.add_argument("--patch-size", type=int, default=16)
    args = ap.parse_args(argv)
    out = tempfile.mkdtemp(prefix="gridnext_concat_")

    import jax

    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
    from gridnext_tpu.evaluate import all_fgd_predictions, flatten_foreground
    from gridnext_tpu.models import ConcatGridNet, CountMLP, DenseNet
    from gridnext_tpu.train import train_gridwise
    from gridnext_tpu.workflows import fit_pca, n_pcs_for_variance, pca_transform

    sims = [simulate_spaceranger_dir(os.path.join(out, f"a{i}"), seed=i,
                                     n_genes=60, n_classes=4, image=True,
                                     spot_spacing_px=max(12, args.patch_size))
            for i in range(args.arrays)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    imgs = [s["image_file"] for s in sims]
    n_val = 1

    # --- modality 1: count-PCA pipeline -------------------------------------
    gdat = create_visium_dataset(dirs, annot_files=annots, use_count=True,
                                 use_image=False, spatial=True,
                                 minimum_detection_rate=None)
    n_classes = len(gdat.classes)
    Xg, Yg = gdat.materialize()
    Xg = np.log1p(Xg)
    pca = fit_pca(Xg[n_val:][Yg[n_val:] > 0])
    n_pcs = n_pcs_for_variance(pca, 0.5)
    Xp = np.asarray(pca_transform(Xg.reshape(-1, Xg.shape[-1]),
                                  pca.components_, pca.mean_, n_pcs=n_pcs))
    Xp = Xp.reshape(Xg.shape[:3] + (n_pcs,)).astype(np.float32)
    Xp[~(Yg > 0)] = 0.0
    logits_pca = train_fg_pipeline(Xp, Yg, n_classes, CountMLP(n_classes=n_classes),
                                   epochs=args.epochs, seed=0)
    print(f"count-PCA pipeline done ({n_pcs} PCs)")

    # --- modality 2: image pipeline ------------------------------------------
    idat = create_visium_dataset(dirs, annot_files=annots, use_count=False,
                                 use_image=True, spatial=True,
                                 fullres_image_files=imgs,
                                 patch_size_px=args.patch_size)
    Xi, Yi = idat.materialize()
    f_img = DenseNet(growth_rate=8, block_config=(2, 2), num_init_features=16,
                     num_classes=n_classes, small_inputs=True)
    logits_img = train_fg_pipeline(Xi, Yi, n_classes, f_img,
                                   epochs=args.epochs, seed=1,
                                   patch_chunk=1664, grid_g=False)
    print("image pipeline done")

    # --- fusion: concat logit maps, train the Cartesian corrector ------------
    Xc = np.concatenate([logits_pca, logits_img], axis=-1)  # (N, H, W, 2C)
    # the fusion corrector is tiny (2C-channel Cartesian convs) -- the
    # notebook trains it for 100 epochs (cell 4); cheap even on CPU
    g_concat = ConcatGridNet(n_classes=n_classes)
    state, val_hist, _ = train_gridwise(
        g_concat, {"train": (Xc[n_val:], Yg[n_val:]),
                   "val": (Xc[:n_val], Yg[:n_val])},
        learning_rate=1e-3, num_epochs=args.epochs * 20, verbose=False,
        rng=jax.random.key(2))

    # --- compare g_pca vs g_concat on the held-out array ---------------------
    pred_pca, true_pca = flatten_foreground(logits_pca[0], Yg[0])
    acc_pca = float((pred_pca.argmax(1) == true_pca).mean())
    y_true, y_pred, _ = all_fgd_predictions(
        (Xc[:n_val], Yg[:n_val]), g_concat, state.variables())
    acc_concat = float((y_true == y_pred).mean())
    print(f"g_pca val acc:    {acc_pca:.3f}")
    print(f"g_concat val acc: {acc_concat:.3f}")
    return {"acc_pca": acc_pca, "acc_concat": acc_concat}


if __name__ == "__main__":
    main()
