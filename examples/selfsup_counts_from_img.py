"""Image -> count self-supervision (counts_from_img.ipynb workflow).

Train an image f-network to REGRESS each spot's expression principal
components from its H&E patch -- no annotations needed -- then reuse the
penultimate features (``classify=False``) or the PC predictions as the
image arm of a registration model.

Run: PYTHONPATH=. python examples/selfsup_counts_from_img.py [--epochs N]
"""

import argparse
import os
import tempfile

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--arrays", type=int, default=2)
    ap.add_argument("--patch-size", type=int, default=16)
    ap.add_argument("--n-pcs", type=int, default=8)
    args = ap.parse_args()
    out = tempfile.mkdtemp(prefix="gridnext_selfsup_")

    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
    from gridnext_tpu.models import DenseNet
    from gridnext_tpu.train import train_spotwise
    from gridnext_tpu.workflows import fit_pca, pca_transform

    sims = [simulate_spaceranger_dir(os.path.join(out, f"a{i}"), seed=i,
                                     n_genes=40, n_classes=3, image=True,
                                     spot_spacing_px=max(12, args.patch_size))
            for i in range(args.arrays)]
    dirs = [s["spaceranger_dir"] for s in sims]
    imgs = [s["image_file"] for s in sims]
    annots = [s["annot_file"] for s in sims]

    # paired (patch, count) spots via the multimodal grid dataset
    mm = create_visium_dataset(dirs, annot_files=annots, use_count=True,
                               use_image=True, spatial=True,
                               fullres_image_files=imgs,
                               patch_size_px=args.patch_size,
                               minimum_detection_rate=None)
    (Xi, Xc), Y = mm.materialize()
    fg = Y > 0
    patches = Xi[fg]                      # (N, P, P, 3)
    counts = np.log1p(Xc[fg])             # (N, G)

    # shuffled train/val split; PCA + scaling fit on the TRAIN split only
    rng = np.random.default_rng(0)
    order = rng.permutation(len(patches))
    patches, counts = patches[order], counts[order]
    n_val = len(patches) // 5

    pca = fit_pca(counts[n_val:])
    targets = np.asarray(pca_transform(counts, pca.components_, pca.mean_,
                                       n_pcs=args.n_pcs), np.float32)
    scale = targets[n_val:].std(0, keepdims=True) + 1e-6
    targets = targets / scale

    # regression head: DenseNet with num_classes = n_pcs, MSE objective
    f = DenseNet(growth_rate=8, block_config=(2, 2), num_init_features=16,
                 num_classes=args.n_pcs, small_inputs=True)
    state, val_hist, _ = train_spotwise(
        f, {"train": (patches[n_val:], targets[n_val:]),
            "val": (patches[:n_val], targets[:n_val])},
        learning_rate=1e-3, num_epochs=args.epochs, batch_size=64,
        loss="mse")
    print(f"val MSE history: {[round(v, 4) for v in val_hist]}")

    # predicted PCs correlate with true PCs on held-out spots
    preds = np.asarray(f.apply(state.variables(), patches[:n_val], train=False))
    corr = np.corrcoef(preds[:, 0], targets[:n_val, 0])[0, 1]
    print(f"held-out PC1 correlation: {corr:.3f}")


if __name__ == "__main__":
    main()
