"""Multimodal tutorial: Tutorial_multimodal.ipynb on simulated data.

Image + count modalities fused in GridNetHexMM (channel concat of the two
f-networks' outputs, count first), trained gridwise with disagreement-masked
labels from MMStackDataset.

Run: PYTHONPATH=. python examples/tutorial_multimodal.py [--epochs N]
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
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or tempfile.mkdtemp(prefix="gridnext_tutorial_mm_")

    import jax

    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
    from gridnext_tpu.evaluate import all_fgd_predictions
    from gridnext_tpu.models import CountMLP, DenseNet, GridNetHexMM
    from gridnext_tpu.train import (create_train_state,
                                    make_gridwise_optimizer, train_gridwise)

    sims = [simulate_spaceranger_dir(os.path.join(out, f"array{i}"), seed=i,
                                     n_genes=40, n_classes=3, image=True,
                                     spot_spacing_px=max(12, args.patch_size))
            for i in range(args.arrays)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    imgs = [s["image_file"] for s in sims]

    mm = create_visium_dataset(dirs, annot_files=annots, use_count=True,
                               use_image=True, spatial=True,
                               fullres_image_files=imgs,
                               patch_size_px=args.patch_size,
                               minimum_detection_rate=None)
    class_names = list(mm.classes)
    (Xi, Xc), Y = mm.materialize()
    Xc = np.log1p(Xc)
    print(f"image grids {Xi.shape}, count grids {Xc.shape}, labels {Y.shape}")

    f_image = DenseNet(growth_rate=8, block_config=(2, 2), num_init_features=16,
                       num_classes=len(class_names), small_inputs=True)
    f_count = CountMLP(n_classes=len(class_names))
    g = GridNetHexMM(image_classifier=f_image, count_classifier=f_count,
                     n_classes=len(class_names), patch_chunk=1664)

    tx = make_gridwise_optimizer(1e-3, f_lr=1e-4)  # jointly fine-tune both f
    state = create_train_state(g, jax.random.key(0), (Xi[:1], Xc[:1]), tx)
    state, val_hist, _ = train_gridwise(
        g, {"train": ((Xi[1:], Xc[1:]), Y[1:]),
            "val": ((Xi[:1], Xc[:1]), Y[:1])},
        state=state, tx=tx, num_epochs=args.epochs)

    y_true, y_pred, _ = all_fgd_predictions(((Xi, Xc), Y), g, state.variables())
    print(f"foreground registration accuracy: {(y_true == y_pred).mean():.3f}")


if __name__ == "__main__":
    main()
