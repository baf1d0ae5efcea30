"""Image-modality tutorial: Tutorial_visium_image.ipynb on simulated data.

Extract spot patches from (simulated) fullres slides, train a small DenseNet
spot classifier f, compose into GridNetHex with chunked f application, train
the corrector, evaluate.

Run: PYTHONPATH=. python examples/tutorial_image.py [--epochs N]
(Defaults are sized for a CPU run; on TPU raise --patch-size/--densenet.)
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
    ap.add_argument("--densenet121", action="store_true",
                    help="full DenseNet-121 f (TPU recommended)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or tempfile.mkdtemp(prefix="gridnext_tutorial_img_")

    import jax

    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
    from gridnext_tpu.evaluate import all_fgd_predictions
    from gridnext_tpu.models import DenseNet, GridNetHex, densenet121
    from gridnext_tpu.train import (create_train_state, load_f_params,
                                    make_gridwise_optimizer, train_gridwise,
                                    train_spotwise)

    sims = [simulate_spaceranger_dir(os.path.join(out, f"array{i}"), seed=i,
                                     n_genes=10, n_classes=3, image=True,
                                     spot_spacing_px=max(12, args.patch_size))
            for i in range(args.arrays)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    imgs = [s["image_file"] for s in sims]

    spots = create_visium_dataset(dirs, annot_files=annots, use_count=False,
                                  use_image=True, spatial=False,
                                  fullres_image_files=imgs,
                                  patch_size_px=args.patch_size)
    grids = create_visium_dataset(dirs, annot_files=annots, use_count=False,
                                  use_image=True, spatial=True,
                                  fullres_image_files=imgs,
                                  patch_size_px=args.patch_size)
    class_names = list(grids.classes)
    print(f"{len(spots)} spot patches, {len(grids)} arrays")

    if args.densenet121:
        f = densenet121(num_classes=len(class_names))
    else:
        f = DenseNet(growth_rate=8, block_config=(2, 2), num_init_features=16,
                     num_classes=len(class_names), small_inputs=True)

    Xs, Ys = spots.materialize()
    n_val = len(Xs) // 5
    f_state, *_ = train_spotwise(
        f, {"train": (Xs[n_val:], Ys[n_val:]), "val": (Xs[:n_val], Ys[:n_val])},
        learning_rate=1e-3, num_epochs=args.epochs, batch_size=64)

    Xg, Yg = grids.materialize()
    g = GridNetHex(patch_classifier=f, n_classes=len(class_names),
                   patch_chunk=1664)  # atonce_patch_limit analog
    tx = make_gridwise_optimizer(1e-3)
    state = create_train_state(g, jax.random.key(0), Xg[:1], tx)
    state = load_f_params(state, f_state.variables())
    state, *_ = train_gridwise(
        g, {"train": (Xg[1:], Yg[1:]), "val": (Xg[:1], Yg[:1])},
        state=state, tx=tx, num_epochs=args.epochs)

    y_true, y_pred, _ = all_fgd_predictions((Xg, Yg), g, state.variables())
    print(f"foreground registration accuracy: {(y_true == y_pred).mean():.3f}")


if __name__ == "__main__":
    main()
