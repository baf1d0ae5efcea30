"""Grouped cross-validated registration (register_BA44*.ipynb workflow).

The BA44 notebooks evaluate each classifier with leave-subjects-out CV:
arrays group by individual, the individuals split into k partitions, and
every fold trains a fresh spot classifier on the remaining subjects'
arrays (register_BA44_counts.ipynb cells 1+5), with fold learning curves
summarized mean +/- std (cell 6). Here: a simulated multi-subject cohort
(two arrays per subject), CountMLP spotwise folds through
``workflows.cross_validate``, and the across-fold summary.

Run: PYTHONPATH=. python examples/register_cv.py [--epochs N]
"""

import argparse
import os
import tempfile

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--subjects", type=int, default=3)
    ap.add_argument("--arrays-per-subject", type=int, default=2)
    args = ap.parse_args(argv)
    out = tempfile.mkdtemp(prefix="gridnext_cv_")

    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
    from gridnext_tpu.models import CountMLP
    from gridnext_tpu.train import train_spotwise
    from gridnext_tpu.workflows import cross_validate, grouped_partitions

    # cohort: arrays-per-subject arrays per subject; groups[i] = array i's
    # subject (the notebooks' meta['Level 3'] column)
    sims, groups = [], []
    for s in range(args.subjects):
        for a in range(args.arrays_per_subject):
            i = len(sims)
            sims.append(simulate_spaceranger_dir(
                os.path.join(out, f"s{s}a{a}"), seed=100 + i,
                n_genes=60, n_classes=4))
            groups.append(f"subject{s}")
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]

    gdat = create_visium_dataset(dirs, annot_files=annots, use_count=True,
                                 use_image=False, spatial=True,
                                 minimum_detection_rate=None)
    Xg, Yg = gdat.materialize()
    Xg = np.log1p(Xg)
    n_classes = len(gdat.classes)

    def spots_of(mask):
        fg = Yg[mask] > 0
        return Xg[mask][fg], (Yg[mask][fg] - 1).astype(np.int64)

    def fold_fn(train_mask, val_mask, fold):
        f = CountMLP(n_classes=n_classes)
        return train_spotwise(
            f, {"train": spots_of(train_mask), "val": spots_of(val_mask)},
            num_epochs=args.epochs, batch_size=128, verbose=False)

    cv = cross_validate(fold_fn, groups,
                        partitions=grouped_partitions(groups, args.subjects))
    s = cv.summary()
    print(f"{len(cv.partitions)}-fold grouped CV over {len(dirs)} arrays")
    print("val loss mean per epoch: "
          + " ".join(f"{v:.3f}" for v in s["val_mean"]))
    print(f"final val loss {s['val_mean'][-1]:.3f} "
          f"+/- {s['val_std'][-1]:.3f} across folds")
    return {"n_folds": len(cv.partitions),
            "shape": cv.val_hist.shape,
            "first_val_mean": float(s["val_mean"][0]),
            "final_val_mean": float(s["val_mean"][-1]),
            "final_val_std": float(s["val_std"][-1])}


if __name__ == "__main__":
    main()
