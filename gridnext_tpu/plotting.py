"""Evaluation plots: ROC/PR grids, confusion matrices, label maps.

Host-side matplotlib/sklearn, functional parity with the reference's
plotting.py (performance_curves:14-98, plot_confusion:103-134,
misclass_density:138-149, plot_class_boundaries:151-185 -- with its missing
``make_axes_locatable`` import fixed -- and plot_label_tensor:189-240).

Conventions: numpy arrays in, channels-LAST softmax grids (H, W, C).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from gridnext_tpu import geometry


# The two one-vs-rest curve families of the performance report. Each entry:
# (name, x-label, y-label, curve_fn(y_binary, scores) -> (xs, ys)).
def _roc_xy(y, s):
    from sklearn.metrics import roc_curve

    fpr, tpr, _ = roc_curve(y, s)
    return fpr, tpr


def _pr_xy(y, s):
    from sklearn.metrics import precision_recall_curve

    precision, recall, _ = precision_recall_curve(y, s)
    return recall, precision


_CURVE_FAMILIES = (("FPR", "TPR", _roc_xy), ("Recall", "Precision", _pr_xy))


def performance_curves(true, smax, class_names: Optional[Sequence[str]] = None,
                       condition_names: Optional[Sequence[str]] = None,
                       panel_columns: int = 4):
    """One-vs-rest ROC + PR curve grid; returns (fig, ax, mAUROC, mAUPRC).

    ``smax`` may be a single (n, C) array or a list of them (multiple
    conditions overlaid); macro averages come back per condition. Figure
    layout matches the reference report (plotting.py:14-98): ROC panels on
    the top half, PR panels below, one column per class.
    """
    from matplotlib import pyplot as plt
    from sklearn.metrics import auc

    if isinstance(smax, list):
        if condition_names is None:
            raise ValueError("Must provide names for each condition plotted")
        conditions = list(zip(condition_names, smax))
    else:
        conditions = [("", smax)]
    n_classes = conditions[0][1].shape[1]
    onehot = np.equal.outer(np.asarray(true), np.arange(n_classes)).astype(int)

    # compute every curve + AUC up front: aucs[family, class, condition]
    curves = {}
    aucs = np.zeros((len(_CURVE_FAMILIES), n_classes, len(conditions)))
    for fi, (_, _, curve_fn) in enumerate(_CURVE_FAMILIES):
        for c in range(n_classes):
            for ci, (_, scores) in enumerate(conditions):
                if not onehot[:, c].any():
                    # class absent from `true`: roc_curve yields nan tpr
                    # and auc(nan) would poison the MACRO average for
                    # every class; mark it and exclude it instead
                    aucs[fi, c, ci] = np.nan
                    continue
                xs, ys = curve_fn(onehot[:, c], scores[:, c])
                aucs[fi, c, ci] = auc(xs, ys)
                curves[fi, c, ci] = (xs, ys)

    # render: family-major row blocks of panel_columns panels
    rows_per_family = -(-n_classes // panel_columns)
    n_row = rows_per_family * len(_CURVE_FAMILIES)
    fig, ax = plt.subplots(n_row, panel_columns,
                           figsize=(4 * panel_columns, 4 * n_row),
                           constrained_layout=True, squeeze=False)
    for a in ax.ravel():
        a.axis("off")
    for (fi, c, ci), (xs, ys) in curves.items():
        a = ax[fi * rows_per_family + c // panel_columns, c % panel_columns]
        a.plot(xs, ys,
               label=f"{conditions[ci][0]} (AUC={aucs[fi, c, ci]:.3f})")
    for fi, (xlabel, ylabel, _) in enumerate(_CURVE_FAMILIES):
        for c in range(n_classes):
            a = ax[fi * rows_per_family + c // panel_columns, c % panel_columns]
            a.axis("on")
            a.set(xlabel=None, ylabel=None, xlim=(0, 1), ylim=(0, 1))
            a.set_xlabel(xlabel, fontsize=12)
            a.set_ylabel(ylabel, fontsize=12)
            if a.get_legend_handles_labels()[0]:  # absent class: no curves
                a.legend(fontsize=12)
            if class_names is not None:
                a.set_title(class_names[c], fontsize=14)

    # macro over the classes PRESENT in `true` (absent classes are nan)
    macro = np.nanmean(aucs, axis=1)  # -> (family, condition)
    return fig, ax, macro[0], macro[1]


def plot_cv_curves(train_hist, val_hist, ylabel: str = "Loss", ax=None):
    """Across-fold mean +/- std learning curves (errorbar per epoch).

    ``train_hist``/``val_hist`` are (n_folds, n_epochs) arrays of epoch
    losses -- a :class:`~gridnext_tpu.workflows.cv.CVResult`'s fields.
    Renders register_BA44_counts.ipynb cell 6: one errorbar series per
    phase, mean across folds with std bars.
    """
    from matplotlib import pyplot as plt

    train_hist = np.asarray(train_hist, float)
    val_hist = np.asarray(val_hist, float)
    fig = None
    if ax is None:
        fig, ax = plt.subplots(1)
    epochs = np.arange(train_hist.shape[1])
    ax.errorbar(epochs, train_hist.mean(0), yerr=train_hist.std(0),
                label="train")
    ax.errorbar(np.arange(val_hist.shape[1]), val_hist.mean(0),
                yerr=val_hist.std(0), label="val")
    ax.set(xlabel="Epoch", ylabel=ylabel)
    ax.legend()
    return fig, ax


def plot_confusion(y_true, y_pred, class_names=None, figsize=None):
    """Row-normalized confusion heatmap annotated with spot counts."""
    import seaborn as sns
    from matplotlib import pyplot as plt
    from sklearn.metrics import confusion_matrix

    if class_names is None:
        class_names = np.unique(np.concatenate([np.asarray(y_true).ravel(),
                                                np.asarray(y_pred).ravel()]))
        labels = class_names
    else:
        # pin the matrix to ALL trained classes: without labels= sklearn
        # drops classes absent from this cohort and the heatmap rows would
        # silently misalign with class_names
        labels = np.arange(len(class_names))
    counts = confusion_matrix(y_true, y_pred, labels=labels)
    # normalize per true-class row (one confusion_matrix call, not two)
    row_sums = counts.sum(axis=1, keepdims=True)
    fractions = counts / np.maximum(row_sums, 1)

    fig, ax = plt.subplots(1, figsize=figsize)
    sns.heatmap(fractions, annot=counts, fmt="d", ax=ax,
                xticklabels=class_names, yticklabels=class_names,
                cbar=True, cbar_kws={"label": "fraction of spots"})
    ax.set(ylabel="True label", xlabel="Predicted label")
    return fig, ax


def misclass_density(out_softmax: np.ndarray, true: np.ndarray) -> np.ndarray:
    """Per-spot misclassification probability 1 - p(correct class).

    ``out_softmax``: (H, W, C) channels-last softmax grid; ``true``: (H, W)
    labels with 0 background. Vectorized port of plotting.py:138-149.
    """
    out_softmax = np.asarray(out_softmax)
    true = np.asarray(true).astype(np.int64)  # uint grids would underflow at -1
    fg = true > 0
    idx = np.maximum(true - 1, 0)
    p_correct = np.take_along_axis(out_softmax, idx[..., None], axis=-1)[..., 0]
    return np.where(fg, 1.0 - p_correct, 0.0)


def class_boundary_segments(true: np.ndarray) -> np.ndarray:
    """Vectorized label-boundary finder for a (H, W) integer grid.

    Returns an (n_segments, 2, 2) array of ((x0, y0), (x1, y1)) line segments
    in image data coordinates (pixel centers at integers), one unit-length
    segment per pair of 4-adjacent cells with differing labels.
    """
    true = np.asarray(true)
    segs = []
    # vertical boundary lines between horizontally adjacent cells
    yy, xx = np.nonzero(true[:, 1:] != true[:, :-1])
    if len(xx):
        x = xx + 0.5
        segs.append(np.stack([np.stack([x, yy - 0.5], 1),
                              np.stack([x, yy + 0.5], 1)], axis=1))
    # horizontal boundary lines between vertically adjacent cells
    yy, xx = np.nonzero(true[1:, :] != true[:-1, :])
    if len(xx):
        y = yy + 0.5
        segs.append(np.stack([np.stack([xx - 0.5, y], 1),
                              np.stack([xx + 0.5, y], 1)], axis=1))
    if not segs:
        return np.zeros((0, 2, 2))
    return np.concatenate(segs, axis=0)


def plot_class_boundaries(base_image: np.ndarray, true: np.ndarray):
    """Per-spot scalar map (e.g. misclass density) with white class borders.

    Same figure as the reference's axvline/axhline cell loop
    (plotting.py:151-185, which also lacks its make_axes_locatable import);
    here the boundary set is computed by vectorized label diffs and drawn as
    one LineCollection.
    """
    from matplotlib import pyplot as plt
    from matplotlib.collections import LineCollection
    from mpl_toolkits.axes_grid1 import make_axes_locatable

    true = np.asarray(true)
    fig, ax = plt.subplots(1)
    ax.set_axis_off()
    ax.imshow(np.zeros_like(true), cmap="gray")
    fgd = ax.imshow(np.ma.masked_where(true == 0, base_image), cmap="plasma")
    ax.add_collection(LineCollection(class_boundary_segments(true),
                                     colors="w", linewidths=1.0))

    cax = make_axes_locatable(ax).append_axes("right", size="5%", pad=0.05)
    fig.colorbar(fgd, cax=cax).set_label("Misclassification Probability")
    return fig


def plot_label_tensor(label_grid, class_names=None, Visium: bool = False,
                      ax=None, legend: bool = True):
    """Scatter a (H, W) integer label grid, hex-aware when ``Visium``."""
    from matplotlib import pyplot as plt

    label_grid = np.asarray(label_grid)
    if class_names is None:
        fg_vals = np.sort(np.unique(label_grid[label_grid > 0]))
    else:
        fg_vals = np.arange(1, len(class_names) + 1)

    if ax is None:
        _, ax = plt.subplots(1, figsize=(10, 8))
    ax.set_aspect("equal")
    ax.invert_yaxis()

    for fgv in fg_vals:
        m = label_grid == fgv
        yy, xx = np.nonzero(m)
        lbl = fgv if class_names is None else class_names[fgv - 1]
        if len(xx):
            if Visium:
                col, row = geometry.oddr_to_pseudo_hex(xx, yy)
                px, py = geometry.pseudo_to_true_hex(col, row)
            else:
                px, py = xx, yy
            ax.scatter(px, py, label=lbl, s=10)
        else:
            ax.scatter([], [], label=lbl, s=10)

    ax.axis("off")
    if legend:
        ax.legend(bbox_to_anchor=(1, 0), loc="lower left")
    return ax


# ---------------------------------------------------------------------------
# Hexagon-patch renderers (hexagdly_tools.py analog, odd-right native)
# ---------------------------------------------------------------------------

def plot_hextensor(grid, layout: str = "odd-r", cmap: str = "Greys", ax=None,
                   mask: Sequence[int] = ()):
    """Render a 2-D grid as a collection of hexagons.

    ``layout='odd-r'`` (default): Visium odd-right -- odd ROWS shifted right,
    pointy-top hexagons; this package's native layout. ``layout='odd-q'``
    reproduces the hexagdly convention (odd COLUMNS shifted down, flat-top;
    hexagdly_tools.py:68) for side-by-side comparison with reference figures.
    """
    from matplotlib import pyplot as plt
    from matplotlib.collections import PatchCollection
    from matplotlib.patches import RegularPolygon

    grid = np.asarray(grid)
    if grid.ndim != 2:
        raise ValueError("plot_hextensor takes a single (H, W) channel")
    h, w = grid.shape

    hexagons, intensities = [], []
    npix = 0
    # pixel counting order matches each convention's own tooling: hexagdly
    # masks count column-major (hexagdly_tools.py:61-63), odd-r row-major
    if layout == "odd-q":
        order = [(y, x) for x in range(w) for y in range(h)]
    else:
        order = [(y, x) for y in range(h) for x in range(w)]
    for y, x in order:
            if npix not in mask:
                if layout == "odd-r":
                    # the canonical odd-right coordinate math (CLAUDE.md:
                    # one geometry implementation), y flipped for screen
                    cx, cy = geometry.oddr_to_cartesian(x, y)
                    center = (float(cx), -float(cy))
                    orientation = 0.0  # pointy-top
                elif layout == "odd-q":
                    center = (x * np.sqrt(3) / 2, -(y + (x % 2) * 0.5))
                    orientation = np.pi / 6
                else:
                    raise ValueError(layout)
                hexagons.append(RegularPolygon(center, 6, radius=0.577349,
                                               orientation=orientation))
                intensities.append(grid[y, x])
            npix += 1

    if ax is None:
        _, ax = plt.subplots(figsize=(10, 10))
    p = PatchCollection(hexagons, cmap=cmap, alpha=0.9, edgecolors="k",
                        linewidth=1)
    p.set_array(np.asarray(intensities))
    ax.add_collection(p)
    ax.autoscale_view()
    ax.set_aspect("equal")
    ax.set_axis_off()
    return ax


def plot_squaretensor(grid, cmap: str = "Greys", ax=None):
    """Cartesian pcolor rendering of a 2-D grid (hexagdly_tools.py:96-139)."""
    from matplotlib import pyplot as plt

    grid = np.asarray(grid)
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
    ax.set_axis_off()
    ax.pcolor(grid, cmap=cmap, edgecolors="k", linewidths=0.4)
    ax.invert_yaxis()
    ax.set_aspect("equal")
    ax.set_frame_on(True)
    return ax
