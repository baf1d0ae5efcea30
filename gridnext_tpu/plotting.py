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


def performance_curves(true, smax, class_names: Optional[Sequence[str]] = None,
                       condition_names: Optional[Sequence[str]] = None):
    """One-vs-rest ROC + PR curve grid; returns (fig, ax, mAUROC, mAUPRC).

    ``smax`` may be a single (n, C) array or a list of them (multiple
    conditions overlaid); macro averages come back per condition.
    """
    from matplotlib import pyplot as plt
    from sklearn.metrics import auc, precision_recall_curve, roc_curve
    from sklearn.preprocessing import label_binarize

    if isinstance(smax, list):
        n_classes = smax[0].shape[1]
        assert condition_names is not None, "Must provide names for each condition plotted"
    else:
        n_classes = smax.shape[1]
        smax = [smax]
        condition_names = [""]
    true_onehot = label_binarize(true, classes=list(range(n_classes)))
    if n_classes == 2:  # label_binarize degenerates to one column
        true_onehot = np.hstack([1 - true_onehot, true_onehot])

    n_col = 4
    n_row = int(np.ceil(n_classes / n_col)) * 2
    fig, ax = plt.subplots(n_row, n_col, figsize=(4 * n_col, 4 * n_row),
                           constrained_layout=True, squeeze=False)
    for a in ax.ravel():
        a.axis("off")

    macro_auroc = np.zeros((n_classes, len(smax)))
    macro_auprc = np.zeros((n_classes, len(smax)))

    for c in range(n_classes):
        top, btm = c // n_col, c // n_col + n_row // 2
        col = c % n_col
        ax[top, col].axis("on")
        ax[btm, col].axis("on")

        for i, s in enumerate(smax):
            fpr, tpr, _ = roc_curve(true_onehot[:, c], s[:, c])
            auroc = auc(fpr, tpr)
            precision, recall, _ = precision_recall_curve(true_onehot[:, c], s[:, c])
            auprc = auc(recall, precision)
            macro_auroc[c, i] = auroc
            macro_auprc[c, i] = auprc
            ax[top, col].plot(fpr, tpr, label=f"{condition_names[i]} (AUC={auroc:.3f})")
            ax[btm, col].plot(recall, precision,
                              label=f"{condition_names[i]} (AUC={auprc:.3f})")

        ax[top, col].set_xlabel("FPR", fontsize=12)
        ax[top, col].set_ylabel("TPR", fontsize=12)
        ax[btm, col].set_xlabel("Recall", fontsize=12)
        ax[btm, col].set_ylabel("Precision", fontsize=12)
        ax[top, col].legend(fontsize=12)
        ax[btm, col].legend(fontsize=12)
        if class_names is not None:
            ax[top, col].set_title(class_names[c], fontsize=14)
            ax[btm, col].set_title(class_names[c], fontsize=14)
        for a in (ax[top, col], ax[btm, col]):
            a.set_xlim(0, 1)
            a.set_ylim(0, 1)

    return fig, ax, macro_auroc.mean(axis=0), macro_auprc.mean(axis=0)


def plot_confusion(y_true, y_pred, class_names=None, figsize=None):
    """Row-normalized confusion heatmap annotated with counts."""
    import seaborn as sns
    from matplotlib import pyplot as plt
    from sklearn.metrics import confusion_matrix

    cmat = confusion_matrix(y_true, y_pred)
    cmat_norm = confusion_matrix(y_true, y_pred, normalize="true")
    if class_names is None:
        class_names = np.unique(y_true)

    fig, ax = plt.subplots(1, figsize=figsize)
    sns.heatmap(cmat_norm, annot=cmat, fmt="d", ax=ax,
                xticklabels=class_names, yticklabels=class_names,
                cbar=True, cbar_kws={"label": "fraction of spots"})
    ax.set_ylabel("True label")
    ax.set_xlabel("Predicted label")
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


def plot_class_boundaries(base_image: np.ndarray, true: np.ndarray):
    """Render a per-spot map with white lines at class boundaries.

    (plotting.py:151-185, with the make_axes_locatable import present.)
    """
    from matplotlib import pyplot as plt
    from mpl_toolkits.axes_grid1 import make_axes_locatable

    true = np.asarray(true)
    ydim, xdim = true.shape
    fig, ax = plt.subplots(1)
    plt.axis("off")

    masked = np.ma.masked_where(true == 0, base_image)
    ax.imshow(np.zeros_like(true), cmap="gray")
    fgd = ax.imshow(masked, cmap="plasma")

    xpix, ypix = 1.0 / xdim, 1.0 / ydim
    for y in range(ydim):
        for x in range(xdim):
            for x_off in (-1, 1):
                if 0 <= x + x_off < xdim and true[y, x] != true[y, x + x_off]:
                    ax.axvline(x=x + x_off / 2, ymin=1 - (y + 1) * ypix,
                               ymax=1 - y * ypix, c="w")
            for y_off in (-1, 1):
                if 0 <= y + y_off < ydim and true[y, x] != true[y + y_off, x]:
                    ax.axhline(y=y + y_off / 2, xmin=x * xpix,
                               xmax=(x + 1) * xpix, c="w")

    divider = make_axes_locatable(ax)
    cax = divider.append_axes("right", size="5%", pad=0.05)
    cbar = fig.colorbar(fgd, cax=cax)
    cbar.set_label("Misclassification Probability")
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
                    center = (x + (y % 2) * 0.5, -(y * np.sqrt(3) / 2))
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
