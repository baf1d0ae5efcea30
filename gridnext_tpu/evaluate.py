"""Inference / registration path: foreground predictions and Loupe export.

Parity targets: ``all_fgd_predictions`` (utils.py:20-57) and
``to_loupe_annots`` (utils.py:169-193) of the reference. This is the
"register a slide" serving path benchmarked by bench.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _forward_fn(model, method, tta=False):
    """One jitted forward per (model, method, tta): repeated
    all_fgd_predictions calls (CLI ``evaluate`` loops per array) reuse the
    compile instead of re-tracing every call. Variables are an ARGUMENT,
    not a closure -- closed-over device arrays lower as HLO constants
    (bloating each compile; see the artifact-export HTTP 413 note in
    docs/roadmap.md).

    ``tta``: test-time augmentation -- the forward averages softmax over
    all 8 dihedral orientations of the image patches (the image element of
    a multimodal tuple) and returns log-mean-softmax, so downstream
    argmax/softmax consume it exactly like logits. 8x compute per array;
    a static python loop, one fused XLA program."""
    from gridnext_tpu.pipeline import dihedral_transform

    def apply(variables, x):
        if method:
            return model.apply(variables, x, train=False, method=method)
        return model.apply(variables, x, train=False)

    @jax.jit
    def forward(variables, x):
        if not tta:
            return apply(variables, x)
        smax = 0.0
        for k in range(8):
            if isinstance(x, (tuple, list)):
                xt = type(x)((dihedral_transform(x[0], k),) + tuple(x[1:]))
            else:
                xt = dihedral_transform(x, k)
            smax = smax + jax.nn.softmax(apply(variables, xt), axis=-1)
        return jnp.log(smax / 8.0 + 1e-20)

    return forward


def all_fgd_predictions(data, model, variables, *, f_only: bool = False,
                        batch_size: int = 1, return_grids: bool = False,
                        tta: bool = False):
    """Run a grid model over a dataset and collect foreground predictions.

    Args:
      data: (inputs, labels) pair -- inputs (N, H, W, ...) array (or tuple of
        arrays for multimodal), labels (N, H, W) with 0 = background.
      model: GridNet-family module.
      variables: flax variables for ``model``.
      f_only: use ``patch_predictions`` (f outputs) instead of the corrected
        grid, like the reference's flag (utils.py:33-36).
      return_grids: also return the per-array ``(label_grid, softmax_grid)``
        pairs (unflattened, (H, W) / (H, W, C)) -- the inputs of the label-map
        and misclass-density figures (CLI ``evaluate --maps``).
      tta: dihedral test-time augmentation -- average the softmax over all
        8 flip/rotation orientations of each image patch (requires
        image-patch inputs; the CLI flag is ``evaluate --tta``). The
        returned "logits" are log-mean-softmax (argmax/softmax-equivalent).

    Returns:
      (y_true, y_pred, y_smax): int labels in [0, N), argmax predictions and
      softmax matrices, flattened over all foreground spots of all arrays;
      plus the grid list when ``return_grids``.
    """
    inputs, labels = data
    multi = isinstance(inputs, (tuple, list))
    n = len(labels)

    method = "patch_predictions" if f_only else None

    if tta:
        probe = inputs[0] if multi else inputs
        probe = np.asarray(probe)
        if probe.ndim < 5 or probe.shape[-2] != probe.shape[-3]:
            raise ValueError(
                "tta needs square image-patch inputs (..., P, P, C); got "
                f"shape {probe.shape} -- count-modality models have no "
                "patch orientation to average over")

    try:
        fwd = _forward_fn(model, method, tta)
    except TypeError:  # model config unhashable; fall back to an uncached jit
        if tta:
            raise  # the cached path is the only TTA implementation
        fwd = jax.jit(lambda v, x: (
            model.apply(v, x, train=False, method=method) if method
            else model.apply(v, x, train=False)))

    def forward(x):
        return fwd(variables, x)

    def pad_batch(a, b):
        """Pad a short remainder batch up to batch_size (repeat last array).

        Keeps every ``forward`` call the same leading shape so the last
        slice of a non-divisible dataset doesn't trigger a recompile; the
        padded rows are discarded by the label mask below.
        """
        if b == batch_size:
            return jnp.asarray(a)
        pad = np.repeat(a[-1:], batch_size - b, axis=0)
        return jnp.asarray(np.concatenate([a, pad], axis=0))

    true_vals, pred_vals, pred_smax, grids = [], [], [], []
    for i in range(0, n, batch_size):
        b = min(batch_size, n - i)
        if multi:
            x = tuple(pad_batch(np.asarray(a)[i:i + b], b) for a in inputs)
        else:
            x = pad_batch(np.asarray(inputs)[i:i + b], b)
        y = np.asarray(labels)[i:i + b]

        logits = np.asarray(forward(x))[:b]             # (b, H, W, C)
        smax_b = None
        if return_grids:
            smax_b = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
            grids.extend((y[j], smax_b[j]) for j in range(b))
        logits = logits.reshape(-1, logits.shape[-1])
        y = y.reshape(-1)
        fg = y > 0
        logits = logits[fg]
        y_fg = y[fg] - 1  # re-scale foreground labels to [0, N)

        true_vals.append(y_fg)
        pred_vals.append(np.argmax(logits, axis=1))
        if smax_b is not None:   # the fg rows of the grid softmax, reused
            pred_smax.append(smax_b.reshape(-1, smax_b.shape[-1])[fg])
        else:
            pred_smax.append(
                np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=1)))

    out = (np.concatenate(true_vals), np.concatenate(pred_vals),
           np.concatenate(pred_smax))
    return out + (grids,) if return_grids else out


def consensus_softmax(smax_list: Sequence[np.ndarray]) -> np.ndarray:
    """Cross-modality consensus: mean of per-model softmax matrices.

    The register_pca.ipynb workflow averages the count-g and image-g
    softmax outputs over foreground spots before argmax (SURVEY.md section
    6 'consensus(g_pca+g_img)').
    """
    stack = np.stack([np.asarray(s) for s in smax_list])
    return stack.mean(axis=0)


def flatten_foreground(pred_grid: np.ndarray, true_grid: np.ndarray):
    """Flatten per-array prediction maps over foreground spots.

    Implements the reference's flattening contract exactly
    (utils.py:37-41 / training.py:152-157): row-major over (H, W), keep
    spots with true label > 0, shift labels to [0, N).

    Args:
      pred_grid: (H, W, C) channels-last or (C, H, W) channels-first map.
        Channels-first is detected by shape mismatch with ``true_grid``; in
        the ambiguous C == H == W case the package convention
        (channels-LAST, CLAUDE.md) wins -- pass channels-last there.
      true_grid: (H, W) integer labels, 0 = background.

    Returns:
      (preds_fg (n_fg, C), true_fg (n_fg,)).
    """
    pred_grid = np.asarray(pred_grid)
    true_grid = np.asarray(true_grid)
    if pred_grid.shape[:2] != true_grid.shape:  # channels-first input
        pred_grid = np.moveaxis(pred_grid, 0, -1)
    flat = pred_grid.reshape(-1, pred_grid.shape[-1])
    labels = true_grid.reshape(-1)
    fg = labels > 0
    return flat[fg], labels[fg] - 1


def to_loupe_annots(annot_grid, position_file, output_file,
                    annot_names: Optional[Sequence[str]] = None,
                    zero_bg: bool = True, hex_coords: bool = True):
    """Write a Loupe-format (Barcode, AARs) CSV from an odd-right label grid.

    ``annot_grid`` is (H, W) integer labels (foreground 1..N when
    ``zero_bg``, else 0..N-1). Unlabeled in-tissue spots export as ''.
    Matches utils.py:169-193. ``hex_coords=False`` (Visium HD square
    lattices) indexes the grid directly by (array_row, array_col).
    """
    import pandas as pd

    from gridnext_tpu import geometry
    from gridnext_tpu.io.spaceranger import read_positions_file

    positions = read_positions_file(position_file)
    annot_grid = np.asarray(annot_grid).squeeze()

    barcodes, annotations = [], []
    in_tissue = positions[positions["in_tissue"].astype(int) == 1]
    if hex_coords:
        x, y = geometry.pseudo_hex_to_oddr(in_tissue["array_col"].values,
                                           in_tissue["array_row"].values)
        x, y = np.atleast_1d(x), np.atleast_1d(y)
        # guard like the square branch below: an out-of-grid index would
        # raise a bare IndexError, and a NEGATIVE one (malformed
        # col/row parity -> x = -1) would silently wrap to the LAST
        # column and export the wrong spot's label
        if len(y) and (int(y.max()) >= annot_grid.shape[0]
                       or int(x.max()) >= annot_grid.shape[1]
                       or int(x.min()) < 0 or int(y.min()) < 0):
            raise ValueError(
                f"positions map to odd-right extent "
                f"({int(y.min())}..{int(y.max())}, "
                f"{int(x.min())}..{int(x.max())}) but the label grid is "
                f"{annot_grid.shape[:2]} -- the array's lattice exceeds "
                "the model's grid (or a position row has invalid "
                "array_col/array_row parity)")
    else:
        x = in_tissue["array_col"].values.astype(int)
        y = in_tissue["array_row"].values.astype(int)
        if len(y) and (int(np.max(y)) >= annot_grid.shape[0]
                       or int(np.max(x)) >= annot_grid.shape[1]):
            raise ValueError(
                f"positions extend to ({int(np.max(y))}, {int(np.max(x))}) but "
                f"the label grid is {annot_grid.shape[:2]} -- the array's HD "
                "lattice is larger than the model's grid_dims (retrain with "
                "grid_dims='auto' over a cohort that covers this array)")
    for bc, xi, yi in zip(in_tissue.index, np.atleast_1d(x), np.atleast_1d(y)):
        a = int(annot_grid[yi, xi]) - int(zero_bg)
        if a < 0:
            annotations.append("")
        elif annot_names is not None:
            annotations.append(annot_names[a])
        else:
            annotations.append(a)
        barcodes.append(bc)

    pd.DataFrame({"Barcode": barcodes, "AARs": annotations}).to_csv(
        output_file, sep=",", index=False)
