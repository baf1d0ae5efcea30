"""PCA-reduced count registration workflow.

Generalized, path-agnostic port of the reference's
scripts/fit_pca_unified_cortex.py (which also fixes its missing ``pickle``
import, fit_pca_unified_cortex.py:98): drop spots under ``min_counts`` UMIs,
depth-normalize to 1e4, log1p, z-scale each gene by the *training cohort's*
statistics, clip at 10, fit PCA, and pick the PC count explaining a target
variance fraction. The PCA transform itself is exposed as a jittable matmul
so PC featurization can run on-device as part of the registration pipeline
(register_pca.ipynb workflow).

scanpy-free: the normalize/log1p steps are plain numpy.
"""

from __future__ import annotations

import pickle
from typing import Optional, Sequence, Tuple

import numpy as np


def _load_counts(count_file) -> "pandas.DataFrame":
    if hasattr(count_file, "values"):  # already a DataFrame
        return count_file
    # same native-fast, mtime-keyed cached read the dataset layer uses
    # (select_hvgs + preprocess_cohorts read the same files in one session)
    from gridnext_tpu.data.datasets import _read_count_frame

    return _read_count_frame(str(count_file))


def filtered_norm_logcounts(count_file, min_counts: int = 100,
                            target_sum: float = 1e4):
    """(genes x spots) count file -> depth-normalized log1p DataFrame.

    Spots with fewer than ``min_counts`` total UMIs are dropped
    (fit_pca_unified_cortex.py:33-44 semantics).
    """
    df = _load_counts(count_file)
    depths = df.values.sum(axis=0)
    keep = depths >= min_counts
    df = df.loc[:, keep]
    depths = depths[keep]
    X = df.values / depths[None, :] * target_sum
    X = np.log1p(X)
    import pandas as pd

    return pd.DataFrame(X, index=df.index, columns=df.columns)


def _check_gene_axes(frames, files):
    """Refuse to hstack count frames with mismatched gene axes: per-gene
    statistics over misaligned rows would be silently wrong (the same
    guard the dataset layer and hvg.py apply; pca.py was the one
    count-consuming path without it)."""
    genes0, f0 = None, None
    for df, cf in zip(frames, files):
        genes = list(df.index)
        if genes0 is None:
            genes0, f0 = genes, cf
        elif genes != genes0:
            from gridnext_tpu.io.unify import assert_gene_axis_match

            assert_gene_axis_match(genes, genes0, str(cf), str(f0))


def _scaler_from_normed(frames, files) -> Tuple[np.ndarray, np.ndarray]:
    """Per-gene (mean, std) over pre-normalized frames -- the ONE scaler
    implementation (fit_cohort_scaler and preprocess_cohorts share it)."""
    _check_gene_axes(frames, files)
    allcounts = np.hstack([df.values for df in frames])
    return allcounts.mean(axis=1), allcounts.std(axis=1)


def fit_cohort_scaler(count_files: Sequence, min_counts: int = 100,
                      target_sum: float = 1e4) -> Tuple[np.ndarray, np.ndarray]:
    """Per-gene (mean, std) over a training cohort's normalized log counts."""
    frames = [filtered_norm_logcounts(cf, min_counts, target_sum)
              for cf in count_files]
    return _scaler_from_normed(frames, count_files)


def scale_logcounts(df, mean: np.ndarray, std: np.ndarray, clip: float = 10.0):
    """Z-scale genes by cohort statistics and clip (fit_pca...py:61-66)."""
    std = np.where(std == 0, 1.0, std)
    X = (df.values - mean[:, None]) / std[:, None]
    X = np.minimum(X, clip)
    import pandas as pd

    return pd.DataFrame(X, index=df.index, columns=df.columns)


def fit_pca(X: np.ndarray, n_components: Optional[int] = None,
            outfile=None):
    """Fit sklearn PCA on (spots x genes) scaled data; optionally pickle it."""
    from sklearn.decomposition import PCA

    pca = PCA(n_components=n_components)
    pca.fit(np.asarray(X, np.float32))
    if outfile is not None:
        with open(outfile, "wb") as fh:
            pickle.dump(pca, fh)
    return pca


def n_pcs_for_variance(pca, fraction: float = 0.5) -> int:
    """Smallest PC count explaining > ``fraction`` of variance
    (fit_pca_unified_cortex.py:100-101). If the fitted components never
    reach ``fraction`` (truncated PCA or fraction ~1.0), all of them are
    returned rather than raising from an empty argwhere."""
    above = np.where(np.cumsum(pca.explained_variance_ratio_) > fraction)[0]
    if len(above) == 0:
        return int(len(pca.explained_variance_ratio_))
    return int(above[0]) + 1


def pca_transform(X, components: np.ndarray, mean: np.ndarray,
                  n_pcs: Optional[int] = None):
    """Jittable PCA projection: (..., genes) -> (..., n_pcs).

    Pass ``pca.components_`` / ``pca.mean_`` from :func:`fit_pca`. Works on
    numpy or jax arrays and inside jit -- PC featurization of count grids
    becomes one on-device matmul feeding f.
    """
    import jax.numpy as jnp

    comp = jnp.asarray(components if n_pcs is None else components[:n_pcs])
    return (jnp.asarray(X) - jnp.asarray(mean)) @ comp.T


def preprocess_cohorts(train_count_files: Sequence, all_count_files: Sequence,
                       min_counts: int = 100, target_sum: float = 1e4,
                       clip: float = 10.0, variance_fraction: float = 0.5,
                       pca_outfile=None):
    """The full fit_pca_unified_cortex pipeline, in memory.

    Returns dict with scaler (mean, std), the fitted pca, ``n_pcs`` at the
    variance target, and per-file scaled DataFrames keyed by the input path
    string (or ``id()`` for DataFrame inputs) -- every file in
    ``all_count_files`` AND ``train_count_files`` gets an entry, and the
    PCA fits on every TRAIN file (train files need not appear in
    all_count_files).
    """
    # read/normalize each file exactly once; membership by identity or
    # normalized path string (Path vs str must compare equal)
    def _key(cf):
        return id(cf) if hasattr(cf, "values") else str(cf)

    normed = {_key(cf): filtered_norm_logcounts(cf, min_counts, target_sum)
              for cf in all_count_files}
    for cf in train_count_files:  # train files may not be in all_count_files
        if _key(cf) not in normed:
            normed[_key(cf)] = filtered_norm_logcounts(cf, min_counts, target_sum)
    every = list(all_count_files) + [cf for cf in train_count_files
                                     if _key(cf) not in
                                     {_key(c) for c in all_count_files}]
    _check_gene_axes([normed[_key(cf)] for cf in every], every)

    train_norm = [normed[_key(cf)] for cf in train_count_files]
    mean, std = _scaler_from_normed(train_norm, train_count_files)

    scaled = {k: scale_logcounts(df, mean, std, clip)
              for k, df in normed.items()}
    # PCA fits on EVERY training file (not just those echoed in
    # all_count_files -- silently fitting on a subset was a bug)
    train_blocks = [scaled[_key(cf)].values.T for cf in train_count_files]

    X_train = np.vstack(train_blocks)
    if X_train.shape[0] == 0:
        raise ValueError(
            "no training spots survived the min_counts filter "
            f"(min_counts={min_counts}); lower it or check the count files")
    pca = fit_pca(X_train, outfile=pca_outfile)
    return {
        "mean": mean, "std": std, "pca": pca,
        "n_pcs": n_pcs_for_variance(pca, variance_fraction),
        "scaled": scaled,
    }
