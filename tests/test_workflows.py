import numpy as np
import pandas as pd
import pytest

from gridnext_tpu.workflows import (
    filtered_norm_logcounts,
    fit_cohort_scaler,
    fit_pca,
    n_pcs_for_variance,
    pca_transform,
    scale_logcounts,
)
from gridnext_tpu.workflows.pca import preprocess_cohorts


def _fake_countfile(tmp_path, name, n_genes=20, n_spots=50, seed=0, depth_lo=50):
    rng = np.random.default_rng(seed)
    counts = rng.poisson(rng.gamma(2, 3, size=(n_genes, 1)),
                         size=(n_genes, n_spots))
    # make a couple of low-depth spots
    counts[:, :2] = 0
    counts[0, 0] = depth_lo
    df = pd.DataFrame(counts, index=[f"G{i}" for i in range(n_genes)],
                      columns=[f"{i}_{i % 3}" for i in range(n_spots)])
    p = tmp_path / name
    df.to_csv(p, sep="\t")
    return str(p)


def test_filtered_norm_logcounts(tmp_path):
    cf = _fake_countfile(tmp_path, "a.tsv")
    df = filtered_norm_logcounts(cf, min_counts=100)
    # low-depth spots dropped
    assert df.shape[1] < 50
    # depth normalization: exp(x)-1 sums to 1e4 per spot
    sums = (np.expm1(df.values)).sum(axis=0)
    np.testing.assert_allclose(sums, 1e4, rtol=1e-5)


def test_scaler_and_scaling(tmp_path):
    cfs = [_fake_countfile(tmp_path, f"{i}.tsv", seed=i) for i in range(3)]
    mean, std = fit_cohort_scaler(cfs[:2])
    assert mean.shape == (20,)
    df = filtered_norm_logcounts(cfs[2])
    scaled = scale_logcounts(df, mean, std, clip=10)
    assert scaled.values.max() <= 10.0
    # scaling training data by its own stats: near-zero mean
    df_tr = filtered_norm_logcounts(cfs[0])
    df_tr2 = filtered_norm_logcounts(cfs[1])
    all_scaled = np.hstack([scale_logcounts(df_tr, mean, std).values,
                            scale_logcounts(df_tr2, mean, std).values])
    np.testing.assert_allclose(all_scaled.mean(axis=1), 0.0, atol=1e-6)


def test_pca_pipeline(tmp_path):
    cfs = [_fake_countfile(tmp_path, f"{i}.tsv", seed=i) for i in range(3)]
    out = preprocess_cohorts(cfs[:2], cfs, pca_outfile=str(tmp_path / "pca.p"))
    assert 1 <= out["n_pcs"] <= 20
    assert (tmp_path / "pca.p").exists()

    pca = out["pca"]
    df = out["scaled"][cfs[2]]
    X = df.values.T
    want = pca.transform(X)[:, :out["n_pcs"]]
    got = np.asarray(pca_transform(X, pca.components_, pca.mean_,
                                   n_pcs=out["n_pcs"]))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_n_pcs_monotone():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(100, 10)) @ np.diag([10, 5, 2, 1, 1, .5, .2, .1, .05, .01])
    pca = fit_pca(X)
    n50 = n_pcs_for_variance(pca, 0.5)
    n90 = n_pcs_for_variance(pca, 0.9)
    assert 1 <= n50 <= n90 <= 10


def test_n_pcs_for_variance_never_reaching_fraction():
    """fraction above the truncated PCA's total EV returns all PCs instead
    of raising IndexError (round-2 review fix)."""
    import numpy as np

    from gridnext_tpu.workflows.pca import fit_pca, n_pcs_for_variance

    rng = np.random.default_rng(0)
    X = rng.normal(size=(50, 20)).astype(np.float32)
    pca = fit_pca(X, n_components=3)  # 3 PCs of isotropic noise: low EV
    assert n_pcs_for_variance(pca, fraction=0.99) == 3
