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


# ---- grouped k-fold CV (register_BA44*.ipynb workflow) ----

def test_grouped_partitions_contiguous():
    from gridnext_tpu.workflows import grouped_partitions

    groups = ["s3", "s1", "s0", "s2", "s1", "s3"]  # unsorted, repeated
    parts = grouped_partitions(groups, 2)
    assert [list(p) for p in parts] == [["s0", "s1"], ["s2", "s3"]]
    # every unique group lands in exactly one partition, any k
    parts4 = grouped_partitions(groups, 4)
    flat = [g for p in parts4 for g in p]
    assert sorted(flat) == ["s0", "s1", "s2", "s3"]
    with pytest.raises(ValueError):
        grouped_partitions(groups, 5)
    with pytest.raises(ValueError):
        grouped_partitions(groups, 1)


def test_partition_masks_semantics():
    from gridnext_tpu.workflows import partition_masks

    groups = ["a", "a", "b", "c"]
    folds = list(partition_masks(groups, [["a"], ["b", "c"]]))
    (tr0, va0), (tr1, va1) = folds
    np.testing.assert_array_equal(va0, [True, True, False, False])
    np.testing.assert_array_equal(tr0, ~va0)
    np.testing.assert_array_equal(va1, [False, False, True, True])
    with pytest.raises(ValueError, match="matches no"):
        list(partition_masks(groups, [["zzz"]]))
    with pytest.raises(ValueError, match="every array"):
        list(partition_masks(groups, [["a", "b", "c"]]))


def test_cross_validate_aggregation():
    from gridnext_tpu.workflows import cross_validate

    groups = ["a", "a", "b", "b", "c", "c"]
    calls = []

    def fold_fn(tr, va, i):
        calls.append((tr.copy(), va.copy(), i))
        # losses encode the fold so stacking order is checkable
        return f"state{i}", [10.0 + i, 1.0 + i], [20.0 + i, 2.0 + i]

    cv = cross_validate(fold_fn, groups, n_folds=3, verbose=False)
    assert cv.val_hist.shape == (3, 2) and cv.train_hist.shape == (3, 2)
    np.testing.assert_allclose(cv.val_hist[:, 0], [10.0, 11.0, 12.0])
    assert cv.states == ["state0", "state1", "state2"]
    # each fold held out exactly one subject's two arrays
    for tr, va, i in calls:
        assert va.sum() == 2 and tr.sum() == 4 and not (tr & va).any()
    s = cv.summary()
    np.testing.assert_allclose(s["val_mean"], [11.0, 2.0])
    np.testing.assert_allclose(s["train_std"], cv.train_hist.std(0))


def test_cross_validate_rejects_ragged_histories():
    from gridnext_tpu.workflows import cross_validate

    def fold_fn(tr, va, i):
        return None, [1.0] * (2 + i), [1.0] * (2 + i)

    with pytest.raises(ValueError, match="unequal history lengths"):
        cross_validate(fold_fn, ["a", "b"], n_folds=2, verbose=False)


def test_pca_fits_on_all_train_files(tmp_path):
    """PCA must fit on EVERY training file, including ones not echoed in
    all_count_files (previously the fit silently used only the overlap),
    and every input file must appear in 'scaled'."""
    import numpy as np
    import pandas as pd

    from gridnext_tpu.workflows.pca import preprocess_cohorts

    rng = np.random.default_rng(0)

    def frame(n_spots, seed):
        r = np.random.default_rng(seed)
        return pd.DataFrame(
            r.integers(0, 50, (6, n_spots)).astype(float) + 20,
            index=[f"g{i}" for i in range(6)],
            columns=[f"{c}_{c}" for c in range(n_spots)])

    a, b, c = frame(30, 1), frame(25, 2), frame(20, 3)
    out = preprocess_cohorts([a, b], [b, c], min_counts=0)
    # all three files scaled; PCA saw a's spots too
    assert len(out["scaled"]) == 3
    n_train_spots = a.shape[1] + b.shape[1]
    assert out["pca"].n_samples_ == n_train_spots
    # fully disjoint train/all works (previously np.vstack([]) crashed)
    out2 = preprocess_cohorts([a], [c], min_counts=0)
    assert out2["pca"].n_samples_ == a.shape[1]


def test_pca_rejects_mismatched_gene_axes():
    """hstack over misaligned gene axes would yield silently wrong per-gene
    statistics; the scaler refuses like the dataset layer does."""
    import numpy as np
    import pandas as pd
    import pytest

    from gridnext_tpu.workflows.pca import fit_cohort_scaler

    g1 = pd.DataFrame(np.ones((3, 4)) + 30, index=["a", "b", "c"],
                      columns=[f"{i}_{i}" for i in range(4)])
    g2 = pd.DataFrame(np.ones((3, 4)) + 30, index=["c", "b", "a"],
                      columns=[f"{i}_{i}" for i in range(4)])
    with pytest.raises(ValueError, match="gene axis"):
        fit_cohort_scaler([g1, g2], min_counts=0)
