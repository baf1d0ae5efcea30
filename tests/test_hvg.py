import numpy as np

from gridnext_tpu.workflows import highly_variable_genes, select_hvgs_from_count_files


def test_hvg_prefers_variable_genes():
    rng = np.random.default_rng(0)
    n_spots, n_genes = 400, 100
    # genes 0..9: same mean as the rest but bimodal (higher dispersion at the
    # same mean bin); rest: stable Poisson
    stable = rng.poisson(5.0, size=(n_spots, n_genes))
    X = stable.astype(float)
    hot = rng.random((n_spots, 10)) < 0.5
    X[:, :10] = np.where(hot, 10.0, 0.0)  # mean 5, variance 25 (vs Poisson 5)
    X = np.log1p(X)

    mask, info = highly_variable_genes(X, n_top_genes=10)
    assert mask.sum() == 10
    # engineered genes dominate the selection and the dispersion ranking
    assert mask[:10].sum() >= 6
    dn = info["dispersions_norm"]
    assert np.nanmean(dn[:10]) > np.nanmean(dn[10:]) + 1.0
    assert np.isfinite(info["means"]).all()


def test_select_hvgs_from_count_files(tmp_path):
    import pandas as pd

    rng = np.random.default_rng(1)
    genes = [f"G{i}" for i in range(50)]
    files = []
    for a in range(2):
        counts = rng.poisson(3.0, size=(50, 120))
        # same mean as the Poisson background, triple the variance
        counts[:5] = np.where(rng.random((5, 120)) < 0.5, 6, 0)
        df = pd.DataFrame(counts, index=genes,
                          columns=[f"{i}_{i % 5}" for i in range(120)])
        p = tmp_path / f"a{a}.unified.tsv.gz"
        df.to_csv(p, sep="\t")
        files.append(str(p))

    hvgs = select_hvgs_from_count_files(files, n_top_genes=5, n_bins=1)
    assert len(hvgs) == 5
    assert len(set(hvgs) & {"G0", "G1", "G2", "G3", "G4"}) >= 4
