import numpy as np
import pytest

from gridnext_tpu.io import anndata_io


def test_gated_import_message(monkeypatch):
    """The optional-dep gate raises an actionable ImportError naming anndata.

    Exercised deterministically by blocking the import, so this runs (and
    means the same thing) whether or not anndata is installed."""
    import builtins
    import sys

    real_import = builtins.__import__

    def block(name, *args, **kwargs):
        if name == "anndata" or name.startswith("anndata."):
            raise ImportError("No module named 'anndata'")
        return real_import(name, *args, **kwargs)

    monkeypatch.delitem(sys.modules, "anndata", raising=False)
    monkeypatch.setattr(builtins, "__import__", block)
    with pytest.raises(ImportError, match="anndata"):
        anndata_io.create_visium_anndata(["/nonexistent"])


class _FakeObs(dict):
    def __getattr__(self, k):
        return self[k]


class _FakeAnnData:
    """Duck-typed stand-in so grid/spot conversion logic is testable without
    the anndata package."""

    def __init__(self, X, obs):
        self.X = X
        self.obs = obs
        self.obsm = {}

    def __len__(self):
        return self.X.shape[0]

    def __getitem__(self, idx):
        import pandas as pd

        obs = self.obs.iloc[np.atleast_1d(idx)] if hasattr(idx, "__len__") \
            else self.obs[idx]
        return _FakeAnnData(self.X[idx], obs)


def _fake_adata():
    import pandas as pd

    X = np.arange(12, dtype=np.float32).reshape(4, 3)
    obs = pd.DataFrame({
        "x": [0, 2, 1, 3], "y": [0, 0, 1, 1],
        "annotation": ["B", "A", "A", "B"],
        "array": ["a1", "a1", "a2", "a2"],
    })
    return _FakeAnnData(X, obs)


def test_anndata_to_grids_semantics():
    ad = _fake_adata()
    labels = np.array([1, 0, 0, 1])
    counts, lbls = anndata_io.anndata_to_grids(ad, labels, h_st=4, w_st=4)
    # (x=0,y=0) -> oddr (0,0); (x=2,y=0) -> (1,0); (x=1,y=1) -> (0,1); (x=3,y=1) -> (1,1)
    assert lbls[0, 0] == 2 and lbls[0, 1] == 1
    assert lbls[1, 0] == 1 and lbls[1, 1] == 2
    np.testing.assert_array_equal(counts[0, 0], [0, 1, 2])
    np.testing.assert_array_equal(counts[1, 1], [9, 10, 11])
    assert counts.shape == (4, 4, 3)


def test_anndata_to_spot_arrays():
    ad = _fake_adata()
    X, y, classes = anndata_io.anndata_to_spot_arrays(ad, "annotation")
    assert list(classes) == ["A", "B"]
    np.testing.assert_array_equal(y, [1, 0, 0, 1])
    np.testing.assert_array_equal(X, ad.X)


def test_anndata_to_grid_arrays():
    ad = _fake_adata()
    X, Y, classes = anndata_io.anndata_to_grid_arrays(
        ad, "annotation", "array", h_st=4, w_st=4)
    assert X.shape == (2, 4, 4, 3)
    assert Y.shape == (2, 4, 4)
    assert list(classes) == ["A", "B"]
    # array a1: spots at (0,0) lbl B->2, (1,0) lbl A->1
    assert Y[0, 0, 0] == 2 and Y[0, 0, 1] == 1
    assert Y[1].sum() > 0


def test_anndata_mm_to_grid_arrays(tmp_path):
    import pandas as pd
    from PIL import Image

    # fake spot patches on disk
    imdir = tmp_path / "imgs"
    imdir.mkdir()
    paths = []
    for i in range(4):
        p = imdir / f"spot{i}.jpg"
        Image.fromarray(np.full((6, 6, 3), 40 * i, np.uint8)).save(p)
        paths.append(str(p))

    X = np.arange(12, dtype=np.float32).reshape(4, 3)
    obs = pd.DataFrame({
        "x": [0, 2, 1, 3], "y": [0, 0, 1, 1],
        "annotation": ["B", "A", "A", "B"],
        "array": ["a1", "a1", "a2", "a2"],
        "imgpath": paths,
    })
    ad = _FakeAnnData(X, obs)
    (Xi, Xc), Y, classes = anndata_io.anndata_mm_to_grid_arrays(
        ad, "annotation", "array", h_st=4, w_st=4)
    assert Xi.shape == (2, 4, 4, 6, 6, 3)
    assert Xc.shape == (2, 4, 4, 3)
    assert Y.shape == (2, 4, 4)
    assert list(classes) == ["A", "B"]
    # a1's first spot (x=0,y=0) -> oddr (0,0), image value 0; second (2,0)->(1,0), 40/255
    np.testing.assert_allclose(Xi[0, 0, 1], 40 / 255.0, atol=1e-2)
    assert Y[0, 0, 0] == 2 and Y[0, 0, 1] == 1


class _ShimAnnData:
    """Just enough of anndata.AnnData for the builder functions: dense X,
    pandas obs/var, boolean-mask slicing, copy, no-op write."""

    def __init__(self, X=None, var=None, obs=None):
        if hasattr(X, "todense"):
            X = np.asarray(X.todense())
        self.X = np.asarray(X)
        self.var = var
        self.obs = obs

    def __getitem__(self, key):
        mask = np.asarray(key)
        return _ShimAnnData(self.X[mask], self.var, self.obs.loc[mask])

    def copy(self):
        return _ShimAnnData(self.X.copy(), self.var.copy(), self.obs.copy())

    def write(self, *a, **k):
        pass


def _shim_concat(adatas, axis=0, join="outer", merge="first"):
    import pandas as pd

    return _ShimAnnData(np.vstack([a.X for a in adatas]),
                        adatas[0].var, pd.concat([a.obs for a in adatas]))


def test_builder_and_factory_share_hd_patch_cache_names(tmp_path, monkeypatch):
    """create_visium_anndata_img and create_visium_dataset must name HD patch
    caches identically (shared pipeline.patch_cache_suffix, cohort-MAX dims)
    even when per-array HD lattices differ -- otherwise one path silently
    re-extracts the other's caches."""
    import os
    import sys
    import types

    from gridnext_tpu.data.datasets import create_visium_dataset
    from gridnext_tpu.data.simulate import simulate_spaceranger_dir

    shim = types.ModuleType("anndata")
    shim.AnnData = _ShimAnnData
    shim.concat = _shim_concat
    monkeypatch.setitem(sys.modules, "anndata", shim)

    binning = "square_008um"
    sims = [simulate_spaceranger_dir(
        tmp_path / f"arr{i}", n_genes=8, n_classes=3, seed=i, image=True,
        spaceranger_version="hd", hd_grid=grid, hd_binning=binning)
        for i, grid in enumerate([(6, 8), (8, 6)])]  # unequal lattices
    srdirs = [s["spaceranger_dir"] for s in sims]
    imgs = [s["image_file"] for s in sims]
    annots = [s["annot_file"] for s in sims]

    adata = anndata_io.create_visium_anndata_img(
        srdirs, fullres_image_files=imgs, annot_files=annots,
        patch_size_px=12, hd_binning=binning)
    assert len(adata.obs) and all(os.path.exists(p) for p in adata.obs.imgpath)

    def patch_dirs():
        out = {}
        for srd in srdirs:
            for d in sorted(os.listdir(srd)):
                if "_patches" in d:
                    full = os.path.join(srd, d)
                    out[full] = {f: os.path.getmtime(os.path.join(full, f))
                                 for f in os.listdir(full)}
        return out

    before = patch_dirs()
    assert before, "builder wrote no patch caches"
    for d in before:  # cohort-max dims (8, 8), factory-identical suffix
        assert f"_{binning}_8x8_patches12px" in d, d

    ds = create_visium_dataset(
        srdirs, use_count=False, use_image=True, spatial=True,
        fullres_image_files=imgs, annot_files=annots,
        patch_size_px=12, hd_binning=binning, grid_dims="auto")
    assert patch_dirs() == before, "factory re-extracted or renamed caches"
    x, y = ds[0]
    assert x.shape == (8, 8, 12, 12, 3) and y.shape == (8, 8)


def test_consensus_softmax():
    from gridnext_tpu.evaluate import consensus_softmax

    a = np.array([[0.8, 0.2], [0.4, 0.6]])
    b = np.array([[0.2, 0.8], [0.6, 0.4]])
    c = consensus_softmax([a, b])
    np.testing.assert_allclose(c, [[0.5, 0.5], [0.5, 0.5]])
