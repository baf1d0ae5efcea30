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


def _sim_two_arrays(tmp_path, image=False):
    from gridnext_tpu.data.simulate import simulate_spaceranger_dir

    # overlapping-but-different gene names exercise the outer join
    sims = [
        simulate_spaceranger_dir(tmp_path / "arrA", n_genes=5, n_classes=2,
                                 seed=0, image=image,
                                 gene_names=["G0", "G1", "G2", "G3", "G4"]),
        simulate_spaceranger_dir(tmp_path / "arrB", n_genes=5, n_classes=2,
                                 seed=1, image=image,
                                 gene_names=["G3", "G4", "G5", "G6", "G7"]),
    ]
    return sims


def test_assemble_visium_frames_full_body(tmp_path):
    """The assembly core executes end to end on plain frames (no anndata):
    in-tissue restriction, annotation intersection, obs schema/index, var
    gene symbols (visium_datasets.py:221-266 parity)."""
    import pandas as pd

    from gridnext_tpu.io import read_positions

    sims = _sim_two_arrays(tmp_path)
    srdirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]

    # drop 3 barcodes from the first annotation file -> intersection shrinks
    df_a = pd.read_csv(annots[0], index_col=0)
    df_a.iloc[3:].to_csv(annots[0])  # removes 3 labeled spots

    frames = anndata_io.assemble_visium_frames(srdirs, annot_files=annots)
    assert len(frames) == 2
    for (counts, obs, var), srd, annot in zip(frames, srdirs, annots):
        pos = read_positions(srd)
        in_tissue = set(pos[pos["in_tissue"] == 1].index)
        labeled = set(pd.read_csv(annot, index_col=0).index)
        assert len(counts) == len(in_tissue & labeled)
        assert list(counts.index) == list(obs.index)  # rows keyed like obs
        assert list(obs.columns) == ["x", "y", "x_px", "y_px", "array",
                                     "annotation"]
        arr = srd.rstrip("/").split("/")[-1]
        assert (obs["array"] == arr).all()
        assert list(obs.index) == [f"{arr}_{x}_{y}"
                                   for x, y in zip(obs["x"], obs["y"])]
        assert obs["annotation"].notna().all()
        assert list(var.columns) == ["gene_symbol"]
        assert list(var.index) == list(counts.columns)
    # 3 spots fewer than in-tissue on array A
    pos_a = read_positions(srdirs[0])
    assert len(frames[0][0]) == int((pos_a["in_tissue"] == 1).sum()) - 3

    # unannotated assembly keeps every in-tissue spot, no annotation column
    plain = anndata_io.assemble_visium_frames(srdirs)
    assert "annotation" not in plain[0][1].columns
    assert len(plain[0][0]) == int((pos_a["in_tissue"] == 1).sum())


def test_concat_visium_frames_outer_join(tmp_path):
    """Gene-axis outer join in first-occurrence order, missing genes filled
    0, var merge='first', obs stacked in array order (ad.concat analog).

    Synthetic frames with genuinely different gene sets (the simulator
    always emits one ENSG range, so disjoint genes need hand-built
    frames); real-file assembly is covered by the test above."""
    import pandas as pd

    counts_a = pd.DataFrame([[1, 2, 3], [4, 5, 6]], columns=["g1", "g2", "g3"],
                            index=["a_0_0", "a_2_0"])
    obs_a = pd.DataFrame({"x": [0, 2], "y": [0, 0], "array": "a"},
                         index=counts_a.index)
    var_a = pd.DataFrame({"gene_symbol": ["S1", "S2", "S3"]},
                         index=["g1", "g2", "g3"])
    counts_b = pd.DataFrame([[7, 8], [9, 10]], columns=["g2", "g4"],
                            index=["b_1_1", "b_3_1"])
    obs_b = pd.DataFrame({"x": [1, 3], "y": [1, 1], "array": "b"},
                         index=counts_b.index)
    var_b = pd.DataFrame({"gene_symbol": ["S2b", "S4"]},
                         index=["g2", "g4"])
    X, obs, var = anndata_io.concat_visium_frames(
        [(counts_a, obs_a, var_a), (counts_b, obs_b, var_b)])

    # first-occurrence gene order: a's genes then b's new ones
    assert list(X.columns) == ["g1", "g2", "g3", "g4"]
    assert list(var.index) == ["g1", "g2", "g3", "g4"]
    assert list(obs.index) == ["a_0_0", "a_2_0", "b_1_1", "b_3_1"]
    np.testing.assert_array_equal(
        X.values, [[1, 2, 3, 0], [4, 5, 6, 0],
                   [0, 7, 0, 8], [0, 9, 0, 10]])
    # var merge='first': g2's symbol comes from array a
    assert list(var["gene_symbol"]) == ["S1", "S2", "S3", "S4"]


def test_attach_imgpaths_filters_missing(tmp_path):
    """attach_imgpaths: imgpath column format + existence filtering over
    the REAL patch caches written by resolve_imgpatch_dirs."""
    import os

    sims = _sim_two_arrays(tmp_path, image=True)
    srdirs = [s["spaceranger_dir"] for s in sims]
    imgs = [s["image_file"] for s in sims]
    frames = anndata_io.assemble_visium_frames(srdirs)

    pdirs = anndata_io.resolve_imgpatch_dirs(srdirs, imgs, patch_size_px=6)
    assert all(os.path.isdir(d) for d in pdirs)
    attached = anndata_io.attach_imgpaths(frames, pdirs)
    assert len(attached) == 2
    for (counts, obs, var), (counts0, obs0, _v) in zip(attached, frames):
        assert len(obs) > 0
        assert all(os.path.exists(p) for p in obs["imgpath"])
        assert list(counts.index) == list(obs.index)
        # filtered rows are a subset of the unfiltered assembly
        assert set(obs.index) <= set(obs0.index)
        arr = obs["array"].iloc[0]
        for p, x, y in zip(obs["imgpath"], obs["x"], obs["y"]):
            assert p.endswith(f"{arr}_{x}_{y}.jpg")

    # a bogus cache dir filters everything out
    empty = anndata_io.attach_imgpaths(frames, [str(tmp_path / "nope")] * 2)
    assert all(len(o) == 0 for _c, o, _v in empty)
