"""DenseWSIGridDataset: HD training grids tiled straight from slides."""

import numpy as np
import pytest

from gridnext_tpu.data import DenseWSIGridDataset, simulate_spaceranger_dir
from gridnext_tpu.io import read_positions
from gridnext_tpu.serving import spot_pixel_arrays


@pytest.fixture(scope="module")
def hd(tmp_path_factory):
    root = tmp_path_factory.mktemp("dense_ingest")
    binning, hd_grid, pitch = "square_016um", (14, 12), 12
    sims = [simulate_spaceranger_dir(root / f"a{i}", seed=3 + i, n_genes=8,
                                     n_classes=3, spaceranger_version="hd",
                                     hd_grid=hd_grid, hd_binning=binning,
                                     image=True, spot_spacing_px=pitch)
            for i in range(2)]
    return sims, binning, hd_grid, pitch


def test_grid_matches_per_bin_extraction(hd):
    """Tiled grids == per-bin crops from the decoded slide, bit for bit
    (pitch == patch, so extraction is a pure gather either way), with
    background bins zeroed and labels placed like the cache datasets."""
    from PIL import Image

    sims, binning, hd_grid, pitch = hd
    ds = DenseWSIGridDataset([s["image_file"] for s in sims],
                             [s["spaceranger_dir"] for s in sims],
                             [s["annot_file"] for s in sims],
                             patch_size=pitch, hd_binning=binning,
                             grid_dims=hd_grid)
    assert len(ds) == 2
    assert ds.classes is not None and len(ds.classes) == 3

    for i, s in enumerate(sims):
        grid, annots = ds[i]
        assert grid.shape == hd_grid + (pitch, pitch, 3)
        assert grid.dtype == np.float32 and annots.dtype == np.int64
        fg = s["label_grid"] > 0
        np.testing.assert_array_equal(annots > 0, fg)

        wsi = np.asarray(Image.open(s["image_file"]).convert("RGB"))
        pos = read_positions(s["spaceranger_dir"], hd_binning=binning)
        oy, ox, ypx, xpx = spot_pixel_arrays(pos, *hd_grid,
                                             hex_coords=False)
        h = pitch // 2
        for k in range(0, len(oy), 7):   # spot-check a spread of bins
            want = wsi[ypx[k] - h:ypx[k] + h,
                       xpx[k] - h:xpx[k] + h].astype(np.float32) / 255.0
            np.testing.assert_array_equal(grid[oy[k], ox[k]], want)
        # background bins are zero patches (training convention)
        bg = ~fg
        assert float(np.abs(grid[bg]).max()) == 0.0

    # no annotations: labels all zero, grids unchanged
    ds0 = DenseWSIGridDataset([sims[0]["image_file"]],
                              [sims[0]["spaceranger_dir"]],
                              patch_size=pitch, hd_binning=binning,
                              grid_dims=hd_grid)
    g0, a0 = ds0[0]
    assert a0.sum() == 0
    np.testing.assert_array_equal(g0, ds[0][0])

    # sample_item: cheap, correctly shaped, no decode
    assert ds.sample_item().shape == hd_grid + (pitch, pitch, 3)


def test_non_dense_lattice_rejected(hd):
    sims, binning, hd_grid, pitch = hd
    ds = DenseWSIGridDataset([sims[0]["image_file"]],
                             [sims[0]["spaceranger_dir"]],
                             patch_size=pitch + 2,   # != lattice pitch
                             hd_binning=binning, grid_dims=hd_grid)
    with pytest.raises(ValueError, match="dense ingest"):
        ds[0]


def test_grid_dims_auto(hd):
    """'auto' resolves the cohort-max lattice like the factory."""
    sims, binning, hd_grid, pitch = hd
    ds = DenseWSIGridDataset([s["image_file"] for s in sims],
                             [s["spaceranger_dir"] for s in sims],
                             patch_size=pitch, hd_binning=binning,
                             grid_dims="auto")
    assert (ds.h_st, ds.w_st) == hd_grid


@pytest.mark.slow
def test_cli_dense_ingest_train_register(tmp_path):
    """train-image --dense-ingest: no patch cache on disk, joint f+g
    training, and register serves the result through the dense path."""
    import json
    import sys

    import pandas as pd

    from gridnext_tpu import cli
    from gridnext_tpu.data import simulate_spaceranger_dir

    binning, hd_grid, pitch = "square_016um", (12, 10), 32
    sims = [simulate_spaceranger_dir(tmp_path / f"a{i}", seed=7 + i,
                                     n_genes=8, n_classes=3,
                                     spaceranger_version="hd",
                                     hd_grid=hd_grid, hd_binning=binning,
                                     image=True, spot_spacing_px=pitch)
            for i in range(2)]
    dirs = [s["spaceranger_dir"] for s in sims]

    argv_bak = sys.argv
    try:
        sys.argv = (["x", "train-image", "--hd-binning", binning,
                     "--grid-dims", "auto", "--f", "tpu", "--dense-ingest",
                     "--patch-px", str(pitch), "--spaceranger"] + dirs +
                    ["--annots"] + [s["annot_file"] for s in sims] +
                    ["--images"] + [s["image_file"] for s in sims] +
                    ["--out", str(tmp_path / "model"), "--epochs", "1"])
        cli.main()
        sys.argv = (["x", "register", "--spaceranger", dirs[0],
                     "--model", str(tmp_path / "model"),
                     "--images", sims[0]["image_file"],
                     "--out", str(tmp_path / "loupe.csv")])
        cli.main()
    finally:
        sys.argv = argv_bak

    # the whole point: no per-bin JPEG patch cache was materialized
    caches = list(tmp_path.glob("a*/**/*_patches*"))
    assert caches == [], caches
    meta = json.loads((tmp_path / "model" / "model.json").read_text())
    assert meta["dense_ingest"] is True
    assert meta["grid_dims"] == list(hd_grid)
    df = pd.read_csv(tmp_path / "loupe.csv")
    assert len(df) == int((sims[0]["label_grid"] > 0).sum())

    # evaluate on the dense-ingest model: the metrics command must route
    # the image grids through the same cache-free tiling path
    try:
        sys.argv = (["x", "evaluate", "--model", str(tmp_path / "model"),
                     "--spaceranger"] + dirs +
                    ["--annots"] + [s["annot_file"] for s in sims] +
                    ["--images"] + [s["image_file"] for s in sims] +
                    ["--out", str(tmp_path / "metrics.json")])
        cli.main()
    finally:
        sys.argv = argv_bak
    m = json.loads((tmp_path / "metrics.json").read_text())
    assert 0.0 <= m["accuracy"] <= 1.0 and m["n_arrays"] == 2
    assert sum(sum(r) for r in m["confusion"]) == m["n_foreground_spots"]

    # dense deployment artifact: export --dense fits the lattice from the
    # sample array; serve-artifact re-fits per slide and must reproduce the
    # register CSV exactly (same dense algorithm end to end)
    import numpy as np
    from PIL import Image

    H, W = np.asarray(Image.open(sims[0]["image_file"])).shape[:2]
    art = tmp_path / "dense.hlo"
    try:
        sys.argv = ["x", "export", "--model", str(tmp_path / "model"),
                    "--out", str(art), "--wsi-shape", str(H), str(W),
                    "--dense", "--spaceranger", dirs[0]]
        cli.main()
        sys.argv = ["x", "serve-artifact", "--artifact", str(art),
                    "--spaceranger", dirs[0],
                    "--images", sims[0]["image_file"],
                    "--out", str(tmp_path / "dense_loupe.csv")]
        cli.main()
    finally:
        sys.argv = argv_bak
    side = json.loads((tmp_path / "dense.hlo.json").read_text())
    assert side["kind"] == "dense" and side["hex_coords"] is False
    df2 = pd.read_csv(tmp_path / "dense_loupe.csv")
    pd.testing.assert_frame_equal(
        df2.sort_values("Barcode").reset_index(drop=True),
        df.sort_values("Barcode").reset_index(drop=True))


def test_train_gridwise_on_dense_ingest(hd):
    """The dense dataset feeds the public gridwise trainer directly --
    f AND corrector train, loss decreases over a few epochs."""
    import jax
    import jax.numpy as jnp

    from gridnext_tpu.models import GridNet, TpuPatchClassifier
    from gridnext_tpu.train import (create_train_state,
                                    make_gridwise_optimizer, train_gridwise)

    sims, binning, hd_grid, pitch = hd
    ds = DenseWSIGridDataset([s["image_file"] for s in sims],
                             [s["spaceranger_dir"] for s in sims],
                             [s["annot_file"] for s in sims],
                             patch_size=pitch, hd_binning=binning,
                             grid_dims=hd_grid)
    f = TpuPatchClassifier(n_classes=3, stages=((128, 1),), stem_patch=4)
    g = GridNet(patch_classifier=f, n_classes=3)
    tx = make_gridwise_optimizer(3e-3, f_lr=3e-4)
    state = create_train_state(g, jax.random.key(0),
                               jnp.asarray(ds.sample_item()[None]), tx)
    state, _, hist = train_gridwise(g, {"train": ds}, state=state, tx=tx,
                                    num_epochs=4, batch_size=2,
                                    verbose=False)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]


def test_mixed_size_cohort_pads_background(hd, tmp_path):
    """grid_dims='auto' over slides with UNEQUAL lattices: the smaller
    slide's item pads the extra cohort-max rows/cols as background instead
    of failing the lattice fit (the cache-based pipeline's semantics)."""
    sims, binning, hd_grid, pitch = hd
    small_grid = (hd_grid[0] - 4, hd_grid[1] - 3)
    s_small = simulate_spaceranger_dir(tmp_path / "small", seed=9,
                                       n_genes=8, n_classes=3,
                                       spaceranger_version="hd",
                                       hd_grid=small_grid,
                                       hd_binning=binning, image=True,
                                       spot_spacing_px=pitch)
    ds = DenseWSIGridDataset(
        [sims[0]["image_file"], s_small["image_file"]],
        [sims[0]["spaceranger_dir"], s_small["spaceranger_dir"]],
        [sims[0]["annot_file"], s_small["annot_file"]],
        patch_size=pitch, hd_binning=binning, grid_dims="auto")
    assert (ds.h_st, ds.w_st) == hd_grid    # cohort max

    grid, annots = ds[1]                    # the smaller slide
    assert grid.shape == hd_grid + (pitch, pitch, 3)
    # cohort-max padding rows/cols are pure background
    assert float(np.abs(grid[small_grid[0]:]).max()) == 0.0
    assert float(np.abs(grid[:, small_grid[1]:]).max()) == 0.0
    assert (annots[small_grid[0]:] == 0).all()
    assert (annots[:, small_grid[1]:] == 0).all()
    # the slide's own bins still carry labels + pixels
    np.testing.assert_array_equal(
        annots[:small_grid[0], :small_grid[1]] > 0,
        s_small["label_grid"] > 0)
    assert float(np.abs(grid[:small_grid[0], :small_grid[1]]).max()) > 0

    # plans are cached: a second access must not refit (read-only check)
    assert set(ds._plans) == {1}
    ds[1]
    assert set(ds._plans) == {1}


def test_materialize_contract(hd):
    """materialize() returns the stacked (X, Y) pair the non-streaming
    trainer path (cli --no-stream) consumes."""
    sims, binning, hd_grid, pitch = hd
    ds = DenseWSIGridDataset([s["image_file"] for s in sims],
                             [s["spaceranger_dir"] for s in sims],
                             [s["annot_file"] for s in sims],
                             patch_size=pitch, hd_binning=binning,
                             grid_dims=hd_grid)
    X, Y = ds.materialize()
    assert X.shape == (2,) + hd_grid + (pitch, pitch, 3)
    assert Y.shape == (2,) + hd_grid
    g0, a0 = ds[0]
    np.testing.assert_array_equal(X[0], g0)
    np.testing.assert_array_equal(Y[0], a0)


def test_mm_stack_over_dense_ingest(hd):
    """MMStackDataset pairs dense image grids with count grids: the
    train-mm --dense-ingest composition (image modality off the slides,
    count modality from the unified caches, same labels both sides)."""
    from gridnext_tpu.data import MMStackDataset, create_visium_dataset

    sims, binning, hd_grid, pitch = hd
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    img = DenseWSIGridDataset([s["image_file"] for s in sims], dirs, annots,
                              patch_size=pitch, hd_binning=binning,
                              grid_dims="auto")
    counts = create_visium_dataset(dirs, spatial=True, use_count=True,
                                   use_image=False, annot_files=annots,
                                   minimum_detection_rate=0,
                                   hd_binning=binning,
                                   grid_dims=(img.h_st, img.w_st))
    mm = MMStackDataset(img, counts)
    assert len(mm) == 2 and list(mm.classes) == list(img.classes)

    (x_img, x_cnt), y = mm[0]
    assert x_img.shape == hd_grid + (pitch, pitch, 3)
    assert x_cnt.shape[:2] == hd_grid and x_cnt.shape[2] > 0
    # identical annotation source both sides: disagreement-zeroing is a
    # no-op and labels match the simulator ground truth
    np.testing.assert_array_equal(y > 0, sims[0]["label_grid"] > 0)

    # model-init sample: per-modality zero items at the real shapes
    s_img, s_cnt = mm.sample_item()
    assert s_img.shape == x_img.shape and s_cnt.shape == x_cnt.shape


@pytest.mark.slow
def test_cli_train_mm_dense_ingest(tmp_path):
    """train-mm --dense-ingest: the image modality tiles off the slides
    (no per-bin patch cache), the image f trains jointly with g, and
    register serves the trained GridNetMM."""
    import json
    import sys

    import pandas as pd

    from gridnext_tpu import cli
    from gridnext_tpu.data import simulate_spaceranger_dir

    binning, hd_grid, pitch = "square_016um", (12, 10), 32
    sims = [simulate_spaceranger_dir(tmp_path / f"a{i}", seed=11 + i,
                                     n_genes=8, n_classes=3,
                                     spaceranger_version="hd",
                                     hd_grid=hd_grid, hd_binning=binning,
                                     image=True, spot_spacing_px=pitch)
            for i in range(2)]
    dirs = [s["spaceranger_dir"] for s in sims]

    argv_bak = sys.argv
    try:
        sys.argv = (["x", "train-mm", "--hd-binning", binning,
                     "--grid-dims", "auto", "--f", "tpu", "--dense-ingest",
                     "--patch-px", str(pitch), "--min-detection", "0",
                     "--batch-size", "32", "--spaceranger"] + dirs +
                    ["--annots"] + [s["annot_file"] for s in sims] +
                    ["--images"] + [s["image_file"] for s in sims] +
                    ["--out", str(tmp_path / "model"), "--epochs", "1"])
        cli.main()
        sys.argv = (["x", "register", "--spaceranger", dirs[0],
                     "--model", str(tmp_path / "model"),
                     "--images", sims[0]["image_file"],
                     "--out", str(tmp_path / "loupe.csv")])
        cli.main()
    finally:
        sys.argv = argv_bak

    # no per-bin image patch cache was materialized (count caches are
    # unified TSVs, not patch dirs)
    caches = list(tmp_path.glob("a*/**/*_patches*"))
    assert caches == [], caches
    # no image-f spotwise stage ran; count-f and g checkpoints exist
    assert not (tmp_path / "model" / "f_image_state.msgpack").exists()
    assert (tmp_path / "model" / "f_count_state.msgpack").exists()
    meta = json.loads((tmp_path / "model" / "model.json").read_text())
    assert meta["model"] == "GridNetMM"
    assert meta["dense_ingest"] is True
    assert meta["grid_dims"] == list(hd_grid)
    df = pd.read_csv(tmp_path / "loupe.csv")
    assert len(df) == int((sims[0]["label_grid"] > 0).sum())


def test_source_ids_are_spaceranger_dirs(hd):
    """--val-arrays matches array dir basenames (cli._split_dls contract):
    source_ids must be the Spaceranger dirs, like every cache dataset --
    image paths would never contain the array names."""
    sims, binning, hd_grid, pitch = hd
    dirs = [s["spaceranger_dir"] for s in sims]
    ds = DenseWSIGridDataset([s["image_file"] for s in sims], dirs, None,
                             patch_size=pitch, hd_binning=binning,
                             grid_dims=hd_grid)
    assert ds.source_ids() == [str(d) for d in dirs]

    from gridnext_tpu.cli import _split_dls

    name = __import__("pathlib").Path(dirs[1]).name
    dls = _split_dls(ds, 2, stream=True, val_arrays=[name])
    assert len(dls["val"]) == 1 and len(dls["train"]) == 1


def test_dense_ingest_mesh_skips_spot_batch_check():
    """--dense-ingest has no spotwise stage: an (otherwise invalid)
    --batch-size must not be rejected against --mesh; --grid-batch-size
    still is."""
    import types

    from gridnext_tpu.cli import _checked_mesh_shape

    args = types.SimpleNamespace(mesh="data=8")
    # 7 % 8 != 0: would sys.exit if validated as the spot batch
    assert _checked_mesh_shape(args, spot_batch=None, grid_batch=8) \
        == {"data": 8}
    with pytest.raises(SystemExit):
        _checked_mesh_shape(args, spot_batch=7, grid_batch=8)
