import numpy as np
import pytest

from gridnext_tpu import geometry as G
from gridnext_tpu import pipeline
from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir


@pytest.fixture(scope="module")
def sim_img(tmp_path_factory):
    root = tmp_path_factory.mktemp("visium_img")
    sims = [simulate_spaceranger_dir(root / f"a{i}", seed=i, n_genes=20,
                                     n_classes=3, image=True,
                                     spot_spacing_px=12) for i in range(2)]
    return sims


def _reference_extraction(imgfile, srd, patch_size):
    """Literal per-spot PIL loop mirroring imgprocess.py:162-238."""
    from PIL import Image

    from gridnext_tpu.io.spaceranger import read_positions

    img = np.asarray(Image.open(imgfile))
    w = patch_size
    img = np.pad(img, [(w // 2, w // 2), (w // 2, w // 2), (0, 0)], mode="edge")
    df = read_positions(srd)
    df = df[df["in_tissue"] == 1]
    out = np.zeros((G.VISIUM_H_ST, G.VISIUM_W_ST, patch_size, patch_size, 3),
                   np.float32)
    for i in range(len(df)):
        row = df.iloc[i]
        x_ind, y_ind = G.pseudo_hex_to_oddr(int(row["array_col"]), int(row["array_row"]))
        x_px = int(np.rint(row["pxl_col_in_fullres"])) + w // 2
        y_px = int(np.rint(row["pxl_row_in_fullres"])) + w // 2
        patch = img[(y_px - w // 2):(y_px + w // 2), (x_px - w // 2):(x_px + w // 2)]
        out[y_ind, x_ind] = patch
    return out


def test_grid_from_wsi_matches_reference_loop(sim_img):
    sim = sim_img[0]
    got = pipeline.grid_from_wsi_visium(sim["image_file"], sim["spaceranger_dir"],
                                        patch_size=10)
    want = _reference_extraction(sim["image_file"], sim["spaceranger_dir"], 10)
    np.testing.assert_array_equal(got, want)
    # tissue spots have non-empty patches
    fg = sim["label_grid"] > 0
    patch_max = got.reshape(got.shape[0], got.shape[1], -1).max(-1)
    assert (patch_max[fg] > 0).mean() > 0.95


def test_extract_patches_device_matches_host(sim_img):
    import jax.numpy as jnp

    from PIL import Image

    sim = sim_img[0]
    img = np.asarray(Image.open(sim["image_file"]))
    w = 8
    img_p = np.pad(img, [(w // 2, w // 2), (w // 2, w // 2), (0, 0)], mode="edge")
    rng = np.random.default_rng(0)
    y = rng.integers(w, img.shape[0] - w, 50)
    x = rng.integers(w, img.shape[1] - w, 50)
    host = pipeline.extract_patches(img_p, y + w // 2, x + w // 2, w, w)
    dev = np.asarray(pipeline.extract_patches_device(
        jnp.asarray(img_p), y + w // 2, x + w // 2, w, w))
    np.testing.assert_array_equal(host, dev)


def test_distance_um_to_px(sim_img):
    # simulator places spots spot_spacing_px apart = 100um
    px = pipeline.distance_um_to_px(sim_img[0]["spaceranger_dir"], 100.0)
    assert px == 12
    assert pipeline.distance_um_to_px(sim_img[0]["spaceranger_dir"], 50.0) == 6


def test_save_and_load_patch_dataset(sim_img, tmp_path):
    dirs = [s["spaceranger_dir"] for s in sim_img]
    annots = [s["annot_file"] for s in sim_img]
    imgs = [s["image_file"] for s in sim_img]

    gdat = create_visium_dataset(dirs, use_count=False, use_image=True,
                                 spatial=True, annot_files=annots,
                                 fullres_image_files=imgs, patch_size_px=8)
    assert len(gdat) == 2
    x, y = gdat[0]
    assert x.shape == (G.VISIUM_H_ST, G.VISIUM_W_ST, 8, 8, 3)
    assert x.dtype == np.float32 and x.max() <= 1.0
    np.testing.assert_array_equal(y, sim_img[0]["label_grid"])

    # spot-level dataset over the same cache
    pdat = create_visium_dataset(dirs, use_count=False, use_image=True,
                                 spatial=False, annot_files=annots,
                                 fullres_image_files=imgs, patch_size_px=8)
    n_fg = sum((s["label_grid"] > 0).sum() for s in sim_img)
    assert len(pdat) == n_fg
    img0, lbl0 = pdat[0]
    assert img0.shape == (8, 8, 3) and 0 <= lbl0 < 3


def test_multimodal_stack(sim_img):
    dirs = [s["spaceranger_dir"] for s in sim_img]
    annots = [s["annot_file"] for s in sim_img]
    imgs = [s["image_file"] for s in sim_img]
    mm = create_visium_dataset(dirs, use_count=True, use_image=True,
                               spatial=True, annot_files=annots,
                               fullres_image_files=imgs, patch_size_px=8,
                               minimum_detection_rate=None)
    (xi, xc), y = mm[0]
    assert xi.shape[:2] == (G.VISIUM_H_ST, G.VISIUM_W_ST)
    assert xc.shape[:2] == (G.VISIUM_H_ST, G.VISIUM_W_ST)
    assert y.shape == (G.VISIUM_H_ST, G.VISIUM_W_ST)
    # agreement masking can only remove labels
    assert ((y > 0) <= (sim_img[0]["label_grid"] > 0)).all()


def test_factory_window_size_cache(sim_img, tmp_path):
    """window_size_px: wider crop resized down, with its own _w{px} cache.

    grid_from_wsi_visium's window_size exists in the reference library
    (imgprocess.py:185-238) but its factory never exposes it; ours threads
    it through create_visium_dataset (and the CLI as --window-px).
    """
    dirs = [s["spaceranger_dir"] for s in sim_img]
    annots = [s["annot_file"] for s in sim_img]
    imgs = [s["image_file"] for s in sim_img]

    gdat = create_visium_dataset(dirs, use_count=False, use_image=True,
                                 spatial=True, annot_files=annots,
                                 fullres_image_files=imgs, patch_size_px=8,
                                 window_size_px=16, save_patches_to=tmp_path)
    cache_dirs = sorted(p.name for p in tmp_path.iterdir())
    assert all(name.endswith("_patches8px_w16") for name in cache_dirs), cache_dirs

    x, y = gdat[0]
    assert x.shape == (G.VISIUM_H_ST, G.VISIUM_W_ST, 8, 8, 3)
    np.testing.assert_array_equal(y, sim_img[0]["label_grid"])

    # content is the host window path (up to JPEG cache quantization):
    # much closer to window-extraction than to the plain 8px center crop
    want_win = pipeline.grid_from_wsi_visium(imgs[0], dirs[0], patch_size=8,
                                             window_size=16)
    want_crop = pipeline.grid_from_wsi_visium(imgs[0], dirs[0], patch_size=8)
    fg = sim_img[0]["label_grid"] > 0
    got = x[fg] * 255.0
    err_win = np.abs(got - want_win[fg]).mean()
    err_crop = np.abs(got - want_crop[fg]).mean()
    assert err_win < 8.0, err_win            # JPEG-level residual only
    assert err_win < 0.5 * err_crop, (err_win, err_crop)


def test_remove_color_cast():
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 200, size=(64, 64, 3))).astype(np.uint8)  # dim image
    out = pipeline.remove_color_cast(img)
    assert out.dtype == np.uint8
    # 99th percentile should now be (near) white in each channel
    for c in range(3):
        assert np.percentile(out[..., c], 99) >= 250


def test_imagenet_normalize():
    img = np.ones((4, 4, 3), np.float32)
    out = pipeline.imagenet_normalize(img)
    np.testing.assert_allclose(out[0, 0], (1 - pipeline.IMAGENET_MEAN) / pipeline.IMAGENET_STD,
                               rtol=1e-6)


def test_make_imagenet_transform():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(300, 280, 3)).astype(np.float32)
    t = pipeline.make_imagenet_transform(64, 48)
    out = t(img)
    assert out.shape == (48, 48, 3)
    # normalized: roughly centered per ImageNet stats for uniform input
    denorm = out * pipeline.IMAGENET_STD + pipeline.IMAGENET_MEAN
    assert 0.0 <= denorm.min() and denorm.max() <= 1.0
    # portrait vs landscape aspect handling
    assert t(rng.uniform(size=(280, 300, 3)).astype(np.float32)).shape == (48, 48, 3)
    # plugs into the dataset hook
    from gridnext_tpu.data.datasets import _load_patch  # noqa: F401


def test_device_resize_pil_parity():
    """window != patch device path: PIL-filter-family resize, <=2 gray levels.

    PIL rounds each separable pass to uint8 internally (fixed point), so
    bit-exactness is not achievable in float; on natural (smooth) images the
    residual is ~1 gray level. Reference resize call: imgprocess.py:221.
    """
    import jax.numpy as jnp
    from PIL import Image, ImageFilter

    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, size=(400, 400, 3), dtype=np.uint8)
    img = np.asarray(Image.fromarray(noise).filter(ImageFilter.GaussianBlur(3)))
    window, patch = 96, 64
    img_p = np.pad(img, [(window // 2,) * 2, (window // 2,) * 2, (0, 0)],
                   mode="edge")
    y = rng.integers(window, img.shape[0] - window, 20) + window // 2
    x = rng.integers(window, img.shape[1] - window, 20) + window // 2

    host = pipeline.extract_patches(img_p, y, x, window, patch)  # PIL path
    dev = np.asarray(pipeline.extract_patches_device(
        jnp.asarray(img_p), y, x, window, patch))
    assert dev.dtype == host.dtype == np.uint8
    diff = np.abs(host.astype(np.int32) - dev.astype(np.int32))
    assert diff.max() <= 2, diff.max()
    assert diff.mean() < 0.5, diff.mean()


def test_hd_bin_um_parsing():
    import pytest

    from gridnext_tpu.pipeline import hd_bin_um

    assert hd_bin_um("square_008um") == 8.0
    assert hd_bin_um("square_016um") == 16.0
    assert hd_bin_um("square_2um") == 2.0
    with pytest.raises(ValueError, match="binning"):
        hd_bin_um("square_raw")


def test_parse_grid_dims():
    import pytest

    from gridnext_tpu.cli import _parse_grid_dims

    assert _parse_grid_dims(None) is None
    assert _parse_grid_dims("auto") == "auto"
    assert _parse_grid_dims("AUTO") == "auto"
    assert _parse_grid_dims("24x20") == (24, 20)
    assert _parse_grid_dims("24X20") == (24, 20)
    with pytest.raises(SystemExit):
        _parse_grid_dims("24")


def test_save_visium_patches_atomic_and_uint8(tmp_path):
    """An interrupted patch dump must never leave a partial cache dir (the
    factory's cache check is 'directory exists'), and re-writing replaces a
    stale/partial dir instead of merging into it."""
    import os

    from gridnext_tpu.data import simulate_spaceranger_dir
    from gridnext_tpu.pipeline import save_visium_patches

    sim = simulate_spaceranger_dir(tmp_path / "arr", seed=0, n_genes=5,
                                   n_classes=2, image=True,
                                   spot_spacing_px=16)
    dest = tmp_path / "arr_patches8px"
    # stale partial cache from an interrupted run
    dest.mkdir()
    (dest / "arr_0_0.jpg").write_bytes(b"partial garbage")
    (dest / "stray.txt").write_text("x")

    save_visium_patches(str(sim["image_file"]), str(sim["spaceranger_dir"]),
                        str(dest), patch_size=8)
    names = sorted(os.listdir(dest))
    assert "stray.txt" not in names          # replaced, not merged
    n_fg = int((sim["label_grid"] > 0).sum())
    assert len(names) == n_fg                # one JPEG per foreground spot
    # no tmp droppings beside the cache
    assert not [d for d in os.listdir(tmp_path) if ".tmp-" in d]


def test_grid_oob_warning_aggregates(tmp_path, capsys):
    """Out-of-bounds spots print ONE aggregate line in array_col/array_row
    coordinates, not a line per spot in converted grid indices."""
    from gridnext_tpu.data import simulate_spaceranger_dir
    from gridnext_tpu.pipeline import grid_from_wsi_visium

    sim = simulate_spaceranger_dir(tmp_path / "arr", seed=1, n_genes=5,
                                   n_classes=2, image=True,
                                   spot_spacing_px=16)
    grid_from_wsi_visium(str(sim["image_file"]), str(sim["spaceranger_dir"]),
                         patch_size=8, h_st=20, w_st=20)  # undersized grid
    outp = capsys.readouterr().out
    warns = [l for l in outp.splitlines() if l.startswith("Warning")]
    assert len(warns) == 1
    assert "array_col" in warns[0] and "20x20" in warns[0]


def test_remove_color_cast_extra_channels_and_bad_ndim():
    rng = np.random.default_rng(1)
    rgba = rng.integers(0, 200, size=(16, 16, 4)).astype(np.uint8)
    out = pipeline.remove_color_cast(rgba)
    np.testing.assert_array_equal(out[..., 3], rgba[..., 3])  # alpha intact
    assert np.percentile(out[..., 0], 99) >= 250
    with pytest.raises(ValueError, match="RGB"):
        pipeline.remove_color_cast(rgba[..., 0])  # 2-D grayscale


def test_grid_from_wsi_drops_negative_oddr(tmp_path):
    """A malformed-parity positions row (array_col=0, odd array_row ->
    odd-right x = -1) is dropped with the out-of-grid warning instead of
    NumPy-wrapping the patch onto the last grid column."""
    sim = simulate_spaceranger_dir(tmp_path / "arr", n_genes=5, n_classes=3,
                                   seed=0, image=True, spot_spacing_px=16)
    grid0 = pipeline.grid_from_wsi_visium(sim["image_file"],
                                          sim["spaceranger_dir"],
                                          patch_size=8)
    with open(sim["position_file"], "a") as fh:
        fh.write("BADBARCODE-1,1,1,0,50,50\n")
    grid1 = pipeline.grid_from_wsi_visium(sim["image_file"],
                                          sim["spaceranger_dir"],
                                          patch_size=8)
    np.testing.assert_array_equal(grid1, grid0)  # last column not polluted
