import numpy as np
import pytest

from gridnext_tpu import geometry as G
from gridnext_tpu.data import simulate_spaceranger_dir
from gridnext_tpu.io import read_positions
from gridnext_tpu.models import DenseNet, GridNetHex
from gridnext_tpu.serving import SlideRegistrar, spot_pixel_arrays


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    root = tmp_path_factory.mktemp("serving")
    return simulate_spaceranger_dir(root / "arr", seed=0, n_genes=10,
                                    n_classes=3, image=True,
                                    spot_spacing_px=16)


def test_spot_pixel_arrays(sim):
    pos = read_positions(sim["spaceranger_dir"])
    oy, ox, ypx, xpx = spot_pixel_arrays(pos)
    n_fg = int((sim["label_grid"] > 0).sum())
    assert len(oy) == n_fg
    assert oy.max() < G.VISIUM_H_ST and ox.max() < G.VISIUM_W_ST


def test_slide_registrar_end_to_end(sim):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    patch = 8
    x0 = jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST, patch, patch, 3))
    variables = g.init(jax.random.key(0), x0)

    registrar = SlideRegistrar.from_gridnet(
        g, variables, patch_size=patch, normalize=None, patch_chunk=None,
        use_pallas_corrector=False,
        corrector_apply=lambda grid: g.apply(variables, grid, train=False,
                                             method=lambda m, x, train: m.corrector(x, train=train)))

    wsi = jnp.asarray(np.asarray(Image.open(sim["image_file"])))
    pos = read_positions(sim["spaceranger_dir"])
    labels = registrar(wsi, pos)

    assert labels.shape == (G.VISIUM_H_ST, G.VISIUM_W_ST)
    fg = sim["label_grid"] > 0
    # foreground support identical to the simulated tissue
    np.testing.assert_array_equal(labels > 0, fg)
    assert set(np.unique(labels[fg])) <= {1, 2, 3}


def test_slide_registrar_matches_gridnet_forward(sim):
    """Registrar logits must equal GridNetHex applied to the patch grid."""
    import jax
    import jax.numpy as jnp

    from gridnext_tpu.pipeline import grid_from_wsi_visium

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    patch = 8
    x0 = jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST, patch, patch, 3))
    variables = g.init(jax.random.key(1), x0)

    # reference path: host extraction -> full GridNetHex forward
    grid = grid_from_wsi_visium(sim["image_file"], sim["spaceranger_dir"],
                                patch_size=patch) / 255.0
    logits = g.apply(variables, jnp.asarray(grid[None]), train=False)
    want_labels = np.asarray(jnp.argmax(logits[0], -1)) + 1
    fg = sim["label_grid"] > 0

    registrar = SlideRegistrar.from_gridnet(
        g, variables, patch_size=patch, normalize=None, patch_chunk=None,
        use_pallas_corrector=False,
        corrector_apply=lambda gr: g.apply(variables, gr, train=False,
                                           method=lambda m, x, train: m.corrector(x, train=train)))
    from PIL import Image
    wsi = jnp.asarray(np.asarray(Image.open(sim["image_file"])))
    got = registrar(wsi, read_positions(sim["spaceranger_dir"]))

    # Registrar reproduces the f(zero-patch) background context, so interior
    # spots (away from image border clamping, where the two paths pad
    # differently) must agree EXACTLY.
    p2 = patch // 2
    oy, ox, ypx, xpx = spot_pixel_arrays(read_positions(sim["spaceranger_dir"]))
    interior = ((ypx >= p2) & (ypx < wsi.shape[0] - p2)
                & (xpx >= p2) & (xpx < wsi.shape[1] - p2))
    np.testing.assert_array_equal(got[oy[interior], ox[interior]],
                                  want_labels[oy[interior], ox[interior]])


def test_slide_registrar_with_tpu_patch_classifier():
    """SlideRegistrar is f-agnostic: the TPU-shaped f serves the same way."""
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from gridnext_tpu.models import GridNetHex, TpuPatchClassifier
    from gridnext_tpu.serving import SlideRegistrar

    n_classes, p = 3, 32
    f = TpuPatchClassifier(n_classes=n_classes, stages=((128, 1),),
                           stem_patch=8)
    g = GridNetHex(patch_classifier=f, n_classes=n_classes)
    rng = np.random.default_rng(0)
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1, 4, 4, p, p, 3), jnp.float32))

    registrar = SlideRegistrar.from_gridnet(g, variables, patch_size=p,
                                            normalize=None, h_st=8, w_st=6,
                                            patch_chunk=None)
    wsi = jnp.asarray(rng.integers(0, 255, (300, 260, 3), dtype=np.uint8))
    positions = pd.DataFrame({
        "in_tissue": [1, 1, 1],
        "array_row": [0, 1, 2],
        "array_col": [0, 1, 2],
        "pxl_row_in_fullres": [60, 120, 180],
        "pxl_col_in_fullres": [60, 120, 180],
    }, index=["b0", "b1", "b2"])
    labels = registrar(wsi, positions)
    assert labels.shape == (8, 6)
    assert (labels > 0).sum() == 3  # only in-tissue spots labeled


def test_slide_registrar_window_size(sim):
    """window_size > patch_size: serve from wider crops resized down.

    Must agree with the host path (grid_from_wsi_visium window_size= ->
    GridNetHex forward) on interior spots. The device resize is PIL-parity
    to <=2 gray levels (pinned in test_pipeline), so a tiny fraction of
    argmax flips is tolerated.
    """
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gridnext_tpu.pipeline import grid_from_wsi_visium

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    patch, window = 8, 16
    x0 = jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST, patch, patch, 3))
    variables = g.init(jax.random.key(2), x0)

    grid = grid_from_wsi_visium(sim["image_file"], sim["spaceranger_dir"],
                                patch_size=patch, window_size=window) / 255.0
    logits = g.apply(variables, jnp.asarray(grid[None]), train=False)
    want = np.asarray(jnp.argmax(logits[0], -1)) + 1

    registrar = SlideRegistrar.from_gridnet(
        g, variables, patch_size=patch, window_size=window, normalize=None,
        patch_chunk=None, use_pallas_corrector=False,
        corrector_apply=lambda gr: g.apply(variables, gr, train=False,
                                           method=lambda m, x, train: m.corrector(x, train=train)))
    assert registrar.window_size == window
    wsi = jnp.asarray(np.asarray(Image.open(sim["image_file"])))
    got = registrar(wsi, read_positions(sim["spaceranger_dir"]))

    w2 = window // 2
    oy, ox, ypx, xpx = spot_pixel_arrays(read_positions(sim["spaceranger_dir"]))
    interior = ((ypx >= w2) & (ypx < wsi.shape[0] - w2)
                & (xpx >= w2) & (xpx < wsi.shape[1] - w2))
    agree = (got[oy[interior], ox[interior]]
             == want[oy[interior], ox[interior]]).mean()
    assert agree >= 0.97, agree


def test_register_batch_matches_single(sim, tmp_path_factory):
    """N-slide batched dispatch == per-slide registration, including padded
    spot arrays for slides with unequal spot counts."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    root = tmp_path_factory.mktemp("serving_batch")
    sim2 = simulate_spaceranger_dir(root / "arr2", seed=5, n_genes=10,
                                    n_classes=3, image=True,
                                    spot_spacing_px=16, tissue_fraction=0.4)

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    patch = 8
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST,
                                  patch, patch, 3)))
    registrar = SlideRegistrar.from_gridnet(
        g, variables, patch_size=patch, normalize=None, patch_chunk=None,
        use_pallas_corrector=False,
        corrector_apply=lambda gr: g.apply(variables, gr, train=False,
                                           method=lambda m, x, train: m.corrector(x, train=train)))

    wsis, poss = [], []
    for s in (sim, sim2):
        img = np.asarray(Image.open(s["image_file"]))
        wsis.append(img)
        poss.append(read_positions(s["spaceranger_dir"]))
    # equalize slide shapes (batch requires one image shape)
    h = min(w.shape[0] for w in wsis)
    w_ = min(w.shape[1] for w in wsis)
    wsis = np.stack([im[:h, :w_] for im in wsis])

    singles = [registrar(jnp.asarray(wsis[i]), poss[i]) for i in range(2)]
    batched = registrar.register_batch(jnp.asarray(wsis), poss)
    assert batched.shape == (2, G.VISIUM_H_ST, G.VISIUM_W_ST)
    for i in range(2):
        np.testing.assert_array_equal(batched[i], singles[i])


def test_register_slides_overlapped(sim, tmp_path_factory):
    """The combined ingest->serve pipeline (threaded decode + staged
    device_put + shape-grouped batch dispatches) reproduces per-slide
    registration exactly, for every slide, in any group order."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gridnext_tpu.ingest import SlideSource
    from gridnext_tpu.serving import register_slides

    root = tmp_path_factory.mktemp("serving_pipeline")
    sim2 = simulate_spaceranger_dir(root / "arrB", seed=5, n_genes=10,
                                    n_classes=3, image=True,
                                    spot_spacing_px=16, tissue_fraction=0.4)
    sims = [sim, sim2, sim]   # a repeated slide guarantees one shape group
    files = [s["image_file"] for s in sims]
    dirs = [s["spaceranger_dir"] for s in sims]

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    patch = 8
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST,
                                  patch, patch, 3)))
    registrar = SlideRegistrar.from_gridnet(
        g, variables, patch_size=patch, normalize=None, patch_chunk=None,
        use_pallas_corrector=False,
        corrector_apply=lambda gr: g.apply(variables, gr, train=False,
                                           method=lambda m, x, train: m.corrector(x, train=train)))

    want = []
    for s in sims:
        wsi = jnp.asarray(np.asarray(Image.open(s["image_file"])))
        want.append(registrar(wsi, read_positions(s["spaceranger_dir"])))

    src = SlideSource(files, dirs, prefetch=2)
    got = {}
    for i, labels, pos in register_slides(registrar, files, dirs,
                                          slide_batch=2, source=src):
        assert pos is not None
        got[i] = labels
    assert set(got) == {0, 1, 2}
    for i in range(3):
        np.testing.assert_array_equal(got[i], want[i])
    # every stage of the pipeline was exercised and timed
    t = src.timer.summary()
    assert t.get("decode", 0) > 0 and t.get("register", 0) > 0


def test_square_hd_registrar_from_gridnet(tmp_path_factory):
    """from_gridnet on a Cartesian (square-HD) GridNet: direct-coordinate
    spot indexing + conv corrector, matching the per-array grid forward."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gridnext_tpu.data import create_visium_dataset
    from gridnext_tpu.models import GridNet

    root = tmp_path_factory.mktemp("serving_hd")
    binning, hd_grid = "square_016um", (20, 16)
    s = simulate_spaceranger_dir(root / "hd0", seed=3, n_genes=8, n_classes=3,
                                 spaceranger_version="hd", hd_grid=hd_grid,
                                 hd_binning=binning, image=True,
                                 spot_spacing_px=12)

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNet(patch_classifier=f, n_classes=3)
    patch = 8
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1,) + hd_grid + (patch, patch, 3)))

    registrar = SlideRegistrar.from_gridnet(g, variables, patch_size=patch,
                                            normalize=None, patch_chunk=None,
                                            h_st=hd_grid[0], w_st=hd_grid[1])
    assert registrar.hex_coords is False and registrar.use_pallas is False

    wsi = jnp.asarray(np.asarray(Image.open(s["image_file"])))
    pos = read_positions(s["spaceranger_dir"], hd_binning=binning)
    got = registrar(wsi, pos)
    assert got.shape == hd_grid

    # reference path: factory patch grid -> GridNet forward
    pdat = create_visium_dataset([s["spaceranger_dir"]], spatial=True,
                                 use_count=False, use_image=True,
                                 fullres_image_files=[s["image_file"]],
                                 patch_size_px=patch, hd_binning=binning,
                                 grid_dims=hd_grid)
    xi, _ = pdat[0]
    logits = g.apply(variables, jnp.asarray(xi[None]), train=False)
    want_labels = np.asarray(jnp.argmax(logits[0], -1)) + 1

    # interior spots (away from border clamping) agree exactly
    p2 = patch // 2
    oy, ox, ypx, xpx = spot_pixel_arrays(pos, hd_grid[0], hd_grid[1],
                                         hex_coords=False)
    interior = ((ypx >= p2) & (ypx < wsi.shape[0] - p2)
                & (xpx >= p2) & (xpx < wsi.shape[1] - p2))
    np.testing.assert_array_equal(got[oy[interior], ox[interior]],
                                  want_labels[oy[interior], ox[interior]])
    np.testing.assert_array_equal(got > 0, s["label_grid"] > 0)


def test_pallas_extractor_matches_xla(sim, tmp_path_factory):
    """extractor='pallas' (interpreted off-TPU) == extractor='xla' labels,
    single-slide and batched, including the window!=patch resize path."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    root = tmp_path_factory.mktemp("serving_pallas_x")
    sim2 = simulate_spaceranger_dir(root / "arr2", seed=9, n_genes=10,
                                    n_classes=3, image=True,
                                    spot_spacing_px=16, tissue_fraction=0.3)

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    patch = 8
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST,
                                  patch, patch, 3)))

    def build(extractor, window=None):
        return SlideRegistrar.from_gridnet(
            g, variables, patch_size=patch, window_size=window,
            normalize=None, patch_chunk=None, use_pallas_corrector=False,
            extractor=extractor,
            corrector_apply=lambda gr: g.apply(
                variables, gr, train=False,
                method=lambda m, x, train: m.corrector(x, train=train)))

    wsis, poss = [], []
    for s in (sim, sim2):
        wsis.append(np.asarray(Image.open(s["image_file"])))
        poss.append(read_positions(s["spaceranger_dir"]))
    h = min(w.shape[0] for w in wsis)
    w_ = min(w.shape[1] for w in wsis)
    wsis = jnp.asarray(np.stack([im[:h, :w_] for im in wsis]))

    want = build("xla")(wsis[0], poss[0])
    got = build("pallas")(wsis[0], poss[0])
    np.testing.assert_array_equal(got, want)

    want_b = build("xla").register_batch(wsis, poss)
    got_b = build("pallas").register_batch(wsis, poss)
    np.testing.assert_array_equal(got_b, want_b)

    # resize path: crop a 12px window, serve at patch=8
    want_r = build("xla", window=12)(wsis[0], poss[0])
    got_r = build("pallas", window=12)(wsis[0], poss[0])
    np.testing.assert_array_equal(got_r, want_r)

    # float WSIs silently take the xla path (pack is uint8-only)
    got_f = build("pallas")(wsis[0].astype(jnp.float32), poss[0])
    np.testing.assert_array_equal(got_f, want)

    # pre-packed slides (pack-at-staging): identical labels, single + batch
    from gridnext_tpu.ops import PackedWSI, pack_wsi

    orig_hw = (int(wsis.shape[1]), int(wsis.shape[2]))
    packed1 = PackedWSI(pack_wsi(wsis[0]), orig_hw)
    np.testing.assert_array_equal(build("pallas")(packed1, poss[0]), want)
    packed_b = PackedWSI(jax.vmap(pack_wsi)(wsis), orig_hw)
    got_pb = build("pallas").register_batch(packed_b, poss)
    np.testing.assert_array_equal(got_pb, want_b)

    # packed input demands the pallas extractor
    with pytest.raises(ValueError):
        build("xla")(packed1, poss[0])


def test_mesh_sharded_serving_matches_single(sim, tmp_path_factory):
    """``mesh=`` serving (spot-axis shard_map DP + ICI all-gather of the
    per-shard features) reproduces single-device labels exactly, for
    single-slide and batched dispatches, including spot counts that do not
    divide the mesh (padded inside the sharded region)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gridnext_tpu.parallel import make_mesh

    root = tmp_path_factory.mktemp("serving_mesh")
    sim2 = simulate_spaceranger_dir(root / "arr2", seed=7, n_genes=10,
                                    n_classes=3, image=True,
                                    spot_spacing_px=16, tissue_fraction=0.4)

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    patch = 8
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST,
                                  patch, patch, 3)))

    def build(mesh=None):
        return SlideRegistrar.from_gridnet(
            g, variables, patch_size=patch, normalize=None, patch_chunk=None,
            mesh=mesh, use_pallas_corrector=False,
            corrector_apply=lambda gr: g.apply(
                variables, gr, train=False,
                method=lambda m, x, train: m.corrector(x, train=train)))

    wsis, poss = [], []
    for s in (sim, sim2):
        img = np.asarray(Image.open(s["image_file"]))
        wsis.append(img)
        poss.append(read_positions(s["spaceranger_dir"]))
    h = min(w.shape[0] for w in wsis)
    w_ = min(w.shape[1] for w in wsis)
    wsis = jnp.asarray(np.stack([im[:h, :w_] for im in wsis]))

    single = build()
    sharded = build(mesh=make_mesh({"data": 8}))
    # spot count must NOT already divide the mesh, or padding goes untested
    assert len(spot_pixel_arrays(poss[0])[0]) % 8 != 0

    np.testing.assert_array_equal(sharded(wsis[0], poss[0]),
                                  single(wsis[0], poss[0]))
    np.testing.assert_array_equal(sharded.register_batch(wsis, poss),
                                  single.register_batch(wsis, poss))


def test_register_dense_matches_per_bin(tmp_path_factory):
    """Dense-tiling HD registration (one slice + reshape, no gather) ==
    the per-bin gather path, bin for bin, including the window->patch
    resize and background bins carrying f(zero-patch)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gridnext_tpu.models import GridNet

    root = tmp_path_factory.mktemp("serving_dense")
    binning, hd_grid = "square_016um", (20, 16)
    s = simulate_spaceranger_dir(root / "hd0", seed=3, n_genes=8, n_classes=3,
                                 spaceranger_version="hd", hd_grid=hd_grid,
                                 hd_binning=binning, image=True,
                                 spot_spacing_px=12)

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNet(patch_classifier=f, n_classes=3)
    patch = 8
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1,) + hd_grid + (patch, patch, 3)))
    # window == the simulated bin pitch (12px): the dense-lattice precondition
    registrar = SlideRegistrar.from_gridnet(g, variables, patch_size=patch,
                                            window_size=12, normalize=None,
                                            patch_chunk=None,
                                            h_st=hd_grid[0], w_st=hd_grid[1])

    wsi = jnp.asarray(np.asarray(Image.open(s["image_file"])))
    pos = read_positions(s["spaceranger_dir"], hd_binning=binning)
    want = registrar(wsi, pos)            # per-bin gather path
    got = registrar.register_dense(wsi, pos)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got > 0, s["label_grid"] > 0)

    # mesh-sharded dense serving: f shards over the flat bin axis, labels
    # identical (the dense path must not silently drop the mesh)
    from gridnext_tpu.parallel import make_mesh

    reg_mesh = SlideRegistrar.from_gridnet(
        g, variables, patch_size=patch, window_size=12, normalize=None,
        patch_chunk=None, h_st=hd_grid[0], w_st=hd_grid[1],
        mesh=make_mesh({"data": 8}))
    np.testing.assert_array_equal(reg_mesh.register_dense(wsi, pos), got)

    # guardrails: hex lattices and irregular positions are rejected
    hexr = SlideRegistrar.from_gridnet(
        GridNetHex(patch_classifier=f, n_classes=3),
        GridNetHex(patch_classifier=f, n_classes=3).init(
            jax.random.key(1),
            jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST, patch, patch, 3))),
        patch_size=patch, normalize=None, patch_chunk=None)
    with pytest.raises(ValueError, match="square lattice"):
        hexr.register_dense(wsi, pos)
    bad = pos.copy()
    row = np.flatnonzero(bad["in_tissue"].astype(int) == 1)[0]
    bad.iloc[row, bad.columns.get_loc("pxl_row_in_fullres")] += 1
    with pytest.raises(ValueError, match="dense"):
        registrar.register_dense(wsi, bad)


def test_register_slides_square_hd_uses_dense(tmp_path_factory):
    """The serving loop prefers dense-tiling registration for square-HD
    registrars (pitch == window), and falls back per-bin when the lattice
    is irregular -- labels identical either way."""
    import jax
    import jax.numpy as jnp

    from gridnext_tpu.models import GridNet
    from gridnext_tpu.serving import register_slides

    root = tmp_path_factory.mktemp("serving_dense_loop")
    binning, hd_grid = "square_016um", (20, 16)
    sims = [simulate_spaceranger_dir(root / f"hd{i}", seed=3 + i, n_genes=8,
                                     n_classes=3, spaceranger_version="hd",
                                     hd_grid=hd_grid, hd_binning=binning,
                                     image=True, spot_spacing_px=12)
            for i in range(2)]

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNet(patch_classifier=f, n_classes=3)
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1,) + hd_grid + (8, 8, 3)))

    def build(window):
        return SlideRegistrar.from_gridnet(
            g, variables, patch_size=8, window_size=window, normalize=None,
            patch_chunk=None, h_st=hd_grid[0], w_st=hd_grid[1])

    files = [s["image_file"] for s in sims]
    dirs = [s["spaceranger_dir"] for s in sims]
    # window == pitch: dense path engages; equals direct register_dense
    reg = build(12)
    got = {i: lab for i, lab, _ in register_slides(reg, files, dirs,
                                                   hd_binning=binning)}
    for i, s in enumerate(sims):
        from PIL import Image

        wsi = jnp.asarray(np.asarray(Image.open(s["image_file"])))
        pos = read_positions(s["spaceranger_dir"], hd_binning=binning)
        np.testing.assert_array_equal(got[i], reg.register_dense(wsi, pos))
    # window != pitch: dense precondition fails, per-bin fallback engages
    reg8 = build(8)
    got8 = {i: lab for i, lab, _ in register_slides(reg8, files, dirs,
                                                    hd_binning=binning)}
    from PIL import Image

    for i, s in enumerate(sims):
        wsi = jnp.asarray(np.asarray(Image.open(s["image_file"])))
        pos = read_positions(s["spaceranger_dir"], hd_binning=binning)
        np.testing.assert_array_equal(got8[i], reg8(wsi, pos))


def test_register_dense_fractional_pitch():
    """Real Spaceranger HD lattices have FRACTIONAL fullres pixel pitch
    (16um / microns-per-pixel); the dense path must still engage -- via the
    banded lattice resample -- and agree with the per-bin gather path."""
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from gridnext_tpu.models import GridNet

    hd_grid, pitch, origin = (20, 16), 12.6, (30.7, 25.3)
    rng = np.random.default_rng(4)
    rows = np.repeat(np.arange(hd_grid[0]), hd_grid[1])
    cols = np.tile(np.arange(hd_grid[1]), hd_grid[0])
    y_c = np.rint(origin[0] + (rows + 0.5) * pitch).astype(int)
    x_c = np.rint(origin[1] + (cols + 0.5) * pitch).astype(int)
    in_tissue = (rng.random(len(rows)) < 0.7).astype(int)
    pos = pd.DataFrame({"in_tissue": in_tissue, "array_row": rows,
                        "array_col": cols, "pxl_row_in_fullres": y_c,
                        "pxl_col_in_fullres": x_c},
                       index=[f"b{i}" for i in range(len(rows))])
    wsi = jnp.asarray(rng.integers(0, 255, (320, 280, 3), dtype=np.uint8))

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNet(patch_classifier=f, n_classes=3)
    patch = 8
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1,) + hd_grid + (patch, patch, 3)))
    reg = SlideRegistrar.from_gridnet(g, variables, patch_size=patch,
                                      window_size=13,  # ~ the 12.6px pitch
                                      normalize=None, patch_chunk=None,
                                      h_st=hd_grid[0], w_st=hd_grid[1])

    assert reg.dense_applicable(wsi, pos)
    plan = reg._dense_plan(wsi.shape, pos)
    assert plan[0] == "resample"
    assert abs(plan[3] - pitch) < 0.05 and abs(plan[4] - pitch) < 0.05

    got = reg.register_dense(wsi, pos)
    want = reg(wsi, pos)                       # per-bin gather path
    fg = np.zeros(hd_grid, np.int32)
    fg[rows[in_tissue == 1], cols[in_tissue == 1]] = 1
    np.testing.assert_array_equal(got > 0, fg > 0)
    # CROSS-SAMPLING sanity only: the per-bin path reads 13px integer
    # center crops, the dense path the exact fractional bin extents --
    # different pixels by design, so this floor is intentionally loose.
    # The TIGHT numerical bound for the fractional path itself is
    # test_register_dense_fractional_pitch_oracle below (float64 oracle
    # of the exact bin extents, f32-rounding agreement).
    agree = (got[fg > 0] == want[fg > 0]).mean()
    assert agree >= 0.9, agree

    # a window far from the pitch means center crops -- dense must decline
    reg_crop = SlideRegistrar.from_gridnet(g, variables, patch_size=patch,
                                           window_size=8, normalize=None,
                                           patch_chunk=None,
                                           h_st=hd_grid[0], w_st=hd_grid[1])
    assert not reg_crop.dense_applicable(wsi, pos)


def _st_linear_oracle(img, out_shape, scale, translation):
    """float64 host oracle of ``jax.image.scale_and_translate(
    method='linear', antialias=True)`` over the spatial dims of (H, W, C):
    per-axis anti-aliased triangle weight matrices contracted in float64
    (self-checked against jax below to ~1e-4 on a 0-255 scale)."""
    img = np.asarray(img, np.float64)

    def weight_mat(in_size, out_size, sc, tr):
        inv = 1.0 / sc
        ks = max(inv, 1.0)                       # antialias widening
        sample_f = (np.arange(out_size) + 0.5) * inv - tr * inv - 0.5
        x = np.abs(sample_f[None, :] - np.arange(in_size)[:, None]) / ks
        w = np.clip(1 - x, 0, 1)
        tot = w.sum(0, keepdims=True)
        w = np.where(np.abs(tot) > 1e-12, w / np.where(tot == 0, 1, tot), 0)
        ok = (sample_f >= -0.5) & (sample_f <= in_size - 0.5)
        return np.where(ok[None, :], w, 0)

    wy = weight_mat(img.shape[0], out_shape[0], scale[0], translation[0])
    wx = weight_mat(img.shape[1], out_shape[1], scale[1], translation[1])
    return np.einsum("io,jp,ijc->opc", wy, wx, img)


def test_register_dense_fractional_pitch_oracle():
    """Tight serving bound for the fractional-pitch resample (VERDICT r4
    #4): the production banded path must reproduce a float64 host oracle of
    the EXACT per-bin fractional extents to f32 rounding -- pixel-level on
    every patch, and >=0.99 (here: total) label agreement through the full
    f+g pipeline."""
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from gridnext_tpu.models import GridNet

    hd_grid, pitch, origin = (18, 14), 12.6, (30.7, 25.3)
    rng = np.random.default_rng(7)
    rows = np.repeat(np.arange(hd_grid[0]), hd_grid[1])
    cols = np.tile(np.arange(hd_grid[1]), hd_grid[0])
    y_c = np.rint(origin[0] + (rows + 0.5) * pitch).astype(int)
    x_c = np.rint(origin[1] + (cols + 0.5) * pitch).astype(int)
    in_tissue = (rng.random(len(rows)) < 0.75).astype(int)
    pos = pd.DataFrame({"in_tissue": in_tissue, "array_row": rows,
                        "array_col": cols, "pxl_row_in_fullres": y_c,
                        "pxl_col_in_fullres": x_c},
                       index=[f"b{i}" for i in range(len(rows))])
    wsi = jnp.asarray(rng.integers(0, 255, (290, 240, 3), dtype=np.uint8))

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNet(patch_classifier=f, n_classes=3)
    patch = 8
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1,) + hd_grid + (patch, patch, 3)))
    reg = SlideRegistrar.from_gridnet(g, variables, patch_size=patch,
                                      window_size=13, normalize=None,
                                      patch_chunk=None, h_st=hd_grid[0],
                                      w_st=hd_grid[1])
    plan = reg._dense_plan(wsi.shape, pos)
    assert plan is not None and plan[0] == "resample"
    _, y0, x0, py, px_, fg, h_band, ey, ex = plan

    # self-check the oracle against jax's own kernel on one band
    chk = np.asarray(jax.image.scale_and_translate(
        wsi.astype(jnp.float32)[:40], (patch, ex * patch, 3), (0, 1),
        jnp.asarray([patch / py, patch / px_], jnp.float32),
        jnp.asarray([-y0 * patch / py, -x0 * patch / px_], jnp.float32),
        method="linear"))
    chk64 = _st_linear_oracle(np.asarray(wsi[:40]), (patch, ex * patch),
                              (patch / py, patch / px_),
                              (-y0 * patch / py, -x0 * patch / px_))
    np.testing.assert_allclose(chk, chk64, atol=5e-3)

    # production banded patches vs per-bin float64 oracle of exact extents
    banded = np.asarray(reg._resampled_patches(
        wsi, y0, x0, py, px_, h_band=h_band, ey=ey, ex=ex))
    wsi64 = np.asarray(wsi)
    scale = (patch / py, patch / px_)
    worst = 0.0
    for r in range(ey):
        for c in range(ex):
            tr = (-(y0 + r * py) * scale[0], -(x0 + c * px_) * scale[1])
            want = _st_linear_oracle(wsi64, (patch, patch), scale, tr)
            worst = max(worst,
                        float(np.abs(banded[r * ex + c] - want).max()))
    # f32 rounding on a 0-255 scale; anything beyond ~1e-2 would mean the
    # banding (band slice offsets / translations) samples wrong extents
    assert worst < 2e-2, f"banded patches deviate from exact extents: {worst}"

    # label agreement through the full pipeline: oracle patches -> same
    # normalize/f/corrector internals as _register_dense_resampled
    oracle_patches = np.stack([
        _st_linear_oracle(
            wsi64, (patch, patch), scale,
            (-(y0 + r * py) * scale[0], -(x0 + c * px_) * scale[1]))
        for r in range(ey) for c in range(ex)]).astype(np.float32)
    feats = reg._apply_f_sharded(reg._normalize(jnp.asarray(oracle_patches)))
    oracle_labels = np.asarray(reg._dense_feats_to_labels(
        reg._pad_extent(feats, ey, ex), jnp.asarray(fg)))
    got = np.asarray(reg.register_dense(wsi, pos))
    agree = (got[fg > 0] == oracle_labels[fg > 0]).mean()
    assert agree >= 0.99, f"label agreement vs float64 oracle: {agree}"


def test_register_dense_cohort_max_extent(tmp_path_factory):
    """A slide whose own lattice is SMALLER than the registrar's cohort-max
    (h_st, w_st) still serves dense: extraction covers only the listed-bin
    extent, the extra grid rows/cols are background, and labels equal the
    per-bin path bit for bit (mixed-size HD cohorts, grid_dims='auto')."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gridnext_tpu.models import GridNet

    root = tmp_path_factory.mktemp("serving_dense_ext")
    binning, slide_grid, cohort = "square_016um", (12, 10), (16, 14)
    s = simulate_spaceranger_dir(root / "hd0", seed=5, n_genes=8,
                                 n_classes=3, spaceranger_version="hd",
                                 hd_grid=slide_grid, hd_binning=binning,
                                 image=True, spot_spacing_px=12)

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNet(patch_classifier=f, n_classes=3)
    patch = 8
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1,) + cohort + (patch, patch, 3)))
    registrar = SlideRegistrar.from_gridnet(g, variables, patch_size=patch,
                                            window_size=12, normalize=None,
                                            patch_chunk=None,
                                            h_st=cohort[0], w_st=cohort[1])

    wsi = jnp.asarray(np.asarray(Image.open(s["image_file"])))
    pos = read_positions(s["spaceranger_dir"], hd_binning=binning)
    plan = registrar.dense_plan(wsi, pos)
    assert plan is not None and plan[0] == "exact"
    it = pos[pos["in_tissue"].astype(int) == 1]
    extent = (int(it["array_row"].max()) + 1, int(it["array_col"].max()) + 1)
    # in-tissue bin extent: <= the slide's own lattice, never the cohort max
    assert plan[-2:] == extent
    assert extent <= slide_grid < cohort
    got = registrar.register_dense(wsi, pos, plan=plan)
    want = registrar(wsi, pos)              # per-bin gather path
    np.testing.assert_array_equal(got, want)
    assert got.shape == cohort
    assert (got[slide_grid[0]:, :] == 0).all()
    assert (got[:, slide_grid[1]:] == 0).all()
    assert (got[:slide_grid[0], :slide_grid[1]] > 0).any()


def test_dense_resample_rejects_overhang():
    """A fractional-pitch lattice whose bin extents overhang the image must
    NOT plan dense: the banded resample would zero-fill out-of-image pixels
    where the per-bin path clamps to border pixels, so it falls back."""
    import pandas as pd

    from gridnext_tpu.serving import fit_dense_lattice

    hd_grid, pitch = (20, 16), 12.6
    rows = np.repeat(np.arange(hd_grid[0]), hd_grid[1])
    cols = np.tile(np.arange(hd_grid[1]), hd_grid[0])

    def make_pos(origin):
        y_c = np.rint(origin[0] + (rows + 0.5) * pitch).astype(int)
        x_c = np.rint(origin[1] + (cols + 0.5) * pitch).astype(int)
        return pd.DataFrame({"in_tissue": np.ones(len(rows), int),
                             "array_row": rows, "array_col": cols,
                             "pxl_row_in_fullres": y_c,
                             "pxl_col_in_fullres": x_c},
                            index=[f"b{i}" for i in range(len(rows))])

    shape = (320, 280, 3)
    ok = fit_dense_lattice(make_pos((30.7, 25.3)), *hd_grid, 13, shape)
    assert ok is not None and ok[0] == "resample"
    # negative origin: bin (., 0) extends past the left image edge
    assert fit_dense_lattice(make_pos((30.7, -4.0)), *hd_grid, 13,
                             shape) is None
    # bottom overhang: last bin row extends past the image bottom
    assert fit_dense_lattice(make_pos((shape[0] - hd_grid[0] * pitch + 5.0,
                                       25.3)), *hd_grid, 13, shape) is None


def test_register_slides_mixed_shapes_bounded_hold(tmp_path_factory):
    """All-distinct-shape cohorts must not pin every staged slide until the
    source drains: register_slides caps held slides at slide_batch, flushing
    the largest partial group at the cap (mixed scan dimensions are the norm
    for real WSIs; unbounded holds OOM HBM on GB-scale slides)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gridnext_tpu.ingest import SlideSource
    from gridnext_tpu.serving import register_slides

    root = tmp_path_factory.mktemp("serving_mixed")
    sims = [simulate_spaceranger_dir(root / f"m{k}", seed=20 + k, n_genes=6,
                                     n_classes=3, image=True,
                                     spot_spacing_px=12 + 2 * k,
                                     tissue_fraction=0.4)
            for k in range(4)]
    files = [s["image_file"] for s in sims]
    dirs = [s["spaceranger_dir"] for s in sims]
    shapes = {Image.open(f).size for f in files}
    assert len(shapes) == 4  # premise: every slide its own shape group

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    patch = 8
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST,
                                  patch, patch, 3)))
    registrar = SlideRegistrar.from_gridnet(
        g, variables, patch_size=patch, normalize=None, patch_chunk=None,
        use_pallas_corrector=False,
        corrector_apply=lambda gr: g.apply(variables, gr, train=False,
                                           method=lambda m, x, train: m.corrector(x, train=train)))

    want = []
    for s in sims:
        wsi = jnp.asarray(np.asarray(Image.open(s["image_file"])))
        want.append(registrar(wsi, read_positions(s["spaceranger_dir"])))

    class CountingSource:
        """Counts slides handed to the consumer (== staged device memory)."""

        def __init__(self, src):
            self.src, self.timer, self.consumed = src, src.timer, 0

        def __iter__(self):
            for item in self.src:
                self.consumed += 1
                yield item

    slide_batch = 2
    cs = CountingSource(SlideSource(files, dirs, prefetch=2))
    got, done, max_gap = {}, 0, 0
    for i, labels, pos in register_slides(registrar, files, dirs,
                                          slide_batch=slide_batch, source=cs):
        done += 1
        max_gap = max(max_gap, cs.consumed - done)
        got[i] = labels
    assert set(got) == set(range(4))
    for i in range(4):
        np.testing.assert_array_equal(got[i], want[i])
    # the cap: at every yield, consumed-but-unyielded slides <= slide_batch
    # (pre-fix this was len(cohort)-1: nothing yielded until the source drained)
    assert max_gap <= slide_batch, max_gap


def test_spot_center_clamp_allows_flush_to_edge_windows():
    """_spot_arrays clamps centers so crops stay in bounds. The crop origin
    is center - w//2 over `window` pixels, so the max valid center is
    H - (w - w//2); the old H - w//2 - 1 was one pixel tighter for even
    windows and shifted flush-to-edge HD bins vs register_dense's slice."""
    import pandas as pd

    w = 10
    reg = SlideRegistrar(f_apply=lambda v, x: x, patch_size=w,
                         h_st=4, w_st=4, hex_coords=False,
                         use_pallas_corrector=False,
                         corrector_apply=lambda g: g, extractor="xla")
    # 2x2 dense lattice flush with a 20x20 image: centers 5 and 15
    pos = pd.DataFrame({
        "barcode": [f"b{i}" for i in range(4)],
        "in_tissue": [1] * 4,
        "array_row": [0, 0, 1, 1], "array_col": [0, 1, 0, 1],
        "pxl_row_in_fullres": [5, 5, 15, 15],
        "pxl_col_in_fullres": [5, 15, 5, 15],
    })
    oy, ox, y_px, x_px = reg._spot_arrays((20, 20), pos, 0)
    # max center 15 must survive: origin 15 - 5 = 10 = H - window (in
    # bounds); clamping to 14 would shift the crop by one pixel
    assert y_px.max() == 15 and x_px.max() == 15
    # and a genuinely out-of-range center still clamps into bounds
    pos2 = pos.copy()
    pos2.loc[3, "pxl_row_in_fullres"] = 19
    _, _, y2, _ = reg._spot_arrays((20, 20), pos2, 0)
    assert y2.max() == 15            # 19 -> clamped to H - (w - w//2)


def test_export_registration_round_trip(sim):
    """SlideRegistrar.export serializes the FULL registration pipeline
    (gather -> f -> corrector -> labels, weights embedded); the reloaded
    StableHLO artifact must reproduce the live registrar's label grid
    with no model code (the deployment-unit contract)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gridnext_tpu.models import CountMLP  # noqa: F401 (import surface)
    from gridnext_tpu.serving import load_exported_registration

    patch = 8

    def f_apply(patches):                      # tiny deterministic f
        m = patches.mean(axis=(1, 2))          # (N, 3)
        return jnp.concatenate([m, m[:, :1] * 0.5], axis=-1)

    def corrector(grid):                       # linear map to 3 classes
        w = jnp.asarray([[1.0, 0.0, -1.0], [0.0, 1.0, 0.0],
                         [-1.0, 0.5, 1.0], [0.2, -0.3, 0.1]])
        return grid @ w

    reg = SlideRegistrar(f_apply=f_apply, patch_size=patch, normalize=None,
                         patch_chunk=None, use_pallas_corrector=False,
                         corrector_apply=corrector, extractor="xla")
    wsi = np.asarray(Image.open(sim["image_file"]))
    pos = read_positions(sim["spaceranger_dir"])
    want = reg(jnp.asarray(wsi), pos)

    blob = reg.export(wsi.shape, n_spots=4096)
    assert isinstance(blob, bytes) and len(blob) > 0
    fn = load_exported_registration(blob)
    oy, ox, y_px, x_px = reg.spot_inputs(wsi.shape, pos, n_spots=4096)
    got = np.asarray(fn(jnp.asarray(wsi), jnp.asarray(oy), jnp.asarray(ox),
                        jnp.asarray(y_px), jnp.asarray(x_px)))
    np.testing.assert_array_equal(got, want)


def test_register_logits_matches_labels(sim):
    """register_logits returns the corrector logits of the same pipeline:
    argmax+1 under the fg mask must reproduce __call__'s label grid, and the
    mask must equal the simulated tissue support."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    patch = 8
    x0 = jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST, patch, patch, 3))
    variables = g.init(jax.random.key(0), x0)
    reg = SlideRegistrar.from_gridnet(
        g, variables, patch_size=patch, normalize=None, patch_chunk=None,
        use_pallas_corrector=False,
        corrector_apply=lambda grid: g.apply(
            variables, grid, train=False,
            method=lambda m, x, train: m.corrector(x, train=train)))
    wsi = jnp.asarray(np.asarray(Image.open(sim["image_file"])))
    pos = read_positions(sim["spaceranger_dir"])
    labels = reg(wsi, pos)
    logits, fg = reg.register_logits(wsi, pos)
    assert logits.shape == (G.VISIUM_H_ST, G.VISIUM_W_ST, 3)
    assert logits.dtype == np.float32
    np.testing.assert_array_equal(fg > 0, sim["label_grid"] > 0)
    want = np.where(fg > 0, logits.argmax(-1) + 1, 0)
    np.testing.assert_array_equal(want, labels)


def test_label_parity_report_contract():
    """The device-portable parity contract: exact -> 0; near-tie flips to
    the runner-up tolerated and counted; wide-margin or off-runner-up flips
    and any bg/fg divergence rejected."""
    from gridnext_tpu.serving import label_parity_report

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 5, 3)).astype(np.float32) * 10.0
    fg = np.ones((4, 5), bool)
    fg[0, 0] = False
    want = np.where(fg, logits.argmax(-1) + 1, 0)

    assert label_parity_report(want, want.copy(), logits) == 0

    # a near-tie at (1, 1): top-2 within tolerance, flip to runner-up passes
    logits_nt = logits.copy()
    order = np.argsort(logits_nt[1, 1])
    logits_nt[1, 1, order[-2]] = logits_nt[1, 1, order[-1]] - 1e-4
    want_nt = np.where(fg, logits_nt.argmax(-1) + 1, 0)
    got = want_nt.copy()
    got[1, 1] = order[-2] + 1
    assert label_parity_report(want_nt, got, logits_nt) == 1

    # same flip with a WIDE margin must raise
    with pytest.raises(AssertionError, match="exceed the near-tie margin"):
        got_wide = want.copy()
        y, x = 2, 3
        got_wide[y, x] = (np.argsort(logits[y, x])[-2] + 1)
        label_parity_report(want, got_wide, logits)

    # near-tie flip to a class that is NOT the runner-up must raise
    got_third = want_nt.copy()
    got_third[1, 1] = order[0] + 1
    with pytest.raises(AssertionError, match="runner-up"):
        label_parity_report(want_nt, got_third, logits_nt)

    # background/foreground structure must never diverge
    got_bg = want.copy()
    got_bg[0, 0] = 2
    with pytest.raises(AssertionError, match="background/foreground"):
        label_parity_report(want, got_bg, logits)


def test_export_rejects_mesh_and_bad_shapes(sim):
    reg = SlideRegistrar(f_apply=lambda p: p.mean(axis=(1, 2)), patch_size=8,
                         normalize=None, use_pallas_corrector=False,
                         corrector_apply=lambda g: g, extractor="xla")
    with pytest.raises(ValueError, match=r"\(H, W, 3\)"):
        reg.export((64, 64), n_spots=128)
    pos = read_positions(sim["spaceranger_dir"])
    with pytest.raises(ValueError, match="exceed n_spots"):
        reg.spot_inputs((640, 640, 3), pos, n_spots=4)

    # mesh registrars must refuse to export (single-device path only)
    import jax

    from gridnext_tpu.parallel import make_mesh

    mesh_reg = SlideRegistrar(f_apply=lambda p: p.mean(axis=(1, 2)),
                              patch_size=8, normalize=None,
                              use_pallas_corrector=False,
                              corrector_apply=lambda g: g, extractor="xla",
                              mesh=make_mesh({"data": len(jax.devices())}))
    with pytest.raises(ValueError, match="mesh=None"):
        mesh_reg.export((64, 64, 3), n_spots=128)
    with pytest.raises(ValueError, match="mesh=None"):
        mesh_reg.export_dense((64, 64, 3), 4, 4)

    # cross-platform export of pallas paths must fail fast, not embed the
    # interpreted fallback (or a mosaic kernel) for the wrong target
    pal = SlideRegistrar(f_apply=lambda p: p.mean(axis=(1, 2)),
                         patch_size=128, normalize=None,
                         use_pallas_corrector=False,
                         corrector_apply=lambda g: g, extractor="pallas")
    other = "tpu" if jax.default_backend() != "tpu" else "cpu"
    with pytest.raises(ValueError, match="current backend"):
        pal.export((512, 512, 3), n_spots=128, platforms=[other])


def test_export_dense_round_trip(tmp_path_factory):
    """export_dense serializes the HD dense-tiling registration; the
    reloaded artifact reproduces register_dense's labels from the plan's
    (oy0, ox0, fg) inputs with no model code."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gridnext_tpu.models import GridNet
    from gridnext_tpu.serving import load_exported_registration

    root = tmp_path_factory.mktemp("serving_dense_export")
    binning, hd_grid = "square_016um", (20, 16)
    s = simulate_spaceranger_dir(root / "hd0", seed=3, n_genes=8, n_classes=3,
                                 spaceranger_version="hd", hd_grid=hd_grid,
                                 hd_binning=binning, image=True,
                                 spot_spacing_px=12)

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNet(patch_classifier=f, n_classes=3)
    patch = 8
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1,) + hd_grid + (patch, patch, 3)))
    registrar = SlideRegistrar.from_gridnet(g, variables, patch_size=patch,
                                            window_size=12, normalize=None,
                                            patch_chunk=None,
                                            h_st=hd_grid[0], w_st=hd_grid[1])

    wsi = np.asarray(Image.open(s["image_file"]))
    pos = read_positions(s["spaceranger_dir"], hd_binning=binning)
    plan = registrar.dense_plan(jnp.asarray(wsi), pos)
    assert plan is not None and plan[0] == "exact"
    _, oy0, ox0, fg, ey, ex = plan
    want = registrar.register_dense(jnp.asarray(wsi), pos, plan=plan)

    blob = registrar.export_dense(wsi.shape, ey, ex)
    fn = load_exported_registration(blob)
    got = np.asarray(fn(jnp.asarray(wsi), jnp.int32(oy0), jnp.int32(ox0),
                        jnp.asarray(fg)))
    np.testing.assert_array_equal(got, want)

    with pytest.raises(ValueError, match="square-lattice"):
        SlideRegistrar(f_apply=lambda p: p.mean(axis=(1, 2)), patch_size=8,
                       normalize=None, use_pallas_corrector=False,
                       corrector_apply=lambda g_: g_,
                       extractor="xla").export_dense((64, 64, 3), 4, 4)


def test_export_grid_forward_count_and_mm(sim):
    """export_grid_forward round-trips count and multimodal grid models:
    reloaded artifacts reproduce argmax(model(x))+1 masked by tissue."""
    import jax
    import jax.numpy as jnp

    from gridnext_tpu import geometry as G2
    from gridnext_tpu.models import CountMLP, GridNetHex, GridNetHexMM
    from gridnext_tpu.serving import (export_grid_forward,
                                      load_exported_registration)

    h, w, ng = 12, 10, 6
    rng = np.random.default_rng(0)
    counts = rng.poisson(1.0, size=(1, h, w, ng)).astype(np.float32)
    counts[0, :4] = 0                                   # background rows

    f = CountMLP(n_classes=3, hidden=(8, 8, 8, 8))
    g = GridNetHex(patch_classifier=f, n_classes=3)
    variables = g.init(jax.random.key(0), jnp.zeros((1, h, w, ng)))
    blob = export_grid_forward(g, variables, (h, w, ng))
    fn = load_exported_registration(blob)
    got = np.asarray(fn(jnp.asarray(counts)))
    logits = g.apply(variables, jnp.asarray(counts), train=False)
    want = np.where(counts.any(-1), np.asarray(jnp.argmax(logits, -1)) + 1, 0)
    np.testing.assert_array_equal(got, want)
    assert (got[0, :4] == 0).all() and (got[0, 4:] > 0).any()

    # multimodal: (image grid, count grid) pair
    from gridnext_tpu.models import DenseNet

    p = 8
    f_img = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                     num_classes=3, small_inputs=True)
    gmm = GridNetHexMM(image_classifier=f_img, count_classifier=f,
                       n_classes=3)
    imgs = rng.uniform(size=(1, h, w, p, p, 3)).astype(np.float32)
    vs = gmm.init(jax.random.key(1), (jnp.zeros((1, h, w, p, p, 3)),
                                      jnp.zeros((1, h, w, ng))))
    blob2 = export_grid_forward(gmm, vs, ((h, w, p, p, 3), (h, w, ng)))
    fn2 = load_exported_registration(blob2)
    got2 = np.asarray(fn2(jnp.asarray(imgs), jnp.asarray(counts)))
    logits2 = gmm.apply(vs, (jnp.asarray(imgs), jnp.asarray(counts)),
                        train=False)
    want2 = np.where(counts.any(-1),
                     np.asarray(jnp.argmax(logits2, -1)) + 1, 0)
    np.testing.assert_array_equal(got2, want2)


def test_export_grid_forward_explicit_fg():
    """explicit_fg=True: the artifact takes the tissue mask as an input,
    needed when the count transform changes the zero-support (scBERT's
    gene2vec reindex zeroes unmapped genes -- the transformed grid can't
    recover the raw-count foreground)."""
    import jax
    import jax.numpy as jnp

    from gridnext_tpu.models import CountMLP, GridNetHex
    from gridnext_tpu.serving import (export_grid_forward,
                                      load_exported_registration)

    h, w, ng = 8, 6, 5
    rng = np.random.default_rng(2)
    counts = rng.poisson(1.0, size=(1, h, w, ng)).astype(np.float32)
    counts[0, 0] = 0            # transformed-support hole...
    fg = np.ones((1, h, w), np.int32)   # ...that RAW counts say is tissue
    fg[0, -1] = 0               # and a transformed-nonzero row that is NOT

    f = CountMLP(n_classes=3, hidden=(8, 8, 8, 8))
    g = GridNetHex(patch_classifier=f, n_classes=3)
    variables = g.init(jax.random.key(0), jnp.zeros((1, h, w, ng)))
    blob = export_grid_forward(g, variables, (h, w, ng), explicit_fg=True)
    fn = load_exported_registration(blob)
    got = np.asarray(fn(jnp.asarray(counts), jnp.asarray(fg)))
    assert (got[0, 0] > 0).all()     # mask wins over zero rows
    assert (got[0, -1] == 0).all()   # and over nonzero rows
    logits = g.apply(variables, jnp.asarray(counts), train=False)
    want = np.where(fg > 0, np.asarray(jnp.argmax(logits, -1)) + 1, 0)
    np.testing.assert_array_equal(got, want)


def test_register_batch_all_background_slides(sim):
    """A batch whose slides have ZERO in-tissue spots must register (all
    background), not die reshaping a 0-width spot axis."""
    import jax
    import jax.numpy as jnp

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    patch = 8
    x0 = jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST, patch, patch, 3))
    variables = g.init(jax.random.key(0), x0)
    registrar = SlideRegistrar.from_gridnet(
        g, variables, patch_size=patch, normalize=None, patch_chunk=None,
        use_pallas_corrector=False,
        corrector_apply=lambda gr: g.apply(
            variables, gr, train=False,
            method=lambda m, x, train: m.corrector(x, train=train)))

    pos = read_positions(sim["spaceranger_dir"]).copy()
    pos["in_tissue"] = 0
    wsis = jnp.zeros((2, 128, 128, 3), jnp.uint8)
    labels = registrar.register_batch(wsis, [pos, pos])
    assert labels.shape == (2, G.VISIUM_H_ST, G.VISIUM_W_ST)
    assert (labels == 0).all()


def test_registrar_requires_corrector():
    """Missing corrector weights fail at construction, not as max(())
    inside the first jit trace."""
    import pytest

    with pytest.raises(ValueError, match="corrector"):
        SlideRegistrar(lambda p: p.reshape(p.shape[0], -1)[:, :4])


def test_spot_pixel_arrays_drops_negative_oddr(sim):
    """Malformed array_col/array_row parity (col=0, odd row) converts to
    odd-right x = -1; it must be DROPPED, not wrap the scatter onto the
    last grid column (jnp .at[] wraps negatives even with mode='drop')."""
    import pandas as pd

    pos = read_positions(sim["spaceranger_dir"])
    bad = pd.DataFrame({"in_tissue": [1], "array_row": [1], "array_col": [0],
                        "pxl_row_in_fullres": [50], "pxl_col_in_fullres": [50]},
                       index=["BADBARCODE-1"])
    oy0, ox0, *_ = spot_pixel_arrays(pos)
    oy, ox, *_ = spot_pixel_arrays(pd.concat([pos, bad]))
    assert len(oy) == len(oy0)          # the malformed spot is gone
    assert ox.min() >= 0 and oy.min() >= 0


def test_single_slide_spot_counts_share_one_program(sim):
    """__call__ bucket-pads the spot axis (parked spots, mode='drop'
    scatters), so slides with different in-tissue counts reuse ONE
    compiled program instead of recompiling per count -- and padding does
    not change the labels."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    patch = 8
    x0 = jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST, patch, patch, 3))
    variables = g.init(jax.random.key(0), x0)
    registrar = SlideRegistrar.from_gridnet(
        g, variables, patch_size=patch, normalize=None, patch_chunk=None,
        use_pallas_corrector=False,
        corrector_apply=lambda grid: g.apply(
            variables, grid, train=False,
            method=lambda m, x, train: m.corrector(x, train=train)))

    wsi = jnp.asarray(np.asarray(Image.open(sim["image_file"])))
    pos = read_positions(sim["spaceranger_dir"])
    full = registrar(wsi, pos)

    # drop some in-tissue spots: a different foreground count in the same
    # _SPOT_BUCKET must not retrace, and the parked padding spots must not
    # leak into the label grid (the removed spots read as background; kept
    # labels may shift near removals -- the corrector sees new boundaries)
    fewer = pos[pos["in_tissue"].astype(int) == 1].iloc[:-7]
    sub = registrar(wsi, fewer)
    assert registrar._jitted._cache_size() == 1
    kept = np.zeros_like(full, bool)
    oy, ox, _, _ = spot_pixel_arrays(fewer)
    kept[oy, ox] = True
    assert (sub[kept] > 0).all()
    assert (sub[~kept] == 0).all()
    assert (full > 0).sum() == kept.sum() + 7
