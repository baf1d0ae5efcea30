import os

import numpy as np
import pytest

from gridnext_tpu import geometry as G
from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir
from gridnext_tpu.io import (
    find_position_file,
    prepare_count_files,
    read_feature_matrix,
    read_feature_names,
    read_positions,
)


@pytest.fixture(scope="module")
def sim_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("visium")
    sims = [simulate_spaceranger_dir(root / f"array{i}", seed=i, n_genes=40,
                                     n_classes=3,
                                     spaceranger_version=2 if i % 2 == 0 else 1)
            for i in range(3)]
    return sims


def test_positions_roundtrip(sim_dirs):
    for sim in sim_dirs:
        pos = read_positions(sim["spaceranger_dir"])
        assert len(pos) == G.VISIUM_N_SPOTS
        assert set(["in_tissue", "array_row", "array_col",
                    "pxl_row_in_fullres", "pxl_col_in_fullres"]) <= set(pos.columns)
        assert pos["in_tissue"].sum() > 1000


def test_position_file_discovery_v1_v2(sim_dirs):
    # even sims are v2 (tissue_positions.csv), odd v1 (tissue_positions_list.csv)
    assert find_position_file(sim_dirs[0]["spaceranger_dir"]).endswith("tissue_positions.csv")
    assert find_position_file(sim_dirs[1]["spaceranger_dir"]).endswith("tissue_positions_list.csv")


def test_feature_matrix(sim_dirs):
    sim = sim_dirs[0]
    df = read_feature_matrix(sim["spaceranger_dir"])
    assert df.shape[0] == sim["n_genes"]
    assert (df.values >= 0).all()
    names = read_feature_names(sim["spaceranger_dir"])
    assert names.loc["ENSG00000", "gene_symbol"] == "Gene0"


def test_prepare_count_files_unifies_genes(sim_dirs):
    dirs = [s["spaceranger_dir"] for s in sim_dirs]
    written = prepare_count_files(dirs, minimum_detection_rate=None, verbose=False)
    assert len(written) == 3
    import pandas as pd
    frames = [pd.read_csv(w, sep="\t", index_col=0) for w in written]
    # same genes, same order, across all arrays
    for f in frames[1:]:
        assert list(f.index) == list(frames[0].index)
    # coordinate-string columns
    assert all("_" in c for c in frames[0].columns)


def test_count_grid_dataset_end_to_end(sim_dirs):
    dirs = [s["spaceranger_dir"] for s in sim_dirs]
    annots = [s["annot_file"] for s in sim_dirs]
    gdat = create_visium_dataset(dirs, use_count=True, use_image=False,
                                 spatial=True, annot_files=annots,
                                 minimum_detection_rate=None)
    assert len(gdat) == 3
    assert list(gdat.classes) == sim_dirs[0]["class_names"]
    x, y = gdat[0]
    assert x.shape[:2] == (G.VISIUM_H_ST, G.VISIUM_W_ST)
    assert x.shape[2] == sim_dirs[0]["n_genes"]
    # label grid must match the simulator's ground truth exactly
    np.testing.assert_array_equal(y, sim_dirs[0]["label_grid"])
    # counts only on foreground
    assert x[y == 0].sum() == 0
    assert x[y > 0].sum() > 0

    X, Y = gdat.materialize()
    assert X.shape == (3, G.VISIUM_H_ST, G.VISIUM_W_ST, sim_dirs[0]["n_genes"])
    assert Y.shape == (3, G.VISIUM_H_ST, G.VISIUM_W_ST)


def test_count_spot_dataset(sim_dirs):
    dirs = [s["spaceranger_dir"] for s in sim_dirs]
    annots = [s["annot_file"] for s in sim_dirs]
    pdat = create_visium_dataset(dirs, use_count=True, use_image=False,
                                 spatial=False, annot_files=annots,
                                 minimum_detection_rate=None)
    n_fg = sum((s["label_grid"] > 0).sum() for s in sim_dirs)
    assert len(pdat) == n_fg
    x, y = pdat[0]
    assert x.shape == (sim_dirs[0]["n_genes"],)
    assert 0 <= y < 3
    X, Y = pdat.materialize()
    assert X.shape == (n_fg, sim_dirs[0]["n_genes"])
    assert set(np.unique(Y)) <= {0, 1, 2}


def test_select_genes_subsetting(sim_dirs):
    dirs = [s["spaceranger_dir"] for s in sim_dirs]
    gdat = create_visium_dataset(dirs, use_count=True, use_image=False,
                                 spatial=True, annot_files=None,
                                 select_genes=["ENSG00003", "ENSG00007"],
                                 minimum_detection_rate=None)
    x, _ = gdat[0]
    assert x.shape[-1] == 2


def test_visium_hd_parquet_path(tmp_path):
    from gridnext_tpu.io import (find_feature_matrix_files, find_position_file,
                                 read_feature_matrix, read_positions)

    sim = simulate_spaceranger_dir(tmp_path / "hd", seed=0, n_genes=15,
                                   n_classes=3, spaceranger_version="hd")
    binning = "square_008um"
    pos_path = find_position_file(sim["spaceranger_dir"], hd_binning=binning)
    assert pos_path.endswith("tissue_positions.parquet")
    pos = read_positions(sim["spaceranger_dir"], hd_binning=binning)
    assert len(pos) == G.VISIUM_N_SPOTS
    assert pos.index.name == "barcode" or "in_tissue" in pos.columns

    files = find_feature_matrix_files(sim["spaceranger_dir"], hd_binning=binning)
    df = read_feature_matrix(individual_files=files)
    assert df.shape[0] == 15
    assert df.shape[1] == int(pos["in_tissue"].sum())


def test_visium_hd_end_to_end(tmp_path):
    """HD binned outputs -> create_visium_dataset(hd_binning=...) -> grids.

    The same seed simulated in v2 and HD layouts must produce identical
    count/label grids: only the storage format differs (parquet positions
    under outs/binned_outputs/<binning>, per-binning MEX; utils.py:253-287).
    """
    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir

    binning = "square_008um"
    sims_v2 = [simulate_spaceranger_dir(tmp_path / f"v2_{i}", seed=i, n_genes=25,
                                        n_classes=3) for i in range(2)]
    sims_hd = [simulate_spaceranger_dir(tmp_path / f"hd_{i}", seed=i, n_genes=25,
                                        n_classes=3, spaceranger_version="hd")
               for i in range(2)]

    # HD position files live under the binned output tree
    assert all(f"binned_outputs/{binning}" in s["position_file"].replace("\\", "/")
               for s in sims_hd)

    kw = dict(use_count=True, use_image=False, minimum_detection_rate=None)
    g_v2 = create_visium_dataset([s["spaceranger_dir"] for s in sims_v2],
                                 annot_files=[s["annot_file"] for s in sims_v2],
                                 spatial=True, **kw)
    g_hd = create_visium_dataset([s["spaceranger_dir"] for s in sims_hd],
                                 annot_files=[s["annot_file"] for s in sims_hd],
                                 spatial=True, hd_binning=binning, **kw)
    assert list(g_v2.classes) == list(g_hd.classes)
    for i in range(2):
        (xa, ya), (xb, yb) = g_v2[i], g_hd[i]
        np.testing.assert_array_equal(ya, yb)
        np.testing.assert_array_equal(xa, xb)

    # the per-binning cache name keeps binnings from colliding
    import glob as _glob
    caches = _glob.glob(str(tmp_path / "hd_0" / f"*{binning}*.unified.tsv.gz"))
    assert len(caches) == 1

    # spot-level path too
    s_hd = create_visium_dataset([s["spaceranger_dir"] for s in sims_hd],
                                 annot_files=[s["annot_file"] for s in sims_hd],
                                 spatial=False, hd_binning=binning, **kw)
    x0, y0 = s_hd[0]
    assert x0.shape == (25,) and int(y0) >= 0


def test_visium_hd_square_grids_end_to_end(tmp_path):
    """True square HD bin lattice -> grid_dims='auto' -> count+image+MM grids.

    The reference only reads HD positions (utils.py:253-287); square-lattice
    grid assembly and per-bin patch extraction are extensions certified here
    against the simulator's ground-truth label grid.
    """
    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir

    binning = "square_016um"
    hd_grid = (24, 20)
    sims = [simulate_spaceranger_dir(tmp_path / f"hd{i}", seed=i, n_genes=18,
                                     n_classes=3, spaceranger_version="hd",
                                     hd_grid=hd_grid, hd_binning=binning,
                                     image=True, spot_spacing_px=10)
            for i in range(2)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    imgs = [s["image_file"] for s in sims]

    # real-HD barcode naming
    pos = read_positions(dirs[0], hd_binning=binning)
    assert pos.index[0].startswith("s_016um_")
    assert len(pos) == hd_grid[0] * hd_grid[1]

    # count grids: auto-inferred square dims, labels == simulator truth
    gdat = create_visium_dataset(dirs, use_count=True, use_image=False,
                                 spatial=True, annot_files=annots,
                                 hd_binning=binning, grid_dims="auto",
                                 minimum_detection_rate=None)
    x, y = gdat[0]
    assert x.shape[:2] == hd_grid and x.shape[2] == 18
    np.testing.assert_array_equal(y, sims[0]["label_grid"])
    assert x[y == 0].sum() == 0 and x[y > 0].sum() > 0

    # image grids: per-bin patches gathered from the fullres image
    mm = create_visium_dataset(dirs, use_count=True, use_image=True,
                               spatial=True, annot_files=annots,
                               fullres_image_files=imgs, patch_size_px=8,
                               hd_binning=binning, grid_dims="auto",
                               minimum_detection_rate=None)
    (xi, xc), ym = mm[0]
    assert xi.shape == hd_grid + (8, 8, 3)
    assert xc.shape[:2] == hd_grid
    # foreground patches are the simulator's class-colored discs (non-white)
    fg = sims[0]["label_grid"] > 0
    assert (xi[fg].reshape(fg.sum(), -1).min(axis=1) < 0.9).mean() > 0.5
    np.testing.assert_array_equal(ym, sims[0]["label_grid"])

    # explicit (h, w) grid_dims and µm-sized patches agree with auto/px
    gdat2 = create_visium_dataset(dirs, use_count=True, use_image=False,
                                  spatial=True, annot_files=annots,
                                  hd_binning=binning, grid_dims=hd_grid,
                                  minimum_detection_rate=None)
    np.testing.assert_array_equal(gdat2[0][1], y)


def test_hd_distance_um_to_px(tmp_path):
    """µm->px inference on the HD square lattice: bins are bin-size µm apart."""
    from gridnext_tpu.data import simulate_spaceranger_dir
    from gridnext_tpu.pipeline import distance_um_to_px

    sim = simulate_spaceranger_dir(tmp_path / "hd", seed=0, n_genes=5,
                                   n_classes=2, spaceranger_version="hd",
                                   hd_grid=(12, 10), hd_binning="square_016um",
                                   image=True, spot_spacing_px=10)
    # 10 px between adjacent 16um bins -> 32 um spans 20 px
    px = distance_um_to_px(sim["spaceranger_dir"], 32.0,
                           hd_binning="square_016um")
    assert px == 20


def test_cli_hd_train_register_end_to_end(tmp_path, capsys):
    """CLI over Visium HD binned outputs: train-count --hd-binning + register."""
    import sys

    import pandas as pd

    from gridnext_tpu import cli
    from gridnext_tpu.data import simulate_spaceranger_dir

    sims = [simulate_spaceranger_dir(tmp_path / f"a{i}", seed=i, n_genes=20,
                                     n_classes=3, spaceranger_version="hd")
            for i in range(2)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]

    argv_bak = sys.argv
    try:
        sys.argv = (["x", "train-count", "--hd-binning", "square_008um",
                     "--spaceranger"] + dirs + ["--annots"] + annots +
                    ["--out", str(tmp_path / "model"), "--epochs", "1",
                     "--min-detection", "0"])
        cli.main()
        sys.argv = ["x", "register", "--spaceranger", dirs[0],
                    "--model", str(tmp_path / "model"),
                    "--out", str(tmp_path / "loupe.csv")]
        cli.main()
    finally:
        sys.argv = argv_bak
    df = pd.read_csv(tmp_path / "loupe.csv")
    assert len(df) > 1000 and set(df.columns) == {"Barcode", "AARs"}

    # count-model export: grid->labels forward serialized; the reloaded
    # artifact reproduces the register path's label grid exactly
    import json as _json

    import jax.numpy as jnp
    import numpy as np

    from gridnext_tpu.data import CountGridDataset
    from gridnext_tpu.io import unified_count_suffix
    from gridnext_tpu.serving import load_exported_registration

    art = tmp_path / "count.hlo"
    try:
        sys.argv = ["x", "export", "--model", str(tmp_path / "model"),
                    "--out", str(art)]
        cli.main()
    finally:
        sys.argv = argv_bak
    side = _json.loads((tmp_path / "count.hlo.json").read_text())
    meta = _json.loads((tmp_path / "model" / "model.json").read_text())
    assert side["grid_shapes"] == [[78, 64, meta["n_genes"]]]
    import os as _os

    cfile = _os.path.join(dirs[0], _os.path.basename(dirs[0].rstrip("/"))
                          + unified_count_suffix("square_008um"))
    x, _ = CountGridDataset([cfile])[0]
    x = np.log1p(x).astype(np.float32)
    fn = load_exported_registration(art.read_bytes())
    labels = np.asarray(fn(jnp.asarray(x[None])))[0]
    # the artifact must reproduce the register CSV's annotations exactly:
    # same foreground support AND same per-class counts
    from collections import Counter

    want = pd.read_csv(tmp_path / "loupe.csv")
    got_names = [side["classes"][v - 1] for v in labels[labels > 0]]
    assert int((labels > 0).sum()) == len(want)
    assert Counter(got_names) == Counter(want["AARs"])


def test_cli_hd_square_train_register_end_to_end(tmp_path):
    """CLI over a true square HD lattice: --grid-dims auto picks the
    Cartesian GridNet corrector; register writes direct-coordinate Loupe CSVs."""
    import sys

    import pandas as pd

    from gridnext_tpu import cli
    from gridnext_tpu.data import simulate_spaceranger_dir

    binning = "square_016um"
    sims = [simulate_spaceranger_dir(tmp_path / f"a{i}", seed=i, n_genes=16,
                                     n_classes=3, spaceranger_version="hd",
                                     hd_grid=(20, 16), hd_binning=binning)
            for i in range(2)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]

    argv_bak = sys.argv
    try:
        sys.argv = (["x", "train-count", "--hd-binning", binning,
                     "--grid-dims", "auto", "--spaceranger"] + dirs +
                    ["--annots"] + annots +
                    ["--out", str(tmp_path / "model"), "--epochs", "1",
                     "--min-detection", "0"])
        cli.main()
        sys.argv = ["x", "register", "--spaceranger", dirs[0],
                    "--model", str(tmp_path / "model"),
                    "--out", str(tmp_path / "loupe.csv")]
        cli.main()
    finally:
        sys.argv = argv_bak

    import json as _json
    meta = _json.loads((tmp_path / "model" / "model.json").read_text())
    assert meta["model"] == "GridNet+CountMLP"
    assert meta["grid_dims"] == [20, 16]

    df = pd.read_csv(tmp_path / "loupe.csv")
    assert set(df.columns) == {"Barcode", "AARs"}
    # every in-tissue bin exported, under real-HD barcode names
    assert len(df) == int((sims[0]["label_grid"] > 0).sum())
    assert df["Barcode"].str.startswith("s_016um_").all()


@pytest.mark.slow
def test_cli_hd_square_image_train_register_end_to_end(tmp_path):
    """CLI image flow on a square HD lattice: train-image --hd-binning
    --grid-dims auto (Cartesian GridNet g) then register from the slides."""
    import sys

    import pandas as pd

    from gridnext_tpu import cli
    from gridnext_tpu.data import simulate_spaceranger_dir

    binning = "square_016um"
    sims = [simulate_spaceranger_dir(tmp_path / f"a{i}", seed=i, n_genes=8,
                                     n_classes=3, spaceranger_version="hd",
                                     hd_grid=(14, 12), hd_binning=binning,
                                     image=True, spot_spacing_px=12)
            for i in range(2)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    imgs = [s["image_file"] for s in sims]

    argv_bak = sys.argv
    try:
        sys.argv = (["x", "train-image", "--hd-binning", binning,
                     "--grid-dims", "auto", "--f", "tpu",
                     "--patch-px", "32", "--spaceranger"] + dirs +
                    ["--annots"] + annots + ["--images"] + imgs +
                    ["--out", str(tmp_path / "model"), "--epochs", "1",
                     "--batch-size", "16"])
        cli.main()
        sys.argv = (["x", "register", "--spaceranger", dirs[0],
                     "--model", str(tmp_path / "model"),
                     "--images", imgs[0], "--mesh", "data=8",
                     "--out", str(tmp_path / "loupe.csv")])
        cli.main()
    finally:
        sys.argv = argv_bak

    import json as _json
    meta = _json.loads((tmp_path / "model" / "model.json").read_text())
    assert meta["model"] == "GridNet+TpuPatchClassifier"
    assert meta["grid_dims"] == [14, 12]
    # architecture recorded so register survives default-shape changes
    from gridnext_tpu.models import TpuPatchClassifier
    from gridnext_tpu.models.tpu_f import tpu_f_arch_meta

    assert meta["tpu_f"] == tpu_f_arch_meta(TpuPatchClassifier(n_classes=3))
    df = pd.read_csv(tmp_path / "loupe.csv")
    assert df["Barcode"].str.startswith("s_016um_").all()
    assert len(df) == int((sims[0]["label_grid"] > 0).sum())

    # export: the same trained model serialized as a StableHLO artifact,
    # reloaded with no model code, labels identical to the live registrar
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from gridnext_tpu.io import read_positions
    from gridnext_tpu.serving import load_exported_registration

    art = tmp_path / "reg.stablehlo"
    wsi = np.asarray(Image.open(imgs[0]))
    try:
        sys.argv = ["x", "export", "--model", str(tmp_path / "model"),
                    "--out", str(art), "--wsi-shape", str(wsi.shape[0]),
                    str(wsi.shape[1]), "--n-spots", "256"]
        cli.main()
    finally:
        sys.argv = argv_bak
    sidecar = _json.loads((tmp_path / "reg.stablehlo.json").read_text())
    assert sidecar["n_spots"] == 256 and sidecar["h_st"] == 14

    meta2, classes2, variables2 = cli._load_model_dir(str(tmp_path / "model"))
    reg = cli._image_registrar_from_meta(meta2, classes2, variables2)
    pos = read_positions(dirs[0], binning)
    want = reg(jnp.asarray(wsi), pos)
    fn = load_exported_registration(art.read_bytes())
    ins = reg.spot_inputs(wsi.shape, pos, 256)
    got = fn(jnp.asarray(wsi), *map(jnp.asarray, ins))
    np.testing.assert_array_equal(np.asarray(got), want)

    # serve-artifact: the no-model-code serving loop writes the same
    # registration as a Loupe CSV straight from the artifact
    try:
        sys.argv = ["x", "serve-artifact", "--artifact", str(art),
                    "--spaceranger", dirs[0], "--images", imgs[0],
                    "--out", str(tmp_path / "artifact_loupe.csv")]
        cli.main()
    finally:
        sys.argv = argv_bak
    df2 = pd.read_csv(tmp_path / "artifact_loupe.csv")
    assert len(df2) == int((np.asarray(want) > 0).sum())
    assert set(df2["AARs"]) <= set(sidecar["classes"])

    # hardening: broken deployment inputs exit with ACTIONABLE messages
    # before any slide decodes (not tracebacks mid-loop)
    import pytest

    def serve(artifact):
        sys.argv = ["x", "serve-artifact", "--artifact", str(artifact),
                    "--spaceranger", dirs[0], "--images", imgs[0],
                    "--out", str(tmp_path / "x.csv")]
        try:
            cli.main()
        finally:
            sys.argv = argv_bak

    orphan = tmp_path / "orphan.stablehlo"
    orphan.write_bytes(art.read_bytes())
    with pytest.raises(SystemExit, match="sidecar"):
        serve(orphan)                                   # sidecar missing
    (tmp_path / "orphan.stablehlo.json").write_text("{not json")
    with pytest.raises(SystemExit, match="not valid JSON"):
        serve(orphan)                                   # sidecar corrupt
    (tmp_path / "orphan.stablehlo.json").write_text('{"classes": []}')
    with pytest.raises(SystemExit, match="no n_spots"):
        serve(orphan)              # count/MM-grid sidecar: dedicated message
    (tmp_path / "orphan.stablehlo.json").write_text(
        '{"classes": [], "n_spots": 256}')
    with pytest.raises(SystemExit, match="missing required fields"):
        serve(orphan)                                   # schema incomplete
    bogus = tmp_path / "bogus.stablehlo"
    bogus.write_bytes(b"not an artifact")
    (tmp_path / "bogus.stablehlo.json").write_text(
        _json.dumps(sidecar))                           # valid sidecar...
    with pytest.raises(SystemExit, match="jax.export"):
        serve(bogus)                                    # ...garbage blob


def test_hd_square_binning_rejected_for_grids(tmp_path):
    """Square-binned HD positions must fail loudly at the factory, not
    overflow/alias inside grid assembly (code-review finding, round 2)."""
    import gzip

    import pytest

    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir

    binning = "square_008um"
    sim = simulate_spaceranger_dir(tmp_path / "a0", seed=0, n_genes=10,
                                   n_classes=3, spaceranger_version="hd")
    # rewrite positions as a real square HD binning: every (row, col) pair
    pq = (tmp_path / "a0" / "outs" / "binned_outputs" / binning / "spatial"
          / "tissue_positions.parquet")
    import pandas as pd

    pos = pd.read_parquet(pq)
    n = len(pos)
    side = int(np.ceil(np.sqrt(n)))
    pos["array_row"] = np.arange(n) // side
    pos["array_col"] = np.arange(n) % side  # both parities per row
    pos.to_parquet(pq, index=False)

    with pytest.raises(ValueError, match="pseudo-hex Visium lattice"):
        create_visium_dataset([sim["spaceranger_dir"]],
                              annot_files=[sim["annot_file"]], spatial=True,
                              use_count=True, use_image=False,
                              hd_binning=binning, minimum_detection_rate=None)

    with pytest.raises(NotImplementedError, match="use_image"):
        create_visium_dataset([sim["spaceranger_dir"]], spatial=True,
                              use_count=False, use_image=True,
                              patch_size_px=16, hd_binning=binning)


def test_prepare_count_files_returns_input_order(tmp_path):
    """Written paths must pair with the input spaceranger_dirs order --
    MultiIndex.levels iteration would silently sort them (round-2 review fix)."""
    from gridnext_tpu.io import prepare_count_files

    # names chosen so lexicographic order != input order
    simulate_spaceranger_dir(tmp_path / "zz", seed=0, n_genes=8, n_classes=2)
    simulate_spaceranger_dir(tmp_path / "aa", seed=1, n_genes=8, n_classes=2)
    written = prepare_count_files([str(tmp_path / "zz"), str(tmp_path / "aa")],
                                  minimum_detection_rate=None, verbose=False)
    assert [os.path.basename(w) for w in written] == [
        "zz.unified.tsv.gz", "aa.unified.tsv.gz"]


def test_mismatched_unified_caches_rejected(tmp_path):
    """Caches prepared in separate runs (different gene axes) must fail
    loudly at the factory, not train on misaligned genes (round-2 review fix)."""
    import pytest

    from gridnext_tpu.io import prepare_count_files

    s0 = simulate_spaceranger_dir(tmp_path / "a0", seed=0, n_genes=10, n_classes=2)
    s1 = simulate_spaceranger_dir(tmp_path / "a1", seed=1, n_genes=12, n_classes=2)
    # prepared separately -> different gene sets
    prepare_count_files([s0["spaceranger_dir"]], minimum_detection_rate=None,
                        verbose=False)
    prepare_count_files([s1["spaceranger_dir"]], minimum_detection_rate=None,
                        verbose=False)
    with pytest.raises(ValueError, match="gene axis"):
        create_visium_dataset([s0["spaceranger_dir"], s1["spaceranger_dir"]],
                              use_count=True, use_image=False, spatial=True,
                              minimum_detection_rate=None)


def test_sample_item_shapes(sim_dirs, tmp_path):
    """sample_item: shape-correct zero init samples without full grid
    assembly (count, image, and MM stack; streaming-trainer init path)."""
    dirs = [s["spaceranger_dir"] for s in sim_dirs]
    gdat = create_visium_dataset(dirs, use_count=True, use_image=False,
                                 spatial=True, minimum_detection_rate=None)
    s = gdat.sample_item()
    assert s.shape == gdat[0][0].shape and s.sum() == 0

    sim = simulate_spaceranger_dir(tmp_path / "img0", seed=0, n_genes=10,
                                   n_classes=3, image=True,
                                   spot_spacing_px=14)
    mm = create_visium_dataset([sim["spaceranger_dir"]],
                               annot_files=[sim["annot_file"]],
                               use_count=True, use_image=True, spatial=True,
                               fullres_image_files=[sim["image_file"]],
                               patch_size_px=8, minimum_detection_rate=None)
    si, sc = mm.sample_item()
    (xi, xc), _ = mm[0]
    assert si.shape == xi.shape and sc.shape == xc.shape


def test_mm_spot_dataset_factory(tmp_path):
    """Spot-level multimodal (use_count + use_image, spatial=False): the
    reference raises NotImplementedError (visium_datasets.py:126-127); our
    MMSpotDataset aligns modalities by coordinate key. Items must agree with
    the single-modality spot datasets for the same physical spot."""
    from gridnext_tpu.data.datasets import (CountSpotDataset, MMSpotDataset,
                                            PatchSpotDataset)

    sims = [simulate_spaceranger_dir(tmp_path / f"a{i}", seed=i, n_genes=20,
                                     n_classes=3, image=True,
                                     spot_spacing_px=10)
            for i in range(2)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    imgs = [s["image_file"] for s in sims]

    kw = dict(annot_files=annots, fullres_image_files=imgs, patch_size_px=8,
              minimum_detection_rate=None)
    mm = create_visium_dataset(dirs, use_count=True, use_image=True,
                               spatial=False, **kw)
    assert isinstance(mm, MMSpotDataset)
    assert len(mm) > 100
    (img0, cnt0), y0 = mm[0]
    assert img0.shape == (8, 8, 3) and cnt0.shape == (20,)

    # cross-check against the single-modality datasets at a shared coordinate
    counts = create_visium_dataset(dirs, use_count=True, use_image=False,
                                   spatial=False, annot_files=annots,
                                   minimum_detection_rate=None)
    images = create_visium_dataset(dirs, use_count=False, use_image=True,
                                   spatial=False, **kw)
    assert isinstance(counts, CountSpotDataset)
    assert isinstance(images, PatchSpotDataset)
    cf0, im0, cstr0 = mm._index[0]
    ci = counts._index.index((cf0, cstr0))
    xc, yc = counts[ci]
    np.testing.assert_array_equal(cnt0, xc)
    assert int(y0) == int(yc)
    ii = images.imgpath_mapping.index(im0)
    xi, yi = images[ii]
    np.testing.assert_array_equal(img0, xi)
    assert int(y0) == int(yi)

    # materialize() matches itemwise access and trains
    (XI, XC), Y = mm.materialize()
    assert XI.shape == (len(mm), 8, 8, 3) and XC.shape == (len(mm), 20)
    np.testing.assert_array_equal(XI[0], img0)
    np.testing.assert_array_equal(XC[0], cnt0)
    assert set(np.unique(Y)) <= {0, 1, 2}


def test_mm_ann_spot_dataset(tmp_path):
    """MMAnnSpotDataset == MMAnnDataset parity: per-spot ((img, count), y)
    from an imgpath-bearing AnnData (multimodal_datasets.py:41-70). Runs on
    a duck-typed AnnData (the class touches only X/obs/obsm), so the parity
    logic is exercised even without the anndata package."""
    from gridnext_tpu.io.anndata_io import MMAnnSpotDataset

    sim = simulate_spaceranger_dir(tmp_path / "a0", seed=0, n_genes=15,
                                   n_classes=3, image=True,
                                   spot_spacing_px=10)
    images = create_visium_dataset([sim["spaceranger_dir"]], use_count=False,
                                   use_image=True, spatial=False,
                                   annot_files=[sim["annot_file"]],
                                   fullres_image_files=[sim["image_file"]],
                                   patch_size_px=8)
    paths = images.imgpath_mapping
    n = len(paths)
    rng = np.random.default_rng(0)
    X = rng.poisson(2.0, size=(n, 15)).astype(np.float32)
    labels = np.asarray(["LayerA", "LayerB", "LayerC"])[
        rng.integers(0, 3, size=n)]

    class _Obs(dict):
        pass

    class _Adata:
        pass

    adata = _Adata()
    adata.obs = _Obs(annotation=labels, imgpath=paths)
    adata.X = X
    adata.obsm = {}

    ds = MMAnnSpotDataset(adata, obs_label="annotation")
    assert len(ds) == n > 100
    (img, cnt), y = ds[3]
    assert img.shape == (8, 8, 3) and cnt.shape == (15,)
    np.testing.assert_array_equal(cnt, X[3])
    assert list(ds.classes) == ["LayerA", "LayerB", "LayerC"]
    assert ds.classes[int(y)] == labels[3]
    x_img, _ = images[3]
    np.testing.assert_array_equal(img, x_img)

    (XI, XC), Y = ds.materialize()
    np.testing.assert_array_equal(XI[3], img)
    np.testing.assert_array_equal(XC, X)
    assert Y[3] == y

    # use_pcs slices obsm like the reference
    adata.obsm["X_pca"] = rng.normal(size=(n, 6)).astype(np.float32)
    ds_pcs = MMAnnSpotDataset(adata, obs_label="annotation", use_pcs=4)
    (_, cnt_pcs), _ = ds_pcs[5]
    np.testing.assert_array_equal(cnt_pcs, adata.obsm["X_pca"][5, :4])


def test_annotfile_second_column_nans_kept(sim_dirs, tmp_path):
    """A second, partially filled Loupe column (free-text notes) must not
    drop annotated spots: dropna only applies to the position join."""
    import pandas as pd

    from gridnext_tpu.io.annotations import read_annotfile

    sim = sim_dirs[0]
    coords0, annots0 = read_annotfile(sim["annot_file"],
                                      position_file=sim["position_file"])
    df = pd.read_csv(sim["annot_file"], header=0, index_col=0)
    df["Notes"] = pd.Series([None] * len(df), index=df.index, dtype=object)
    df.iloc[0, df.columns.get_loc("Notes")] = "checked"
    two_col = tmp_path / "two_col.csv"
    df.to_csv(two_col)
    coords1, annots1 = read_annotfile(str(two_col),
                                      position_file=sim["position_file"])
    assert list(coords1) == list(coords0)
    np.testing.assert_array_equal(annots1, annots0)


def test_union_classes_memoized(sim_dirs, monkeypatch):
    from gridnext_tpu.io import annotations as A

    afiles = [s["annot_file"] for s in sim_dirs]
    pfiles = [s["position_file"] for s in sim_dirs]
    A._UNION_CACHE.clear()
    first = A.union_classes(afiles, pfiles)

    calls = {"n": 0}
    real = A.read_annotfile

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(A, "read_annotfile", counting)
    again = A.union_classes(afiles, pfiles)  # cache hit: no re-reads
    np.testing.assert_array_equal(again, first)
    assert calls["n"] == 0
    # mutating the returned array must not poison the cache
    again[0] = "ZZZ"
    np.testing.assert_array_equal(A.union_classes(afiles, pfiles), first)
    # touching an annotation file invalidates
    os.utime(afiles[0])
    A.union_classes(afiles, pfiles)
    assert calls["n"] == len(afiles)


def test_patch_file_discovery_ignores_stray_suffixes(tmp_path):
    from gridnext_tpu.data.datasets import _matched_patch_files

    d = tmp_path / "cache"
    d.mkdir()
    (d / "slide_10_12.jpg").write_bytes(b"x")
    (d / "slide_10_12.jpg.bak").write_bytes(b"x")
    (d / "slide_10_13.jpgX").write_bytes(b"x")
    names, coords = _matched_patch_files(str(d), "jpg")
    assert names == ["slide_10_12.jpg"] and coords == [(10, 12)]


def test_unified_cache_path_matches_prepare_contract(tmp_path):
    """unified_cache_path is the one source of the `.unified.tsv.gz`
    naming scheme (visium_datasets.py:69): it must name exactly the file
    prepare_count_files writes, for plain Visium and per-binning HD."""
    from gridnext_tpu.io import unified_cache_path, unified_count_suffix

    srd = str(tmp_path / "arrayA")
    assert unified_cache_path(srd) == os.path.join(
        srd, "arrayA.unified.tsv.gz")
    # trailing slash and Path inputs normalize identically
    assert unified_cache_path(srd + "/") == unified_cache_path(srd)
    from pathlib import Path as _P
    assert unified_cache_path(_P(srd)) == unified_cache_path(srd)
    # HD binning threads through the suffix helper
    assert unified_cache_path(srd, "016um") == os.path.join(
        srd, "arrayA" + unified_count_suffix("016um"))


def test_image_registrar_from_meta_forwards_patch_chunk():
    """register/export must serve with the TRAINING-time patch_chunk
    (meta['patch_chunk']) -- a model trained with a small chunk so f
    activations fit HBM would otherwise OOM at serving with the 624
    default."""
    import jax
    import jax.numpy as jnp

    from gridnext_tpu import cli
    from gridnext_tpu.models import GridNetHex, TpuPatchClassifier

    classes = ["a", "b", "c"]
    f = TpuPatchClassifier(n_classes=len(classes), stages=((128, 1),),
                           stem_patch=8, norm="rms")
    g = GridNetHex(patch_classifier=f, n_classes=len(classes))
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1, 4, 4, 16, 16, 3), jnp.float32))
    from gridnext_tpu.models.tpu_f import tpu_f_arch_meta

    meta = {"model": "GridNetHex+TpuPatchClassifier",
            "tpu_f": tpu_f_arch_meta(f), "patch_px": 16, "patch_chunk": 48}
    reg = cli._image_registrar_from_meta(meta, classes, variables)
    assert reg.patch_chunk == 48
    # absent key keeps the serving default
    meta.pop("patch_chunk")
    assert cli._image_registrar_from_meta(meta, classes,
                                          variables).patch_chunk == 624


def test_patch_spot_dataset_ignores_stray_jpgs(tmp_path):
    """PatchSpotDataset discovery enforces the *_{col}_{row}.{ext} filename
    contract in BOTH branches: a stray thumbnail.jpg in a patch dir must not
    become a (wrong-shape) dataset item."""
    import numpy as np
    from PIL import Image

    from gridnext_tpu.data.datasets import PatchSpotDataset

    imdir = tmp_path / "arr_patches8px"
    imdir.mkdir()
    rng = np.random.default_rng(0)
    for col, row in [(10, 0), (11, 1), (12, 2)]:
        Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(
            imdir / f"arr_{col}_{row}.jpg")
    # stray non-patch JPEG with a different shape
    Image.fromarray(np.zeros((40, 64, 3), np.uint8)).save(
        imdir / "thumbnail.jpg")

    ds = PatchSpotDataset([str(imdir)])
    assert len(ds) == 3
    xs, ys = ds.materialize()          # would np.stack-fail with the stray
    assert xs.shape == (3, 8, 8, 3)


def test_numeric_loupe_labels_encode_uniformly(tmp_path):
    """Integer cluster IDs must map to ONE class name whether or not an
    array's label column carried NaNs (float64 coercion would otherwise
    split cluster '1' into classes '1' and '1.0')."""
    import pandas as pd

    from gridnext_tpu.data import simulate_spaceranger_dir
    from gridnext_tpu.io import find_position_file
    from gridnext_tpu.io.annotations import read_annotfile, union_classes

    sim = simulate_spaceranger_dir(tmp_path / "arr", seed=0, n_genes=5,
                                   n_classes=2)
    pf = find_position_file(sim["spaceranger_dir"])
    pos = pd.read_csv(pf, header=None if "list" not in str(pf) else 0)
    import gzip

    # barcodes from the positions file (v2 headered or v1 headerless)
    from gridnext_tpu.io.spaceranger import read_positions_file

    barcodes = list(read_positions_file(pf).index[:4])
    full = tmp_path / "full.csv"       # fully annotated -> int64 column
    pd.DataFrame({"Barcode": barcodes, "AARs": [1, 2, 1, 2]}).to_csv(
        full, index=False)
    gappy = tmp_path / "gappy.csv"     # one blank -> float64 column
    pd.DataFrame({"Barcode": barcodes,
                  "AARs": [1, 2, None, 2]}).to_csv(gappy, index=False)

    _, a_full = read_annotfile(str(full), position_file=pf)
    _, a_gappy = read_annotfile(str(gappy), position_file=pf)
    assert set(a_full) == {"1", "2"}
    assert set(a_gappy) == {"1", "2"}          # NOT {'1.0', '2.0'}
    classes = union_classes([str(full), str(gappy)], [pf, pf])
    assert list(classes) == ["1", "2"]


def test_prepare_count_files_hd_default_suffix(tmp_path):
    """prepare_count_files(hd_binning=...) must write the BIN-TAGGED cache
    name by default -- the untagged name would be invisible to
    unified_cache_path yet silently adopted by a later non-HD factory
    call."""
    from gridnext_tpu.data import simulate_spaceranger_dir
    from gridnext_tpu.io import unified_cache_path
    from gridnext_tpu.io.unify import prepare_count_files

    sim = simulate_spaceranger_dir(tmp_path / "hd", seed=0, n_genes=5,
                                   n_classes=2, spaceranger_version="hd",
                                   hd_binning="square_008um")
    written = prepare_count_files([sim["spaceranger_dir"]],
                                  minimum_detection_rate=None, verbose=False,
                                  hd_binning="square_008um")
    assert written[0] == unified_cache_path(sim["spaceranger_dir"],
                                            "square_008um")
    assert "square_008um" in written[0]


def test_array_name_handles_dot_paths(tmp_path, monkeypatch):
    """THE per-array name rule: '.', trailing slashes, and plain paths all
    yield the real directory name, so the unified-cache path a writer
    builds is the same one every reader builds (unified_cache_path is the
    single contract; Path('.').name == '' used to silently split them)."""
    from gridnext_tpu.io.unify import array_name, unified_cache_path

    d = tmp_path / "a0"
    d.mkdir()
    assert array_name(str(d)) == "a0"
    assert array_name(str(d) + "/") == "a0"
    monkeypatch.chdir(d)
    assert array_name(".") == "a0"
    assert unified_cache_path(".") == os.path.join(".", "a0.unified.tsv.gz")


def test_load_count_dataset_rejects_misaligned_gene_axes(tmp_path):
    """Splotch-style count files with different gene axes fail loudly at
    load instead of stacking feature-scrambled spot vectors."""
    import pandas as pd

    from gridnext_tpu.data.datasets import load_count_dataset

    a = tmp_path / "a.tsv"
    b = tmp_path / "b.tsv"
    pd.DataFrame([[1, 2]], index=["g1"], columns=["1_1", "2_2"]).to_csv(
        a, sep="\t")
    pd.DataFrame([[3, 4]], index=["g2"], columns=["1_1", "2_2"]).to_csv(
        b, sep="\t")
    with pytest.raises(ValueError, match="gene axis"):
        load_count_dataset([str(a), str(b)])
