"""The vendored Visium v1 slide template: whitelist integrity + reference
parity + pseudo-Visium wiring (VERDICT r3 #3).

The barcode <-> lattice correspondence is a manufactured 10x data asset
(it cannot be derived), so these tests pin three things: the asset's
internal invariants, row-for-row identity with the reference's packaged
template when the reference checkout is present, and that pseudo-Visium
arrays built from it are barcode-faithful through a Loupe CSV round trip.
"""

import os

import numpy as np
import pandas as pd
import pytest

from gridnext_tpu import geometry as G
from gridnext_tpu.data import (visium_v1_barcode_grid, visium_v1_scalefactors,
                               visium_v1_template)

_REF_TEMPLATE = "/root/reference/gridnext/visium_templates/tissue_positions.csv"


def test_template_invariants():
    df = visium_v1_template()
    assert len(df) == G.VISIUM_N_SPOTS == 4992
    assert df["barcode"].is_unique
    assert df["barcode"].str.match(r"^[ACGT]{16}-1$").all()
    # exact full pseudo-hex lattice: every (row, col) cell once
    pairs = set(zip(df["array_row"], df["array_col"]))
    want = {(r, 2 * c + (r % 2))
            for r in range(G.VISIUM_H_ST) for c in range(G.VISIUM_W_ST)}
    assert pairs == want
    # the pre-baked capture-area pattern the reference propagates
    assert set(df["in_tissue"].unique()) == {0, 1}
    assert int(df["in_tissue"].sum()) == 4525

    scale = visium_v1_scalefactors()
    assert set(scale) >= {"spot_diameter_fullres",
                          "fiducial_diameter_fullres",
                          "tissue_hires_scalef", "tissue_lowres_scalef"}
    assert 0 < scale["spot_diameter_fullres"] < scale[
        "fiducial_diameter_fullres"]


def test_barcode_grid_round_trip():
    grid = visium_v1_barcode_grid()
    assert grid.shape == (G.VISIUM_H_ST, G.VISIUM_W_ST)
    df = visium_v1_template()
    ox, oy = G.pseudo_hex_to_oddr(df["array_col"].to_numpy(),
                                  df["array_row"].to_numpy())
    # spot-check the inverse lookup across the frame
    for i in range(0, len(df), 997):
        assert grid[oy[i], ox[i]] == df["barcode"].iloc[i]
    # every cell assigned exactly once
    assert not pd.isnull(grid.ravel().tolist()).any()
    assert len(set(grid.ravel())) == G.VISIUM_N_SPOTS


@pytest.mark.skipif(not os.path.exists(_REF_TEMPLATE),
                    reason="reference checkout not present")
def test_template_matches_reference_row_for_row():
    ours = visium_v1_template()
    ref = pd.read_csv(_REF_TEMPLATE)
    pd.testing.assert_frame_equal(ours, ref)


def test_pseudo_visium_real_barcodes_loupe_round_trip(tmp_path):
    """pseudo_visium_from_image (default template) emits REAL barcodes;
    a Loupe export from its label grid re-imports barcode-faithfully
    against the template whitelist (imgprocess.py:294-349 parity)."""
    from PIL import Image

    from gridnext_tpu.data.simulate import pseudo_visium_from_image
    from gridnext_tpu.evaluate import to_loupe_annots
    from gridnext_tpu.io import read_positions

    img = np.random.default_rng(0).integers(0, 255, (600, 600, 3), np.uint8)
    img_path = tmp_path / "roi.jpg"
    Image.fromarray(img).save(img_path)
    srd = pseudo_visium_from_image(img_path, tmp_path / "pseudo",
                                   image_width_mm=8)

    pos = read_positions(srd)
    tmpl = visium_v1_template()
    assert len(pos) == G.VISIUM_N_SPOTS
    # real whitelist, template's in_tissue pattern, reference pixel formula
    assert set(pos.index) == set(tmpl["barcode"])
    merged = pos.reset_index(names="barcode").merge(
        tmpl, on="barcode", suffixes=("", "_t"))
    assert (merged["in_tissue"] == merged["in_tissue_t"]).all()
    assert (merged["array_row"] == merged["array_row_t"]).all()
    assert (merged["array_col"] == merged["array_col_t"]).all()
    px_per_mm = 600 / 8
    sw, sp = px_per_mm * 55 / 1000, px_per_mm * 100 / 1000
    ul = int(np.rint(0.75 * px_per_mm + sw / 2))
    want_col = np.rint(ul + merged["array_col"] / 2 * sp).astype(int)
    want_row = np.rint(ul + merged["array_row"] * sp * np.sqrt(3) / 2).astype(int)
    assert (merged["pxl_col_in_fullres"] == want_col).all()
    assert (merged["pxl_row_in_fullres"] == want_row).all()

    # scalefactors: reference rescale semantics
    import json

    with open(os.path.join(srd, "outs", "spatial",
                           "scalefactors_json.json")) as fh:
        scale = json.load(fh)
    base = visium_v1_scalefactors()
    assert scale["spot_diameter_fullres"] == pytest.approx(sw)
    assert scale["fiducial_diameter_fullres"] == pytest.approx(
        base["fiducial_diameter_fullres"] / base["spot_diameter_fullres"] * sw)

    # Loupe round trip: label every in-tissue spot, export, re-import; the
    # barcodes in the CSV must be the REAL whitelist entries
    grid = np.zeros((G.VISIUM_H_ST, G.VISIUM_W_ST), np.int64)
    ox, oy = G.pseudo_hex_to_oddr(pos["array_col"].to_numpy(),
                                 pos["array_row"].to_numpy())
    fg = pos["in_tissue"].to_numpy() == 1
    grid[oy[fg], ox[fg]] = 1 + (oy[fg] % 3)
    out_csv = tmp_path / "annots.csv"
    to_loupe_annots(grid, os.path.join(srd, "outs", "spatial",
                                       "tissue_positions.csv"),
                    str(out_csv), annot_names=["L1", "L2", "L3"])
    annots = pd.read_csv(out_csv)
    assert len(annots) == int(fg.sum())
    assert set(annots["Barcode"]) <= set(tmpl["barcode"])
    # and the labels land on the right barcodes via the whitelist grid
    bgrid = visium_v1_barcode_grid()
    lookup = dict(zip(annots["Barcode"], annots[annots.columns[1]]))
    names = np.array(["bg", "L1", "L2", "L3"])
    for i in range(0, int(fg.sum()), 511):
        y, x = oy[fg][i], ox[fg][i]
        assert lookup[bgrid[y, x]] == names[grid[y, x]]


def test_pseudo_visium_synthetic_mode(tmp_path):
    """template='synthetic' keeps the previous self-describing barcodes
    with every spot in-tissue."""
    from PIL import Image

    from gridnext_tpu.data.simulate import pseudo_visium_from_image
    from gridnext_tpu.io import read_positions

    img = np.zeros((200, 200, 3), np.uint8)
    img_path = tmp_path / "roi.jpg"
    Image.fromarray(img).save(img_path)
    srd = pseudo_visium_from_image(img_path, tmp_path / "pseudo",
                                   template="synthetic")
    pos = read_positions(srd)
    assert (pos["in_tissue"] == 1).all()
    assert pos.index.str.startswith("SYN").all()

    with pytest.raises(ValueError, match="template"):
        pseudo_visium_from_image(img_path, tmp_path / "p2", template="bogus")


def test_simulate_with_real_barcodes(tmp_path):
    """simulate_spaceranger_dir(barcodes='visium_v1') stamps the vendored
    whitelist; the fixture flows through the io layer and its annotation
    barcodes are real slide barcodes at the right lattice cells."""
    from gridnext_tpu.data import simulate_spaceranger_dir
    from gridnext_tpu.io import read_positions

    sim = simulate_spaceranger_dir(tmp_path / "arr", seed=0, n_genes=6,
                                   n_classes=2, barcodes="visium_v1")
    pos = read_positions(sim["spaceranger_dir"])
    tmpl = visium_v1_template()
    assert set(pos.index) == set(tmpl["barcode"])
    # annotation barcodes must be the whitelist entries of their cells
    import pandas as pd

    annots = pd.read_csv(sim["annot_file"])
    bgrid = visium_v1_barcode_grid()
    assert set(annots["Barcode"]) <= set(tmpl["barcode"])
    fg = np.argwhere(sim["label_grid"] > 0)
    whitelist_fg = {bgrid[y, x] for y, x in fg}
    assert set(annots["Barcode"]) == whitelist_fg

    with pytest.raises(ValueError, match="barcodes"):
        simulate_spaceranger_dir(tmp_path / "bad", barcodes="nope")
    with pytest.raises(ValueError, match="coordinate"):
        simulate_spaceranger_dir(tmp_path / "bad2", barcodes="visium_v1",
                                 spaceranger_version="hd")
