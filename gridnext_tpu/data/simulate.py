"""Pseudo-Visium simulation: fabricate complete Spaceranger-shaped fixtures.

Generalizes the reference's ``pseudo_visium_spots`` (imgprocess.py:294-349),
which fills packaged templates. We *generate* the full 78x64 lattice instead
of shipping a barcode template: synthetic barcodes, v2-format
``tissue_positions.csv``, ``scalefactors_json.json``, a sparse MEX count
matrix, a Loupe annotation CSV, and (optionally) a fullres tissue image whose
color varies smoothly with position -- enough to exercise every io/data/model
path in this package with zero downloads.
"""

from __future__ import annotations

import gzip
import json
import os
from pathlib import Path

import numpy as np

from gridnext_tpu import geometry


def lattice_positions(h_st: int = geometry.VISIUM_H_ST,
                      w_st: int = geometry.VISIUM_W_ST):
    """All (barcode, array_col, array_row) for the full lattice."""
    rows = np.repeat(np.arange(h_st), w_st)
    cols_oddr = np.tile(np.arange(w_st), h_st)
    col, row = geometry.oddr_to_pseudo_hex(cols_oddr, rows)
    barcodes = np.array([f"SYN{c:03d}X{r:03d}-1" for c, r in zip(col, row)])
    return barcodes, col, row


def simulate_spaceranger_dir(dest_dir, *, n_genes: int = 60, n_classes: int = 4,
                             seed: int = 0, tissue_fraction: float = 0.6,
                             image: bool = False, spot_spacing_px: int = 12,
                             spaceranger_version: int = 2,
                             gene_names=None, hd_grid=None,
                             hd_binning: str = "square_008um",
                             barcodes: str = "synthetic"):
    """Create ``dest_dir`` as a fake Spaceranger output directory.

    The simulated tissue is an ellipse; annotation classes are concentric
    bands within it (spatially coherent, so a corrector has signal to use).
    Per-class gene expression is drawn from class-specific Poisson rates so a
    spot classifier can learn, too.

    ``spaceranger_version="hd"`` writes the Visium HD binned-output layout
    (``outs/binned_outputs/<hd_binning>``: parquet positions + per-binning
    MEX, utils.py:253-287). By default the HD fixture reuses the 78x64
    pseudo-hex lattice (format-only HD: same grids as v2 for a given seed);
    pass ``hd_grid=(h, w)`` for a *true square* HD bin lattice -- direct
    ``array_row``/``array_col`` indices with both column parities per row,
    real-HD barcode names, and a ``(h, w)`` label grid.

    ``barcodes='visium_v1'`` stamps the REAL Visium v1 slide whitelist
    (the vendored template, :mod:`gridnext_tpu.data.template`) onto the
    lattice instead of synthetic ``SYN...`` names, so fixture Loupe CSVs
    re-import against actual slide barcodes (v1/v2 layouts only -- HD
    barcodes are coordinate-derived by Spaceranger itself).

    Returns a dict with paths and the ground-truth label grid.
    """
    if not 0 < tissue_fraction <= 1:
        # fraction 0 would divide by zero in the ellipse and emit a corrupt
        # zero-barcode MEX fixture (a blank-line barcodes.tsv.gz)
        raise ValueError(f"tissue_fraction must be in (0, 1]; "
                         f"got {tissue_fraction}")
    rng = np.random.default_rng(seed)
    dest = Path(dest_dir)
    spatial = dest / "outs" / "spatial"
    # NOTE: the non-HD matrix dir is created lazily below -- real HD output
    # has no outs/filtered_feature_bc_matrix (only the binned_outputs one),
    # and the fixture layout must match what Spaceranger actually writes
    matdir = dest / "outs" / "filtered_feature_bc_matrix"
    spatial.mkdir(parents=True, exist_ok=True)

    if hd_grid is not None and spaceranger_version != "hd":
        raise ValueError("hd_grid requires spaceranger_version='hd'")
    if hd_grid is not None:
        if barcodes != "synthetic":
            raise ValueError("barcodes='visium_v1' applies to the Visium "
                             "pseudo-hex lattice; HD bin barcodes are "
                             "coordinate-derived")
        # True square HD bin lattice: direct row/col indices, unit spacing.
        h_st, w_st = int(hd_grid[0]), int(hd_grid[1])
        row = np.repeat(np.arange(h_st), w_st)
        col = np.tile(np.arange(w_st), h_st)
        um = hd_binning.split("_")[-1]  # 'square_008um' -> '008um'
        barcodes = np.array([f"s_{um}_{r:05d}_{c:05d}-1"
                             for r, c in zip(row, col)])
        xs, ys = col.astype(float), row.astype(float)
    else:
        h_st, w_st = geometry.VISIUM_H_ST, geometry.VISIUM_W_ST
        bc_syn, col, row = lattice_positions()
        if barcodes == "visium_v1":
            if spaceranger_version == "hd":
                raise ValueError("barcodes='visium_v1' applies to v1/v2 "
                                 "layouts (HD barcodes are coordinate-"
                                 "derived)")
            from gridnext_tpu.data.template import visium_v1_barcode_grid

            grid_bc = visium_v1_barcode_grid()
            ox_all, oy_all = geometry.pseudo_hex_to_oddr(col, row)
            barcodes = grid_bc[oy_all, ox_all].astype(str)
        elif barcodes == "synthetic":
            barcodes = bc_syn
        else:
            raise ValueError(f"barcodes must be 'synthetic' or "
                             f"'visium_v1'; got {barcodes!r}")
        xs, ys = geometry.pseudo_to_true_hex(col, row)

    # Elliptical tissue mask around the array center.
    cx, cy = np.mean(xs), np.mean(ys)
    rx = (xs.max() - xs.min()) / 2 * tissue_fraction
    ry = (ys.max() - ys.min()) / 2 * tissue_fraction
    r2 = ((xs - cx) / rx) ** 2 + ((ys - cy) / ry) ** 2
    in_tissue = (r2 <= 1.0).astype(int)

    # Concentric annotation bands 1..n_classes (0 reserved for background).
    band = np.minimum((np.sqrt(r2) * n_classes).astype(int), n_classes - 1)
    labels = np.where(in_tissue == 1, band + 1, 0)

    # Pixel coordinates on a fake fullres image.
    margin = 2 * spot_spacing_px
    px_col = np.rint(xs * spot_spacing_px + margin).astype(int)
    px_row = np.rint(ys * spot_spacing_px + margin).astype(int)

    # --- tissue_positions file -------------------------------------------
    import pandas as pd

    pos = pd.DataFrame({
        "barcode": barcodes, "in_tissue": in_tissue,
        "array_row": row, "array_col": col,
        "pxl_row_in_fullres": px_row, "pxl_col_in_fullres": px_col,
    })
    if isinstance(spaceranger_version, str) and spaceranger_version != "hd":
        raise ValueError(
            f"spaceranger_version must be 1, 2, or 'hd'; got {spaceranger_version!r}")
    if spaceranger_version == "hd":
        # Visium HD layout: binned outputs with parquet positions
        bin_spatial = dest / "outs" / "binned_outputs" / hd_binning / "spatial"
        bin_spatial.mkdir(parents=True, exist_ok=True)
        pos_path = bin_spatial / "tissue_positions.parquet"
        pos.to_parquet(pos_path, index=False)
        matdir = (dest / "outs" / "binned_outputs" / hd_binning /
                  "filtered_feature_bc_matrix")
        matdir.mkdir(parents=True, exist_ok=True)
    elif spaceranger_version >= 2:
        pos_path = spatial / "tissue_positions.csv"
        pos.to_csv(pos_path, index=False)
    else:
        pos_path = spatial / "tissue_positions_list.csv"
        pos.to_csv(pos_path, index=False, header=False)

    # --- scalefactors ------------------------------------------------------
    scale = {"spot_diameter_fullres": spot_spacing_px * 0.55,
             "fiducial_diameter_fullres": spot_spacing_px * 0.85,
             "tissue_hires_scalef": 0.1, "tissue_lowres_scalef": 0.03}
    with open(spatial / "scalefactors_json.json", "w") as fh:
        json.dump(scale, fh)

    # --- MEX count matrix (in-tissue barcodes only, like Spaceranger) ------
    keep = in_tissue == 1
    kept_barcodes = barcodes[keep]
    if not len(kept_barcodes):
        # degenerate lattice (e.g. a 1xN hd_grid whose ellipse collapses):
        # refuse rather than write a fixture readers can't parse
        raise ValueError("simulated tissue ellipse contains no spots; "
                         "increase tissue_fraction or the grid size")
    # class gene signatures are a property of the TISSUE, not the array:
    # a fixed rng makes them consistent across simulated arrays so
    # cross-array train/val generalization is meaningful
    sig_rng = np.random.default_rng(20260816 + n_genes * 1000 + n_classes)
    rates = sig_rng.gamma(2.0, 2.0, size=(n_classes, n_genes))
    counts = rng.poisson(rates[labels[keep] - 1])  # (n_spots, n_genes)

    gene_ids = [f"ENSG{i:05d}" for i in range(n_genes)]
    if gene_names is None:
        gene_names = [f"Gene{i}" for i in range(n_genes)]
    elif len(gene_names) != n_genes:
        raise ValueError(
            f"gene_names has {len(gene_names)} entries, expected {n_genes}")
    matdir.mkdir(parents=True, exist_ok=True)
    with gzip.open(matdir / "features.tsv.gz", "wt") as fh:
        for gid, gname in zip(gene_ids, gene_names):
            fh.write(f"{gid}\t{gname}\tGene Expression\n")
    with gzip.open(matdir / "barcodes.tsv.gz", "wt") as fh:
        fh.write("\n".join(kept_barcodes) + "\n")

    nz = np.nonzero(counts.T)  # MEX is (genes x barcodes)
    with gzip.open(matdir / "matrix.mtx.gz", "wt") as fh:
        fh.write("%%MatrixMarket matrix coordinate integer general\n%\n")
        fh.write(f"{n_genes} {len(kept_barcodes)} {len(nz[0])}\n")
        for g, b in zip(*nz):
            fh.write(f"{g + 1} {b + 1} {counts[b, g]}\n")

    # --- Loupe annotation CSV ----------------------------------------------
    class_names = [f"Layer{i + 1}" for i in range(n_classes)]
    # distinct per-array basename: downstream converters key files by name
    annot_path = dest / f"{dest.name}_annotations.csv"
    with open(annot_path, "w") as fh:
        fh.write("Barcode,AARs\n")
        for b, l in zip(barcodes[keep], labels[keep]):
            fh.write(f"{b},{class_names[l - 1]}\n")

    # --- optional fullres image ---------------------------------------------
    img_path = None
    if image:
        from PIL import Image

        W = int(px_col.max() + margin)
        H = int(px_row.max() + margin)
        img = np.full((H, W, 3), 255, dtype=np.uint8)
        # paint class-colored discs at spot centers. Class colors are a
        # property of the TISSUE like the gene signatures above: a fixed rng
        # keeps Layer_k the same color on every simulated array, so
        # cross-array image train/val generalization is meaningful
        pal_rng = np.random.default_rng(20260816 + n_classes)
        palette = (np.stack([pal_rng.permutation(256)[:n_classes]
                             for _ in range(3)], 1)).astype(np.uint8)
        rad = spot_spacing_px // 2
        for x0, y0, l in zip(px_col[keep], px_row[keep], labels[keep]):
            img[max(0, y0 - rad):y0 + rad, max(0, x0 - rad):x0 + rad] = palette[l - 1]
        # per-array basename: save_visium_patches_all keys subdirs by image stem
        img_path = dest / f"{dest.name}_fullres.jpg"
        Image.fromarray(img).save(img_path, "JPEG", quality=95)

    label_grid = np.zeros((h_st, w_st), dtype=np.int64)
    if hd_grid is not None:
        label_grid[row, col] = labels
    else:
        ox, oy = geometry.pseudo_hex_to_oddr(col, row)
        label_grid[oy, ox] = labels

    return {
        "spaceranger_dir": str(dest),
        "position_file": str(pos_path),
        "annot_file": str(annot_path),
        "image_file": str(img_path) if img_path else None,
        "label_grid": label_grid,
        "class_names": class_names,
        "n_genes": n_genes,
    }


def pseudo_visium_from_image(fullres_roi, dest_dir, image_width_mm: float = 8,
                             spot_width_um: float = 55,
                             spot_spacing_um: float = 100,
                             template: str = "visium_v1") -> str:
    """Simulate Visium files for an arbitrary cropped tissue image.

    Writes ``<dest>/<image_stem>/outs/spatial/{tissue_positions.csv,
    scalefactors_json.json}`` placing the full 78x64 lattice over the image
    ROI -- the reference's ``pseudo_visium_spots`` (imgprocess.py:294-349).

    ``template='visium_v1'`` (default, reference parity) fills the packaged
    REAL slide template (:func:`gridnext_tpu.data.template.visium_v1_template`):
    actual Visium v1 barcodes -- so Loupe CSV exports from the pseudo array
    re-import against a real barcode whitelist -- the template's pre-baked
    in_tissue pattern, and its scalefactors rescaled to the simulated spot
    width (imgprocess.py:309-341 semantics). ``template='synthetic'``
    generates ``SYN...`` barcodes with every spot in-tissue (no whitelist,
    but self-describing coordinates).

    Returns the created pseudo-Spaceranger directory.
    """
    import pandas as pd
    from PIL import Image

    img = np.asarray(Image.open(fullres_roi))
    w_px = img.shape[0]  # reference uses the first dim as width (:321-322)

    px_per_mm = w_px / image_width_mm
    spot_width_px = px_per_mm * spot_width_um / 1000
    spot_space_px = px_per_mm * spot_spacing_um / 1000

    ul = int(np.rint(0.75 * px_per_mm + spot_width_px / 2))

    if template == "visium_v1":
        from gridnext_tpu.data.template import (visium_v1_scalefactors,
                                                visium_v1_template)

        pos = visium_v1_template()
        barcodes = pos["barcode"].to_numpy()
        col = pos["array_col"].to_numpy()
        row = pos["array_row"].to_numpy()
        in_tissue = pos["in_tissue"].to_numpy()
        scale = visium_v1_scalefactors()
        # reference semantics (imgprocess.py:337-338): rescale the fiducial
        # by the simulated/template spot-width ratio, then set the width
        scale["fiducial_diameter_fullres"] = (
            scale["fiducial_diameter_fullres"]
            / scale["spot_diameter_fullres"] * spot_width_px)
        scale["spot_diameter_fullres"] = spot_width_px
    elif template == "synthetic":
        barcodes, col, row = lattice_positions()
        in_tissue = np.ones(len(barcodes), int)
        scale = {"spot_diameter_fullres": spot_width_px,
                 "fiducial_diameter_fullres": spot_width_px * 85 / 55,
                 "tissue_hires_scalef": 0.1, "tissue_lowres_scalef": 0.03}
    else:
        raise ValueError(f"template must be 'visium_v1' or 'synthetic'; "
                         f"got {template!r}")
    # one canonical hex formula: pseudo-hex -> unit-spacing Cartesian, then
    # scale by the spot pitch (geometry.py owns col/2 and row*sqrt(3)/2)
    x_hex, y_hex = geometry.pseudo_to_true_hex(col, row)
    pos = pd.DataFrame({
        "barcode": barcodes,
        "in_tissue": in_tissue,
        "array_row": row,
        "array_col": col,
        "pxl_row_in_fullres": np.rint(ul + y_hex * spot_space_px).astype(int),
        "pxl_col_in_fullres": np.rint(ul + x_hex * spot_space_px).astype(int),
    })

    arr_name = Path(fullres_roi).stem.replace(" ", "_")
    out_dir = Path(dest_dir) / arr_name / "outs" / "spatial"
    out_dir.mkdir(parents=True, exist_ok=True)
    pos.set_index("barcode").to_csv(out_dir / "tissue_positions.csv")
    with open(out_dir / "scalefactors_json.json", "w") as fh:
        json.dump(scale, fh)
    return str(Path(dest_dir) / arr_name)
