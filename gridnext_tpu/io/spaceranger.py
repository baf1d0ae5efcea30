"""Host-side Spaceranger output readers.

File-format contracts preserved from the reference (these ARE the product):

* position files -- Spaceranger v1 headerless CSV (`tissue_positions_list.csv`),
  v2 headered CSV (`tissue_positions.csv`), and Visium HD parquet under
  ``outs/binned_outputs/<binning>/spatial`` (utils.py:247-287).
* feature-barcode matrix -- MEX triplet {matrix.mtx.gz, features.tsv.gz,
  barcodes.tsv.gz} discovered anywhere below the directory
  (utils.py:290-313, visium_datasets.py:178-205).
"""

from __future__ import annotations

import csv
import glob
import gzip
import os
from typing import Mapping, Optional

import pandas as pd

_V1_COLUMNS = ["in_tissue", "array_row", "array_col",
               "pxl_row_in_fullres", "pxl_col_in_fullres"]


def find_position_file(spaceranger_dir, hd_binning: Optional[str] = None) -> str:
    """Locate the tissue-positions file for an array (v1/v2/HD)."""
    if hd_binning is not None:
        pos_path = os.path.join(spaceranger_dir, "outs", "binned_outputs",
                                hd_binning, "spatial", "tissue_positions.parquet")
        if not os.path.exists(pos_path):
            raise ValueError(
                f"Cannot locate position file for {hd_binning} binning of {spaceranger_dir}")
        return pos_path

    # sorted: deterministic across filesystems, and when a re-processed dir
    # holds both layouts, 'tissue_positions.csv' (v2) sorts before
    # 'tissue_positions_list.csv' (v1) so the newer format wins
    for pos_path in sorted(glob.glob(os.path.join(str(spaceranger_dir),
                                                  "**", "*.csv"),
                           recursive=True)):
        if "tissue_positions" in os.path.basename(pos_path):
            return pos_path
    raise ValueError(f"Cannot locate position file for {spaceranger_dir}")


def read_positions_file(position_file) -> pd.DataFrame:
    """Read a positions file into a barcode-indexed DataFrame.

    Columns: in_tissue, array_row, array_col, pxl_row_in_fullres,
    pxl_col_in_fullres. Spaceranger version is sniffed from the header
    (utils.py:253-270).
    """
    position_file = str(position_file)
    if position_file.endswith(".parquet"):
        return pd.read_parquet(position_file).set_index("barcode")

    with open(position_file, "r") as fh:
        first = fh.readline()
    if first.startswith("barcode"):  # Spaceranger >= 2.0
        return pd.read_csv(position_file, index_col=0, header=0)
    return pd.read_csv(position_file, index_col=0, header=None, names=_V1_COLUMNS)


def read_positions(spaceranger_dir, hd_binning: Optional[str] = None) -> pd.DataFrame:
    """Positions DataFrame for an array: find + read in one call."""
    return read_positions_file(find_position_file(spaceranger_dir, hd_binning))


def find_feature_matrix_files(spaceranger_dir, hd_binning: Optional[str] = None) -> dict:
    """Locate {matrix, features, barcodes} MEX files below a directory."""
    values = {"matrix": "matrix.mtx.gz", "features": "features.tsv.gz",
              "barcodes": "barcodes.tsv.gz"}
    found = {}
    if hd_binning is not None:
        mat_dir = os.path.join(spaceranger_dir, "outs", "binned_outputs",
                               hd_binning, "filtered_feature_bc_matrix")
        for k, v in values.items():
            p = os.path.join(mat_dir, v)
            if os.path.exists(p):
                found[k] = p
    else:
        # deterministic order, and prefer the filtered matrix when a raw one
        # sits alongside it (real Spaceranger outs/ has both; loading raw
        # would silently include out-of-tissue barcodes)
        paths = sorted(glob.glob(os.path.join(str(spaceranger_dir), "**"),
                                 recursive=True),
                       key=lambda s: ("filtered_feature_bc_matrix" not in s, s))
        for k, v in values.items():
            for p in paths:
                if v in p:
                    found[k] = p
                    break
    if all(k in found for k in values):
        return found
    raise ValueError(f"Cannot locate matrix files for {spaceranger_dir}")


def read_feature_matrix(spaceranger_dir=None, individual_files: Optional[Mapping] = None,
                        hd_binning: Optional[str] = None) -> pd.DataFrame:
    """Read a Spaceranger run into a dense (genes x barcodes) DataFrame.

    visium_datasets.py:178-205 analog; returns a dense frame (the sparse
    pandas accessor buys nothing downstream since unification densifies).
    """
    import scipy.io

    if individual_files is None:
        individual_files = find_feature_matrix_files(spaceranger_dir, hd_binning)

    mat = scipy.io.mmread(individual_files["matrix"]).tocsr()
    with gzip.open(individual_files["features"], "rt") as fh:
        feature_ids = [row[0] for row in csv.reader(fh, delimiter="\t")]
    with gzip.open(individual_files["barcodes"], "rt") as fh:
        barcodes = [row[0] for row in csv.reader(fh, delimiter="\t")]
    return pd.DataFrame(mat.toarray(), index=feature_ids, columns=barcodes)


def read_feature_names(spaceranger_dir=None, individual_files: Optional[Mapping] = None,
                       hd_binning: Optional[str] = None) -> pd.DataFrame:
    """ENSEMBL -> gene_symbol mapping from features.tsv.gz (visium_datasets.py:209-217)."""
    if individual_files is None:
        individual_files = find_feature_matrix_files(spaceranger_dir, hd_binning)
    return pd.read_csv(individual_files["features"], header=None, index_col=0,
                       sep="\t", names=["ENSEMBL", "gene_symbol"], usecols=[0, 1])


_HD_DIMS_CACHE: dict = {}


def hd_lattice_dims(spaceranger_dir, hd_binning: str) -> tuple:
    """(h, w) of an HD square bin lattice: (max_row+1, max_col+1) over ALL
    positions (in- and out-of-tissue), the canonical grid dims for
    ``grid_dims='auto'`` and the patch-cache writer.

    Memoized per (positions path, mtime): one run resolves dims from several
    independent sites (CLI grid-dims, factory, prepare, dense ingest,
    AnnData builder), and each HD parquet is ~147k rows."""
    pos_path = find_position_file(spaceranger_dir, hd_binning)
    key = (str(pos_path), os.stat(pos_path).st_mtime_ns)
    hit = _HD_DIMS_CACHE.get(key)
    if hit is None:
        pos = read_positions_file(pos_path)
        hit = (int(pos["array_row"].astype(int).max()) + 1,
               int(pos["array_col"].astype(int).max()) + 1)
        if len(_HD_DIMS_CACHE) >= 64:
            _HD_DIMS_CACHE.pop(next(iter(_HD_DIMS_CACHE)))
        _HD_DIMS_CACHE[key] = hit
    return hit


def cohort_hd_lattice_dims(spaceranger_dirs, hd_binning: str) -> tuple:
    """Cohort-max (h, w) over every array's :func:`hd_lattice_dims` -- THE
    ``grid_dims='auto'`` rule, shared by the dataset factory, prepare's
    cache namer, the AnnData builder, and the dense ingest so their lattice
    dims (and cache names) can never diverge."""
    h = w = 0
    for srd in spaceranger_dirs:
        hh, ww = hd_lattice_dims(srd, hd_binning)
        h, w = max(h, hh), max(w, ww)
    return h, w


def coord_string(array_col, array_row) -> str:
    """THE '{array_col}_{array_row}' spot key — the unified-cache column
    name every annotation/count join matches on (one formatter so the
    load-bearing key can never diverge across writers and readers)."""
    return f"{int(array_col)}_{int(array_row)}"


def positions_to_coord_strings(positions: pd.DataFrame, barcodes) -> list:
    """Barcodes -> '{array_col}_{array_row}' coordinate strings."""
    sub = positions.loc[barcodes]
    return [coord_string(x, y) for x, y in
            zip(sub["array_col"].values, sub["array_row"].values)]
