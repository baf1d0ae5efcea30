"""Annotation-file readers (Loupe and Splotch formats) and grid assembly.

* Loupe format: ``Barcode,<annotation>`` CSV exported from Loupe Browser;
  joined against a positions file to get array coordinates (utils.py:220-233).
* Splotch format: (annotations x '{x}_{y}' spot coords) binary one-hot TSV;
  spots with column-sum != 1 are dropped (utils.py:235-244).

``read_annotated_starray`` builds the (H, W, n_genes) count grid and (H, W)
annotation grid for one array, exactly mirroring the dtype contract of the
reference (utils.py:88-166): string grid (bg='') for Loupe annotations,
int grid (bg=0, labels 1..N) for Splotch.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pandas as pd

from gridnext_tpu import geometry
from gridnext_tpu.io.spaceranger import coord_string, read_positions_file


def _label_str(v) -> str:
    """One canonical string per label value: integral floats render like
    ints ('1', not '1.0'). Numeric Loupe cluster IDs must encode to the
    SAME class name on every array -- a column with one blank cell parses
    float64 while a fully-annotated array's parses int64, and a naive
    astype(str) would split one cluster into '1' and '1.0' classes."""
    if isinstance(v, float) and float(v).is_integer():
        return str(int(v))
    return str(v)


def read_annotfile(afile, position_file=None, afile_delim: str = ",",
                   Visium: bool = True):
    """Return paired (coord_strings, annotations) lists for one array.

    Loupe path (``Visium=True``): annotations come back as *strings* (class
    encoding must wait until the union over all arrays is known). Splotch
    path: integer argmax labels over the one-hot matrix.
    """
    if Visium:
        adat = pd.read_csv(afile, header=0, index_col=0, sep=afile_delim)
        pdat = read_positions_file(position_file)
        first = adat.iloc[:, 0]
        # blank cells parse as NaN (read_csv's default NA handling covers
        # empty strings); numeric cluster IDs coerce to strings so class
        # encoding is uniform (dtype-independent -- see _label_str)
        adat = adat[first.notna()]
        # keep only the label column before the join: a second, partially
        # filled Loupe column (e.g. free-text notes) must not drop annotated
        # spots via dropna; dropna then only removes barcodes with no
        # position row
        adat = adat.iloc[:, [0]].join(pdat, how="left")
        adat = adat.dropna(subset=["array_col", "array_row"])
        coord_strs = [coord_string(x, y) for x, y in
                      zip(adat["array_col"], adat["array_row"])]
        return coord_strs, np.array([_label_str(v)
                                     for v in adat.iloc[:, 0]])

    adat = pd.read_csv(afile, header=0, index_col=0, sep=afile_delim)
    adat = adat.loc[:, adat.sum(axis=0) == 1]  # drop mis-annotated spots
    return list(adat.columns), np.argmax(adat.values, axis=0)


def union_classes(annot_files: Sequence, position_files: Sequence,
                  afile_delim: str = ",") -> np.ndarray:
    """Sorted union of annotation names across arrays.

    This IS the label encoding of the reference: sklearn LabelEncoder fit on
    np.union1d over arrays (count_datasets.py:117-125) assigns codes in
    sorted order, which np.union1d already returns.

    Memoized per (files, mtimes): the CLI constructs several dataset views
    of one cohort (mm grids + image spots + count spots), each of which
    computes the same union -- without the cache every construction re-reads
    every annotation CSV *and* positions file (HD parquet positions are
    ~147k rows/array).
    """
    key = tuple(
        (str(a), str(p), _mtime_or_none(a), _mtime_or_none(p))
        for a, p in zip(annot_files, position_files)) + (afile_delim,)
    hit = _UNION_CACHE.get(key)
    if hit is not None:
        return hit.copy()
    all_annots = np.array([])
    for afile, pfile in zip(annot_files, position_files):
        _, annot_strs = read_annotfile(afile, position_file=pfile,
                                       afile_delim=afile_delim, Visium=True)
        all_annots = np.union1d(all_annots, annot_strs)
    if len(_UNION_CACHE) >= 16:
        _UNION_CACHE.pop(next(iter(_UNION_CACHE)))
    _UNION_CACHE[key] = all_annots
    return all_annots.copy()


_UNION_CACHE: dict = {}


def _mtime_or_none(path):
    try:
        return os.stat(path).st_mtime_ns
    except OSError:
        return None


def encode_labels(values, classes: np.ndarray) -> np.ndarray:
    """Map annotation strings to integer codes per ``classes`` order."""
    idx = np.searchsorted(classes, values)
    if np.any(classes[np.clip(idx, 0, len(classes) - 1)] != np.asarray(values)):
        missing = set(np.asarray(values)) - set(classes)
        raise ValueError(f"labels not in class list: {missing}")
    return idx


def read_annotated_starray(count_file, annot_file=None, select_genes=None,
                           h_st: int = geometry.VISIUM_H_ST,
                           w_st: int = geometry.VISIUM_W_ST,
                           Visium: bool = True, position_file=None,
                           cfile_delim: str = "\t", afile_delim: str = "\t",
                           loupe_delim: str = ","):
    """Read one array's unified count file (+ annotations) into dense grids.

    ``afile_delim`` applies to the Splotch branch (reference semantics,
    utils.py:130-142); ``loupe_delim`` to the Loupe branch, so cohorts with
    non-comma Loupe exports parse the same here as in the spot datasets.

    Returns:
      counts_grid: (h_st, w_st, n_genes) float array, odd-right indexed.
      annots_grid: (h_st, w_st) -- string array (bg '') for Loupe annotations
        (Visium + position_file), int array (bg 0) for Splotch.
    """
    cmat = None
    if isinstance(count_file, pd.DataFrame):
        # pre-read frame (e.g. the dataset layer's mtime-keyed LRU): lets
        # streamed grid training reuse one parse per array instead of
        # re-inflating the whole TSV on every __getitem__. Read-only here.
        cmat = count_file
    elif cfile_delim == "\t":
        from gridnext_tpu import native

        cmat = native.read_tsv_dataframe(count_file)
    if cmat is None:
        cmat = pd.read_csv(count_file, header=0, index_col=0, sep=cfile_delim)
    if select_genes is not None:
        cmat = cmat.loc[select_genes, :]
    n_genes = cmat.shape[0]

    adict = None
    if annot_file is not None:
        if position_file is not None:
            coord_strs, annot_strs = read_annotfile(
                annot_file, position_file=position_file, Visium=True,
                afile_delim=loupe_delim)
            str_len = max((len(a) for a in annot_strs), default=1)
            annots_grid = np.empty((h_st, w_st), dtype=f"U{str_len}")
            annots_grid[:] = ""
            adict = dict(zip(coord_strs, annot_strs))
        else:
            coord_strs, annot_lbls = read_annotfile(
                annot_file, Visium=False, afile_delim=afile_delim)
            annots_grid = np.zeros((h_st, w_st), dtype=int)
            adict = dict(zip(coord_strs, annot_lbls))
    else:
        annots_grid = np.zeros((h_st, w_st), dtype=int)

    counts_grid = np.zeros((h_st, w_st, n_genes), dtype=float)
    if len(cmat.columns) == 0:
        # zero-spot array (no in-tissue spots): empty grids, like the
        # reference's plain column loop -- coords would be 1-D below
        return counts_grid, annots_grid

    # Vectorized placement over the column coordinate strings.
    coords = np.array([list(map(float, c.split("_"))) for c in cmat.columns])
    if Visium:
        x, y = geometry.pseudo_hex_to_oddr(coords[:, 0].astype(int),
                                           coords[:, 1].astype(int))
    else:
        x = np.rint(coords[:, 0]).astype(int)
        y = np.rint(coords[:, 1]).astype(int)

    values = cmat.values.T  # (spots, genes)
    if adict is None:
        counts_grid[y, x] = values
    else:
        # vectorized: a per-spot Python loop is ~147k dict lookups plus
        # row copies per array at HD scale
        keep = np.fromiter((c in adict for c in cmat.columns), dtype=bool,
                           count=len(cmat.columns))
        counts_grid[y[keep], x[keep]] = values[keep]
        lbls = np.asarray([adict[c] for c in cmat.columns[keep]])
        if annots_grid.dtype.kind in "iu":
            lbls = lbls + 1 if len(lbls) else lbls  # 0 = background
        annots_grid[y[keep], x[keep]] = lbls

    return counts_grid, annots_grid


def encode_annot_grid(annots_grid: np.ndarray, classes: np.ndarray) -> np.ndarray:
    """String annotation grid -> int grid with bg 0, classes 1..N.

    (count_datasets.py:296-300 semantics.)
    """
    if annots_grid.dtype.kind in "iu":
        return annots_grid.astype(np.int64)
    flat = annots_grid.ravel()
    out = np.zeros(flat.shape, dtype=np.int64)
    fg = flat != ""
    out[fg] = encode_labels(flat[fg], classes) + 1
    return out.reshape(annots_grid.shape)


def to_splotch_annots(loupe_annotations: Sequence, spaceranger_dirs: Sequence,
                      dest_dir, include_annots: Optional[Sequence[str]] = None):
    """Convert Loupe annotation CSVs to Splotch one-hot TSVs (imgprocess.py:115-155)."""
    from pathlib import Path

    from gridnext_tpu.io.spaceranger import read_positions

    if include_annots is None:
        annot_list = []
        for afile in loupe_annotations:
            adat = pd.read_csv(afile, header=0, sep=",")
            # numeric Loupe cluster IDs count as labels too (same _label_str
            # coercion the grid readers use); NaN = unannotated
            col = [_label_str(a) for a in adat[adat.columns[1]]
                   if pd.notna(a)]
            annot_list.append([a for a in col
                               if a and a.lower() != "undefined"])
        include_annots = list(np.unique(np.concatenate(
            [np.asarray(a, dtype=object) for a in annot_list]
            or [np.array([], dtype=object)])))

    for afile, srd in zip(loupe_annotations, spaceranger_dirs):
        annots = pd.read_csv(afile, header=0, sep=",")
        positions = read_positions(srd)
        missing = [b for b in annots["Barcode"] if b not in positions.index]
        if missing:
            raise ValueError(
                f"{len(missing)} annotation barcodes in {afile} have no row "
                f"in {srd}'s positions file (first: {missing[0]!r}) -- the "
                "Loupe export and Spaceranger dir are mismatched")
        mat = np.zeros((len(include_annots), len(annots["Barcode"])), dtype=int)
        coord_strs = []
        for i, b in enumerate(annots["Barcode"]):
            coord_strs.append(coord_string(positions.loc[b, "array_col"],
                                           positions.loc[b, "array_row"]))
            a = annots.iloc[i, 1]
            a = _label_str(a) if pd.notna(a) else a
            if a in include_annots:
                mat[include_annots.index(a), i] = 1
        frame = pd.DataFrame(mat, index=include_annots, columns=coord_strs)
        outfile = str(Path(dest_dir) / Path(afile).with_suffix(".tsv").name)
        frame.to_csv(outfile, sep="\t")
