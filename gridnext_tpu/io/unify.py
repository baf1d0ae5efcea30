"""Cross-array gene unification: the `.unified.tsv.gz` cache contract.

``prepare_count_files`` reads every array's MEX matrix, renames barcodes to
'{array_col}_{array_row}' coordinate strings, outer-joins the gene axis
across arrays (missing genes filled with 0), drops genes detected in fewer
than ``minimum_detection_rate`` of all spots, and writes one
``<array>.unified.tsv.gz`` per Spaceranger directory
(visium_datasets.py:136-174 semantics, including the gene sort from
pd.concat(sort=True)).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pandas as pd

from gridnext_tpu.io.spaceranger import (
    read_feature_matrix,
    read_positions,
    positions_to_coord_strings,
)


def array_name(srd) -> str:
    """THE per-array name rule: the Spaceranger dir's basename, used in
    every per-array artifact name (unified count caches, patch cache dirs,
    Loupe output naming, ``--val-arrays`` matching). Resolved via abspath
    so trailing slashes and dot-paths ('.', 'foo/.') still yield the real
    directory name -- ad-hoc ``Path(srd).name`` returns '' for '.', which
    would silently write one artifact name and read another."""
    return os.path.basename(os.path.abspath(str(srd)))


def unified_count_suffix(hd_binning=None,
                         base: str = ".unified.tsv.gz") -> str:
    """Cache-file suffix for unified counts; bin-specific for Visium HD so
    switching binnings can never serve a stale cache."""
    return f".{hd_binning}{base}" if hd_binning else base


def unified_cache_path(srd, hd_binning=None,
                       base: str = ".unified.tsv.gz") -> str:
    """Canonical path of ``srd``'s unified count cache:
    ``<srd>/<dirname><suffix>`` (the ``.unified.tsv.gz`` contract,
    visium_datasets.py:69). The ONE place the naming scheme lives --
    every reader/writer (prepare, the dataset factory, the CLI's train/
    register/scBERT paths) must build the path here so the contract can
    never drift between them."""
    srd = str(srd)
    return os.path.join(srd, array_name(srd)
                        + unified_count_suffix(hd_binning, base))


def assert_gene_axis_match(genes, genes0, cf, cf0):
    """Raise the shared misaligned-gene-axis error when ``genes != genes0``.

    One message for every construction path (factory check, spot datasets'
    in-loop checks) so diagnostics stay consistent.
    """
    if genes != genes0:
        if all(".unified" in str(f) for f in (cf, cf0)):
            remedy = ("(unified caches prepared in separate runs?). Delete "
                      "the *.unified.tsv.gz caches and regenerate them over "
                      "the full cohort in one prepare_count_files/"
                      "create_visium_dataset call, or pass select_genes to "
                      "align by name.")
        else:
            remedy = ("Pass select_genes to align the files by gene name, "
                      "or rebuild them over one shared gene axis.")
        raise ValueError(
            f"count files do not share a gene axis: {cf} differs from "
            f"{cf0}. {remedy}")


def read_unified_genes(count_file) -> list:
    """Gene axis (index column) of one unified cache. Decompresses the whole
    gzip (TSV is row-major) but skips parsing the count columns."""
    return list(pd.read_csv(count_file, sep="\t", index_col=0,
                            usecols=[0]).index)


def validated_unified_cache(srd, hd_binning=None,
                            genes: Optional[list] = None) -> str:
    """Path of ``srd``'s unified count cache, verified to exist and (when
    ``genes`` is given -- a trained model's recorded gene axis) to carry
    exactly that gene set and order.

    Raises ``FileNotFoundError`` / ``ValueError`` with actionable messages;
    the CLI's register/evaluate paths wrap these into ``sys.exit`` while
    the resident server maps them to HTTP 400s -- one validation, two
    error surfaces.
    """
    cfile = unified_cache_path(srd, hd_binning)
    if not os.path.exists(cfile):
        raise FileNotFoundError(
            f"{cfile} not found -- run `python -m gridnext_tpu prepare "
            f"--spaceranger {srd}` first")
    if genes is not None and read_unified_genes(cfile) != list(genes):
        raise ValueError(
            f"{cfile} has a different gene set/order than the model was "
            "trained on -- regenerate the unified counts with the training "
            "cohort's settings")
    return cfile


def check_unified_gene_axis(count_files: Sequence) -> list:
    """Assert pre-existing unified caches share one gene axis; return it.

    Caches written by separate ``prepare_count_files`` runs over different
    cohorts have different detection-rate-filtered gene sets; mixing them
    would train on misaligned gene axes (or die in np.stack). The unified
    contract is cohort-wide, so this is a user error worth a clear message.
    """
    genes0 = None
    for cf in count_files:
        genes = read_unified_genes(cf)
        if genes0 is None:
            genes0 = genes
        else:
            assert_gene_axis_match(genes, genes0, cf, count_files[0])
    return genes0


def prepare_count_files(spaceranger_dirs: Sequence,
                        suffix: Optional[str] = None,
                        minimum_detection_rate: Optional[float] = 0.02,
                        verbose: bool = True,
                        hd_binning: Optional[str] = None) -> list:
    """Generate unified count files; returns the list of written paths.

    ``hd_binning`` (e.g. 'square_008um') reads Visium HD binned outputs
    (parquet positions + per-binning MEX; utils.py:253-287 contract).
    ``suffix`` defaults to :func:`unified_count_suffix` FOR THE GIVEN
    BINNING -- an HD prepare must never land on the untagged non-HD cache
    name, which unified_cache_path would miss while a later non-HD factory
    call would silently adopt (square coordinates through the pseudo-hex
    transform). Pass an explicit suffix only to break the cache contract
    on purpose.
    """
    if suffix is None:
        suffix = unified_count_suffix(hd_binning)
    frames, out_stems = [], []
    for srd in spaceranger_dirs:
        df = read_feature_matrix(srd, hd_binning=hd_binning)
        positions = read_positions(srd, hd_binning=hd_binning)
        df.columns = positions_to_coord_strings(positions, df.columns)
        frames.append(df)
        out_stems.append(os.path.join(str(srd), array_name(srd)))

    for stem, frame in zip(out_stems, frames):
        frame.columns = pd.MultiIndex.from_product(
            [[stem], frame.columns], names=["Sample", "Coordinate"])
        frame.index.name = "Gene"

    result = pd.concat(frames, axis=1, sort=True)
    if verbose:
        print(f"unified gene axis: {result.shape[0]} genes across "
              f"{len(frames)} arrays")
    result = result.fillna(0).astype(int)

    if minimum_detection_rate is not None:
        keep = ((result > 0).sum(axis=1) / float(result.shape[1])) > minimum_detection_rate
        result = result[keep]
        if verbose:
            pct = 100.0 * minimum_detection_rate
            print(f"detection-rate filter (<{pct:.2f}% of spots): "
                  f"{result.shape[0]} genes kept")

    if verbose:
        print(f"median depth: {int(np.median(result.sum(axis=0)))} "
              "counts/spot")

    from gridnext_tpu import native

    written = []
    # iterate in INPUT order: MultiIndex.levels is always lexicographically
    # sorted, which would silently reorder the returned paths relative to
    # spaceranger_dirs (callers pair written[i] with their own lists)
    for stem in out_stems:
        path = stem + suffix
        frame = result[stem]
        # native writer is ~40x pandas for gz TSVs; same file contract
        if not native.write_tsv_matrix(path, frame.index, frame.columns,
                                       frame.values, index_name="Gene",
                                       force_int=True):
            frame.to_csv(path, sep="\t", index=True)
        written.append(path)
    return written
