"""Splotch annotation format: conversion and consumption round trip."""

import numpy as np
import pandas as pd
import pytest

from gridnext_tpu.data import simulate_spaceranger_dir
from gridnext_tpu.data.datasets import CountGridDataset, CountSpotDataset
from gridnext_tpu.io import read_annotated_starray, read_annotfile
from gridnext_tpu.io.annotations import to_splotch_annots


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    root = tmp_path_factory.mktemp("splotch")
    sims = [simulate_spaceranger_dir(root / f"a{i}", seed=i, n_genes=20,
                                     n_classes=3) for i in range(2)]
    # unified count files
    from gridnext_tpu.io import prepare_count_files

    files = prepare_count_files([s["spaceranger_dir"] for s in sims],
                                minimum_detection_rate=None, verbose=False)
    return sims, files, root


def test_to_splotch_annots_roundtrip(sim, tmp_path):
    sims, count_files, root = sim
    dest = tmp_path / "splotch"
    dest.mkdir()
    to_splotch_annots([s["annot_file"] for s in sims],
                      [s["spaceranger_dir"] for s in sims], dest)

    outs = sorted(dest.glob("*.tsv"))
    assert len(outs) == 2
    df = pd.read_csv(outs[0], header=0, index_col=0, sep="\t")
    # one-hot over include_annots x spots
    assert set(df.index) == set(sims[0]["class_names"])
    assert ((df.sum(axis=0) == 1).all())

    # Splotch-format annotations read back as integer labels
    coord_strs, annot_lbls = read_annotfile(outs[0], Visium=False,
                                            afile_delim="\t")
    assert len(coord_strs) == int((sims[0]["label_grid"] > 0).sum())
    assert set(annot_lbls) <= {0, 1, 2}


def test_read_annotated_starray_splotch_dtype_contract(sim, tmp_path):
    sims, count_files, root = sim
    dest = tmp_path / "sp2"
    dest.mkdir()
    to_splotch_annots([s["annot_file"] for s in sims],
                      [s["spaceranger_dir"] for s in sims], dest)
    afile = sorted(dest.glob("*.tsv"))[0]

    counts, annots = read_annotated_starray(count_files[0], str(afile),
                                            position_file=None)
    # Splotch path: integer grid, bg 0 (utils.py:139-142 contract)
    assert annots.dtype.kind in "iu"
    fg = sims[0]["label_grid"] > 0
    np.testing.assert_array_equal(annots > 0, fg)
    # class indices are alphanumeric order of names -> same encoding as the
    # simulator's 1..N labels
    np.testing.assert_array_equal(annots, sims[0]["label_grid"])


def test_grid_and_spot_datasets_splotch(sim, tmp_path):
    sims, count_files, root = sim
    dest = tmp_path / "sp3"
    dest.mkdir()
    to_splotch_annots([s["annot_file"] for s in sims],
                      [s["spaceranger_dir"] for s in sims], dest)
    afiles = [str(p) for p in sorted(dest.glob("*.tsv"))]

    gdat = CountGridDataset(count_files, annot_files=afiles, Visium=True,
                            position_files=None, afile_delim="\t",
                            annot_format="splotch")
    x, y = gdat[0]
    np.testing.assert_array_equal(y, sims[0]["label_grid"])

    sdat = CountSpotDataset(count_files, annot_files=afiles, Visium=False,
                            afile_delim="\t")
    assert len(sdat) == sum(int((s["label_grid"] > 0).sum()) for s in sims)
    xv, yv = sdat[0]
    assert xv.shape == (20,)
    assert 0 <= yv < 3


def test_reference_named_eager_loaders(sim, tmp_path):
    from gridnext_tpu.data.datasets import (load_count_dataset,
                                            load_count_grid_dataset)

    sims, count_files, root = sim
    dest = tmp_path / "sp4"
    dest.mkdir()
    to_splotch_annots([s["annot_file"] for s in sims],
                      [s["spaceranger_dir"] for s in sims], dest)
    afiles = [str(p) for p in sorted(dest.glob("*.tsv"))]

    X, y = load_count_dataset(count_files, annot_files=afiles)
    n_fg = sum(int((s["label_grid"] > 0).sum()) for s in sims)
    assert X.shape == (n_fg, 20)
    assert set(np.unique(y)) <= {0, 1, 2}

    Xg, Yg = load_count_grid_dataset(count_files, annot_files=afiles)
    assert Xg.shape[0] == 2 and Yg.shape[1:] == (78, 64)
    np.testing.assert_array_equal(Yg[0], sims[0]["label_grid"])
