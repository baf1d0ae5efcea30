import numpy as np
import pandas as pd
import pytest

from gridnext_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_write_read_roundtrip_gz(lib_ok, tmp_path):
    rng = np.random.default_rng(0)
    values = rng.poisson(1.0, size=(50, 30)).astype(np.float64)
    rows = [f"ENSG{i:05d}" for i in range(50)]
    cols = [f"{i}_{i % 7}" for i in range(30)]
    path = tmp_path / "arr.unified.tsv.gz"

    assert native.write_tsv_matrix(path, rows, cols, values, force_int=True)

    # pandas must read exactly what we wrote (file-contract compatibility)
    df = pd.read_csv(path, header=0, index_col=0, sep="\t")
    assert list(df.index) == rows
    assert list(df.columns) == cols
    assert df.index.name == "Gene"
    np.testing.assert_array_equal(df.values, values)

    # our reader agrees with itself and pandas
    r2, c2, v2 = native.read_tsv_matrix(path)
    assert r2 == rows and c2 == cols
    np.testing.assert_array_equal(v2, values)


def test_multi_member_gzip_chain(lib_ok, tmp_path):
    """The writer emits BGZF-style concatenated gzip members (one per ~4 MB
    row chunk, total member size in a 'GX' EXTRA subfield) so the reader can
    inflate members across the thread pool. The file must stay an ordinary
    .tsv.gz for every other consumer (pandas, gzip stdlib, zcat)."""
    import gzip

    rng = np.random.default_rng(3)
    # big enough for several members: ~30 MB raw
    values = rng.integers(0, 50, size=(5000, 800)).astype(np.float64)
    values[10, 5] = 2.5
    rows = [f"GENE{i}" for i in range(5000)]
    cols = [f"S{i}" for i in range(800)]
    path = tmp_path / "mm.unified.tsv.gz"
    assert native.write_tsv_matrix(path, rows, cols, values)

    # walk the member chain by hand via the GX subfields
    raw = path.read_bytes()
    off, members = 0, 0
    while off < len(raw):
        assert raw[off:off + 3] == b"\x1f\x8b\x08" and raw[off + 3] == 4
        xlen = int.from_bytes(raw[off + 10:off + 12], "little")
        p, end = off + 12, off + 12 + xlen
        msize = None
        while p + 4 <= end:
            slen = int.from_bytes(raw[p + 2:p + 4], "little")
            if raw[p:p + 2] == b"GX" and slen == 4:
                msize = int.from_bytes(raw[p + 4:p + 8], "little")
                break
            p += 4 + slen
        assert msize, "member without GX size subfield"
        off += msize
        members += 1
    assert off == len(raw) and members > 2, members

    # ordinary consumers read concatenated members transparently
    with gzip.open(path, "rt") as fh:
        assert fh.readline().startswith("Gene\tS0\t")
    df = pd.read_csv(path, sep="\t", index_col=0)
    np.testing.assert_array_equal(df.values, values)

    # native parallel-inflate path round-trips
    r2, c2, v2 = native.read_tsv_matrix(path)
    assert r2 == rows and c2 == cols
    np.testing.assert_array_equal(v2, values)


def test_write_read_floats_plain(lib_ok, tmp_path):
    rng = np.random.default_rng(1)
    values = rng.normal(size=(10, 8))
    rows = [f"G{i}" for i in range(10)]
    cols = [f"c{i}" for i in range(8)]
    path = tmp_path / "floats.tsv"  # uncompressed
    assert native.write_tsv_matrix(path, rows, cols, values)
    df = pd.read_csv(path, header=0, index_col=0, sep="\t")
    # pandas' fast float parser is within 1 ulp of strtod
    np.testing.assert_allclose(df.values, values, rtol=1e-14)
    _, _, v2 = native.read_tsv_matrix(path)
    np.testing.assert_allclose(v2, values, rtol=0, atol=0)  # strtod round-trip exact


def test_reader_handles_pandas_written_file(lib_ok, tmp_path):
    rng = np.random.default_rng(2)
    df = pd.DataFrame(rng.poisson(2, size=(20, 10)),
                      index=[f"G{i}" for i in range(20)],
                      columns=[f"{i}_{i}" for i in range(10)])
    df.index.name = "Gene"
    path = tmp_path / "pandas.tsv.gz"
    df.to_csv(path, sep="\t")
    rows, cols, values = native.read_tsv_matrix(path)
    assert rows == list(df.index) and cols == list(df.columns)
    np.testing.assert_array_equal(values, df.values)


def test_gzip_member_format_classification(lib_ok, tmp_path):
    df = pd.DataFrame(np.ones((4, 3)), index=list("abcd"),
                      columns=["0_0", "1_1", "2_2"])
    df.index.name = "Gene"
    foreign = tmp_path / "foreign.tsv.gz"
    df.to_csv(foreign, sep="\t")
    assert native.gzip_member_format(foreign) == "foreign"

    nat = tmp_path / "native.tsv.gz"
    assert native.write_tsv_matrix(nat, df.index, df.columns, df.values)
    assert native.gzip_member_format(nat) == "native"

    plain = tmp_path / "plain.tsv"
    df.to_csv(plain, sep="\t")
    assert native.gzip_member_format(plain) is None


def test_migrate_on_read_rewrites_foreign_gz_value_exact(lib_ok, tmp_path):
    """migrate=True converts a pandas-written cache to the parallel-
    inflatable multi-member format IN PLACE, value-exactly -- including
    non-integral float64s (%.17g round-trip) and the index name."""
    rng = np.random.default_rng(5)
    vals = rng.poisson(2, size=(20, 10)).astype(np.float64)
    vals[3, 4] = 1.0 / 3.0                     # full-precision float
    vals[7, 1] = 1e-17
    df = pd.DataFrame(vals, index=[f"G{i}" for i in range(20)],
                      columns=[f"{i}_{i}" for i in range(10)])
    df.index.name = "Symbol"
    path = tmp_path / "arr.unified.tsv.gz"
    df.to_csv(path, sep="\t")
    assert native.gzip_member_format(path) == "foreign"

    rows, cols, values = native.read_tsv_matrix(path, migrate=True)
    assert rows == list(df.index) and cols == list(df.columns)
    np.testing.assert_array_equal(values, vals)

    # the file is now native-framed, and BOTH readers see identical content
    assert native.gzip_member_format(path) == "native"
    df2 = pd.read_csv(path, header=0, index_col=0, sep="\t")
    assert df2.index.name == "Symbol"
    np.testing.assert_array_equal(df2.values, vals)
    assert list(df2.index) == list(df.index)
    r3, c3, v3 = native.read_tsv_matrix(path)
    assert r3 == rows and c3 == cols
    np.testing.assert_array_equal(v3, vals)

    # migrate on an already-native file is a no-op (same bytes)
    before = path.read_bytes()
    native.read_tsv_matrix(path, migrate=True)
    assert path.read_bytes() == before


def test_count_frame_cache_migrates_foreign_cache(lib_ok, tmp_path,
                                                  monkeypatch):
    """The streaming count reader migrates foreign caches once (epoch 2+
    reads inflate in parallel on multi-core hosts); GNX_CACHE_MIGRATE=0
    opts out."""
    from gridnext_tpu.data.datasets import _read_count_frame

    df = pd.DataFrame(np.arange(12, dtype=np.float64).reshape(4, 3),
                      index=list("abcd"), columns=["0_0", "1_1", "2_2"])
    df.index.name = "Gene"

    off = tmp_path / "off.unified.tsv.gz"
    df.to_csv(off, sep="\t")
    monkeypatch.setenv("GNX_CACHE_MIGRATE", "0")
    got = _read_count_frame(str(off))
    np.testing.assert_array_equal(got.values, df.values)
    assert native.gzip_member_format(off) == "foreign"   # untouched

    on = tmp_path / "on.unified.tsv.gz"
    df.to_csv(on, sep="\t")
    monkeypatch.delenv("GNX_CACHE_MIGRATE", raising=False)
    got = _read_count_frame(str(on))
    np.testing.assert_array_equal(got.values, df.values)
    assert native.gzip_member_format(on) == "native"
    # post-migration read still serves the same frame
    got2 = _read_count_frame(str(on))
    np.testing.assert_array_equal(got2.values, df.values)

    # USER-authored count files (no .unified in the name) are never
    # rewritten -- migration is gated to our own cache artifacts
    user = tmp_path / "my_counts.tsv.gz"
    df.to_csv(user, sep="\t")
    got = _read_count_frame(str(user))
    np.testing.assert_array_equal(got.values, df.values)
    assert native.gzip_member_format(user) == "foreign"


def test_stale_tmp_sweep(lib_ok, tmp_path):
    """Hard-killed writers leak uniquely-named tmps; the next write sweeps
    siblings older than the stale bound but spares fresh (possibly live)
    ones."""
    import os
    import time

    df = pd.DataFrame(np.ones((3, 2)), index=list("abc"),
                      columns=["0_0", "1_1"])
    path = tmp_path / "arr.unified.tsv.gz"
    stale = tmp_path / "arr.unified.tsv.gz.tmp.123.0"
    fresh = tmp_path / "arr.unified.tsv.gz.tmp.456.0"
    stale.write_bytes(b"dead")
    fresh.write_bytes(b"live")
    old = time.time() - native._STALE_TMP_S - 60
    os.utime(stale, (old, old))
    assert native.write_tsv_matrix(path, df.index, df.columns, df.values)
    assert not stale.exists() and fresh.exists() and path.exists()


def test_unify_pipeline_uses_native(lib_ok, tmp_path):
    # end-to-end: prepare_count_files writes via native; datasets read it back
    from gridnext_tpu.data import create_visium_dataset, simulate_spaceranger_dir

    sims = [simulate_spaceranger_dir(tmp_path / f"a{i}", seed=i, n_genes=25,
                                     n_classes=3) for i in range(2)]
    dirs = [s["spaceranger_dir"] for s in sims]
    gdat = create_visium_dataset(dirs, use_count=True, use_image=False,
                                 spatial=True,
                                 annot_files=[s["annot_file"] for s in sims],
                                 minimum_detection_rate=None)
    x, y = gdat[0]
    np.testing.assert_array_equal(y, sims[0]["label_grid"])
    assert x[y > 0].sum() > 0


def test_reader_missing_fields_become_nan(lib_ok, tmp_path):
    # empty cell and short row must yield NaN, never shifted values
    path = tmp_path / "holes.tsv"
    path.write_text("Gene\tc0\tc1\tc2\n"
                    "G0\t1\t\t3\n"      # empty middle field
                    "G1\t4\t5\n"        # short row
                    "G2\tx\t7\t8\n")    # malformed token
    rows, cols, v = native.read_tsv_matrix(path)
    assert rows == ["G0", "G1", "G2"]
    np.testing.assert_array_equal(v[0], [1.0, np.nan, 3.0])
    assert v[1][0] == 4.0 and v[1][1] == 5.0 and np.isnan(v[1][2])
    assert np.isnan(v[2][0]) and v[2][1] == 7.0 and v[2][2] == 8.0


def test_pad_graph_requires_pad_node(lib_ok):
    from gridnext_tpu.data.graph_data import pad_graph
    g = {"nodes": np.zeros((4, 3)), "edges": np.array([[0, 1], [1, 0]]),
         "pos": np.zeros((4, 2)), "y": np.arange(4), "n_node": np.array([4]),
         "n_edge": np.array([2]), "classes": None}
    with pytest.raises(ValueError, match="padding node"):
        pad_graph(g, 4, n_edge_pad=8)
    out = pad_graph(g, 5, n_edge_pad=8)
    assert (out["edges"][:, 2:] == 4).all()


def test_jpeg_decode_batch_matches_pil(tmp_path):
    """Native threaded JPEG decode is bit-identical to PIL (both wrap
    libjpeg); dimension mismatches return None so callers fall back."""
    from PIL import Image

    if native.get_patch_lib() is None:
        pytest.skip("native jpeg codec unavailable")

    rng = np.random.default_rng(3)
    P, N = 24, 12
    paths = []
    for i in range(N):
        img = rng.integers(0, 256, (P, P, 3), dtype=np.uint8)
        p = tmp_path / f"a_{i}_{i}.jpg"
        Image.fromarray(img).save(p, "JPEG", quality=92)
        paths.append(str(p))

    out = native.decode_jpeg_batch(paths, P)
    assert out is not None and out.shape == (N, P, P, 3)
    pil = np.stack([np.asarray(Image.open(p)) for p in paths])
    np.testing.assert_array_equal(out, pil)

    assert native.decode_jpeg_batch(paths, P + 1) is None  # wrong dims
    assert native.decode_jpeg_batch([str(tmp_path / "missing.jpg")], P) is None


def test_load_patches_fallback_equivalence(tmp_path, monkeypatch):
    """_load_patches: native path == PIL fallback, with and without a
    transform (PatchGridDataset feeds both through the same helper)."""
    from PIL import Image

    from gridnext_tpu.data.datasets import _load_patches

    rng = np.random.default_rng(5)
    paths = []
    for i in range(6):
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        p = tmp_path / f"b_{i}_{i}.jpg"
        Image.fromarray(img).save(p, "JPEG", quality=92)
        paths.append(str(p))

    tf = lambda im: im[::2, ::2] * 2.0
    for transform in (None, tf):
        fast = _load_patches(paths, transform)
        monkeypatch.setattr(native, "decode_jpeg_batch",
                            lambda *a, **k: None)
        slow = _load_patches(paths, transform)
        monkeypatch.undo()
        np.testing.assert_array_equal(fast, slow)


def test_reader_handles_foreign_concatenated_members(lib_ok, tmp_path):
    """Concatenated foreign gzip members WITHOUT our GX size tags (bgzip
    files, or two gzip streams catted together) must stream through the
    in-memory inflate fallback's inflateReset path."""
    import gzip

    rng = np.random.default_rng(3)
    df = pd.DataFrame(rng.poisson(2, size=(30, 6)),
                      index=[f"G{i}" for i in range(30)],
                      columns=[f"{i}_{i}" for i in range(6)])
    df.index.name = "Gene"
    text = df.to_csv(sep="\t").encode()
    half = len(text) // 2
    path = tmp_path / "catted.tsv.gz"
    with open(path, "wb") as fh:        # two members, split mid-table
        fh.write(gzip.compress(text[:half]))
        fh.write(gzip.compress(text[half:]))
    # stdlib reads the concatenation transparently -- ours must match
    assert gzip.decompress(path.read_bytes()) == text
    rows, cols, values = native.read_tsv_matrix(path)
    assert rows == list(df.index) and cols == list(df.columns)
    np.testing.assert_array_equal(values, df.values)


def test_native_dataframe_declines_text_columns(lib_ok, tmp_path):
    """A TSV with an unparseable (text) token: the native reader declines
    (returns None) instead of serving silent NaNs, so the pandas fallback
    fails loudly downstream -- same outcome with or without a toolchain."""
    import pandas as pd

    from gridnext_tpu import native

    p = tmp_path / "weird.tsv"
    pd.DataFrame({"1_1": [1, 2], "desc": ["geneA", "geneB"]},
                 index=["g1", "g2"]).to_csv(p, sep="\t")
    assert native.read_tsv_dataframe(str(p)) is None
    # numeric files still parse natively
    q = tmp_path / "ok.tsv"
    pd.DataFrame({"1_1": [1, 2], "2_2": [3, 4]},
                 index=["g1", "g2"]).to_csv(q, sep="\t")
    df = native.read_tsv_dataframe(str(q))
    assert df is not None and df.loc["g2", "2_2"] == 4
