"""Native (C++) host-I/O tier: fast unified-count-TSV codec + JPEG batch decode.

Compiled lazily with g++ on first use (cached by source hash under
``_build/``); every entry point degrades gracefully to the pandas/PIL
implementation when a toolchain or library is unavailable, so the native
tier is an accelerator, never a dependency.

Why it exists: the ``.unified.tsv.gz`` cache contract is the framework's
hottest host path -- pandas takes minutes to WRITE a full-transcriptome
array (default formatting + gzip level 9) and seconds to read one;
the C++ codec does both in a fraction of that (measured ~40x write,
~4x read on a 15k x 4k matrix). Gzip output is multi-member (BGZF-style
size-tagged members), so on multi-core hosts both deflate and inflate run
across a thread pool while the file stays an ordinary ``.tsv.gz`` for
pandas/zcat. The JPEG codec (patchio.cpp) batch-decodes
a patch-cache directory (~3k spot JPEGs per array) across a thread pool
instead of one PIL call per ``__getitem__`` (image_datasets.py:113-122).
"""

from __future__ import annotations

import ctypes
import hashlib
import itertools
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC = Path(__file__).with_name("fastio.cpp")
_BUILD_DIR = Path(__file__).with_name("_build")
_tmp_serial = itertools.count()

_lib = None
_lib_failed = False
_build_lock = __import__("threading").Lock()


def _build_lib() -> Optional[ctypes.CDLL]:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so_path = _BUILD_DIR / f"fastio-{tag}.so"
    if not so_path.exists():
        _BUILD_DIR.mkdir(exist_ok=True)
        # pid+serial-unique tmp (same rule as write_tsv_matrix): two
        # processes racing the first build must never os.replace a torn .so
        # onto the content-hash path, which would disable the native tier
        # until someone deletes _build/
        tmp = so_path.with_suffix(f".so.tmp.{os.getpid()}-{next(_tmp_serial)}")
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", str(_SRC), "-o", str(tmp), "-lz"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)

    lib = ctypes.CDLL(str(so_path))
    lib.tsv_write_matrix.restype = ctypes.c_int
    lib.tsv_write_matrix.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int]
    lib.tsv_open.restype = ctypes.c_void_p
    lib.tsv_open.argtypes = [ctypes.c_char_p]
    lib.tsv_n_rows.restype = ctypes.c_int64
    lib.tsv_n_rows.argtypes = [ctypes.c_void_p]
    lib.tsv_n_cols.restype = ctypes.c_int64
    lib.tsv_n_cols.argtypes = [ctypes.c_void_p]
    lib.tsv_copy_values.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_double)]
    lib.tsv_index_name.restype = ctypes.c_char_p
    lib.tsv_index_name.argtypes = [ctypes.c_void_p]
    lib.tsv_row_name.restype = ctypes.c_char_p
    lib.tsv_row_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.tsv_col_name.restype = ctypes.c_char_p
    lib.tsv_col_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.tsv_free.argtypes = [ctypes.c_void_p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The compiled TSV-codec library, building it on first use; None when
    the toolchain/zlib is missing (callers fall back to pure Python)."""
    global _lib, _lib_failed
    if _lib is None and not _lib_failed:
        with _build_lock:   # one in-process build; losers reuse it
            if _lib is None and not _lib_failed:
                try:
                    _lib = _build_lib()
                except Exception:
                    _lib_failed = True
    return _lib


def available() -> bool:
    """True when the native TSV codec compiled and loaded."""
    return get_lib() is not None


def _char_array(strings: Sequence[str]):
    enc = [s.encode() for s in strings]
    arr = (ctypes.c_char_p * len(enc))(*enc)
    return arr, enc  # keep enc alive


_STALE_TMP_S = 600


def _sweep_stale_tmps(path):
    """Unlink abandoned ``X.tmp.<pid>.<n>`` siblings of ``path`` older than
    ten minutes: hard-killed writers leak their uniquely-named tmp, and
    nothing else ever removes it. The age bound keeps a CONCURRENT writer's
    live tmp safe (its write completes in seconds, not minutes)."""
    import glob
    import time

    now = time.time()
    # escape: a path with glob metacharacters ('S1[rep2]') must neither
    # break the sweep nor match unrelated siblings
    for p in glob.glob(glob.escape(str(path)) + ".tmp.*"):
        try:
            if now - os.path.getmtime(p) > _STALE_TMP_S:
                os.remove(p)
        except OSError:
            pass


def write_tsv_matrix(path, index, columns, values: np.ndarray,
                     index_name: str = "Gene", gzip_level: Optional[int] = 1,
                     force_int: bool = False) -> bool:
    """Write a (rows x cols) numeric TSV(.gz). Returns False if native
    unavailable (caller should fall back)."""
    lib = get_lib()
    if lib is None:
        return False
    values = np.ascontiguousarray(values, dtype=np.float64)
    if values.ndim != 2 or len(index) != values.shape[0] \
            or len(columns) != values.shape[1]:
        raise ValueError(
            f"shape mismatch: values {values.shape} vs {len(index)} index "
            f"names and {len(columns)} column names")
    rows, renc = _char_array([str(s) for s in index])
    cols, cenc = _char_array([str(s) for s in columns])
    level = -1 if gzip_level is None else gzip_level
    if str(path).endswith(".gz") and level < 0:
        level = 1
    if not str(path).endswith(".gz"):
        level = -1
    # write to a sibling tmp file and rename: a failed/interrupted write must
    # never leave a truncated cache at the final path (create_visium_dataset
    # trusts existing caches). The tmp name is per-call unique so concurrent
    # writers of the same path (e.g. two loader threads migrating one cache)
    # can't interleave into each other's buffer; last replace wins, and both
    # replacements carry identical content.
    tmp = f"{path}.tmp.{os.getpid()}.{next(_tmp_serial)}"
    _sweep_stale_tmps(path)
    rc = lib.tsv_write_matrix(
        tmp.encode(), index_name.encode(), rows, cols,
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        values.shape[0], values.shape[1], level, int(force_int))
    if rc != 0:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise OSError(f"fastio tsv_write_matrix failed with code {rc} for {path}")
    os.replace(tmp, str(path))
    return True


def gzip_member_format(path) -> Optional[str]:
    """Classify a file's gzip framing: 'native' (multi-member chain whose
    headers carry the writer's 'GX' size subfield -- parallel-inflatable),
    'foreign' (valid gzip without it -- e.g. pandas-written; inflates
    serially), or None (not gzip at all, e.g. a plain .tsv)."""
    with open(str(path), "rb") as fh:
        head = fh.read(4096)
    if len(head) < 18 or head[:2] != b"\x1f\x8b" or head[2] != 8:
        return None
    if not head[3] & 0x04:                        # no FEXTRA
        return "foreign"
    xlen = int.from_bytes(head[10:12], "little")
    extra = head[12:12 + xlen]
    i = 0
    while i + 4 <= len(extra):
        sid, slen = extra[i:i + 2], int.from_bytes(extra[i + 2:i + 4],
                                                   "little")
        if sid == b"GX" and slen == 4:
            return "native"
        i += 4 + slen
    return "foreign"


def migrate_tsv_gz(path) -> bool:
    """Rewrite a FOREIGN (single-member) .tsv.gz in the native multi-member
    format, value-exactly (see :func:`read_tsv_matrix`'s ``migrate``). A
    no-op (False) when the file is already native-framed, not gzip, or the
    native codec / write permission is unavailable. Call this BEFORE any
    mtime-keyed caching of the parse, so the cache keys on the migrated
    file. Only for OWN cache artifacts -- never user-authored inputs."""
    try:
        if (not str(path).endswith(".gz") or not available()
                or gzip_member_format(path) != "foreign"
                or not os.access(str(path), os.W_OK)):
            return False
        return read_tsv_matrix(path, migrate=True) is not None
    except Exception:
        return False                              # best-effort, never raise


def read_tsv_matrix(path, migrate: bool = False
                    ) -> Optional[Tuple[list, list, np.ndarray]]:
    """Read a numeric TSV(.gz) -> (row_names, col_names, float64 matrix);
    None if native unavailable.

    ``migrate=True``: after reading a FOREIGN .gz (single-member, e.g.
    written by the pandas fallback when no toolchain was available at
    prepare time), atomically rewrite it in the native multi-member format
    so every subsequent read inflates across the thread pool. Value-exact:
    the writer emits integers verbatim and non-integral doubles as %.17g
    (lossless float64 round-trip). Only for OWN cache artifacts
    (.unified.tsv.gz contract) -- never pass user-authored inputs.
    Best-effort: a failed rewrite leaves the original untouched.
    """
    lib = get_lib()
    if lib is None:
        return None
    if not os.path.exists(str(path)):
        raise FileNotFoundError(str(path))
    h = lib.tsv_open(str(path).encode())
    if not h:
        raise OSError(f"fastio tsv_open failed for {path}")
    try:
        n_rows = lib.tsv_n_rows(h)
        n_cols = lib.tsv_n_cols(h)
        values = np.empty((n_rows, n_cols), np.float64)
        lib.tsv_copy_values(h, values.ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)))
        rows = [lib.tsv_row_name(h, i).decode() for i in range(n_rows)]
        cols = [lib.tsv_col_name(h, i).decode() for i in range(n_cols)]
        index_name = lib.tsv_index_name(h).decode()
    finally:
        lib.tsv_free(h)
    if migrate and str(path).endswith(".gz"):
        try:
            if (gzip_member_format(path) == "foreign"
                    and os.access(str(path), os.W_OK)):
                write_tsv_matrix(path, rows, cols, values,
                                 index_name=index_name or "Gene")
        except Exception:
            pass                                  # reads must never fail here
    return rows, cols, values


def read_tsv_dataframe(path, migrate: bool = False):
    """Native TSV read as a pandas DataFrame; None if unavailable.
    ``migrate``: see :func:`read_tsv_matrix`."""
    out = read_tsv_matrix(path, migrate=migrate)
    if out is None:
        return None
    import pandas as pd

    rows, cols, values = out
    if np.isnan(values).any():
        # The C++ parser writes NaN for BOTH empty cells (pandas semantics)
        # and unparseable text tokens (strtod failure) -- indistinguishable
        # here, and our numeric count TSVs never contain NaN. So any NaN
        # means "not confidently numeric": decline, and let the caller's
        # pandas fallback decide -- it parses legit empties identically and
        # fails LOUDLY on text columns (object dtype -> astype raises),
        # where serving the native frame would silently train on NaN. (The
        # migrate path only ever rewrites our own .unified caches, which
        # are numeric by construction, so declining after a migrating parse
        # does not strand a rewritten user file.)
        return None
    return pd.DataFrame(values, index=rows, columns=cols)


# --- JPEG batch decode (patchio.cpp) ----------------------------------------

_PATCH_SRC = Path(__file__).with_name("patchio.cpp")
_patch_lib = None
_patch_lib_failed = False


def _build_patch_lib() -> Optional[ctypes.CDLL]:
    src = _PATCH_SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so_path = _BUILD_DIR / f"patchio-{tag}.so"
    if not so_path.exists():
        _BUILD_DIR.mkdir(exist_ok=True)
        # pid+serial-unique tmp (same rule as write_tsv_matrix): two
        # processes racing the first build must never os.replace a torn .so
        # onto the content-hash path, which would disable the native tier
        # until someone deletes _build/
        tmp = so_path.with_suffix(f".so.tmp.{os.getpid()}-{next(_tmp_serial)}")
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", str(_PATCH_SRC),
               "-o", str(tmp), "-ljpeg"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)

    lib = ctypes.CDLL(str(so_path))
    lib.jpeg_decode_batch.restype = ctypes.c_int
    lib.jpeg_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    return lib


def get_patch_lib() -> Optional[ctypes.CDLL]:
    """The compiled JPEG patch-decode library, building it on first use;
    None when the toolchain/libjpeg is missing (callers fall back to PIL)."""
    global _patch_lib, _patch_lib_failed
    if _patch_lib is None and not _patch_lib_failed:
        with _build_lock:
            if _patch_lib is None and not _patch_lib_failed:
                try:
                    _patch_lib = _build_patch_lib()
                except Exception:
                    _patch_lib_failed = True
    return _patch_lib


def decode_jpeg_batch(paths: Sequence, patch_size: int,
                      n_threads: int = 0) -> Optional[np.ndarray]:
    """Decode ``paths`` into a (n, patch_size, patch_size, 3) uint8 array.

    Returns None when the native codec is unavailable OR any file is not an
    exact (p, p, 3) JPEG -- callers fall back to the PIL loop. Decodes run
    across a thread pool (``n_threads<=0`` = hardware concurrency).
    """
    lib = get_patch_lib()
    if lib is None or len(paths) == 0:
        return None
    arr, enc = _char_array([str(p) for p in paths])
    out = np.empty((len(paths), patch_size, patch_size, 3), np.uint8)
    rc = lib.jpeg_decode_batch(arr, len(paths), patch_size,
                               out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                               int(n_threads))
    return out if rc == 0 else None
