"""Array-backed dataset classes and the ``create_visium_dataset`` factory.

Same roles as the reference's torch Datasets (count_datasets.py,
image_datasets.py, multimodal_datasets.py, visium_datasets.py:21-132) but
returning numpy arrays shaped for TPU consumption:

* count grids   (H, W, n_genes)  float32, odd-right, channels-LAST
* patch grids   (H, W, P, P, 3)  float32 in [0, 1]
* label grids   (H, W)           int64, 0 = background, 1..N foreground
* spot datasets (n_genes,) / (P, P, 3) per item with labels in [0, N)

``materialize()`` stacks a whole dataset into (inputs, labels) array pairs --
the form the jitted train loops consume. ``__getitem__`` stays lazy per
array/spot for parity with the reference's map-style access.

File-format cache contracts preserved: ``<array>.unified.tsv.gz`` count files
(visium_datasets.py:69) and ``<array>_patches{N}px|{N}um`` patch dirs
(visium_datasets.py:78-88) with ``{name}_{array_col}_{array_row}.jpg`` spot
patches.
"""

from __future__ import annotations

import collections
import functools
import os
import re
import threading
from typing import Callable, Optional, Sequence

import numpy as np

from gridnext_tpu import geometry
from gridnext_tpu.io.annotations import (
    encode_annot_grid,
    encode_labels,
    read_annotated_starray,
    read_annotfile,
    union_classes,
)
from gridnext_tpu.io.spaceranger import find_position_file
from gridnext_tpu.io.unify import array_name, prepare_count_files


def _check_lengths(files, annot_files, position_files, Visium,
                   annot_format: str = "loupe"):
    if annot_files is not None and len(files) != len(annot_files):
        raise ValueError("Length of data files and annot_files must match.")
    if Visium and annot_files is not None and annot_format == "loupe":
        if position_files is None:
            raise ValueError(
                "Must provide Spaceranger position files mapping barcodes to array locations.")
    if (annot_files is not None and position_files is not None
            and len(position_files) != len(annot_files)):
        raise ValueError(
            "Number of Spaceranger position files does not match number of annotation files.")


class _GridDatasetBase:
    """Common: per-array lazy access + stacked materialization."""

    def __len__(self):
        return self._n_arrays

    def source_ids(self):
        """Per-item backing path (count file / patch dir): lets callers
        split by source array (e.g. the CLI's --val-arrays)."""
        if hasattr(self, "count_files"):
            return [str(c) for c in self.count_files]
        return [str(d) for d in self.img_dirs]

    def materialize(self):
        xs, ys = [], []
        for i in range(len(self)):
            x, y = self[i]
            xs.append(x)
            ys.append(y)
        return np.stack(xs), np.stack(ys)


_FRAME_CACHE_MAX = 4
_FRAME_CACHE = collections.OrderedDict()  # (path, delim, mtime_ns, size) -> frame
_FRAME_CACHE_LOCK = threading.Lock()


def _read_count_frame(count_file: str, cfile_delim: str = "\t"):
    """LRU-cached unified-count read, keyed on (path, mtime, size).

    The mtime/size key makes in-process regeneration of a unified file
    (e.g. prepare with a different detection-rate filter) invalidate the
    cached frame instead of serving stale data.

    Migrate-on-first-read: a foreign (pandas-fallback-written) gzip cache
    is value-exactly rewritten in the native multi-member format as part
    of the SAME parse that serves this read (``read_tsv_dataframe(...,
    migrate=True)`` -- one inflate, no second pass), and the cache is
    keyed on the migrated file's stat, so every later epoch's read
    inflates across the thread pool (GNX_CACHE_MIGRATE=0 opts out).
    Gated to OUR ``.unified*.tsv.gz`` cache artifacts by name --
    user-authored count files (arbitrary TSVs through
    CountGridDataset/workflows) are never rewritten.
    """
    count_file = str(count_file)
    st = os.stat(count_file)
    key = (count_file, cfile_delim, st.st_mtime_ns, st.st_size)
    with _FRAME_CACHE_LOCK:
        if key in _FRAME_CACHE:
            _FRAME_CACHE.move_to_end(key)
            return _FRAME_CACHE[key]

    frame = None
    if cfile_delim == "\t":
        from gridnext_tpu import native

        migrate = (".unified" in os.path.basename(count_file)
                   and count_file.endswith(".tsv.gz")
                   and os.environ.get("GNX_CACHE_MIGRATE", "1") != "0")
        frame = native.read_tsv_dataframe(count_file, migrate=migrate)
        if frame is not None and migrate:
            st = os.stat(count_file)  # re-key on the migrated bytes
            key = (count_file, cfile_delim, st.st_mtime_ns, st.st_size)
    if frame is None:
        import pandas as pd

        frame = pd.read_csv(count_file, header=0, index_col=0,
                            sep=cfile_delim)
    with _FRAME_CACHE_LOCK:
        _FRAME_CACHE[key] = frame
        _FRAME_CACHE.move_to_end(key)
        while len(_FRAME_CACHE) > _FRAME_CACHE_MAX:
            _FRAME_CACHE.popitem(last=False)
    return frame


class CountGridDataset(_GridDatasetBase):
    """Per-array (H, W, n_genes) count grids + (H, W) label grids.

    ``annot_format``: 'loupe' (barcode CSVs; requires position_files, class
    encoding over the union of annotations) or 'splotch' (one-hot coordinate
    TSVs; classes encoded inline, no position files needed -- the
    load_count_grid_dataset path of the reference, count_datasets.py:52-72).
    """

    def __init__(self, count_files: Sequence, annot_files: Optional[Sequence] = None,
                 position_files: Optional[Sequence] = None, Visium: bool = True,
                 select_genes: Optional[Sequence[str]] = None,
                 h_st: int = geometry.VISIUM_H_ST, w_st: int = geometry.VISIUM_W_ST,
                 cfile_delim: str = "\t", afile_delim: str = "\t",
                 loupe_delim: str = ",",
                 annot_format: str = "loupe", check_gene_axis: bool = True):
        _check_lengths(count_files, annot_files, position_files, Visium,
                       annot_format)
        self.annot_format = annot_format
        self.count_files = list(count_files)
        self.annot_files = list(annot_files) if annot_files is not None else None
        self.position_files = list(position_files) if position_files is not None else None
        self.select_genes = select_genes
        self.h_st, self.w_st = h_st, w_st
        self.Visium = Visium
        self.cfile_delim = cfile_delim
        self.afile_delim = afile_delim   # Splotch one-hot TSVs
        self.loupe_delim = loupe_delim   # Loupe barcode CSVs
        self._n_arrays = len(self.count_files)

        # Loupe annotations (barcode CSVs + positions) need class encoding
        # over the cross-array union; this is independent of the grid
        # placement convention (``Visium``) -- HD square lattices use
        # Visium=False placement with Loupe annotations.
        self.classes = None
        if (annot_files is not None and annot_format == "loupe"
                and self.position_files is not None):
            self.classes = union_classes(self.annot_files, self.position_files,
                                         afile_delim=loupe_delim)

        # Caches from separate prepare runs may not share a gene axis; fail
        # at construction with a clear message instead of as an np.stack
        # shape error mid-training (direct construction must check; the
        # factory passes check_gene_axis=False since it already checked or
        # just generated the caches -- the check decompresses every cache,
        # so doubling it matters at HD scale).
        if (check_gene_axis and self._n_arrays > 1 and select_genes is None
                and cfile_delim == "\t"
                and all(os.path.exists(cf) for cf in self.count_files)):
            from gridnext_tpu.io.unify import check_unified_gene_axis

            check_unified_gene_axis(self.count_files)

    def __getitem__(self, idx):
        af = self.annot_files[idx] if self.annot_files is not None else None
        pf = (self.position_files[idx]
              if self.position_files is not None and self.annot_format == "loupe"
              else None)
        # route the count parse through the mtime-keyed LRU: streamed grid
        # epochs re-read each array's TSV, and read_annotated_starray only
        # reads the frame -- sharing the cached parse is free
        frame = _read_count_frame(self.count_files[idx], self.cfile_delim)
        counts, annots = read_annotated_starray(
            frame, af, select_genes=self.select_genes,
            h_st=self.h_st, w_st=self.w_st, Visium=self.Visium,
            position_file=pf, cfile_delim=self.cfile_delim,
            afile_delim=self.afile_delim, loupe_delim=self.loupe_delim)
        if annots.dtype.kind not in "iu":
            annots = encode_annot_grid(annots, self.classes)
        return counts.astype(np.float32), annots.astype(np.int64)

    def sample_item(self):
        """Zero input item with the real per-array shape, without assembling
        a grid or parsing the count matrix -- the cheap model-init sample
        for streaming trainers (index-only read for the gene count)."""
        if self.select_genes is not None:
            n_genes = len(self.select_genes)
        else:
            import pandas as pd

            n_genes = len(pd.read_csv(self.count_files[0],
                                      sep=self.cfile_delim, index_col=0,
                                      usecols=[0]).index)
        return np.zeros((self.h_st, self.w_st, n_genes), np.float32)


class CountSpotDataset:
    """Flattened annotated spots: (n_genes,) vectors with labels in [0, N).

    Reference parity: CountDataset (count_datasets.py:77-213), but backed by
    a whole-file read with a small LRU cache instead of one TSV scan per spot
    (the reference's pathological per-__getitem__ pd.read_csv,
    count_datasets.py:185-187).

    Access-pattern note: the frame cache holds 4 files. Globally-shuffled
    lazy iteration over a LARGER cohort thrashes it (a frame re-parse per
    spot); count cohorts are small enough that ``materialize()`` -- the form
    the jitted loops prefer anyway -- is the right call there. Lazy
    streaming is aimed at the image datasets, whose patches load per file.
    """

    def __init__(self, count_files: Sequence, annot_files: Optional[Sequence] = None,
                 position_files: Optional[Sequence] = None, Visium: bool = True,
                 select_genes: Optional[Sequence[str]] = None,
                 cfile_delim: str = "\t", afile_delim: str = ","):
        _check_lengths(count_files, annot_files, position_files, Visium)
        self.count_files = list(count_files)
        self.select_genes = select_genes
        self.cfile_delim = cfile_delim

        self.classes = None
        self._index = []  # (file, coord_str)
        self.annotations = []

        if annot_files is not None and Visium:
            self.classes = union_classes(annot_files, position_files, afile_delim)

        rxp = re.compile(r"\d+_\d+")
        genes0 = None  # cross-file gene-axis consistency (free: frames are
        for i, cf in enumerate(self.count_files):  # read here for indexing)
            frame = _read_count_frame(cf, cfile_delim)
            if self.select_genes is None:
                if genes0 is None:
                    genes0 = list(frame.index)
                else:
                    from gridnext_tpu.io.unify import assert_gene_axis_match

                    assert_gene_axis_match(list(frame.index), genes0, cf,
                                           self.count_files[0])
            if annot_files is not None:
                if Visium:
                    coord_strs, annot_strs = read_annotfile(
                        annot_files[i], position_file=position_files[i],
                        afile_delim=afile_delim)
                    annot_lbls = encode_labels(annot_strs, self.classes)
                else:
                    coord_strs, annot_lbls = read_annotfile(
                        annot_files[i], Visium=False, afile_delim=afile_delim)
                adict = dict(zip(coord_strs, annot_lbls))
                for cstr in frame.columns:
                    if cstr in adict:
                        self._index.append((cf, cstr))
                        self.annotations.append(int(adict[cstr]))
            else:
                for cstr in frame.columns:
                    if rxp.fullmatch(cstr):
                        self._index.append((cf, cstr))

    def __len__(self):
        return len(self._index)

    def __getitem__(self, idx):
        cf, cstr = self._index[idx]
        frame = _read_count_frame(cf, self.cfile_delim)
        col = frame[cstr]
        if self.select_genes is not None:
            col = col.loc[self.select_genes]
        label = self.annotations[idx] if self.annotations else 0
        return col.values.astype(np.float32), np.int64(label)

    def materialize(self):
        xs = np.stack([self[i][0] for i in range(len(self))])
        ys = np.array(self.annotations if self.annotations
                      else np.zeros(len(self)), dtype=np.int64)
        return xs, ys

    def source_ids(self):
        return [cf for cf, _ in self._index]


_PATCH_RXP_TMPL = r".*_(\d+)_(\d+)\.%s"


def _matched_patch_files(imdir: str, img_ext: str):
    """(names, coords) of the patch-cache files in ``imdir`` -- the single
    definition of the ``*_{col}_{row}.{ext}`` filename contract's discovery
    (sorted listing, coordinate parse). fullmatch + escaped extension so
    stray ``...jpg.bak``/``...jpg.tmp`` files are never listed as patches."""
    rxp = re.compile(_PATCH_RXP_TMPL % re.escape(img_ext))
    names, coords = [], []
    for f in sorted(os.listdir(imdir)):
        m = rxp.fullmatch(f)
        if m is not None:
            names.append(f)
            coords.append((int(m.group(1)), int(m.group(2))))
    return names, coords


def _pil_open(path) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path))


def _load_patch(path, transform: Optional[Callable]):
    img = np.asarray(_pil_open(path), dtype=np.float32) / 255.0
    if transform is not None:
        img = transform(img)
    return img


def _decode_patch_batch(paths) -> Optional[np.ndarray]:
    """Native batch decode -> (n, P, P, 3) uint8, or None (caller uses PIL).

    Square RGB JPEGs go through the threaded decoder (native/patchio.cpp,
    bit-identical to PIL -- both wrap libjpeg); anything else, or a missing
    toolchain, returns None.
    """
    if not paths or not str(paths[0]).lower().endswith((".jpg", ".jpeg")):
        return None
    from PIL import Image

    from gridnext_tpu import native

    with Image.open(paths[0]) as im:  # header-only probe
        square_rgb = im.mode == "RGB" and im.size[0] == im.size[1]
        side = im.size[0]
    if not square_rgb:
        return None
    return native.decode_jpeg_batch(paths, side)


def _load_patches(paths, transform: Optional[Callable]) -> np.ndarray:
    """Decode a batch of patch files -> (n, ...) float32 in [0, 1]."""
    raw = _decode_patch_batch(paths)
    if raw is None:
        return np.stack([_load_patch(p, transform) for p in paths])
    imgs = raw.astype(np.float32) / 255.0
    if transform is not None:
        imgs = np.stack([transform(im) for im in imgs])
    return imgs


class PatchGridDataset(_GridDatasetBase):
    """Per-array (H, W, P, P, 3) patch grids + (H, W) label grids.

    Patches load from ``{imgdir}/*_{array_col}_{array_row}.{ext}`` files
    (image_datasets.py:125-232 contract), float32 in [0, 1], channels-last.
    """

    def __init__(self, img_dirs: Sequence, annot_files: Optional[Sequence] = None,
                 position_files: Optional[Sequence] = None, Visium: bool = True,
                 img_transforms: Optional[Callable] = None, afile_delim: str = ",",
                 img_ext: str = "jpg", h_st: int = geometry.VISIUM_H_ST,
                 w_st: int = geometry.VISIUM_W_ST):
        _check_lengths(img_dirs, annot_files, position_files, Visium)
        self.img_dirs = list(img_dirs)
        self.annot_files = list(annot_files) if annot_files is not None else None
        self.position_files = list(position_files) if position_files is not None else None
        self.Visium = Visium
        self.transform = img_transforms
        self.afile_delim = afile_delim
        self.img_ext = img_ext
        self.h_st, self.w_st = h_st, w_st
        self._n_arrays = len(self.img_dirs)

        # Loupe class-union encoding whenever positions are available --
        # decoupled from the placement convention (see CountGridDataset).
        self.classes = None
        if annot_files is not None and self.position_files is not None:
            self.classes = union_classes(self.annot_files, self.position_files,
                                         afile_delim)

    def __getitem__(self, idx):
        adict = None
        if self.annot_files is not None:
            if self.position_files is not None:
                coord_strs, annot_strs = read_annotfile(
                    self.annot_files[idx], position_file=self.position_files[idx],
                    Visium=True, afile_delim=self.afile_delim)
                annot_lbls = encode_labels(annot_strs, self.classes)
            else:
                coord_strs, annot_lbls = read_annotfile(
                    self.annot_files[idx], Visium=False, afile_delim=self.afile_delim)
            adict = dict(zip(coord_strs, annot_lbls))

        annots = np.zeros((self.h_st, self.w_st), dtype=np.int64)
        imdir = str(self.img_dirs[idx])
        names, coords = _matched_patch_files(imdir, self.img_ext)
        if not names:
            raise ValueError(f"No patches found in {self.img_dirs[idx]}")
        paths = [os.path.join(imdir, f) for f in names]
        # batch-decode to uint8, then convert/transform per patch while
        # scattering -- holds 1/4 the transient RAM of a float32 batch
        # (image grids are ~1 GB/array materialized)
        raw = _decode_patch_batch(paths)

        def patch_at(i):
            img = (raw[i].astype(np.float32) / 255.0 if raw is not None
                   else np.asarray(_pil_open(paths[i]), np.float32) / 255.0)
            return self.transform(img) if self.transform is not None else img

        first = patch_at(0)
        patch_grid = np.zeros((self.h_st, self.w_st) + first.shape,
                              dtype=np.float32)
        for i, (a_x, a_y) in enumerate(coords):
            x, y = (geometry.pseudo_hex_to_oddr(a_x, a_y) if self.Visium
                    else (a_x, a_y))
            if adict is not None:
                cstr = f"{a_x}_{a_y}"
                if cstr in adict:
                    annots[y, x] = adict[cstr] + 1  # 0 reserved for background
            patch_grid[y, x] = first if i == 0 else patch_at(i)
        return patch_grid, annots

    def sample_item(self):
        """Zero input item with the real per-array shape: decodes ONE patch
        (for its post-transform shape) instead of the ~3k a full __getitem__
        costs -- the cheap model-init sample for streaming trainers."""
        imdir = str(self.img_dirs[0])
        names, _ = _matched_patch_files(imdir, self.img_ext)
        if not names:
            raise ValueError(f"No patches found in {self.img_dirs[0]}")
        patch = _load_patch(os.path.join(imdir, names[0]), self.transform)
        return np.zeros((self.h_st, self.w_st) + patch.shape, np.float32)


class PatchSpotDataset:
    """Individual spot patches with labels in [0, N) (image_datasets.py:20-122)."""

    def __init__(self, img_dirs: Sequence, annot_files: Optional[Sequence] = None,
                 position_files: Optional[Sequence] = None, Visium: bool = True,
                 img_transforms: Optional[Callable] = None, afile_delim: str = ",",
                 img_ext: str = "jpg"):
        _check_lengths(img_dirs, annot_files, position_files, Visium)
        self.transform = img_transforms
        self.imgpath_mapping = []
        self.annotations = []
        self.classes = None

        if annot_files is not None:
            if Visium:
                self.classes = union_classes(annot_files, position_files, afile_delim)
            for i, (imdir, afile) in enumerate(zip(img_dirs, annot_files)):
                if Visium:
                    coord_strs, annot_strs = read_annotfile(
                        afile, position_file=position_files[i], Visium=True,
                        afile_delim=afile_delim)
                    annot_lbls = encode_labels(annot_strs, self.classes)
                else:
                    coord_strs, annot_lbls = read_annotfile(
                        afile, Visium=False, afile_delim=afile_delim)
                adict = dict(zip(coord_strs, annot_lbls))
                names, coords = _matched_patch_files(str(imdir), img_ext)
                for name, (cx, cy) in zip(names, coords):
                    cstr = f"{cx}_{cy}"
                    if cstr in adict:
                        self.annotations.append(int(adict[cstr]))
                        self.imgpath_mapping.append(
                            os.path.join(str(imdir), name))
        else:
            for imdir in img_dirs:
                # the shared filename-contract discovery, NOT a bare *.jpg
                # glob: a stray thumbnail.jpg must never become a dataset
                # item (wrong shape -> np.stack failure mid-training)
                names, _ = _matched_patch_files(str(imdir), img_ext)
                self.imgpath_mapping.extend(
                    os.path.join(str(imdir), n) for n in names)

    def __len__(self):
        return len(self.imgpath_mapping)

    def __getitem__(self, idx):
        img = _load_patch(self.imgpath_mapping[idx], self.transform)
        label = self.annotations[idx] if self.annotations else 0
        return img, np.int64(label)

    def materialize(self):
        xs = _load_patches(self.imgpath_mapping, self.transform)
        ys = np.array(self.annotations if self.annotations
                      else np.zeros(len(self)), dtype=np.int64)
        return xs, ys

    def source_ids(self):
        return list(self.imgpath_mapping)


class MMSpotDataset:
    """Spot-level multimodal dataset: ``((x_image, x_count), y)`` per spot.

    The reference ships this capability as ``MMAnnDataset``
    (multimodal_datasets.py:41-70, AnnData-backed -- see
    ``io.anndata_io.MMAnnSpotDataset`` for that form) but its factory refuses
    the cache-contract form ("Need to ensure indexing matches between spots",
    visium_datasets.py:126-127). Here alignment is proven by construction:
    spots are keyed on their ``"x_y"`` coordinate string per array, and only
    coordinates present in BOTH the unified count frame and the patch cache
    (and annotated, when annotations are given) are indexed -- so the image
    and count halves of every item describe the same physical spot.

    Count access goes through the shared frame LRU; like CountSpotDataset,
    globally-shuffled lazy iteration over >4 arrays thrashes it -- call
    ``materialize()`` (the jitted loops' preferred form) for such cohorts.
    """

    def __init__(self, count_files: Sequence, img_dirs: Sequence,
                 annot_files: Optional[Sequence] = None,
                 position_files: Optional[Sequence] = None, Visium: bool = True,
                 select_genes: Optional[Sequence[str]] = None,
                 img_transforms: Optional[Callable] = None,
                 cfile_delim: str = "\t", afile_delim: str = ",",
                 img_ext: str = "jpg"):
        if len(count_files) != len(img_dirs):
            raise ValueError("need one patch dir per count file")
        _check_lengths(count_files, annot_files, position_files, Visium)
        self.count_files = [str(c) for c in count_files]
        self.select_genes = select_genes
        self.transform = img_transforms
        self.cfile_delim = cfile_delim

        self.classes = None
        if annot_files is not None and Visium:
            self.classes = union_classes(annot_files, position_files, afile_delim)

        self._index = []   # (count_file, image_path, coord_str)
        self.annotations = []
        genes0 = None  # cross-file gene-axis consistency (see CountSpotDataset)
        for i, (cf, imdir) in enumerate(zip(self.count_files, img_dirs)):
            frame = _read_count_frame(cf, cfile_delim)
            if self.select_genes is None:
                if genes0 is None:
                    genes0 = list(frame.index)
                else:
                    from gridnext_tpu.io.unify import assert_gene_axis_match

                    assert_gene_axis_match(list(frame.index), genes0, cf,
                                           self.count_files[0])
            frame_cols = set(frame.columns)
            adict = None
            if annot_files is not None:
                if Visium:
                    coord_strs, annot_strs = read_annotfile(
                        annot_files[i], position_file=position_files[i],
                        afile_delim=afile_delim)
                    annot_lbls = encode_labels(annot_strs, self.classes)
                else:
                    coord_strs, annot_lbls = read_annotfile(
                        annot_files[i], Visium=False, afile_delim=afile_delim)
                adict = dict(zip(coord_strs, annot_lbls))
            names, coords = _matched_patch_files(str(imdir), img_ext)
            for f, (a_x, a_y) in zip(names, coords):
                cstr = f"{a_x}_{a_y}"
                if cstr not in frame_cols:
                    continue
                if adict is not None:
                    if cstr not in adict:
                        continue
                    self.annotations.append(int(adict[cstr]))
                self._index.append((cf, os.path.join(str(imdir), f), cstr))
        if not self._index:
            raise ValueError(
                "no spots shared between count and patch caches -- were they "
                "generated from the same Spaceranger runs?")

    def __len__(self):
        return len(self._index)

    def __getitem__(self, idx):
        cf, imfile, cstr = self._index[idx]
        col = _read_count_frame(cf, self.cfile_delim)[cstr]
        if self.select_genes is not None:
            col = col.loc[self.select_genes]
        img = _load_patch(imfile, self.transform)
        label = self.annotations[idx] if self.annotations else 0
        return (img, col.values.astype(np.float32)), np.int64(label)

    def sample_item(self):
        (img, cnt), _ = self[0]
        return (np.zeros_like(img), np.zeros_like(cnt))

    def materialize(self):
        imgs = _load_patches([im for _, im, _ in self._index], self.transform)
        counts = []  # index is file-ordered, so the frame LRU never thrashes
        for cf, _, cstr in self._index:
            col = _read_count_frame(cf, self.cfile_delim)[cstr]
            if self.select_genes is not None:
                col = col.loc[self.select_genes]
            counts.append(col.values.astype(np.float32))
        ys = np.array(self.annotations if self.annotations
                      else np.zeros(len(self)), dtype=np.int64)
        return (imgs, np.stack(counts)), ys

    def source_ids(self):
        return [cf for cf, _, _ in self._index]


class MMStackDataset(_GridDatasetBase):
    """Pairs an image and a count grid dataset; zeroes label disagreements.

    (multimodal_datasets.py:21-37 semantics.) Items are ((x_image, x_count), y).
    """

    def __init__(self, image_dataset, count_dataset):
        if len(image_dataset) != len(count_dataset):
            raise ValueError("Datasets must be of the same length!")
        self.image_dataset = image_dataset
        self.count_dataset = count_dataset
        self._n_arrays = len(image_dataset)
        self.classes = getattr(image_dataset, "classes", None)

    def __getitem__(self, idx):
        x1, y1 = self.image_dataset[idx]
        x2, y2 = self.count_dataset[idx]
        y = np.where(y1 != y2, 0, y1)
        return (x1, x2), y

    def sample_item(self):
        """Cheap model-init sample: per-modality zero items."""
        return (self.image_dataset.sample_item(),
                self.count_dataset.sample_item())

    def source_ids(self):
        return self.count_dataset.source_ids()

    def materialize(self):
        xi, xc, ys = [], [], []
        for i in range(len(self)):
            (x1, x2), y = self[i]
            xi.append(x1)
            xc.append(x2)
            ys.append(y)
        return (np.stack(xi), np.stack(xc)), np.stack(ys)


def load_count_dataset(count_files, annot_files=None, select_genes=None):
    """Eagerly load annotated spots from Splotch-format annotation files.

    Reference-named API (count_datasets.py:16-50): returns (X, y) arrays of
    the spot expression vectors and integer labels (argmax of the one-hot
    Splotch columns), skipping mis-annotated spots.
    """
    xs, ys = [], []
    genes0 = cf0 = None
    for i, cf in enumerate(count_files):
        frame = _read_count_frame(str(cf))
        # same in-loop axis check as CountSpotDataset/MMSpotDataset (free:
        # the frame is already read) -- misaligned caches would otherwise
        # stack feature-scrambled spot vectors with no error at all
        if select_genes is None:
            genes = list(frame.index)
            if genes0 is None:
                genes0, cf0 = genes, cf
            else:
                from gridnext_tpu.io.unify import assert_gene_axis_match

                assert_gene_axis_match(genes, genes0, cf, cf0)
        adat = None
        if annot_files is not None:
            import pandas as pd

            adat = pd.read_csv(annot_files[i], header=0, index_col=0, sep="\t")
            adat = adat.loc[:, adat.sum(axis=0) == 1]
        for cstr in frame.columns:
            if adat is not None and cstr not in adat.columns:
                continue
            col = frame[cstr]
            if select_genes is not None:
                col = col.loc[select_genes]
            xs.append(col.values.astype(np.float32))
            ys.append(int(np.argmax(adat[cstr].values)) if adat is not None else 0)
    return np.stack(xs), np.asarray(ys, np.int64)


def load_count_grid_dataset(count_files, annot_files=None, select_genes=None,
                            h_st=geometry.VISIUM_H_ST, w_st=geometry.VISIUM_W_ST,
                            Visium=True):
    """Eagerly load per-array grids with Splotch annotations.

    Reference-named API (count_datasets.py:52-72): returns (X, Y) stacked
    channels-last (N, h, w, genes) count grids and (N, h, w) label grids.
    """
    xs, ys = [], []
    for i, cf in enumerate(count_files):
        af = annot_files[i] if annot_files is not None else None
        counts, annots = read_annotated_starray(
            cf, af, select_genes=select_genes, h_st=h_st, w_st=w_st,
            Visium=Visium)
        xs.append(counts.astype(np.float32))
        ys.append(annots.astype(np.int64))
    return np.stack(xs), np.stack(ys)


def create_visium_dataset(spaceranger_dirs: Sequence, use_count: bool = True,
                          use_image: bool = True, spatial: bool = True,
                          annot_files: Optional[Sequence] = None,
                          fullres_image_files: Optional[Sequence] = None,
                          count_suffix: str = ".unified.tsv.gz",
                          minimum_detection_rate: Optional[float] = 0.02,
                          patch_size_px: Optional[int] = None,
                          patch_size_um: Optional[float] = 100.0,
                          window_size_px: Optional[int] = None,
                          img_transforms: Optional[Callable] = None,
                          select_genes: Optional[Sequence[str]] = None,
                          save_patches_to=None,
                          hd_binning: Optional[str] = None,
                          grid_dims=None):
    """Top-level dataset factory (visium_datasets.py:21-132 parity).

    Generates missing ``.unified.tsv.gz`` count caches and ``_patches*`` image
    caches, then dispatches on (spatial, modality) to the dataset classes.

    ``hd_binning`` (e.g. 'square_008um') selects a Visium HD binned output
    (``outs/binned_outputs/<binning>``: parquet positions + per-binning MEX,
    utils.py:253-287) -- an extension over the reference, whose factory only
    exposes HD through the AnnData builders (visium_datasets.py:221,277).

    ``window_size_px`` crops a larger window around each spot and resizes
    it to the patch size (grid_from_wsi_visium's ``window_size``; the
    reference library supports it but never exposes it through its factory).
    Window-sized caches get their own ``_w{window}`` suffix.

    ``grid_dims`` enables *square-lattice* HD grids: ``"auto"`` infers
    (max_row+1, max_col+1) over the arrays' positions, or pass an explicit
    ``(h, w)``. Grids are then indexed directly by (array_row, array_col)
    (``Visium=False`` placement) and the image branch extracts per-bin
    patches from the fullres image. Without ``grid_dims``, HD positions
    must sit on the 78x64 pseudo-hex lattice (legacy behavior) and the
    image branch is unavailable.
    """
    if not (use_count or use_image):
        raise ValueError("Must utilize at least one data modality")
    if use_image and not (patch_size_px or patch_size_um):
        raise ValueError("Must specify patch size in pixels (int) or um (float)")
    if grid_dims is not None and hd_binning is None:
        raise ValueError("grid_dims is only meaningful with hd_binning")

    spaceranger_dirs = [str(s) for s in spaceranger_dirs]
    hd_square = hd_binning is not None and grid_dims is not None
    if hd_square:
        from gridnext_tpu.io.spaceranger import cohort_hd_lattice_dims

        if isinstance(grid_dims, str):
            if grid_dims != "auto":
                raise ValueError(f"grid_dims must be 'auto' or (h, w); got {grid_dims!r}")
            h_hd, w_hd = cohort_hd_lattice_dims(spaceranger_dirs, hd_binning)
        else:
            h_hd, w_hd = int(grid_dims[0]), int(grid_dims[1])
    if hd_binning is not None:
        from gridnext_tpu.io import unified_count_suffix

        if use_image and not hd_square:
            raise NotImplementedError(
                "hd_binning with use_image=True needs grid_dims (the square "
                "HD bin lattice the patch grid is indexed by); pass "
                "grid_dims='auto' or an explicit (h, w)")
        if spatial and not hd_square:
            # Grid datasets place spots on the 78x64 pseudo-hex Visium
            # lattice. Square-binned HD positions (both column parities per
            # row, indices into the hundreds) do not fit it -- fail loudly
            # instead of overflowing/aliasing in read_annotated_starray.
            from gridnext_tpu.io.spaceranger import read_positions

            for srd in spaceranger_dirs:
                pos = read_positions(srd, hd_binning)
                col = pos["array_col"].astype(int)
                row = pos["array_row"].astype(int)
                if (((col % 2) != (row % 2)).any()
                        or int(row.max()) >= geometry.VISIUM_H_ST
                        or int(col.max()) >= 2 * geometry.VISIUM_W_ST):
                    raise ValueError(
                        f"{srd} [{hd_binning}]: positions are not on the "
                        f"{geometry.VISIUM_H_ST}x{geometry.VISIUM_W_ST} "
                        "pseudo-hex Visium lattice (square HD binning); "
                        "grid datasets cannot represent them. Pass "
                        "grid_dims='auto' (square-lattice grids), use "
                        "spatial=False (spot-level), or the AnnData "
                        "builders (io.anndata_io, hd_binning=...) which "
                        "carry arbitrary HD coordinates.")

        # bin-specific cache name so switching binnings can't serve stale data
        count_suffix = unified_count_suffix(hd_binning, count_suffix)

    count_files = None
    if use_count:
        count_files = [os.path.join(srd, array_name(srd) + count_suffix)
                       for srd in spaceranger_dirs]
        if not all(os.path.exists(cf) for cf in count_files):
            print(f"No unified countfiles detected (*{count_suffix}) -- generating...")
            prepare_count_files(spaceranger_dirs, count_suffix, minimum_detection_rate,
                                hd_binning=hd_binning)
        elif len(count_files) > 1:
            # caches from separate prepare runs may not share a gene axis
            from gridnext_tpu.io.unify import check_unified_gene_axis

            check_unified_gene_axis(count_files)

    patch_dirs = None
    if use_image:
        from gridnext_tpu.pipeline import (distance_um_to_px,
                                           patch_cache_suffix,
                                           save_visium_patches)

        # shared cache-naming contract with CLI `prepare` (the use_image
        # guard above ensures hd_square, so (h_hd, w_hd) are set here)
        patch_suffix = patch_cache_suffix(
            patch_size_px=patch_size_px, patch_size_um=patch_size_um,
            window_size_px=window_size_px, hd_binning=hd_binning,
            hd_dims=(h_hd, w_hd) if hd_binning is not None else None)
        if save_patches_to is None:
            patch_dirs = [os.path.join(srd, array_name(srd) + patch_suffix)
                          for srd in spaceranger_dirs]
        else:
            os.makedirs(save_patches_to, exist_ok=True)
            patch_dirs = [os.path.join(str(save_patches_to),
                                       array_name(srd) + patch_suffix)
                          for srd in spaceranger_dirs]
        missing = [i for i, pd_ in enumerate(patch_dirs)
                   if not os.path.exists(pd_)]
        if missing:
            print(f"No extracted image patches detected for {len(missing)} "
                  f"array(s) (*{patch_suffix}) -- generating...")
            if fullres_image_files is None:
                raise ValueError("Must provide fullres_image_files to extract image patches")
            # only (re-)extract the arrays whose caches are missing
            for i in missing:
                imfile = fullres_image_files[i]
                if not os.path.exists(imfile):
                    raise ValueError(f"Could not find image file: {imfile}")
                ps = (patch_size_px if patch_size_px is not None
                      else distance_um_to_px(spaceranger_dirs[i], patch_size_um,
                                             hd_binning=hd_binning))
                save_visium_patches(imfile, spaceranger_dirs[i], patch_dirs[i],
                                    patch_size=ps, window_size=window_size_px,
                                    hd_binning=hd_binning,
                                    h_st=h_hd if hd_square else None,
                                    w_st=w_hd if hd_square else None)

    position_files = [find_position_file(srd, hd_binning)
                      for srd in spaceranger_dirs]

    if spatial:
        # HD square lattices index grids directly by (array_row, array_col);
        # Loupe annotation reading still goes through the positions file.
        grid_kw = (dict(Visium=False, h_st=h_hd, w_st=w_hd) if hd_square
                   else dict(Visium=True))
        dat_image = dat_count = None
        if use_image:
            dat_image = PatchGridDataset(patch_dirs, annot_files=annot_files,
                                         position_files=position_files,
                                         img_transforms=img_transforms, **grid_kw)
        if use_count:
            # the factory already checked (or just generated) the gene axis
            dat_count = CountGridDataset(count_files, annot_files=annot_files,
                                         position_files=position_files,
                                         select_genes=select_genes,
                                         check_gene_axis=False, **grid_kw)
        if use_image and use_count:
            return MMStackDataset(dat_image, dat_count)
        return dat_image if use_image else dat_count

    if use_image and use_count:
        # the reference factory refuses this combination
        # (visium_datasets.py:126-127, "Need to ensure indexing matches");
        # MMSpotDataset aligns modalities by coordinate key, so it exists here
        return MMSpotDataset(count_files, patch_dirs, annot_files=annot_files,
                             position_files=position_files, Visium=True,
                             select_genes=select_genes,
                             img_transforms=img_transforms)
    if use_image:
        return PatchSpotDataset(patch_dirs, annot_files=annot_files,
                                position_files=position_files, Visium=True,
                                img_transforms=img_transforms)
    return CountSpotDataset(count_files, annot_files=annot_files,
                            position_files=position_files, Visium=True,
                            select_genes=select_genes)


class Subset:
    """Index-subset view of a map-style dataset, with an optional transform.

    Lets the training loops stream train/val splits straight off a lazy
    dataset (one batch resident at a time) instead of materializing whole
    cohorts -- the image grids are ~1 GB/array at 128px.
    """

    def __init__(self, dataset, indices, transform: Optional[Callable] = None):
        self.dataset = dataset
        self.indices = np.asarray(indices, dtype=np.int64)
        self.transform = transform

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        x, y = self.dataset[int(self.indices[i])]
        if self.transform is not None:
            x = self.transform(x)
        return x, y
