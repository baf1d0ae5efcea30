"""Dense HD training ingest: image grids straight from fullres slides.

The cache-based image pipeline (the reference's contract,
imgprocess.py:162-238 -> image_datasets.py:125-232) materializes one JPEG
per bin before training can start -- ~147k files PER SLIDE at Visium HD
capture-area scale (16um binning, 384x384 bins). But HD bins tile the
slide contiguously (pitch == bin size), so when the lattice is an exact
integer-pitch tiling the whole (H, W, P, P, 3) training grid is ONE
reshape of the decoded slide: no patch files, no per-bin crop loop, no
cache directory at all. This is the serving-side ``register_dense``
insight (serving.fit_dense_lattice) applied to training.

:class:`DenseWSIGridDataset` is a drop-in for
:class:`~gridnext_tpu.data.datasets.PatchGridDataset` (same item contract:
(H, W, P, P, 3) float32 in [0, 1] + (H, W) int64 labels, 0 background),
feeding ``train_gridwise`` directly::

    ds = DenseWSIGridDataset(image_files, spaceranger_dirs, annot_files,
                             patch_size=32, hd_binning="square_016um",
                             grid_dims=(384, 384))
    tx = make_gridwise_optimizer(1e-3, f_lr=1e-4)      # f AND g train
    train_gridwise(g, {"train": ds}, tx=tx, ...)

Scope: exact integer-pitch lattices with ``patch_size == pitch`` (the
native-resolution HD configuration). Fractional-pitch cohorts need the
device resample (serving's banded ``scale_and_translate``) -- use the
cache-based pipeline for training there, or pre-resample the slides.
Mixed-size cohorts work: extraction covers each slide's own listed-bin
extent and pads the cohort-max grid with background rows/cols.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from gridnext_tpu.io import read_positions
from gridnext_tpu.io.annotations import (encode_labels, read_annotfile,
                                         union_classes)
from gridnext_tpu.io.spaceranger import find_position_file


class DenseWSIGridDataset:
    """Per-array (H, W, P, P, 3) patch grids tiled directly from slides.

    Args:
      image_files: fullres slide images, one per array.
      spaceranger_dirs: matching Spaceranger dirs (positions per array).
      annot_files: optional Loupe annotation CSVs (labels; bins without an
        annotation stay 0/background like the cache-based datasets).
      patch_size: bin patch side in pixels; must equal the lattice pitch.
      hd_binning: Visium HD binned-output name for position lookup.
      grid_dims: (h_st, w_st) bin lattice dims, or "auto" to infer the
        cohort-max lattice from positions (the factory's semantics,
        datasets.create_visium_dataset).
      decode: override the slide decode function (ingest.decode_slide).

    Background bins (not listed in positions / not in tissue) are zeroed,
    matching the training convention of the cache-based grids (background
    cells are literal zero patches, so the corrector learns f(0) context).
    """

    def __init__(self, image_files: Sequence, spaceranger_dirs: Sequence,
                 annot_files: Optional[Sequence] = None, *,
                 patch_size: int, grid_dims,
                 hd_binning: Optional[str] = None, decode=None):
        if len(image_files) != len(spaceranger_dirs):
            raise ValueError("need one spaceranger dir per image file")
        if annot_files is not None and len(annot_files) != len(image_files):
            raise ValueError("need one annotation file per image file")
        self.image_files = [str(f) for f in image_files]
        self.spaceranger_dirs = [str(s) for s in spaceranger_dirs]
        self.annot_files = (list(annot_files) if annot_files is not None
                            else None)
        self.patch_size = int(patch_size)
        self.hd_binning = hd_binning
        if isinstance(grid_dims, str):
            if grid_dims != "auto":
                raise ValueError(f"grid_dims must be 'auto' or (h, w); "
                                 f"got {grid_dims!r}")
            if hd_binning is None:
                raise ValueError("grid_dims='auto' needs hd_binning")
            from gridnext_tpu.io.spaceranger import cohort_hd_lattice_dims

            grid_dims = cohort_hd_lattice_dims(self.spaceranger_dirs,
                                               hd_binning)
        self.h_st, self.w_st = int(grid_dims[0]), int(grid_dims[1])
        self._plans = {}   # idx -> fitted lattice plan (deterministic)
        if decode is None:
            from gridnext_tpu.ingest import decode_slide

            decode = decode_slide
        self.decode = decode

        self.position_files = [find_position_file(srd, hd_binning)
                               for srd in self.spaceranger_dirs]
        self.classes = None
        if self.annot_files is not None:
            self.classes = union_classes(self.annot_files,
                                         self.position_files)

    def __len__(self):
        return len(self.image_files)

    def _plan(self, idx, wsi_shape):
        plan = self._plans.get(idx)   # the fit is ~2 lstsq over every bin;
        if plan is not None:          # once per array, not once per epoch
            return plan
        from gridnext_tpu.serving import fit_dense_lattice

        pos = read_positions(self.spaceranger_dirs[idx], self.hd_binning)
        plan = fit_dense_lattice(pos, self.h_st, self.w_st, self.patch_size,
                                 wsi_shape)
        if plan is None or plan[0] != "exact":
            raise ValueError(
                f"{self.spaceranger_dirs[idx]}: positions are not an exact "
                f"integer {self.patch_size}px-pitch lattice inside the "
                f"image -- dense ingest needs pitch == patch_size exactly; "
                "use the cache-based pipeline (create_visium_dataset) for "
                "fractional-pitch or irregular cohorts")
        self._plans[idx] = plan
        return plan

    def __getitem__(self, idx):
        p = self.patch_size
        wsi = self.decode(self.image_files[idx])
        _, oy0, ox0, fg, ey, ex = self._plan(idx, wsi.shape)

        # tile only the in-tissue bin extent (ey, ex); a slide smaller than a
        # cohort-max lattice pads with background rows/cols, exactly like
        # the cache-based grids
        region = wsi[oy0:oy0 + ey * p, ox0:ox0 + ex * p]
        tiles = region.reshape(ey, p, ex, p, 3)
        tiles = tiles.transpose(0, 2, 1, 3, 4).astype(np.float32) / 255.0
        grid = np.zeros((self.h_st, self.w_st, p, p, 3), np.float32)
        grid[:ey, :ex] = tiles
        # background bins are zero patches, exactly like the cache-based
        # grids (PatchGridDataset leaves unlisted coords at 0.0)
        grid *= (fg > 0)[:, :, None, None, None]

        annots = np.zeros((self.h_st, self.w_st), np.int64)
        if self.annot_files is not None:
            coord_strs, annot_strs = read_annotfile(
                self.annot_files[idx],
                position_file=self.position_files[idx], Visium=True)
            adict = dict(zip(coord_strs,
                             encode_labels(annot_strs, self.classes)))
            oy, ox = np.nonzero(fg)
            for y, x in zip(oy, ox):
                lbl = adict.get(f"{x}_{y}")
                if lbl is not None:
                    annots[y, x] = int(lbl) + 1   # 0 reserved for background
        return grid, annots

    def materialize(self):
        """Whole cohort as ((N, H, W, P, P, 3), (N, H, W)) arrays -- the
        non-streaming trainer contract (cli --no-stream). RAM-bound at
        capture-area scale; meant for small cohorts."""
        items = [self[i] for i in range(len(self))]
        return (np.stack([x for x, _ in items]),
                np.stack([y for _, y in items]))

    def sample_item(self):
        """Zero item with the real per-array shape (cheap model-init sample
        for streaming trainers -- no slide decode)."""
        return np.zeros((self.h_st, self.w_st, self.patch_size,
                         self.patch_size, 3), np.float32)

    def source_ids(self):
        # Spaceranger dirs, not image paths: --val-arrays matches array dir
        # basenames (cli._split_dls), same as every cache-based dataset
        return list(self.spaceranger_dirs)
