"""AnnData builders (optional tier -- requires the ``anndata`` package).

Parity with visium_datasets.py:221-353: ``create_visium_anndata`` assembles
annotated multi-array count data into one AnnData (obs: x, y, x_px, y_px,
array, annotation; var: gene_symbol); ``create_visium_anndata_img`` adds
per-spot image-patch paths (obs['imgpath']), extracting patches on demand.

anndata is not a hard dependency of this framework; every function raises a
clear ImportError if it is missing. The array-native dataset layer
(data.datasets) covers the same workflows without it.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from gridnext_tpu.io.spaceranger import (
    read_feature_matrix,
    read_feature_names,
    read_positions,
)


def _require_anndata():
    try:
        import anndata as ad
        return ad
    except ImportError as e:
        raise ImportError(
            "this function requires the optional 'anndata' package") from e


def assemble_visium_frames(spaceranger_dirs: Sequence,
                           annot_files: Optional[Sequence] = None,
                           hd_binning: Optional[str] = None):
    """Per-array (counts, obs, var) assembly as PLAIN pandas frames.

    The pure assembly core of :func:`create_visium_anndata`
    (visium_datasets.py:221-266 semantics), split out so every line of it
    executes and tests without the optional ``anndata`` package:

    - counts: (spots x genes) frame over the array's IN-TISSUE barcodes,
      intersected with the annotation file's labeled barcodes when one is
      given (blank Loupe cells dropped -- the reference's ``!= ''`` filter
      keeps NaN rows and poisons the class list, visium_datasets.py:243);
    - obs: x/y (pseudo-hex array_col/array_row), x_px/y_px, array name, and
      ``annotation``, indexed ``{array}_{x}_{y}``;
    - var: ``gene_symbol`` indexed by gene id.

    Returns a list of ``(counts, obs, var)`` triples, one per array, in
    input order (the concatenation ordering contract).
    """
    import pandas as pd

    frames = []
    for i, srd in enumerate(spaceranger_dirs):
        df_counts = read_feature_matrix(srd, hd_binning=hd_binning).T
        df_pos = read_positions(srd, hd_binning=hd_binning)
        df_feats = read_feature_names(srd, hd_binning=hd_binning)

        barcodes = df_pos[df_pos["in_tissue"].astype(int) == 1].index

        df_annot = None
        if annot_files is not None:
            df_annot = pd.read_csv(annot_files[i], header=0, index_col=0, sep=",")
            # blank Loupe cells parse as NaN, not "" -- the reference's
            # `!= ''` filter keeps them and poisons the class list
            # (visium_datasets.py:243; same fix as annotations.py read_annotfile)
            first = df_annot.iloc[:, 0]
            df_annot = df_annot.loc[first.notna() & (first.astype(str) != "")]
            barcodes = barcodes.intersection(df_annot.index)

        arr = Path(srd).stem
        obs = pd.DataFrame({
            "x": df_pos.loc[barcodes, "array_col"],
            "y": df_pos.loc[barcodes, "array_row"],
            "x_px": df_pos.loc[barcodes, "pxl_col_in_fullres"],
            "y_px": df_pos.loc[barcodes, "pxl_row_in_fullres"],
            "array": arr,
        })
        if df_annot is not None:
            obs["annotation"] = df_annot.loc[barcodes].iloc[:, 0]
        obs.index = [f"{arr}_{x}_{y}" for x, y in zip(obs["x"], obs["y"])]

        var = pd.DataFrame(
            {"gene_symbol": df_feats.loc[df_counts.columns, "gene_symbol"]},
            index=df_counts.columns)
        counts = df_counts.loc[barcodes, :]
        counts.index = obs.index  # rows keyed like obs ({array}_{x}_{y})
        frames.append((counts, obs, var))
    return frames


def concat_visium_frames(frames):
    """Outer-join concatenation of per-array (counts, obs, var) frames.

    The pure analog of ``ad.concat(axis=0, join='outer', merge='first')``
    (visium_datasets.py:268): spot rows stack in array order; the gene axis
    is the union of per-array genes in FIRST-OCCURRENCE order with missing
    genes filled 0; var columns take the first array's non-missing value
    per gene. Returns ``(X, obs, var)`` plain frames ready for one
    ``AnnData(...)`` construction.
    """
    import pandas as pd

    gene_order = []
    seen = set()
    for counts, _obs, _var in frames:
        for g in counts.columns:
            if g not in seen:
                seen.add(g)
                gene_order.append(g)
    X = pd.concat(
        [counts.reindex(columns=gene_order, fill_value=0)
         for counts, _obs, _var in frames], axis=0).fillna(0)
    obs = pd.concat([o for _c, o, _v in frames], axis=0)
    # merge='first': first non-missing var metadata per gene wins
    var = pd.concat([v for _c, _o, v in frames], axis=0)
    var = var[~var.index.duplicated(keep="first")].reindex(gene_order)
    return X, obs, var


def create_visium_anndata(spaceranger_dirs: Sequence, annot_files: Optional[Sequence] = None,
                          destfile=None, hd_binning: Optional[str] = None):
    """Annotated multi-array count AnnData (visium_datasets.py:221-272).

    All frame assembly runs in :func:`assemble_visium_frames` +
    :func:`concat_visium_frames` (pure pandas, fully tested without the
    optional package); only the final ``AnnData(...)`` construction and
    write are gated on ``anndata``.
    """
    ad = _require_anndata()
    from scipy import sparse

    frames = assemble_visium_frames(spaceranger_dirs,
                                    annot_files=annot_files,
                                    hd_binning=hd_binning)
    X, obs, var = concat_visium_frames(frames)
    adata_all = ad.AnnData(X=sparse.csr_matrix(X.values.astype(np.float32)),
                           obs=obs, var=var)
    if destfile is not None:
        adata_all.write(destfile, compression="gzip")
    return adata_all


def attach_imgpaths(frames, imgpatch_dirs):
    """Attach per-spot patch paths to assembled frames; drop missing ones.

    The pure imgpath-join core of :func:`create_visium_anndata_img`
    (visium_datasets.py:341-353 semantics): for each array's
    ``(counts, obs, var)`` triple, ``obs['imgpath']`` is
    ``<dir>/{array}_{x}_{y}.jpg`` and rows whose patch file does not exist
    (background/edge spots the patch writer skipped) are filtered from BOTH
    counts and obs. Returns the filtered triples.
    """
    out = []
    for (counts, obs, var), pdir in zip(frames, imgpatch_dirs):
        arrs = obs["array"].unique()
        assert len(arrs) == 1, "one array per assembled frame"
        arr = arrs[0]
        imfiles = [os.path.join(str(pdir), f"{arr}_{x}_{y}.jpg")
                   for x, y in zip(obs["x"], obs["y"])]
        obs = obs.copy()
        obs["imgpath"] = imfiles
        keep = np.array([os.path.exists(im) for im in imfiles], bool)
        out.append((counts.loc[keep], obs.loc[keep], var))
    return out


def resolve_imgpatch_dirs(spaceranger_dirs: Sequence, fullres_image_files,
                          patch_size_px: Optional[int] = None,
                          patch_size_um: Optional[float] = 100.0,
                          save_patches_to=None, hd_binning=None):
    """Resolve (and lazily populate) per-array patch-cache directories.

    The cache-naming + generation stage of :func:`create_visium_anndata_img`
    (visium_datasets.py:296-339): directory names follow the shared
    ``patch_cache_suffix`` contract (identical to the dataset factory's, so
    caches interoperate), and any missing directory is built from its
    fullres image via ``save_visium_patches``.
    """
    from gridnext_tpu.pipeline import distance_um_to_px, save_visium_patches

    if patch_size_px is None and patch_size_um is None:
        # same validation as the dataset factory (datasets.py) -- a bare
        # int(None) TypeError would point nowhere
        raise ValueError("Must specify patch size in pixels "
                         "(patch_size_px) or microns (patch_size_um)")
    from gridnext_tpu.io.unify import array_name
    from gridnext_tpu.pipeline import patch_cache_suffix

    if hd_binning is not None:
        # match create_visium_dataset's binning+dims cache naming; HD
        # patch filenames carry direct (array_col, array_row), which is
        # exactly what obs x/y hold for HD, so the imgpath join works.
        # Dims are the COHORT-MAX lattice (identical to the factory's
        # grid_dims='auto'), so caches written here and there share names
        # even when per-array HD lattices differ.
        from gridnext_tpu.io.spaceranger import cohort_hd_lattice_dims

        cohort_dims = cohort_hd_lattice_dims(spaceranger_dirs, hd_binning)
    else:
        cohort_dims = None
    hd_dims = [cohort_dims] * len(spaceranger_dirs)
    suffixes = [patch_cache_suffix(patch_size_px, patch_size_um,
                                   hd_binning=hd_binning,
                                   hd_dims=cohort_dims)] * len(spaceranger_dirs)
    if save_patches_to is None:
        imgpatch_dirs = [os.path.join(str(srd), array_name(srd) + sfx)
                         for srd, sfx in zip(spaceranger_dirs, suffixes)]
    else:
        os.makedirs(save_patches_to, exist_ok=True)
        imgpatch_dirs = [os.path.join(str(save_patches_to),
                                      array_name(srd) + sfx)
                         for srd, sfx in zip(spaceranger_dirs, suffixes)]
    for imfile, pdir, srd, dims in zip(fullres_image_files, imgpatch_dirs,
                                       spaceranger_dirs, hd_dims):
        if not os.path.exists(pdir):
            if not os.path.exists(imfile):
                raise ValueError(f"Could not find image file: {imfile}")
            ps = (patch_size_px if patch_size_px is not None
                  else distance_um_to_px(srd, patch_size_um,
                                         hd_binning=hd_binning))
            save_visium_patches(imfile, srd, pdir, patch_size=ps,
                                hd_binning=hd_binning,
                                h_st=dims[0] if dims else None,
                                w_st=dims[1] if dims else None)
    return imgpatch_dirs


def create_visium_anndata_img(spaceranger_dirs: Sequence, imgpatch_dirs=None,
                              fullres_image_files=None, annot_files=None,
                              destfile=None, patch_size_px: Optional[int] = None,
                              patch_size_um: Optional[float] = 100.0,
                              save_patches_to=None, hd_binning=None):
    """Count AnnData + per-spot image paths (visium_datasets.py:277-353).

    Assembly runs in pure stages -- :func:`assemble_visium_frames`,
    :func:`resolve_imgpatch_dirs`, :func:`attach_imgpaths`,
    :func:`concat_visium_frames` -- all tested without ``anndata``; only the
    final ``AnnData(...)`` construction and write are gated.
    """
    ad = _require_anndata()
    from scipy import sparse

    frames = assemble_visium_frames(spaceranger_dirs,
                                    annot_files=annot_files,
                                    hd_binning=hd_binning)

    if imgpatch_dirs is None and fullres_image_files is None:
        raise ValueError("Must provide either patched image directories or fullres images")

    if imgpatch_dirs is None:
        imgpatch_dirs = resolve_imgpatch_dirs(
            spaceranger_dirs, fullres_image_files,
            patch_size_px=patch_size_px, patch_size_um=patch_size_um,
            save_patches_to=save_patches_to, hd_binning=hd_binning)

    frames = attach_imgpaths(frames, imgpatch_dirs)
    X, obs, var = concat_visium_frames(frames)
    adata_img = ad.AnnData(X=sparse.csr_matrix(X.values.astype(np.float32)),
                           obs=obs, var=var)
    if destfile is not None:
        adata_img.write(destfile, compression="gzip")
    return adata_img


def anndata_to_grids(adata, labels, obs_x: str = "x", obs_y: str = "y",
                     h_st: int = 78, w_st: int = 64, use_pcs=False,
                     vis_coords: bool = True):
    """One array's AnnData -> ((h, w, features), (h, w)) grids, channels-last.

    (utils.py:197-217 semantics; labels are shifted +1, 0 = background.)
    """
    from scipy import sparse

    from gridnext_tpu import geometry

    if use_pcs:
        dat = adata.obsm["X_pca"][:, :use_pcs]
    elif sparse.issparse(adata.X):
        dat = np.asarray(adata.X.todense())
    else:
        dat = np.asarray(adata.X)

    counts_grid = np.zeros((h_st, w_st, dat.shape[1]), np.float32)
    labels_grid = np.zeros((h_st, w_st), np.int64)

    xs = np.asarray(adata.obs[obs_x], dtype=int)
    ys = np.asarray(adata.obs[obs_y], dtype=int)
    if vis_coords:
        xs, ys = geometry.pseudo_hex_to_oddr(xs, ys)
    labels_grid[ys, xs] = np.asarray(labels) + 1
    counts_grid[ys, xs] = dat
    return counts_grid, labels_grid


def anndata_to_spot_arrays(adata, obs_label: str, use_pcs=False):
    """(X, y, classes) spot arrays from AnnData (anndata_to_tensordataset
    analog, count_datasets.py:347-376)."""
    from scipy import sparse

    labels_raw = np.asarray(adata.obs[obs_label])
    classes = np.unique(labels_raw)
    y = np.searchsorted(classes, labels_raw).astype(np.int64)
    X = adata.obsm["X_pca"][:, :use_pcs] if use_pcs else adata.X
    if sparse.issparse(X):
        X = np.asarray(X.todense())
    return np.asarray(X, np.float32), y, classes


class MMAnnSpotDataset:
    """Lazy spot-level multimodal dataset over an imgpath-bearing AnnData:
    ``((x_image, x_count), y)`` per spot.

    Direct ``MMAnnDataset`` parity (multimodal_datasets.py:41-70): counts
    come from ``adata.X`` (or the first ``use_pcs`` columns of
    ``obsm['X_pca']``), images load from ``obs[obs_img]`` paths as written by
    :func:`create_visium_anndata_img`, labels encode alphanumerically over
    ``obs[obs_label]``. Map-style: feeds the train loops' streaming form
    directly, or ``materialize()`` for the jitted array form.
    """

    def __init__(self, adata, obs_label: str, obs_img: str = "imgpath",
                 use_pcs=None, img_transforms=None):
        from scipy import sparse

        labels_raw = np.asarray(adata.obs[obs_label])
        self.classes = np.unique(labels_raw)
        self.annotations = np.searchsorted(self.classes, labels_raw).astype(np.int64)
        X = (adata.obsm["X_pca"][:, :use_pcs] if use_pcs
             else adata.X)
        if sparse.issparse(X):
            X = np.asarray(X.todense())
        self._X = np.asarray(X, np.float32)
        self.imgfiles = [str(p) for p in adata.obs[obs_img]]
        self.transform = img_transforms

    def __len__(self):
        return len(self.imgfiles)

    def __getitem__(self, idx):
        from gridnext_tpu.data.datasets import _load_patch

        img = _load_patch(self.imgfiles[idx], self.transform)
        return (img, self._X[idx]), np.int64(self.annotations[idx])

    def sample_item(self):
        (img, cnt), _ = self[0]
        return (np.zeros_like(img), np.zeros_like(cnt))

    def materialize(self):
        from gridnext_tpu.data.datasets import _load_patches

        imgs = _load_patches(self.imgfiles, self.transform)
        return (imgs, self._X.copy()), self.annotations.copy()


def anndata_mm_to_grid_arrays(adata, obs_label: str, obs_arr: str,
                              obs_img: str = "imgpath", obs_x="x", obs_y="y",
                              h_st: int = 78, w_st: int = 64, use_pcs=False,
                              vis_coords: bool = True, img_transforms=None):
    """Multimodal AnnData -> ((X_img, X_count), Y) stacked grid arrays.

    The MMAnnGridDataset analog (multimodal_datasets.py:73-132): count grids
    from X/obsm plus per-spot image patches loaded from ``obs[obs_img]``
    paths (as written by create_visium_anndata_img). Channels-last.
    """
    from gridnext_tpu import geometry
    from gridnext_tpu.data.datasets import _load_patch

    labels_raw = np.asarray(adata.obs[obs_label])
    classes = np.unique(labels_raw)
    arrays = list(dict.fromkeys(np.asarray(adata.obs[obs_arr])))

    xi_list, xc_list, y_list = [], [], []
    for arr in arrays:
        adata_arr = adata[np.asarray(adata.obs[obs_arr]) == arr]
        lbls = np.searchsorted(classes, np.asarray(adata_arr.obs[obs_label]))
        cg, lg = anndata_to_grids(adata_arr, lbls, obs_x=obs_x, obs_y=obs_y,
                                  h_st=h_st, w_st=w_st, use_pcs=use_pcs,
                                  vis_coords=vis_coords)
        patch_grid = None
        xs = np.asarray(adata_arr.obs[obs_x], dtype=int)
        ys = np.asarray(adata_arr.obs[obs_y], dtype=int)
        if vis_coords:
            xs, ys = geometry.pseudo_hex_to_oddr(xs, ys)
        for imfile, x, y in zip(np.asarray(adata_arr.obs[obs_img]),
                                np.atleast_1d(xs), np.atleast_1d(ys)):
            patch = _load_patch(imfile, img_transforms)
            if patch_grid is None:
                patch_grid = np.zeros((h_st, w_st) + patch.shape, np.float32)
            patch_grid[y, x] = patch
        xi_list.append(patch_grid)
        xc_list.append(cg)
        y_list.append(lg)
    return (np.stack(xi_list), np.stack(xc_list)), np.stack(y_list), classes


def anndata_to_grid_arrays(adata, obs_label: str, obs_arr: str, obs_x="x",
                           obs_y="y", h_st: int = 78, w_st: int = 64,
                           use_pcs=False, vis_coords: bool = True,
                           arrays_ordered=None):
    """(X, Y, classes) stacked grid arrays over all arrays
    (anndata_arrays_to_tensordataset analog, count_datasets.py:427-477)."""
    labels_raw = np.asarray(adata.obs[obs_label])
    classes = np.unique(labels_raw)

    if arrays_ordered is None:
        arrays_ordered = adata.obs[obs_arr].unique()

    xs, ys = [], []
    for arr in arrays_ordered:
        adata_arr = adata[adata.obs[obs_arr] == arr]
        if len(adata_arr) == 0:
            print(f"Warning: no spots found for array {arr}")
            continue
        lbls = np.searchsorted(classes, np.asarray(adata_arr.obs[obs_label]))
        cg, lg = anndata_to_grids(adata_arr, lbls, obs_x=obs_x, obs_y=obs_y,
                                  h_st=h_st, w_st=w_st, use_pcs=use_pcs,
                                  vis_coords=vis_coords)
        xs.append(cg)
        ys.append(lg)
    return np.stack(xs), np.stack(ys), classes
