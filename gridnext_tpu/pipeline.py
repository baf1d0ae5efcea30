"""WSI -> per-spot patch-grid extraction: the preprocessing hot path.

The reference loops PIL crop/resize over ~5k spots per array
(imgprocess.py:162-238, the per-spot HOT LOOP of SURVEY.md section 3.1). Here
extraction is a single **composed gather**: per-spot pixel boxes and the
resize index maps are precomputed, so crop + nearest sampling collapse into
one fancy-index (host) or one XLA gather (device) producing the whole
(H_ST, W_ST, P, P, 3) grid at once.

Resize parity notes:
* the tutorials call ``grid_from_wsi_visium`` with ``window_size=None`` =>
  window == patch_size => pure crop, bit-exact on both paths.
* when ``window_size != patch_size`` the reference resizes with PIL's
  default filter (bicubic + antialias). The host path defers to PIL per
  patch for exact parity; the device path uses ``jax.image.resize`` (cubic,
  antialias=True -- the same separable filter family) rounded back to
  integer pixel values. Residual vs PIL is PIL's internal fixed-point
  per-pass quantization: <= ~1 gray level on natural images
  (tests/test_pipeline.py::test_device_resize_pil_parity).

Also here: µm->px resolution inference (imgprocess.py:89-109), the JPEG
patch cache writer (imgprocess.py:242-291), and SpaCell color-cast removal
(imgprocess.py:49-67).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import numpy as np

from gridnext_tpu import geometry
from gridnext_tpu.geometry import VISIUM_H_ST, VISIUM_W_ST, pairwise_distances
from gridnext_tpu.io.spaceranger import read_positions

# ImageNet normalization used with pretrained DenseNet
# (Tutorial_visium_image.ipynb cell 4)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def imagenet_normalize(img):
    """Normalize a float [0,1] channels-last image (or batch)."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def make_imagenet_transform(resize: int = 256, crop: int = 224):
    """Per-patch transform matching the image tutorial's torchvision stack:
    Resize(resize) -> CenterCrop(crop) -> Normalize(ImageNet)
    (Tutorial_visium_image.ipynb cell 4). For the ``img_transforms`` hook of
    the patch datasets; input/output are float32 [0,1] channels-last.
    """
    from PIL import Image

    def transform(img: np.ndarray) -> np.ndarray:
        pil = Image.fromarray(np.clip(img * 255.0, 0, 255).astype(np.uint8))
        w, h = pil.size
        # torchvision Resize(int): shorter side -> resize, keep aspect
        if w <= h:
            new_w, new_h = resize, int(round(h * resize / w))
        else:
            new_w, new_h = int(round(w * resize / h)), resize
        pil = pil.resize((new_w, new_h), Image.BILINEAR)
        left = (new_w - crop) // 2
        top = (new_h - crop) // 2
        pil = pil.crop((left, top, left + crop, top + crop))
        out = np.asarray(pil, np.float32) / 255.0
        return imagenet_normalize(out)

    return transform


def hd_bin_um(hd_binning: str) -> float:
    """Bin edge length in µm from an HD binning name ('square_008um' -> 8)."""
    import re

    m = re.search(r"(\d+(?:\.\d+)?)\s*um$", str(hd_binning))
    if m is None:
        raise ValueError(f"Cannot parse bin size from binning {hd_binning!r}")
    return float(m.group(1))


def distance_um_to_px(spaceranger_dir, distance_um: float,
                      hd_binning: Optional[str] = None) -> int:
    """Pixels spanning ``distance_um`` on the fullres image of an array.

    Inferred from the ratio of pixel to lattice distances over a 10-spot
    sample, exactly like imgprocess.py:89-109 (spots are 100 µm apart).
    For Visium HD (``hd_binning``), the lattice is square with bins
    ``hd_bin_um(hd_binning)`` µm apart and direct array_row/col indices.
    """
    positions = read_positions(spaceranger_dir, hd_binning)
    if len(positions) > 10:
        # fixed seed: the inferred px size names the patch cache directory,
        # so it must be deterministic across runs
        positions = positions.sample(n=10, random_state=0)

    if hd_binning is not None:
        cart = np.stack([positions["array_col"].values.astype(float),
                         positions["array_row"].values.astype(float)], axis=1)
        lattice_um = hd_bin_um(hd_binning)
    else:
        cart = np.stack(geometry.pseudo_to_true_hex(
            positions["array_col"].values, positions["array_row"].values), axis=1)
        lattice_um = 100.0  # adjacent Visium spots are 100 µm apart
    px = np.stack([positions["pxl_col_in_fullres"].values,
                   positions["pxl_row_in_fullres"].values], axis=1).astype(float)

    d_unit = np.mean(pairwise_distances(px) / pairwise_distances(cart))
    return int(np.rint(distance_um * d_unit / lattice_um))


def _spot_pixel_boxes(positions, window: int, hex_coords: bool = True):
    """Foreground spots -> (oddr_x, oddr_y, x_px, y_px) int arrays.

    Pixel coords are rounded (fractional coords occur rarely,
    imgprocess.py:212-214) and offset by the edge padding of ``window//2``.
    ``hex_coords=False`` (Visium HD square bins) indexes the grid directly
    with array_col/array_row instead of the pseudo-hex -> odd-right map.
    """
    df = positions[positions["in_tissue"].astype(int) == 1]
    if hex_coords:
        x_ind, y_ind = geometry.pseudo_hex_to_oddr(df["array_col"].values,
                                                   df["array_row"].values)
    else:
        x_ind = df["array_col"].values.astype(int)
        y_ind = df["array_row"].values.astype(int)
    x_px = np.rint(df["pxl_col_in_fullres"].values.astype(float)).astype(int) + window // 2
    y_px = np.rint(df["pxl_row_in_fullres"].values.astype(float)).astype(int) + window // 2
    return np.asarray(x_ind), np.asarray(y_ind), x_px, y_px


def extract_patches(img: np.ndarray, y_px: np.ndarray, x_px: np.ndarray,
                    window: int, patch_size: int) -> np.ndarray:
    """Gather (N, patch_size, patch_size, C) patches centered at pixel coords.

    ``img`` must already be edge-padded by ``window//2``; centers already
    offset. Crop and nearest-subsample compose into one gather; bicubic
    resize (PIL-parity) is applied per patch only when needed.
    """
    n = len(y_px)
    if window == patch_size:
        offs = np.arange(window) - window // 2
        rows = y_px[:, None] + offs
        cols = x_px[:, None] + offs
        return img[rows[:, :, None], cols[:, None, :]]

    from PIL import Image

    out = np.empty((n, patch_size, patch_size, img.shape[-1]), dtype=img.dtype)
    half = window // 2
    for i in range(n):
        y0, x0 = y_px[i] - half, x_px[i] - half
        crop = img[y0:y0 + window, x0:x0 + window]  # exact window (odd-safe)
        out[i] = np.asarray(Image.fromarray(crop).resize((patch_size, patch_size)))
    return out


def extract_patches_device(img, y_px, x_px, window: int, patch_size: int):
    """XLA patch gather: one jit-able op from a device-resident WSI.

    Same contract as :func:`extract_patches` but runs on TPU; the
    window != patch_size path resizes with ``jax.image.resize`` (cubic).

    Implementation note: ``vmap(dynamic_slice)`` -- measured 24x faster than
    the equivalent advanced-indexing gather on v5e (103 ms -> 4.3 ms for
    4,992 x 128px patches), whose lowering degenerates to per-element
    gathers. dynamic_slice clamps starts at image borders, matching the
    edge-padded host path for interior spots.
    """
    import jax
    import jax.numpy as jnp

    y0 = jnp.asarray(y_px) - window // 2
    x0 = jnp.asarray(x_px) - window // 2

    def one(yy, xx):
        return jax.lax.dynamic_slice(img, (yy, xx, 0),
                                     (window, window, img.shape[-1]))

    crops = jax.vmap(one)(y0, x0)                     # (N, w, w, C)
    return resize_patches_device(crops, patch_size)


def resize_patches_device(crops, patch_size: int):
    """(N, w, w, C) crops -> (N, patch_size, patch_size, C), PIL-parity.

    No-op when already patch-sized; otherwise cubic ``jax.image.resize``
    (antialias on -- PIL's filter family) with uint8 re-quantization for
    integer inputs. Shared by the XLA and Pallas extraction paths.
    """
    import jax
    import jax.numpy as jnp

    if crops.shape[1] == patch_size and crops.shape[2] == patch_size:
        return crops
    out = jax.image.resize(
        crops.astype(jnp.float32),
        (crops.shape[0], patch_size, patch_size, crops.shape[-1]),
        method="cubic")  # antialias=True default: PIL's filter family
    if jnp.issubdtype(crops.dtype, jnp.integer):
        # match the host path's uint8 quantization (PIL returns uint8)
        out = jnp.clip(jnp.rint(out), 0, 255).astype(crops.dtype)
    return out


def grid_from_wsi_visium(fullres_imgfile, spaceranger_dir, patch_size: int = 256,
                         window_size: Optional[int] = None,
                         h_st: int = VISIUM_H_ST, w_st: int = VISIUM_W_ST,
                         dtype=np.float32,
                         hd_binning: Optional[str] = None) -> np.ndarray:
    """Extract the odd-right (H_ST, W_ST, P, P, 3) patch grid for one array.

    Values are raw pixel intensities 0..255 (cast to ``dtype``), matching the
    reference's tensor contract (imgprocess.py:206-238) up to the
    channels-LAST layout used throughout this package. With ``hd_binning``
    the positions come from the HD binned-output parquet and the grid is
    indexed directly by (array_row, array_col) -- pass the square lattice's
    dims as ``h_st``/``w_st``.
    """
    from PIL import Image

    Image.MAX_IMAGE_PIXELS = None
    img = np.asarray(Image.open(fullres_imgfile))
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)

    if window_size is None:
        w = patch_size
    elif isinstance(window_size, float):
        w = int(window_size * img.shape[1])
    elif isinstance(window_size, int):
        w = window_size
    else:
        raise ValueError("Window size must be a float or int")

    img = np.pad(img, [(w // 2, w // 2), (w // 2, w // 2), (0, 0)], mode="edge")

    positions = read_positions(spaceranger_dir, hd_binning)
    x_ind, y_ind, x_px, y_px = _spot_pixel_boxes(positions, w,
                                                 hex_coords=hd_binning is None)

    # lower bounds too: malformed array_col/array_row parity can yield an
    # odd-right x of -1, which NumPy fancy indexing would silently WRAP to
    # the last grid column (same guard as evaluate.to_loupe_annots)
    in_bounds = (y_ind >= 0) & (x_ind >= 0) & (y_ind < h_st) & (x_ind < w_st)
    if not in_bounds.all():
        # one aggregate line (a misconfigured HD grid can overflow by tens
        # of thousands of bins), in the USER's coordinates: the positions
        # file's array_col/array_row, not the converted grid indices
        ox, oy = np.asarray(x_ind)[~in_bounds], np.asarray(y_ind)[~in_bounds]
        if hd_binning is None:
            ac, ar = geometry.oddr_to_pseudo_hex(ox, oy)
        else:
            ac, ar = ox, oy
        first = list(zip(np.atleast_1d(ac)[:5].tolist(),
                         np.atleast_1d(ar)[:5].tolist()))
        print(f"Warning: {int((~in_bounds).sum())} spots outside the "
              f"{h_st}x{w_st} grid dropped (first (array_col, array_row): "
              f"{first})")
    x_ind, y_ind = x_ind[in_bounds], y_ind[in_bounds]
    x_px, y_px = x_px[in_bounds], y_px[in_bounds]

    patches = extract_patches(img, y_px, x_px, w, patch_size)

    grid = np.zeros((h_st, w_st, patch_size, patch_size, 3), dtype=dtype)
    grid[y_ind, x_ind] = patches[..., :3].astype(dtype)
    return grid


def patch_cache_suffix(patch_size_px: Optional[int] = None,
                       patch_size_um: Optional[float] = None,
                       window_size_px: Optional[int] = None,
                       hd_binning: Optional[str] = None,
                       hd_dims: Optional[tuple] = None) -> str:
    """THE patch-cache directory suffix — the one place the naming lives.

    The suffix is a load-bearing cache contract shared by the dataset
    factory (data/datasets.py) and CLI ``prepare``: a mismatch silently
    orphans prepared caches and triggers full re-extraction. Window-resized
    caches get ``_w{px}``; HD caches are binning- AND dims-specific (the
    writer drops out-of-bounds patches, so a cache built for smaller dims
    must never be reused for a larger-dims run).
    """
    s = (f"_patches{patch_size_px}px" if patch_size_px is not None
         else f"_patches{int(patch_size_um)}um")
    if window_size_px is not None:
        s += f"_w{window_size_px}"
    if hd_binning is not None:
        if hd_dims is None:
            raise ValueError("HD patch caches are dims-specific: "
                             "patch_cache_suffix needs hd_dims with "
                             "hd_binning")
        s = f"_{hd_binning}_{hd_dims[0]}x{hd_dims[1]}{s}"
    return s


def save_visium_patches(img_file, spaceranger_dir, dest_dir, patch_size: int = 256,
                        window_size: Optional[int] = None,
                        hd_binning: Optional[str] = None,
                        h_st: Optional[int] = None, w_st: Optional[int] = None):
    """Write per-spot JPEGs named ``{array}_{col}_{row}.jpg`` (cache contract).

    Foreground = any nonzero pixel in the patch (imgprocess.py:270-278).
    Filename coordinates are pseudo-hex for Visium and direct
    (array_col, array_row) for HD binnings; HD grid dims default to the
    positions' (max_row+1, max_col+1).
    """
    from PIL import Image

    if hd_binning is not None and (h_st is None or w_st is None):
        from gridnext_tpu.io.spaceranger import hd_lattice_dims

        dims = hd_lattice_dims(spaceranger_dir, hd_binning)
        h_st = dims[0] if h_st is None else h_st
        w_st = dims[1] if w_st is None else w_st
    # uint8 end to end: values are raw 0..255 intensities either way, and a
    # float32 grid would quadruple peak RAM (256px Visium: ~3.9 GB/array)
    grid = grid_from_wsi_visium(img_file, spaceranger_dir,
                                patch_size=patch_size, window_size=window_size,
                                h_st=VISIUM_H_ST if h_st is None else h_st,
                                w_st=VISIUM_W_ST if w_st is None else w_st,
                                dtype=np.uint8, hd_binning=hd_binning)
    slide = str(Path(spaceranger_dir).stem)
    # write-then-rename: the factory's cache check is "directory exists",
    # so an interrupted multi-thousand-JPEG dump must never leave a partial
    # dest_dir behind (it would silently train with the missing spots as
    # background forever)
    tmp_dir = f"{dest_dir}.tmp-{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)

    fg = grid.reshape(grid.shape[0], grid.shape[1], -1).max(axis=-1) > 0
    for oy, ox in zip(*np.nonzero(fg)):
        if hd_binning is None:
            x_coord, y_coord = geometry.oddr_to_pseudo_hex(int(ox), int(oy))
        else:
            x_coord, y_coord = int(ox), int(oy)
        Image.fromarray(grid[oy, ox]).save(
            os.path.join(tmp_dir, f"{slide}_{x_coord}_{y_coord}.jpg"), "JPEG")
    if os.path.isdir(str(dest_dir)):   # caller asked to (re)write this cache
        import shutil

        shutil.rmtree(str(dest_dir))
    os.replace(tmp_dir, str(dest_dir))


def save_visium_patches_all(wsi_files, spaceranger_dirs, dest_dir,
                            patch_size: int = 256, window_size=None):
    """Multi-array analog; one sub-directory per array (imgprocess.py:281-291)."""
    os.makedirs(dest_dir, exist_ok=True)
    for img_file, srd in zip(wsi_files, spaceranger_dirs):
        print(f"{img_file} : {srd} ...")
        slide = str(Path(img_file).stem)
        save_visium_patches(img_file, srd, os.path.join(str(dest_dir), slide),
                            patch_size, window_size)


def remove_color_cast(img: np.ndarray) -> np.ndarray:
    """SpaCell color-cast removal: scale channels so the 99th percentile
    maps to white (imgprocess.py:49-67). (H, W, >=3) uint8 in, uint8 out;
    channels past RGB (e.g. PNG alpha) pass through untouched."""
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[-1] < 3:
        # a 2-D grayscale image would otherwise "normalize" its first three
        # COLUMNS as if they were channels, silently
        raise ValueError(f"expected an (H, W, >=3) RGB image; got shape "
                         f"{img.shape}")
    out = img.copy()
    for c in range(3):
        p = np.percentile(img[..., c].ravel(), q=99)
        # PIL Image.point applies the lut with int truncation
        out[..., c] = np.minimum(img[..., c].astype(np.float64) * (255.0 / p),
                                 255).astype(np.uint8)
    return out


def augment_patches(key, patches, *, flips: bool = True,
                    rotations: bool = True, brightness: float = 0.0,
                    contrast: float = 0.0):
    """On-device random augmentation of square image patches, jit-safe.

    The TPU-native replacement for the reference's host-side torchvision
    ``img_transforms`` augmentation (README "Importing data": the optional
    transform hook the tutorials use for training-time augmentation):
    instead of per-patch PIL work on the host, this rides INSIDE the jitted
    train step (``make_steps(augment=...)``), so augmentation costs a few
    fused elementwise copies on the VPU and zero host round-trips.

    ``patches``: (..., P, P, 3) channels-last float array -- every leading
    axis indexes independent samples, so both spotwise batches (B, P, P, 3)
    and gridwise batches (B, H, W, P, P, 3) augment per-patch. Each patch
    independently draws one of the 8 dihedral transforms (when ``flips``
    and ``rotations``; spot content has no canonical orientation, and
    per-patch transforms leave the hex GRID geometry untouched -- rotating
    the lattice itself would corrupt odd-right indexing) and, optionally,
    photometric jitter: brightness shifts by ``u*brightness`` and contrast
    scales around the patch mean by ``1 + u*contrast`` with u ~ U[-1, 1]
    (applied in the normalized space the models consume, where both are
    affine). Deterministic in ``key``; the train step folds the step index
    so resume reproduces the exact augmentation stream.
    """
    import jax
    import jax.numpy as jnp

    patches = jnp.asarray(patches)
    if patches.ndim < 3 or patches.shape[-2] != patches.shape[-3]:
        raise ValueError("augment_patches wants (..., P, P, C) square "
                         f"patches; got shape {patches.shape}")
    lead = patches.shape[:-3]
    k_flip, k_rot, k_bri, k_con = jax.random.split(key, 4)

    # Dihedral transforms as (transpose?, flip rows?, flip cols?) bits --
    # each bit lowers to one jnp.where-selected copy (no per-sample
    # switch). All 8 bit combinations = the full dihedral group; the
    # rotations-only subgroup {0, 90, 180, 270} maps to constrained bits
    # (90 = transpose+flip_c, 180 = flip_r+flip_c, 270 = transpose+flip_r).
    zeros = jnp.zeros(lead, bool)
    transpose = flip_r = flip_c = zeros
    kt, kr, kc = jax.random.split(k_flip, 3)
    if flips and rotations:
        transpose = jax.random.bernoulli(kt, 0.5, lead)
        flip_r = jax.random.bernoulli(kr, 0.5, lead)
        flip_c = jax.random.bernoulli(kc, 0.5, lead)
    elif flips:
        flip_r = jax.random.bernoulli(kr, 0.5, lead)
        flip_c = jax.random.bernoulli(kc, 0.5, lead)
    elif rotations:
        k90 = jax.random.randint(kt, lead, 0, 4)
        transpose = (k90 % 2) == 1
        flip_r = k90 >= 2
        flip_c = (k90 == 1) | (k90 == 2)

    def expand(b):  # (lead,) -> broadcastable over (..., P, P, C)
        return b[(...,) + (None,) * 3]

    out = jnp.where(expand(transpose), jnp.swapaxes(patches, -2, -3),
                    patches)
    out = jnp.where(expand(flip_r), jnp.flip(out, axis=-3), out)
    out = jnp.where(expand(flip_c), jnp.flip(out, axis=-2), out)

    if brightness:
        u = jax.random.uniform(k_bri, lead, minval=-1.0, maxval=1.0)
        out = out + expand(u * brightness).astype(out.dtype)
    if contrast:
        u = jax.random.uniform(k_con, lead, minval=-1.0, maxval=1.0)
        mean = out.mean(axis=(-1, -2, -3), keepdims=True)
        out = (out - mean) * expand(1.0 + u * contrast).astype(out.dtype) + mean
    return out


def make_train_augment(brightness: float = 0.0, contrast: float = 0.0):
    """Build the train-step augmentation hook (``make_steps(augment=...)``).

    Returns ``fn(key, x)`` applying :func:`augment_patches` to the image
    component of the batch: a bare array augments directly; a multimodal
    ``(image, counts)`` tuple augments only the image element (count
    vectors have no spatial symmetry to exploit). The CLI's ``--augment``
    flag on train-image / train-mm passes exactly this.
    """
    def augment(key, x):
        if isinstance(x, (tuple, list)):
            return type(x)((augment_patches(key, x[0], brightness=brightness,
                                            contrast=contrast),)
                           + tuple(x[1:]))
        return augment_patches(key, x, brightness=brightness,
                               contrast=contrast)

    return augment


def dihedral_transform(patches, k: int):
    """Apply the ``k``-th (0..7) dihedral transform to (..., P, P, C) patches.

    Static companion of :func:`augment_patches` (same convention: bit 0 =
    transpose, bit 1 = flip rows, bit 2 = flip cols; k in 0..7 enumerates
    the full group). Used by test-time augmentation
    (``evaluate.all_fgd_predictions(tta=True)``) to average predictions
    over every patch orientation.
    """
    import jax.numpy as jnp

    if not 0 <= k < 8:
        raise ValueError(f"dihedral k must be in 0..7; got {k}")
    patches = jnp.asarray(patches)
    if patches.ndim < 3 or patches.shape[-2] != patches.shape[-3]:
        raise ValueError("dihedral_transform wants (..., P, P, C) square "
                         f"patches; got shape {patches.shape}")
    if k & 1:
        patches = jnp.swapaxes(patches, -2, -3)
    if k & 2:
        patches = jnp.flip(patches, axis=-3)
    if k & 4:
        patches = jnp.flip(patches, axis=-2)
    return patches
