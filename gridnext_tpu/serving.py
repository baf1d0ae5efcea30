"""Production serving: end-to-end on-device slide registration.

Packages the full inference path as one jittable function: device-resident
slide image -> per-spot patch gather -> spot classifier f -> correction
network g -> label grid. This is the "register a slide" path of the
reference (all_fgd_predictions + to_loupe_annots over a PatchGridDataset)
with the host loop, the JPEG cache round-trip, and all host<->device
transfers removed.

Correctors: Visium pseudo-hex lattices run the fused Pallas hex corrector
with the final argmax + background masking fused into the same kernel
(ops.hexcorrector_pallas.fused_hex_corrector_labels -- label grids come
straight off-chip, logits never round-trip HBM); square HD bin lattices run
the Cartesian conv corrector through XLA (plain convs, already optimal).

Typical use:

    registrar = SlideRegistrar.from_gridnet(g_model, variables, patch_size=128)
    wsi = jax.device_put(slide_uint8)                      # decode once
    labels = registrar(wsi, positions)                     # (78, 64) int
    to_loupe_annots(labels, position_file, out_csv, annot_names=classes)

    # production shape: N slides per dispatch
    labels_b = registrar.register_batch(wsis, positions_list)  # (N, 78, 64)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gridnext_tpu import geometry
from gridnext_tpu.ops.hexcorrector_pallas import (
    fold_corrector_params,
    fused_hex_corrector_labels,
)


def spot_pixel_arrays(positions, h_st: int = geometry.VISIUM_H_ST,
                      w_st: int = geometry.VISIUM_W_ST,
                      hex_coords: bool = True):
    """Positions DataFrame -> (oddr_y, oddr_x, y_px, x_px) int32 arrays over
    in-tissue spots (pixel coords NOT yet offset for padding).

    Thin wrapper over the canonical positions->(grid index, pixel) mapping
    (pipeline._spot_pixel_boxes), plus the out-of-lattice bounds filter the
    serving scatter needs. ``hex_coords=False`` (Visium HD square bins)
    indexes the grid directly by (array_row, array_col).
    """
    from gridnext_tpu.pipeline import _spot_pixel_boxes

    ox, oy, x_px, y_px = _spot_pixel_boxes(positions, window=0,
                                           hex_coords=hex_coords)
    # lower bounds too: a malformed-parity spot's odd-right x of -1 would
    # otherwise scatter its features + fg flag onto the LAST grid column
    # (jnp .at[] wraps negative indices even with mode='drop')
    keep = (oy >= 0) & (ox >= 0) & (oy < h_st) & (ox < w_st)
    return (oy[keep], ox[keep],
            y_px[keep].astype(np.int32), x_px[keep].astype(np.int32))


def _clamp_centers(y_px, x_px, wsi_shape, window_size: int,
                   pad_offset: int = 0):
    """Offset + clamp spot centers so the crop window stays in bounds.

    THE load-bearing convention shared by the live registrar
    (``_spot_arrays``) and exported-artifact inputs
    (:func:`artifact_spot_inputs`) -- one implementation so they can never
    desynchronize. Crop origin is center - w//2 over ``window_size``
    pixels, so the max in-bounds center is H - (w - w//2); NOT
    H - w//2 - 1, which is one pixel tighter for even windows and would
    shift flush-to-edge lattice rows by 1 px vs register_dense's unclamped
    slice (breaking the dense==per-bin parity contract).
    """
    p2 = window_size // 2
    y_px = np.clip(y_px + pad_offset, p2, wsi_shape[0] - (window_size - p2))
    x_px = np.clip(x_px + pad_offset, p2, wsi_shape[1] - (window_size - p2))
    return y_px, x_px


def artifact_spot_inputs(wsi_shape, positions, n_spots: int, *,
                         window_size: int, h_st: int, w_st: int,
                         hex_coords: bool = True, pad_offset: int = 0):
    """Fixed-length (oy, ox, y_px, x_px) int32 inputs for an exported
    registration artifact, built from its JSON sidecar fields alone
    (window_px/h_st/w_st/hex_coords) -- no registrar or model code needed.

    Same conventions as the live path: centers clamp so the window stays in
    bounds (:func:`_clamp_centers`); pad entries park outside the lattice
    (oy == h_st, scatter mode='drop') and crop a harmless corner.
    """
    oy_a, ox_a, y_a, x_a = spot_pixel_arrays(positions, h_st, w_st,
                                             hex_coords)
    y_a, x_a = _clamp_centers(y_a, x_a, wsi_shape, window_size, pad_offset)
    p2 = window_size // 2
    k = len(oy_a)
    if k > n_spots:
        raise ValueError(f"{k} in-tissue spots exceed n_spots={n_spots}")
    oy, ox, y_px, x_px = _parked_spots(n_spots, h_st, p2)
    oy[:k], ox[:k], y_px[:k], x_px[:k] = oy_a, ox_a, y_a, x_a
    return oy, ox, y_px, x_px


def _parked_spots(n: int, h_st: int, p2: int):
    """(oy, ox, y_px, x_px) int32 fill arrays for ``n`` padding spots.

    THE padding convention, defined once: padded spots 'park' outside the
    lattice (``oy == h_st`` -- dropped by the scatters' mode='drop') and
    crop a harmless corner window (centers at ``p2 = window // 2``). Both
    exported-artifact inputs and batched serving pad with exactly these
    values, so the two can never desynchronize.
    """
    return (np.full((n,), h_st, np.int32), np.zeros((n,), np.int32),
            np.full((n,), p2, np.int32), np.full((n,), p2, np.int32))


def _shard_map(f, mesh, in_specs, out_specs):
    """shard_map across jax versions: jax.shard_map (>=0.8, check_vma) with
    the jax.experimental fallback (check_rep). Replication checking is off
    either way -- the bodies all_gather explicitly."""
    try:
        from jax import shard_map  # jax >= 0.8

        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


# Padded spot arrays round up to a multiple of this, so batches with
# near-equal spot counts share one compiled program.
_SPOT_BUCKET = 128


def fit_dense_lattice(positions, h_st: int, w_st: int, window: int,
                      wsi_shape=None, pad_offset: int = 0):
    """Host-side dense-lattice analysis -> an execution plan or None.

    Fits ``center = origin + (idx + 1/2) * pitch`` per axis by least squares
    over the listed in-lattice bins of a square (``hex_coords=False``)
    positions frame. Returns ``("exact", oy0, ox0, fg, ey, ex)`` when the
    pitch is exactly the integer ``window`` (tiling: one slice + reshape,
    bit-identical to per-bin extraction), ``("resample", y0, x0, py, px,
    fg, h_band, ey, ex)`` when the lattice is regular to <=0.5 px but
    fractional-pitch (real Spaceranger HD: pitch = 16um/mpp) and ``window``
    means the full bin (|pitch - window| <= 1), and None when the positions
    aren't a dense regular lattice (or the in-tissue bins' extent exceeds
    ``wsi_shape``). ``fg`` is the (h_st, w_st) in-tissue mask of the listed
    bins; ``(ey, ex)`` is the in-tissue bin extent (max index + 1 -- the
    fit, like every serving path, sees only ``in_tissue == 1`` rows) --
    bounds and extraction cover only that extent, so a slide whose lattice
    (or tissue footprint) is smaller than a cohort-max ``(h_st, w_st)``
    still plans (the extra grid rows/cols are background), exactly like
    the cache-based pipeline.
    """
    oy, ox, y_px, x_px = spot_pixel_arrays(positions, h_st, w_st,
                                           hex_coords=False)
    if len(oy) == 0 or len(np.unique(oy)) < 2 or len(np.unique(ox)) < 2:
        return None
    y_px = y_px.astype(np.float64) + pad_offset
    x_px = x_px.astype(np.float64) + pad_offset

    def fit(idx, px):
        a = np.stack([np.ones_like(idx, np.float64), idx], axis=1)
        (b0, pitch), *_ = np.linalg.lstsq(a, px, rcond=None)
        res = np.abs(px - (b0 + pitch * idx)).max()
        return b0, pitch, res

    by, pitch_y, res_y = fit(oy.astype(np.float64), y_px)
    bx, pitch_x, res_x = fit(ox.astype(np.float64), x_px)
    if (max(res_y, res_x) > 0.5 or pitch_y <= 1 or pitch_x <= 1):
        return None
    fg = np.zeros((h_st, w_st), np.int32)
    fg[oy, ox] = 1
    ey, ex = int(oy.max()) + 1, int(ox.max()) + 1
    w = window
    h_img, w_img = ((wsi_shape[0], wsi_shape[1]) if wsi_shape is not None
                    else (np.inf, np.inf))
    # exact tiling when the fitted lattice is the integer window pitch
    # (lstsq of exact integer data leaves ~1e-12 float residue). The
    # centers the fit sees are already rint'ed to integers
    # (spot_pixel_arrays), and the per-bin gather's crop origin is
    # rint(center) - w//2 -- so integer-center integrality IS the right
    # exactness test for every pitch parity (a zero-residual integer-pitch
    # fit always has an integer intercept; odd-pitch lattices with raw
    # half-integer centers rint to alternating +-0.5 and correctly fail
    # the residual gate, exactly like the per-bin path's own jitter)
    tol = 1e-6
    int_pitch = (abs(pitch_y - w) < tol and abs(pitch_x - w) < tol
                 and res_y < tol and res_x < tol
                 and abs(by - round(by)) < tol
                 and abs(bx - round(bx)) < tol)
    if int_pitch:
        oy0, ox0 = round(by) - w // 2, round(bx) - w // 2
        if (oy0 >= 0 and ox0 >= 0 and oy0 + ey * w <= h_img
                and ox0 + ex * w <= w_img):
            return ("exact", oy0, ox0, fg, ey, ex)
        return None
    # fractional (or shifted) regular lattice -> resample plan, but only
    # when the window means "the full bin" (window ~ pitch): a window much
    # smaller than the pitch asks for center CROPS, which only the per-bin
    # gather provides. The listed extent must sit fully inside the image
    # (origin included) -- an overhanging lattice falls back to the per-bin
    # path, whose coordinate clip handles borders.
    if abs(pitch_y - w) > 1.0 or abs(pitch_x - w) > 1.0:
        return None
    y0 = by - pitch_y / 2
    x0 = bx - pitch_x / 2
    h_band = int(np.ceil(pitch_y)) + 3
    if (y0 < 0 or x0 < 0 or y0 + ey * pitch_y > h_img
            or x0 + ex * pitch_x > w_img or h_band > h_img):
        return None
    return ("resample", float(y0), float(x0), float(pitch_y),
            float(pitch_x), fg, h_band, ey, ex)


class SlideRegistrar:
    """Jitted full-slide registration: image -> label grid.

    Args:
      f_apply: ``f_apply(patches (N,P,P,3) float in [0,1]) -> (N, f_dim)``
        -- a closure over the spot classifier and its variables.
      corrector_kernels/biases/relu_flags: folded hex-corrector weights
        (see ops.hexcorrector_pallas.fold_corrector_params); None for
        Cartesian models (pass ``corrector_apply`` instead).
      patch_size: patch side in pixels.
      window_size: crop window side; when larger than ``patch_size`` the
        window is resized down (cubic, PIL-parity path of
        pipeline.extract_patches_device). Default: equal to patch_size.
      normalize: 'imagenet' (DenseNet transforms parity) or None.
      patch_chunk: f applied over the spot axis in chunks of this size.
      hex_coords: True for Visium pseudo-hex positions; False for HD square
        bin lattices (direct array_row/array_col grid indexing).
      corrector_apply: ``corrector_apply(grid (B,H,W,F)) -> (B,H,W,C)``
        logits closure, used when ``use_pallas_corrector=False`` (the
        Cartesian conv corrector of square-HD models).
      extractor: 'pallas' (DMA-pipelined ops.patch_gather_pallas kernel --
        measured 17% faster end-to-end serving on v5e, docs/roadmap.md),
        'xla' (vmap(dynamic_slice)), or 'auto' (pallas on TPU, xla
        elsewhere -- the kernel runs interpreted off-TPU, too slow for
        full slides). Both paths produce identical patches (pinned in
        tests); float WSIs fall back to xla (the pack is uint8-only).
      mesh: a ``jax.sharding.Mesh`` to serve over. The flat spot/patch
        axis shards over EVERY mesh axis (spots are embarrassingly
        parallel, so an N-chip slice is N-way DP for f -- ~90% of serving
        time); the WSI replicates, per-shard features all-gather over ICI,
        and the tiny corrector runs replicated. Labels are identical to
        single-device serving (pinned in tests on the 8-device CPU mesh).
    """

    def __init__(self, f_apply: Callable, corrector_kernels=None,
                 corrector_biases=None,
                 relu_flags=(False, True, False, True, False), *,
                 patch_size: int = 128, window_size: Optional[int] = None,
                 normalize: Optional[str] = "imagenet",
                 patch_chunk: Optional[int] = 624,
                 h_st: int = geometry.VISIUM_H_ST,
                 w_st: int = geometry.VISIUM_W_ST,
                 hex_coords: bool = True,
                 use_pallas_corrector: bool = True,
                 corrector_apply: Optional[Callable] = None,
                 extractor: str = "auto",
                 mesh=None):
        self.f_apply = f_apply
        self.kernels = [jnp.asarray(k) for k in corrector_kernels or []]
        self.biases = [jnp.asarray(b) for b in corrector_biases or []]
        self.relu_flags = tuple(relu_flags)
        self.patch_size = patch_size
        self.window_size = window_size or patch_size
        self.normalize = normalize
        self.patch_chunk = patch_chunk
        self.h_st, self.w_st = h_st, w_st
        self.hex_coords = hex_coords
        self.use_pallas = use_pallas_corrector and corrector_apply is None
        self.corrector_apply = corrector_apply
        if not self.use_pallas and corrector_apply is None:
            raise ValueError("need corrector_apply when not using the "
                             "Pallas hex corrector")
        if self.use_pallas and not self.kernels:
            # fail HERE, not as max(()) deep inside the first jit trace
            raise ValueError(
                "the Pallas hex corrector needs corrector_kernels/"
                "corrector_biases (serving.fold_corrector_params over the "
                "trained corrector, or from_gridnet); pass corrector_apply "
                "for a non-hex corrector")
        from gridnext_tpu.ops.patch_gather_pallas import _LANE_PAD

        if extractor not in ("auto", "pallas", "xla"):
            raise ValueError(f"unknown extractor {extractor!r}")
        if extractor == "auto":
            # the DMA gather stages (window, window) VMEM corners, which
            # Mosaic only lowers at lane-tile multiples (the kernel's own
            # constant, so the two checks can't diverge)
            extractor = ("pallas" if jax.devices()[0].platform == "tpu"
                         and self.window_size % _LANE_PAD == 0 else "xla")
        if (extractor == "pallas" and self.window_size % _LANE_PAD
                and jax.devices()[0].platform == "tpu"):
            # compiled-kernel constraint only; interpret mode (off-TPU
            # tests) lowers any window
            raise ValueError(
                f"the pallas extractor needs window_size % {_LANE_PAD} == 0 "
                f"(VMEM lane tiling); got {self.window_size}. Use "
                "extractor='xla' or register_dense for tiled HD lattices.")
        self.extractor = extractor
        self.mesh = mesh
        self._jitted = jax.jit(self._register, static_argnames=("orig_hw",))
        self._jitted_logits = jax.jit(self._register_logits,
                                      static_argnames=("orig_hw",))
        self._jitted_batch = jax.jit(self._register_batch,
                                     static_argnames=("orig_hw",))
        self._jitted_dense = jax.jit(self._register_dense,
                                     static_argnames=("ey", "ex"))
        self._jitted_dense_rs = jax.jit(self._register_dense_resampled,
                                        static_argnames=("h_band", "ey",
                                                         "ex"))

    @classmethod
    def from_gridnet(cls, model, variables, *, patch_size: int = 128,
                     normalize: Optional[str] = "imagenet", **kw):
        """Build from a trained GridNetHex or (square-lattice) GridNet.

        Hex models fold their corrector into the fused Pallas kernel;
        Cartesian models (HD square bins -- detected by their conv-stack
        corrector params) run the conv corrector through XLA and index the
        grid by direct (array_row, array_col) coordinates.
        """
        corr_params = variables["params"]["corrector"]
        corr_bs = variables.get("batch_stats", {}).get("corrector")
        f = model.patch_classifier
        f_vars = {"params": variables["params"]["patch_classifier"]}
        if variables.get("batch_stats", {}).get("patch_classifier") is not None:
            f_vars["batch_stats"] = variables["batch_stats"]["patch_classifier"]

        def f_apply(patches):
            return f.apply(f_vars, patches, train=False)

        if "HexConv_0" in corr_params:
            kernels, biases, relu_flags = fold_corrector_params(
                corr_params, corr_bs)
            return cls(f_apply, kernels, biases, relu_flags,
                       patch_size=patch_size, normalize=normalize, **kw)

        # Cartesian conv corrector (GridNet on HD square lattices)
        from gridnext_tpu.models.gridnet import _CartesianCorrector

        n_classes = corr_params["Conv_3"]["kernel"].shape[-1]
        corr = _CartesianCorrector(n_classes=n_classes,
                                   use_bn=corr_bs is not None)
        corr_vars = {"params": corr_params}
        if corr_bs is not None:
            corr_vars["batch_stats"] = corr_bs

        def corrector_apply(grid):
            return corr.apply(corr_vars, grid, train=False)

        kw.setdefault("hex_coords", False)
        return cls(f_apply, patch_size=patch_size, normalize=normalize,
                   use_pallas_corrector=False,
                   corrector_apply=corrector_apply, **kw)

    def _normalize(self, patches):
        patches = patches.astype(jnp.float32) / 255.0
        if self.normalize == "imagenet":
            from gridnext_tpu.pipeline import imagenet_normalize

            patches = imagenet_normalize(patches)
        return patches

    def _use_pallas_extract(self, wsi):
        return self.extractor == "pallas" and wsi.dtype == jnp.uint8

    def _extract_flat(self, wsi, y_c, x_c, slide, orig_hw=None):
        """Flat patch extraction, single-slide or multi-slide.

        ``wsi``: (H, W, 3) -- or (B, H, W, 3) when ``slide`` (an (N,)
        per-spot slide index) is given -- or pre-packed data when
        ``orig_hw`` is set. ``y_c``/``x_c``: (N,) spot centers. Returns
        (N, P, P, 3) normalized patches.
        """
        from gridnext_tpu.pipeline import (extract_patches_device,
                                           resize_patches_device)

        w = self.window_size
        if orig_hw is not None or self._use_pallas_extract(wsi):
            from gridnext_tpu.ops.patch_gather_pallas import (gather_patches,
                                                              pack_wsi)

            if orig_hw is None:
                if slide is None:
                    orig_hw = (wsi.shape[0], wsi.shape[1])
                    wsi = pack_wsi(wsi)
                else:
                    orig_hw = (wsi.shape[1], wsi.shape[2])
                    wsi = jax.vmap(pack_wsi)(wsi)
            crops = gather_patches(          # one kernel over all slides
                wsi, y_c - w // 2, x_c - w // 2, w,
                slide=slide, orig_hw=orig_hw)
            return self._normalize(resize_patches_device(crops,
                                                         self.patch_size))
        if slide is None:
            return self._normalize(extract_patches_device(
                wsi, y_c, x_c, w, self.patch_size))
        c = wsi.shape[-1]

        def one(s, y0, x0):
            return jax.lax.dynamic_slice(wsi, (s, y0, x0, 0),
                                         (1, w, w, c))[0]

        crops = jax.vmap(one)(slide, y_c - w // 2, x_c - w // 2)
        return self._normalize(resize_patches_device(crops, self.patch_size))

    def _feats_flat(self, wsi, y_c, x_c, slide, orig_hw=None):
        """Flat spot centers -> (N, f_dim); sharded over ``self.mesh``.

        The manual-SPMD region (shard_map): the WSI replicates, the spot
        axis splits over every mesh axis, each device gathers + classifies
        its shard, and the per-shard features all-gather back (XLA lowers
        it over ICI). Off-mesh this is plain extract + f.
        """
        def compute(wsi_, y_, x_, slide_):
            patches = self._extract_flat(wsi_, y_, x_, slide_, orig_hw)
            return self._apply_f(patches)

        if self.mesh is None:
            return compute(wsi, y_c, x_c, slide)

        from jax.sharding import PartitionSpec as P

        axes = tuple(self.mesh.axis_names)
        spot_spec = P(axes)
        single = slide is None   # before the dummy-slide reassignment below

        def body(wsi_, y_, x_, slide_):
            local = compute(wsi_, y_, x_, None if single else slide_)
            return jax.lax.all_gather(local, axes, axis=0, tiled=True)

        fn = _shard_map(
            body, mesh=self.mesh,
            in_specs=(P(), spot_spec, spot_spec, spot_spec),
            out_specs=P())
        # pad the spot axis to a mesh-size multiple (dummy spots crop the
        # top-left corner of slide 0 -- harmless, sliced off below)
        n = y_c.shape[0]
        pad = (-n) % self.mesh.size
        if pad:
            p2 = self.window_size // 2
            y_c = jnp.concatenate([y_c, jnp.full((pad,), p2, y_c.dtype)])
            x_c = jnp.concatenate([x_c, jnp.full((pad,), p2, x_c.dtype)])
            if slide is not None:
                slide = jnp.concatenate([slide,
                                         jnp.zeros((pad,), slide.dtype)])
        if single:          # shard_map can't route None; pass a dummy
            slide = jnp.zeros_like(y_c)
        return fn(wsi, y_c, x_c, slide)[:n]

    def _apply_f_sharded(self, patches):
        """``_apply_f`` over the flat patch axis of ``self.mesh`` (dense
        path: extraction is one cheap slice, so only f shards -- each device
        classifies its patch shard, features all-gather over ICI). Off-mesh
        this is plain ``_apply_f``."""
        if self.mesh is None:
            return self._apply_f(patches)

        from jax.sharding import PartitionSpec as P

        axes = tuple(self.mesh.axis_names)
        n = patches.shape[0]
        pad = (-n) % self.mesh.size
        if pad:
            patches = jnp.concatenate(
                [patches,
                 jnp.zeros((pad,) + patches.shape[1:], patches.dtype)])

        def body(p):
            return jax.lax.all_gather(self._apply_f(p), axes, axis=0,
                                      tiled=True)

        fn = _shard_map(body, mesh=self.mesh,
                        in_specs=(P(axes),), out_specs=P())
        return fn(patches)[:n]

    def _apply_f(self, patches):
        n = patches.shape[0]
        chunk = self.patch_chunk
        if chunk is None or n <= chunk:
            return self.f_apply(patches)
        # pad to a chunk multiple so memory-bounded chunking applies to every
        # slide (real foreground counts are never exact multiples)
        pad = (-n) % chunk
        if pad:
            patches = jnp.concatenate(
                [patches, jnp.zeros((pad,) + patches.shape[1:], patches.dtype)])
        out = jax.lax.map(self.f_apply,
                          patches.reshape((-1, chunk) + patches.shape[1:]))
        out = out.reshape(-1, out.shape[-1])
        return out[:n]

    def _bg_vec(self):
        # Background cells must carry f(zero-CELL) -- GridNetHex runs f on
        # ALL grid cells including background (gridnet_models.py:76-79), and
        # in training grids background cells are literal zeros (transforms
        # apply to foreground patches only; PatchGridDataset leaves bg at
        # 0.0), so the corrector learned boundary context from f(0). The bg
        # patch therefore bypasses normalization: normalizing it would feed
        # f((0-mean)/std), a vector training never produced.
        bg_patch = jnp.zeros((1, self.patch_size, self.patch_size, 3),
                             jnp.float32)
        return self.f_apply(bg_patch)[0]

    def _labels_from_grid(self, grid, fg):
        """(B, H, W, f_dim) grid + (B, H, W) fg mask -> (B, H, W) labels."""
        if self.use_pallas:
            return fused_hex_corrector_labels(grid, fg, self.kernels,
                                              self.biases, self.relu_flags)
        logits = self.corrector_apply(grid)
        labels = jnp.argmax(logits, axis=-1).astype(jnp.int32) + 1
        return jnp.where(fg > 0, labels, 0)

    def _grid_fg(self, wsi, oy, ox, y_px, x_px, orig_hw=None):
        """One slide -> ((1, H, W, f_dim) f-output grid, (1, H, W) fg)."""
        feats = self._feats_flat(wsi, y_px, x_px, None, orig_hw)  # (N, f_dim)
        bg_vec = self._bg_vec().astype(feats.dtype)
        grid = jnp.broadcast_to(bg_vec, (1, self.h_st, self.w_st,
                                         feats.shape[-1]))
        # 'drop' ignores padded spots parked at oy == h_st (out of bounds)
        grid = grid.at[0, oy, ox].set(feats, mode="drop")
        fg = jnp.zeros((1, self.h_st, self.w_st), jnp.int32)
        fg = fg.at[0, oy, ox].set(1, mode="drop")
        return grid, fg

    def _register(self, wsi, oy, ox, y_px, x_px, orig_hw=None):
        grid, fg = self._grid_fg(wsi, oy, ox, y_px, x_px, orig_hw)
        return self._labels_from_grid(grid, fg)[0]

    def _register_logits(self, wsi, oy, ox, y_px, x_px, orig_hw=None):
        """Like :meth:`_register` but returning the corrector's class
        logits: ((H, W, C) float32 logits, (H, W) int32 fg mask)."""
        grid, fg = self._grid_fg(wsi, oy, ox, y_px, x_px, orig_hw)
        if self.use_pallas:
            from gridnext_tpu.ops.hexcorrector_pallas import (
                fused_hex_corrector)

            logits = fused_hex_corrector(grid, self.kernels, self.biases,
                                         self.relu_flags)
        else:
            logits = self.corrector_apply(grid)
        return logits[0].astype(jnp.float32), fg[0]

    def _register_batch(self, wsis, oy, ox, y_px, x_px, orig_hw=None):
        """(B, H, W, 3) slides + (B, S) padded spot arrays -> (B, h, w)."""
        b, s = oy.shape
        feats = self._feats_flat(wsis, y_px.reshape(-1), x_px.reshape(-1),
                                 jnp.repeat(jnp.arange(b), s), orig_hw)
        feats = feats.reshape(b, s, -1)
        bg_vec = self._bg_vec().astype(feats.dtype)
        grid = jnp.broadcast_to(bg_vec,
                                (b, self.h_st, self.w_st, feats.shape[-1]))
        bidx = jnp.arange(b)[:, None]
        grid = grid.at[bidx, oy, ox].set(feats, mode="drop")
        fg = jnp.zeros((b, self.h_st, self.w_st), jnp.int32)
        fg = fg.at[bidx, oy, ox].set(1, mode="drop")
        return self._labels_from_grid(grid, fg)

    def _dense_feats_to_labels(self, feats, fg):
        """(hs*ws, f_dim) flat features + (hs, ws) fg mask -> (hs, ws) labels.

        Background bins carry f(zero-patch), exactly like training grids and
        the scatter path (_register): tissue masks the features, not the
        input pixels.
        """
        bg_vec = self._bg_vec().astype(feats.dtype)
        feats = jnp.where(fg.reshape(-1, 1) > 0, feats, bg_vec)
        grid = feats.reshape(1, self.h_st, self.w_st, -1)
        return self._labels_from_grid(grid, fg[None])[0]

    def _register_dense(self, wsi, oy0, ox0, fg, *, ey, ex):
        """Tiling-form registration of an exact integer-pitch lattice.

        ``(oy0, ox0)``: top-left pixel of bin (0, 0). One dynamic_slice +
        reshape replaces the per-bin gather entirely -- HD bins tile the
        capture area contiguously (pitch == window), and at ~30x the Visium
        spot count per slide the gather is the cost that matters.
        ``(ey, ex)``: the in-tissue bin extent (static); f runs over only that
        region, and the feature grid pads to (h_st, w_st) -- the extra
        rows/cols of a cohort-max lattice are background (fg masks them to
        the trained bg vector downstream).
        """
        from gridnext_tpu.pipeline import resize_patches_device

        w = self.window_size
        region = jax.lax.dynamic_slice(wsi, (oy0, ox0, 0),
                                       (ey * w, ex * w, wsi.shape[-1]))
        crops = region.reshape(ey, w, ex, w, region.shape[-1])
        crops = crops.transpose(0, 2, 1, 3, 4).reshape(
            ey * ex, w, w, region.shape[-1])
        patches = self._normalize(resize_patches_device(crops,
                                                        self.patch_size))
        feats = self._apply_f_sharded(patches)               # (ey*ex, f_dim)
        return self._dense_feats_to_labels(self._pad_extent(feats, ey, ex),
                                           fg)

    def _pad_extent(self, feats, ey, ex):
        """(ey*ex, F) extent features -> (h_st*w_st, F), zero-padded; the
        pad rows are fg=0 so _dense_feats_to_labels swaps in the bg vector."""
        if (ey, ex) == (self.h_st, self.w_st):
            return feats
        grid = feats.reshape(ey, ex, -1)
        grid = jnp.pad(grid, ((0, self.h_st - ey), (0, self.w_st - ex),
                              (0, 0)))
        return grid.reshape(self.h_st * self.w_st, -1)

    def _resampled_patches(self, wsi, y0, x0, py, px_, *, h_band, ey, ex):
        """Banded lattice resample -> raw (ey*ex, P, P, C) float32 patches.

        Real Spaceranger HD positions step at 16um / microns-per-pixel --
        generally a NON-integer fullres pixel pitch, so integer tiling would
        drift by pixels across the lattice. Instead each bin row-band
        resamples (jax.image.scale_and_translate, linear) straight to patch
        scale, sampling the exact fractional bin extents; a lax.map over
        bands keeps peak memory at one band, and the band stack IS the
        patch tensor (no gather, no per-bin resize). ``(ey, ex)``: the
        in-tissue bin extent (static); bands cover only it.

        Numerics are pinned against a float64 host oracle of the exact
        per-bin extents in tests/test_serving.py (fractional-pitch oracle
        test): agreement is f32-rounding-tight, not approximate.
        """
        p = self.patch_size
        c = wsi.shape[-1]
        w_img = wsi.shape[1]
        scale = jnp.stack([p / py, p / px_])

        def band(r):
            sy = y0 + r * py                       # fractional band top
            iy = jnp.clip(jnp.floor(sy).astype(jnp.int32) - 1, 0,
                          wsi.shape[0] - h_band)
            rows = jax.lax.dynamic_slice(
                wsi, (iy, 0, 0), (h_band, w_img, c)).astype(jnp.float32)
            # input coord u maps to output scale*u + translation: bin col 0
            # must land at output x 0 -> translation_x = -x0 * scale_x (and
            # the band's own fractional top for y)
            trans = jnp.stack([-(sy - iy) * (p / py), -x0 * (p / px_)])
            return jax.image.scale_and_translate(
                rows, (p, ex * p, c), (0, 1), scale, trans, method="linear")

        bands = jax.lax.map(band, jnp.arange(ey))  # (ey, P, ex*P, C)
        patches = bands.reshape(ey, p, ex, p, c).transpose(0, 2, 1, 3, 4)
        return patches.reshape(ey * ex, p, p, c)

    def _register_dense_resampled(self, wsi, y0, x0, py, px_, fg, *,
                                  h_band, ey, ex):
        """Fractional-pitch dense serving: banded resample -> f -> labels."""
        patches = self._normalize(self._resampled_patches(
            wsi, y0, x0, py, px_, h_band=h_band, ey=ey, ex=ex))
        feats = self._apply_f_sharded(patches)
        return self._dense_feats_to_labels(self._pad_extent(feats, ey, ex),
                                           fg)

    def _dense_plan(self, wsi_shape, positions, pad_offset: int = 0):
        """:func:`fit_dense_lattice` for this registrar's lattice/window."""
        return fit_dense_lattice(positions, self.h_st, self.w_st,
                                 self.window_size, wsi_shape, pad_offset)

    def dense_plan(self, wsi, positions, pad_offset: int = 0):
        """The dense-lattice execution plan for these inputs, or None when
        :meth:`register_dense` would not accept them (hex registrar, packed
        WSI, irregular/sparse/out-of-bounds lattice). Pass the returned plan
        back via ``register_dense(plan=...)`` to skip refitting -- the fit
        is two lstsq's over every in-tissue bin (~147k at HD capture-area
        scale), worth computing once per slide."""
        from gridnext_tpu.ops.patch_gather_pallas import PackedWSI

        if self.hex_coords or isinstance(wsi, PackedWSI):
            return None
        return self._dense_plan(wsi.shape, positions, pad_offset)

    def dense_applicable(self, wsi, positions, pad_offset: int = 0) -> bool:
        """True when :meth:`register_dense` will accept these inputs --
        square registrar, unpacked WSI, dense regular lattice in bounds."""
        return self.dense_plan(wsi, positions, pad_offset) is not None

    def register_dense(self, wsi, positions, pad_offset: int = 0,
                       plan=None) -> np.ndarray:
        """Register a DENSE square bin lattice (Visium HD) by tiling.

        HD bins tile the capture area contiguously (bin pitch == bin size),
        so patch extraction needs no per-bin gather: integer-pitch lattices
        (pitch == ``window_size`` exactly) register from ONE dynamic_slice +
        reshape with labels bit-identical to the per-bin path, and
        fractional-pitch lattices (real Spaceranger HD: pitch = 16um /
        microns-per-pixel) register through a banded lattice resample that
        samples the exact bin extents. Bins missing from ``positions``
        register as background.

        Requires ``hex_coords=False`` (square lattices only) and an unpacked
        (H, W, 3) WSI; raises ValueError for irregular/sparse position sets
        (use plain ``__call__`` there, or :meth:`dense_applicable` to probe
        first). ``plan``: a precomputed :meth:`dense_plan` result, skipping
        the refit.
        """
        if self.hex_coords:
            raise ValueError("register_dense needs a square lattice "
                             "(hex_coords=False)")
        from gridnext_tpu.ops.patch_gather_pallas import PackedWSI

        if isinstance(wsi, PackedWSI):
            raise ValueError("register_dense slices the raw WSI; pass the "
                             "unpacked (H, W, 3) image")
        if plan is None:
            plan = self._dense_plan(wsi.shape, positions, pad_offset)
        if plan is None:
            raise ValueError(
                "positions are not a dense regular lattice (or it exceeds "
                "the image); use the per-bin registration path (__call__) "
                "instead")
        if plan[0] == "exact":
            _, oy0, ox0, fg, ey, ex = plan
            labels = self._jitted_dense(wsi, oy0, ox0, jnp.asarray(fg),
                                        ey=ey, ex=ex)
        else:
            _, y0, x0, py, px_, fg, h_band, ey, ex = plan
            labels = self._jitted_dense_rs(
                wsi, jnp.float32(y0), jnp.float32(x0), jnp.float32(py),
                jnp.float32(px_), jnp.asarray(fg), h_band=h_band,
                ey=ey, ex=ex)
        return np.asarray(labels)

    def _spot_arrays(self, wsi_shape, positions, pad_offset):
        oy, ox, y_px, x_px = spot_pixel_arrays(positions, self.h_st,
                                               self.w_st, self.hex_coords)
        y_px, x_px = _clamp_centers(y_px, x_px, wsi_shape,
                                    self.window_size, pad_offset)
        return oy, ox, y_px, x_px

    def __call__(self, wsi, positions, pad_offset: int = 0) -> np.ndarray:
        """Register one slide.

        Args:
          wsi: device-resident (H, W, 3) uint8 image in ORIGINAL pixel
            coordinates, or a :class:`~gridnext_tpu.ops.patch_gather_pallas.
            PackedWSI` staged via ``SlideSource(pack=True)`` (the per-slide
            pack then happens at staging, off the registration dispatch).
            Spots within half a patch of the border read border-clamped
            pixels. If you pre-padded the image yourself, pass the padding
            amount as ``pad_offset`` so spot coordinates are shifted
            accordingly.
          positions: Spaceranger positions DataFrame for the array.

        Returns:
          (h_st, w_st) int label grid, 0 background / 1..C foreground.
        """
        wsi, orig_hw, oy, ox, y_px, x_px = self._prepared_inputs(
            wsi, positions, pad_offset)
        labels = self._jitted(wsi, oy, ox, y_px, x_px, orig_hw=orig_hw)
        return np.asarray(labels)

    def _prepared_inputs(self, wsi, positions, pad_offset: int):
        """Shared single-slide preamble of :meth:`__call__` and
        :meth:`register_logits`: unpack (PackedWSI-aware), compute spot
        arrays, and bucket-pad the spot axis so near-equal in-tissue
        counts share ONE compiled program (parked spots are dropped by the
        scatters) -- foreground counts are essentially unique per slide,
        and without this every count retraces + recompiles."""
        wsi, orig_hw = self._unpack(wsi)
        shape = orig_hw if orig_hw is not None else wsi.shape
        oy, ox, y_px, x_px = self._spot_arrays(shape, positions, pad_offset)
        k = len(oy)
        s_pad = -(-max(k, 1) // _SPOT_BUCKET) * _SPOT_BUCKET
        if s_pad != k:
            p2 = self.window_size // 2
            poy, pox, py, px_ = _parked_spots(s_pad, self.h_st, p2)
            poy[:k], pox[:k], py[:k], px_[:k] = oy, ox, y_px, x_px
            oy, ox, y_px, x_px = poy, pox, py, px_
        return (wsi, orig_hw, jnp.asarray(oy), jnp.asarray(ox),
                jnp.asarray(y_px), jnp.asarray(x_px))

    def register_logits(self, wsi, positions, pad_offset: int = 0):
        """Register one slide, returning class logits instead of labels.

        Same pipeline as :meth:`__call__` up to (and including) the
        corrector, without the final argmax/masking: returns
        ``((h_st, w_st, C) float32 logits, (h_st, w_st) int32 fg mask)``.
        Use for calibrated/score-aware consumers and for
        :func:`label_parity_report`'s margin analysis.
        """
        wsi, orig_hw, oy, ox, y_px, x_px = self._prepared_inputs(
            wsi, positions, pad_offset)
        logits, fg = self._jitted_logits(wsi, oy, ox, y_px, x_px,
                                         orig_hw=orig_hw)
        return np.asarray(logits), np.asarray(fg)

    def _unpack(self, wsi):
        from gridnext_tpu.ops.patch_gather_pallas import PackedWSI

        if isinstance(wsi, PackedWSI):
            if self.extractor != "pallas":
                raise ValueError("PackedWSI input requires the pallas "
                                 f"extractor (have {self.extractor!r})")
            return wsi.data, tuple(wsi.orig_hw)
        return wsi, None

    def _check_export_platforms(self, platforms):
        """Fail fast on cross-platform export of Pallas paths: the
        interpret-mode heuristics (hexcorrector_pallas/patch_gather_pallas)
        key off the CURRENT backend, not the lowering target -- exporting a
        Mosaic kernel for a cpu target fails, and exporting the interpreted
        fallback for a tpu target would silently embed the slow pure-XLA
        form in the 'deployment unit'. Same-backend targets are fine."""
        if not platforms:
            return
        uses_pallas = self.use_pallas or self.extractor == "pallas"
        here = jax.default_backend()
        mismatched = [p for p in platforms if str(p).lower() != here]
        if uses_pallas and mismatched:
            raise ValueError(
                f"cannot export the Pallas corrector/extractor for platforms"
                f" {mismatched} from a {here!r} backend: kernel vs interpret "
                "lowering is decided by the current backend. Export on the "
                "target backend, or build the registrar with "
                "use_pallas_corrector=False and extractor='xla' for a "
                "portable (pure-XLA) artifact")

    def spot_inputs(self, wsi_shape, positions, n_spots: int,
                    pad_offset: int = 0):
        """Fixed-length device inputs for one slide: (oy, ox, y_px, x_px)
        int32 arrays padded to exactly ``n_spots``.

        Padded entries park outside the lattice (``oy == h_st``, dropped by
        the scatter's mode='drop') and crop a harmless corner window --
        the same convention as :meth:`register_batch`. Use with
        :meth:`export` artifacts, whose spot axis is a fixed shape.
        """
        return artifact_spot_inputs(
            wsi_shape, positions, n_spots, window_size=self.window_size,
            h_st=self.h_st, w_st=self.w_st, hex_coords=self.hex_coords,
            pad_offset=pad_offset)

    def export(self, wsi_shape, n_spots: int, platforms=None) -> bytes:
        """Serialize the registration computation as a portable artifact.

        Returns jax.export-serialized StableHLO bytes of the FULL pipeline
        (patch gather -> f -> corrector -> label grid) with the model
        weights embedded as constants: a serving container reloads and runs
        it with :func:`load_exported_registration` and NO model code, and
        the artifact is a stable deployment unit (the reference has no
        deployment story at all -- its serving is a Python loop over a
        live torch module, utils.py:20-57).

        Shapes are static: ``wsi_shape`` = (H, W, 3) uint8 and a fixed
        ``n_spots`` spot axis -- build inputs with :meth:`spot_inputs`.
        ``platforms``: target platform list (e.g. ``['tpu', 'cpu']``);
        default = the current backend only.
        """
        from jax import export as jexport

        if self.mesh is not None:
            raise ValueError("export serializes the single-device path; "
                             "build the registrar with mesh=None")
        self._check_export_platforms(platforms)
        if len(wsi_shape) != 3 or wsi_shape[-1] != 3:
            raise ValueError(f"wsi_shape must be (H, W, 3); got {wsi_shape}")
        spot = jax.ShapeDtypeStruct((int(n_spots),), jnp.int32)
        args = (jax.ShapeDtypeStruct(tuple(map(int, wsi_shape)), jnp.uint8),
                spot, spot, spot, spot)
        fn = jax.jit(lambda wsi, oy, ox, y, x:
                     self._register(wsi, oy, ox, y, x))
        exported = jexport.export(fn, platforms=platforms)(*args)
        return bytes(exported.serialize())

    def export_dense(self, wsi_shape, ey: int, ex: int,
                     platforms=None) -> bytes:
        """Serialize the HD dense-tiling registration as a portable artifact.

        The exact integer-pitch path of :meth:`register_dense` (one
        dynamic_slice + reshape -> f -> corrector -> labels) exported via
        jax.export for a fixed ``wsi_shape`` and in-tissue bin extent
        ``(ey, ex)`` -- take these from :meth:`dense_plan`'s
        ``("exact", oy0, ox0, fg, ey, ex)`` result. The reloaded callable
        (:func:`load_exported_registration`) takes ``(wsi, oy0, ox0, fg)``
        with ``fg`` the (h_st, w_st) int32 in-tissue mask.
        """
        from jax import export as jexport

        if self.mesh is not None:
            raise ValueError("export serializes the single-device path; "
                             "build the registrar with mesh=None")
        self._check_export_platforms(platforms)
        if self.hex_coords:
            raise ValueError("export_dense needs a square-lattice registrar "
                             "(hex_coords=False)")
        if len(wsi_shape) != 3 or wsi_shape[-1] != 3:
            raise ValueError(f"wsi_shape must be (H, W, 3); got {wsi_shape}")
        scalar = jax.ShapeDtypeStruct((), jnp.int32)
        args = (jax.ShapeDtypeStruct(tuple(map(int, wsi_shape)), jnp.uint8),
                scalar, scalar,
                jax.ShapeDtypeStruct((self.h_st, self.w_st), jnp.int32))
        ey, ex = int(ey), int(ex)
        fn = jax.jit(lambda wsi, oy0, ox0, fg:
                     self._register_dense(wsi, oy0, ox0, fg, ey=ey, ex=ex))
        return bytes(jexport.export(fn, platforms=platforms)(*args)
                     .serialize())

    def register_batch(self, wsis, positions_list: Sequence,
                       pad_offset: int = 0) -> np.ndarray:
        """Register N same-shape slides in ONE device dispatch.

        Per-slide spot arrays pad to a common bucket-rounded length (padded
        entries park outside the lattice and scatter with mode='drop'), so
        slides with near-equal spot counts share one compiled program and
        the f batch covers all N slides at once -- the production serving
        shape.

        Args:
          wsis: (N, H, W, 3) uint8 stack (device-resident) of equally-sized
            slides, or a batched ``PackedWSI`` ((N, Hp, Wp) data).
          positions_list: one positions DataFrame per slide.

        Returns:
          (N, h_st, w_st) int label grids.
        """
        wsis, orig_hw = self._unpack(wsis)
        n = len(positions_list)
        if wsis.shape[0] != n:
            raise ValueError(f"{wsis.shape[0]} slides vs {n} position sets")
        shape = orig_hw if orig_hw is not None else wsis.shape[1:]
        per = [self._spot_arrays(shape, p, pad_offset)
               for p in positions_list]
        # max(s_max, 1): an all-background batch (no in-tissue spots on any
        # slide) still needs one (parked) spot column -- a 0-width spot axis
        # can't reshape to (b, 0, -1)
        s_max = max(len(a[0]) for a in per)
        s_pad = -(-max(s_max, 1) // _SPOT_BUCKET) * _SPOT_BUCKET
        p2 = self.window_size // 2

        oy, ox, y_px, x_px = (np.tile(a, (n, 1)) for a in
                              _parked_spots(s_pad, self.h_st, p2))
        for i, (a_oy, a_ox, a_y, a_x) in enumerate(per):
            k = len(a_oy)
            oy[i, :k], ox[i, :k] = a_oy, a_ox
            y_px[i, :k], x_px[i, :k] = a_y, a_x
        labels = self._jitted_batch(wsis, jnp.asarray(oy), jnp.asarray(ox),
                                    jnp.asarray(y_px), jnp.asarray(x_px),
                                    orig_hw=orig_hw)
        return np.asarray(labels)


def export_grid_forward(model, variables, grid_shapes, platforms=None,
                        explicit_fg: bool = False) -> bytes:
    """Serialize a grid model's registration forward as a portable artifact.

    The count/multimodal analog of :meth:`SlideRegistrar.export`: jits
    ``argmax(model(x)) + 1`` masked by the tissue support over a fixed-shape
    input grid, exports it via jax.export with the weights embedded, and
    returns the serialized bytes. ``grid_shapes``: one ``(H, W, C)`` tuple
    for a single-modality model, or a sequence of them (image, count order)
    for GridNetMM family. Reload with :func:`load_exported_registration`;
    the callable takes the (1, H, W, C) batched grid(s) and returns
    (1, H, W) int32 labels (0 = background).

    Tissue mask: by default, any non-zero feature in the (last) count-grid
    input -- equivalent to the live register convention (raw counts > 0)
    for raw or log1p counts, where zero rows stay zero. With
    ``explicit_fg=True`` the artifact instead takes a trailing (1, H, W)
    int32 foreground mask input -- REQUIRED when the count grid is fed
    pre-transformed by a support-changing map (scBERT's gene2vec reindex
    zeroes unmapped genes, so a bin whose raw counts all fall outside the
    vocabulary would otherwise silently flip to background, diverging from
    the live register path).
    """
    from jax import export as jexport

    single = bool(len(grid_shapes)) and np.ndim(grid_shapes[0]) == 0
    shapes = (grid_shapes,) if single else tuple(grid_shapes)
    args = tuple(jax.ShapeDtypeStruct((1,) + tuple(map(int, s)), jnp.float32)
                 for s in shapes)
    n_grids = len(args)
    if explicit_fg:
        h, w = shapes[0][0], shapes[0][1]
        args = args + (jax.ShapeDtypeStruct((1, int(h), int(w)), jnp.int32),)

    def fn(*xs):
        grids = xs[:n_grids]
        x = grids[0] if single else grids
        logits = model.apply(variables, x, train=False)
        labels = jnp.argmax(logits, axis=-1).astype(jnp.int32) + 1
        fg = (xs[-1] > 0) if explicit_fg else jnp.any(grids[-1] != 0, axis=-1)
        return jnp.where(fg, labels, 0)

    return bytes(jexport.export(jax.jit(fn), platforms=platforms)(*args)
                 .serialize())


def load_exported_registration(blob: bytes) -> Callable:
    """Rehydrate a :meth:`SlideRegistrar.export` artifact.

    Returns ``fn(wsi, oy, ox, y_px, x_px) -> (h_st, w_st) int32 labels``
    executing the serialized StableHLO -- weights included, no model code
    or registrar construction needed. Inputs must match the exported
    shapes (see :meth:`SlideRegistrar.spot_inputs`).
    """
    from jax import export as jexport

    return jexport.deserialize(bytearray(blob)).call


def label_parity_report(want, got, logits, *, rel_tol: float = 1e-2,
                        abs_tol: float = 1e-3) -> int:
    """Assert two label grids from separately compiled programs agree.

    XLA does not guarantee bitwise-identical floats between two separately
    compiled programs of the same computation (an exported StableHLO module
    re-compiled on load vs the live jit): fusion and intra-op partitioning
    choices can reorder reductions, so an ``argmax`` may legitimately flip
    at sites whose top-2 logits are within float noise. On real TPU the
    observed behavior IS exact (measured in examples/artifact_timing.py and
    asserted there); this helper enforces the strongest *device-portable*
    contract:

    - the two grids agree everywhere EXCEPT possibly at near-tie sites,
      where the top-2 logit margin is below ``abs_tol + rel_tol * scale``;
    - at a flipped site, the disagreeing label must be exactly the
      runner-up class of the reference logits (a flip to any other class is
      a real bug, not float noise);
    - background/foreground structure (label 0 vs >0) must match exactly --
      the fg mask is integer-deterministic.

    Args:
      want: (H, W) int reference label grid (e.g. the live jit's).
      got: (H, W) int label grid under test (e.g. the reloaded artifact's).
      logits: (H, W, C) float class logits of the REFERENCE path
        (:meth:`SlideRegistrar.register_logits`).

    Returns:
      the number of tolerated near-tie flips (0 = exact agreement).

    Raises:
      AssertionError: any structural mismatch or over-tolerance flip.
    """
    want = np.asarray(want)
    got = np.asarray(got)
    logits = np.asarray(logits, np.float32)
    if not ((want > 0) == (got > 0)).all():
        bad = np.argwhere((want > 0) != (got > 0))
        raise AssertionError(
            f"background/foreground mismatch at {len(bad)} sites (first: "
            f"{bad[0].tolist()}) -- fg masking is integer-deterministic and "
            "must never diverge between compilations")
    mism = want != got
    n_flips = int(mism.sum())
    if n_flips == 0:
        return 0
    order = np.argsort(logits, axis=-1)
    top1, top2 = order[..., -1], order[..., -2]
    v1 = np.take_along_axis(logits, top1[..., None], -1)[..., 0]
    v2 = np.take_along_axis(logits, top2[..., None], -1)[..., 0]
    margin = v1 - v2
    tol = abs_tol + rel_tol * np.maximum(np.abs(v1), np.abs(v2))
    wide = mism & (margin > tol)
    if wide.any():
        y, x = np.argwhere(wide)[0]
        raise AssertionError(
            f"{int(wide.sum())}/{n_flips} label flips exceed the near-tie "
            f"margin (first at ({y},{x}): want {want[y, x]} got {got[y, x]}"
            f", margin {margin[y, x]:.4g} > tol {tol[y, x]:.4g})")
    # a near-tie flip must land on the runner-up class, not an arbitrary one
    not_runner_up = mism & (got != top2 + 1) & (got != top1 + 1)
    if not_runner_up.any():
        y, x = np.argwhere(not_runner_up)[0]
        raise AssertionError(
            f"flip at ({y},{x}) to label {got[y, x]} which is neither the "
            f"top-1 ({top1[y, x] + 1}) nor runner-up ({top2[y, x] + 1}) "
            "class -- not explicable as float noise")
    return n_flips


def _tctx(timer, stage: str):
    """``timer(stage)`` or a no-op context when no StageTimer is wired."""
    if timer is None:
        import contextlib

        return contextlib.nullcontext()
    return timer(stage)


def dispatch_group(registrar: SlideRegistrar, items, *, timer=None,
                   plans=None, stats=None):
    """Register one same-shape group of slides with the canonical routing.

    THE routing, defined once and shared by :func:`register_slides` and the
    HTTP server's micro-batcher (server._MicroBatcher) so the two can never
    diverge: square-lattice slides with a dense plan register per slide
    through the tiling path (:meth:`SlideRegistrar.register_dense`); a
    singleton group uses the single-slide program; everything else stacks
    (PackedWSI-aware) into one :meth:`SlideRegistrar.register_batch`
    dispatch.

    Args:
      items: sequence of ``(key, wsi, positions)``; ``key`` passes through
        untouched (a slide index, a request handle, ...).
      timer: optional :class:`~gridnext_tpu.observability.StageTimer`;
        device dispatches run under ``timer("register")``.
      plans: optional ``{key: dense_plan-or-None}`` fitted by the caller
        (e.g. on a concurrent request thread); keys present here skip the
        in-dispatch :meth:`SlideRegistrar.dense_plan` fit, and a ``None``
        value means "not a dense lattice". Only consulted for square
        lattices.
      stats: optional dict; ``stats['batched']`` is incremented by the
        number of slides that went through ``register_batch``.

    Returns:
      list of ``(key, labels, positions)`` per item (dense-routed items
      first, then the batched rest).
    """
    from gridnext_tpu.ops.patch_gather_pallas import PackedWSI

    out = []
    if not registrar.hex_coords:
        # square HD lattices: prefer the dense-tiling path (no per-bin
        # gather -- 3.6M bins/s measured at 16um capture-area scale). The
        # explicit predicate (not exception control flow) decides: genuine
        # dense-path errors surface, and slides that fail the dense
        # precondition keep the batched per-bin dispatch below.
        rest = []
        for key, wsi, pos in items:
            if plans is not None and key in plans:
                plan = plans[key]
            else:
                plan = registrar.dense_plan(wsi, pos)  # fit once per slide
            if plan is not None:
                with _tctx(timer, "register"):
                    out.append((key, registrar.register_dense(wsi, pos,
                                                              plan=plan),
                                pos))
            else:
                rest.append((key, wsi, pos))
        items = rest
        if not items:
            return out
    if len(items) == 1:
        key, wsi, pos = items[0]
        with _tctx(timer, "register"):
            return out + [(key, registrar(wsi, pos), pos)]
    keys, wsis, poss = zip(*items)
    if isinstance(wsis[0], PackedWSI):
        wsis = PackedWSI(jnp.stack([w.data for w in wsis]), wsis[0].orig_hw)
    else:
        wsis = jnp.stack(wsis)
    with _tctx(timer, "register"):
        labels = registrar.register_batch(wsis, list(poss))
    if stats is not None:
        stats["batched"] = stats.get("batched", 0) + len(keys)
    return out + [(k, labels[j], p)
                  for j, (k, p) in enumerate(zip(keys, poss))]


def register_slides(registrar: SlideRegistrar, image_files: Sequence,
                    spaceranger_dirs: Sequence, *, hd_binning=None,
                    slide_batch: int = 4, prefetch: Optional[int] = None,
                    source=None):
    """Sustained multi-slide registration: decode, stage, and register
    fully overlapped -- the production serving loop.

    Drives an :class:`~gridnext_tpu.ingest.SlideSource` (background-thread
    JPEG decode + asynchronous ``device_put`` staging) into the registrar,
    grouping same-shape slides into :meth:`SlideRegistrar.register_batch`
    dispatches of up to ``slide_batch`` slides, so the TPU registers batch
    N while the host decodes and stages batch N+1. The reference's
    equivalent loop (imgprocess.py:185-238 feeding utils.py:20-57) is fully
    serial: decode -> per-spot crop -> forward, one slide at a time.

    Yields ``(index, label_grid, positions)`` per slide as each dispatch
    completes. Shape-grouping may reorder slides across groups -- use
    ``index`` (position in ``image_files``) to identify results. Per-stage
    seconds land in ``source.timer`` (decode / stage / register).

    Args:
      registrar: a jitted :class:`SlideRegistrar`.
      image_files: fullres slide images, one per array.
      spaceranger_dirs: matching Spaceranger dirs (positions per slide).
      hd_binning: Visium HD binned-output name for position lookup.
      slide_batch: max slides per device dispatch, and the cap on staged
        slides held across shape groups (mixed-shape cohorts flush the
        largest partial group at the cap instead of pinning every shape's
        WSI in HBM until the source drains). Leftover groups dispatch at
        their actual size (size-1 groups reuse the single-slide program).
      prefetch: SlideSource queue depth (default ``slide_batch + 1`` so the
        next full batch decodes behind the current dispatch).
      source: pass a pre-built SlideSource instead (image_files /
        spaceranger_dirs / hd_binning / prefetch are then ignored).
    """
    if source is None:
        from gridnext_tpu.ingest import SlideSource

        # pallas-extractor registrars take pre-packed slides: run pack_wsi
        # at staging time (behind the previous batch's registration) so the
        # ~6 ms/slide pack never sits on the registration dispatch. Square
        # registrars stay unpacked -- the dense-tiling route (preferred for
        # HD lattices) slices the raw WSI; per-bin fallbacks pack in-dispatch.
        source = SlideSource(image_files, spaceranger_dirs,
                             hd_binning=hd_binning,
                             prefetch=prefetch or slide_batch + 1,
                             pack=(registrar.extractor == "pallas"
                                   and registrar.hex_coords))
    timer = source.timer

    from gridnext_tpu.ops.patch_gather_pallas import PackedWSI

    def flush(group):
        # one canonical routing, shared with the HTTP server's micro-batcher
        return dispatch_group(registrar, group, timer=timer)

    # Shape-grouping must not pin unbounded device memory: a mixed-shape
    # cohort (distinct scan dimensions are the norm for real WSIs) never
    # fills any one group, so without a cap every staged slide would stay
    # HBM-resident until the source drains. Bound the total held slides at
    # slide_batch -- when the cap is hit, flush the largest partial group
    # (best dispatch amortization) even though it's not full.
    groups: dict = {}
    held = 0
    for i, wsi, pos in source:
        key = (tuple(wsi.orig_hw) if isinstance(wsi, PackedWSI)
               else tuple(wsi.shape))
        groups.setdefault(key, []).append((i, wsi, pos))
        held += 1
        if len(groups[key]) >= slide_batch:
            key_to_flush = key
        elif held >= slide_batch:
            key_to_flush = max(groups, key=lambda k: len(groups[k]))
        else:
            continue
        group = groups.pop(key_to_flush)
        held -= len(group)
        yield from flush(group)
    for group in groups.values():
        if group:
            yield from flush(group)
