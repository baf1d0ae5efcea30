"""Production serving: end-to-end on-device slide registration.

Packages the full inference path as one jittable function: device-resident
slide image -> per-spot patch gather -> spot classifier f -> hexagonal
corrector g (fused Pallas kernel) -> odd-right label grid. This is the
"register a slide" path of the reference (all_fgd_predictions +
to_loupe_annots over a PatchGridDataset) with the host loop, the JPEG cache
round-trip, and all host<->device transfers removed.

Typical use:

    registrar = SlideRegistrar.from_gridnet(g_model, variables, patch_size=128)
    wsi = jax.device_put(slide_uint8)                      # decode once
    labels = registrar(wsi, positions)                     # (78, 64) int
    to_loupe_annots(labels, position_file, out_csv, annot_names=classes)
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gridnext_tpu import geometry
from gridnext_tpu.ops.hexcorrector_pallas import (
    fold_corrector_params,
    fused_hex_corrector,
)


def spot_pixel_arrays(positions, h_st: int = geometry.VISIUM_H_ST,
                      w_st: int = geometry.VISIUM_W_ST):
    """Positions DataFrame -> (oddr_y, oddr_x, y_px, x_px) int32 arrays over
    in-tissue spots (pixel coords NOT yet offset for padding).

    Thin wrapper over the canonical positions->(grid index, pixel) mapping
    (pipeline._spot_pixel_boxes), plus the out-of-lattice bounds filter the
    serving scatter needs.
    """
    from gridnext_tpu.pipeline import _spot_pixel_boxes

    ox, oy, x_px, y_px = _spot_pixel_boxes(positions, window=0)
    keep = (oy < h_st) & (ox < w_st)
    return (oy[keep], ox[keep],
            y_px[keep].astype(np.int32), x_px[keep].astype(np.int32))


class SlideRegistrar:
    """Jitted full-slide registration: image -> odd-right label grid.

    Args:
      f_apply: ``f_apply(patches (N,P,P,3) float in [0,1]) -> (N, f_dim)``
        -- a closure over the spot classifier and its variables.
      corrector_kernels/biases/relu_flags: folded hex-corrector weights
        (see ops.hexcorrector_pallas.fold_corrector_params).
      patch_size: patch side in pixels.
      normalize: 'imagenet' (DenseNet transforms parity) or None.
      patch_chunk: f applied over the spot axis in chunks of this size.
    """

    def __init__(self, f_apply: Callable, corrector_kernels, corrector_biases,
                 relu_flags=(False, True, False, True, False), *,
                 patch_size: int = 128, normalize: Optional[str] = "imagenet",
                 patch_chunk: Optional[int] = 624,
                 h_st: int = geometry.VISIUM_H_ST,
                 w_st: int = geometry.VISIUM_W_ST,
                 use_pallas_corrector: bool = True,
                 corrector_apply: Optional[Callable] = None):
        self.f_apply = f_apply
        self.kernels = [jnp.asarray(k) for k in corrector_kernels]
        self.biases = [jnp.asarray(b) for b in corrector_biases]
        self.relu_flags = tuple(relu_flags)
        self.patch_size = patch_size
        self.normalize = normalize
        self.patch_chunk = patch_chunk
        self.h_st, self.w_st = h_st, w_st
        self.use_pallas = use_pallas_corrector
        self.corrector_apply = corrector_apply
        self._jitted = jax.jit(self._register)

    @classmethod
    def from_gridnet(cls, model, variables, *, patch_size: int = 128,
                     normalize: Optional[str] = "imagenet", **kw):
        """Build from a trained GridNetHex (+DenseNet-style f)."""
        kernels, biases, relu_flags = fold_corrector_params(
            variables["params"]["corrector"],
            variables.get("batch_stats", {}).get("corrector"))
        f = model.patch_classifier
        f_vars = {"params": variables["params"]["patch_classifier"]}
        if variables.get("batch_stats", {}).get("patch_classifier") is not None:
            f_vars["batch_stats"] = variables["batch_stats"]["patch_classifier"]

        def f_apply(patches):
            return f.apply(f_vars, patches, train=False)

        return cls(f_apply, kernels, biases, relu_flags,
                   patch_size=patch_size, normalize=normalize, **kw)

    def _normalize(self, patches):
        patches = patches.astype(jnp.float32) / 255.0
        if self.normalize == "imagenet":
            from gridnext_tpu.pipeline import imagenet_normalize

            patches = imagenet_normalize(patches)
        return patches

    def _extract(self, wsi, y_px, x_px):
        from gridnext_tpu.pipeline import extract_patches_device

        p = self.patch_size
        return self._normalize(extract_patches_device(wsi, y_px, x_px, p, p))

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

    def _register(self, wsi, oy, ox, y_px, x_px):
        patches = self._extract(wsi, y_px, x_px)
        feats = self._apply_f(patches)                       # (N, f_dim)
        # Background cells must carry f(zero-CELL) -- GridNetHex runs f on
        # ALL grid cells including background (gridnet_models.py:76-79), and
        # in training grids background cells are literal zeros (transforms
        # apply to foreground patches only; PatchGridDataset leaves bg at
        # 0.0), so the corrector learned boundary context from f(0). The bg
        # patch therefore bypasses normalization: normalizing it would feed
        # f((0-mean)/std), a vector training never produced.
        bg_patch = jnp.zeros((1, self.patch_size, self.patch_size, 3),
                             jnp.float32)
        bg_vec = self.f_apply(bg_patch)[0].astype(feats.dtype)
        grid = jnp.broadcast_to(bg_vec, (1, self.h_st, self.w_st,
                                         feats.shape[-1]))
        grid = grid.at[0, oy, ox].set(feats)
        if self.use_pallas:
            logits = fused_hex_corrector(grid, self.kernels, self.biases,
                                         self.relu_flags)
        else:
            logits = self.corrector_apply(grid)
        labels = jnp.argmax(logits[0], axis=-1) + 1          # 1..C foreground
        fg = jnp.zeros((self.h_st, self.w_st), bool).at[oy, ox].set(True)
        return jnp.where(fg, labels, 0)

    def __call__(self, wsi, positions, pad_offset: int = 0) -> np.ndarray:
        """Register one slide.

        Args:
          wsi: device-resident (H, W, 3) uint8 image in ORIGINAL pixel
            coordinates; spots within half a patch of the border read
            border-clamped pixels. If you pre-padded the image yourself,
            pass the padding amount as ``pad_offset`` so spot coordinates
            are shifted accordingly.
          positions: Spaceranger positions DataFrame for the array.

        Returns:
          (h_st, w_st) int label grid, 0 background / 1..C foreground.
        """
        oy, ox, y_px, x_px = spot_pixel_arrays(positions, self.h_st, self.w_st)
        y_px = y_px + pad_offset
        x_px = x_px + pad_offset
        p2 = self.patch_size // 2
        y_px = np.clip(y_px, p2, wsi.shape[0] - p2 - 1)
        x_px = np.clip(x_px, p2, wsi.shape[1] - p2 - 1)
        labels = self._jitted(wsi, jnp.asarray(oy), jnp.asarray(ox),
                              jnp.asarray(y_px), jnp.asarray(x_px))
        return np.asarray(labels)
