"""Pallas patch-gather kernel: DMA-pipelined spot-window extraction.

The serving hot path crops one ``window x window`` patch per spot from a
device-resident WSI (4,992 crops per Visium slide). XLA's best form --
``vmap(dynamic_slice)`` (pipeline.extract_patches_device) -- issues the
crops as a serial chain of small copies and measured ~9 ms/slide inside
the registration pipeline (docs/roadmap.md roofline; the reference's
equivalent is a host-side PIL crop loop, imgprocess.py:207-221). This
kernel drives the copies as K-deep pipelined DMAs instead, with the
unaligned window extraction done on-chip.

Why the dance below: Mosaic requires *provably* tile-aligned dynamic
slices of HBM memrefs -- an (8, 128)-tiled int32 image can only be sliced
at ``block_idx * 8`` rows / ``block_idx * 128`` lanes (runtime scalar
offsets fail the divisibility proof, measured). And ``tpu.dynamic_rotate``
only lowers 32-bit lanes (an int8 roll fails to compile) and mis-lowers
negative dynamic shifts (measured: use ``size - shift``). So:

1. The WSI is packed ONCE per slide: RGB uint8 -> RGBX -> bitcast int32,
   one 32-bit lane per pixel, zero-padded to (8k, 128k) so edge-clamped
   superblocks stay block-aligned (pack_wsi; one cheap XLA pass).
2. Per spot, the kernel DMAs the aligned (window+8, window+128) superblock
   covering the window into a VMEM slot (K slots, K DMAs in flight).
3. On-chip, two ``pltpu.roll``s shift the window to the origin; the
   (window, window) corner is staged and DMA'd back to HBM, overlapped
   with the next spot's input DMA.

Measured on v5e (4,992 x 128 px, 0.25 GB WSI): see docs/roadmap.md.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class PackedWSI(NamedTuple):
    """A pre-packed slide: pay :func:`pack_wsi` once at staging time
    (ingest.SlideSource(pack=True)) instead of inside every registration
    dispatch (~6 ms/slide at 0.25 GB, docs/roadmap.md).

    Attributes:
      data: (Hp, Wp) -- or (B, Hp, Wp) for a batch -- int32 packed image(s).
      orig_hw: the pre-pack (H, W); edge-crop clamping bound.
    """

    data: jnp.ndarray
    orig_hw: tuple

# Superblock margins: 1 row tile (8) and 1 lane tile (128) beyond the
# window cover any in-tile offset. The superblock sides are themselves
# rounded up to tile multiples so the edge clamp (in whole blocks) still
# leaves the window inside: with hp % 8 == 0 and blk_r % 8 == 0, the
# clamped origin is exactly hp - blk_r, so dy <= blk_r - window (same for
# lanes) -- without the rounding, edge spots overflow the margin.
_ROW_PAD = 8
_LANE_PAD = 128


def _blk(window: int):
    blk_r = -(-window // _ROW_PAD) * _ROW_PAD + _ROW_PAD
    blk_c = -(-window // _LANE_PAD) * _LANE_PAD + _LANE_PAD
    return blk_r, blk_c


def pack_wsi(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3|4) uint8 WSI -> (8k, 128k) int32 image, one pixel per lane.

    RGB gains a zero X byte; rows/cols zero-pad up to the tile multiples the
    kernel's aligned superblock DMAs require. Pure XLA, one pass; do it once
    per slide and reuse across gathers.
    """
    if img.dtype != jnp.uint8 or img.ndim != 3 or img.shape[-1] not in (3, 4):
        raise ValueError(f"expected (H, W, 3|4) uint8 WSI, got "
                         f"{img.shape} {img.dtype}")
    h, w = img.shape[:2]
    if img.shape[-1] == 3:
        img = jnp.concatenate(
            [img, jnp.zeros((h, w, 1), img.dtype)], axis=-1)
    i32 = lax.bitcast_convert_type(img, jnp.int32).reshape(h, w)
    hp = -(-h // _ROW_PAD) * _ROW_PAD
    wp = -(-w // _LANE_PAD) * _LANE_PAD
    return jnp.pad(i32, ((0, hp - h), (0, wp - w)))


def _kernel(window, depth, yb_ref, xb_ref, dy_ref, dx_ref, slide_ref,
            img_ref, out_ref, in_buf, stage, sin, sout):
    n = yb_ref.shape[0]
    blk_r, blk_c = _blk(window)

    def in_dma(i):
        slot = lax.rem(i, depth)
        return pltpu.make_async_copy(
            img_ref.at[slide_ref[i],
                       pl.ds(yb_ref[i] * _ROW_PAD, blk_r),
                       pl.ds(xb_ref[i] * _LANE_PAD, blk_c)],
            in_buf.at[slot], sin.at[slot])

    def out_dma(i):
        slot = lax.rem(i, depth)
        return pltpu.make_async_copy(stage.at[slot], out_ref.at[i],
                                     sout.at[slot])

    def warm(i, _):
        in_dma(i).start()
        return 0
    lax.fori_loop(0, min(depth, n), warm, 0)

    def body(i, _):
        slot = lax.rem(i, depth)
        in_dma(i).wait()

        @pl.when(i >= depth)
        def _():
            out_dma(i - depth).wait()          # stage slot must be free
        block = in_buf[slot]
        # dynamic_rotate: 'size - shift' form (negative shifts mis-lower)
        rolled = pltpu.roll(block, lax.rem(blk_c - dx_ref[i], blk_c), axis=1)
        rolled = pltpu.roll(rolled, lax.rem(blk_r - dy_ref[i], blk_r), axis=0)
        stage[slot] = rolled[:window, :window]
        out_dma(i).start()

        @pl.when(i + depth < n)
        def _():
            in_dma(i + depth).start()          # in_buf slot now free
        return 0
    lax.fori_loop(0, n, body, 0)

    def drain(i, _):
        out_dma(i).wait()
        return 0
    lax.fori_loop(max(0, n - depth), n, drain, 0)


@functools.partial(jax.jit,
                   static_argnames=("window", "orig_hw", "depth", "interpret"))
def gather_patches(imgs32: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray,
                   window: int, slide: jnp.ndarray = None, *,
                   orig_hw: tuple = None, depth: int = 8,
                   interpret: bool = None) -> jnp.ndarray:
    """Gather (N, window, window, 3) uint8 patches from packed WSIs.

    Args:
      imgs32: (B, Hp, Wp) int32 packed slides (:func:`pack_wsi`; a single
        (Hp, Wp) image is promoted to B=1).
      y0, x0: (N,) int-like top-left corners in ORIGINAL pixel coordinates;
        clamped into bounds like ``lax.dynamic_slice``.
      window: static crop side in pixels.
      slide: (N,) slide index per spot (default: all 0).
      orig_hw: the pre-pack (H, W) -- clamping bound, so edge crops match
        ``dynamic_slice`` on the unpadded image exactly (pad rows/cols
        never reach the output). Default: the packed dims.
      depth: DMA pipeline depth (in-flight superblock fetches).
      interpret: run the kernel interpreted (default: auto -- True off-TPU,
        so CPU test meshes exercise the same code path).

    Returns:
      (N, window, window, 3) uint8 patches.
    """
    if imgs32.ndim == 2:
        imgs32 = imgs32[None]
    if imgs32.dtype != jnp.int32:
        raise ValueError("imgs32 must be pack_wsi output (int32)")
    if interpret is None:
        from gridnext_tpu.ops.pallas_support import default_interpret
        interpret = default_interpret()
    if window % _LANE_PAD and not interpret:
        # the staged (window, window) corner is a lane-dim slice of the VMEM
        # superblock; Mosaic only lowers compiled slices at 128-lane
        # multiples (the interpreter has no such constraint)
        raise ValueError(
            f"window must be a multiple of {_LANE_PAD} (VMEM lane tiling); "
            f"got {window}. Use the XLA extractor for smaller windows -- "
            "for dense HD bin lattices use SlideRegistrar.register_dense "
            "(tiling extraction needs no gather at all).")
    b, hp, wp = imgs32.shape
    blk_r, blk_c = _blk(window)
    if hp < blk_r or wp < blk_c:
        raise ValueError(f"packed image {hp}x{wp} smaller than the "
                         f"superblock {blk_r}x{blk_c}")
    h, w = orig_hw if orig_hw is not None else (hp, wp)
    if h < window or w < window:
        # the superblock check above already implies this when orig_hw is
        # consistent with the packed dims, but an inconsistent orig_hw would
        # otherwise drive jnp.clip(y0, 0, h - window) NEGATIVE (clip returns
        # the max when max < min) and the kernel into out-of-bounds DMAs
        raise ValueError(f"slide ({h}x{w}) smaller than the {window}px "
                         f"window; cannot crop")
    n = y0.shape[0]
    if n == 0:
        # all-background slide (no in-tissue spots): the kernel's warm-up
        # DMA loop can't index 0-length SMEM refs; match the XLA
        # extractor's empty-batch behavior instead of a trace error
        return jnp.zeros((0, window, window, 3), jnp.uint8)
    y0 = jnp.clip(y0, 0, h - window).astype(jnp.int32)
    x0 = jnp.clip(x0, 0, w - window).astype(jnp.int32)
    # slide indices are traced values, so clamp (like the corners) rather
    # than DMA past the batch dim on a bad index
    slide = (jnp.zeros((n,), jnp.int32) if slide is None
             else jnp.clip(slide.astype(jnp.int32), 0, b - 1))
    # aligned superblock origin (block units -- Mosaic proves divisibility
    # from the in-kernel multiply) + in-block window offset
    y_b = jnp.minimum(y0 // _ROW_PAD, (hp - blk_r) // _ROW_PAD)
    x_b = jnp.minimum(x0 // _LANE_PAD, (wp - blk_c) // _LANE_PAD)
    dy = y0 - y_b * _ROW_PAD
    dx = x0 - x_b * _LANE_PAD

    out = pl.pallas_call(
        functools.partial(_kernel, window, depth),
        out_shape=jax.ShapeDtypeStruct((n, window, window), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5 +
                 [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((depth, blk_r, blk_c), jnp.int32),
                        pltpu.VMEM((depth, window, window), jnp.int32),
                        pltpu.SemaphoreType.DMA((depth,)),
                        pltpu.SemaphoreType.DMA((depth,))],
        interpret=interpret,
    )(y_b, x_b, dy, dx, slide, imgs32)
    return lax.bitcast_convert_type(out, jnp.uint8)[..., :3]
