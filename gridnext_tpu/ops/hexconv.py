"""Hexagonal convolution over Visium odd-right grids, TPU-first.

Replaces the external ``hexagdly`` package used by the reference's correction
networks (gridnet_models.py:130-147). hexagdly stores hex data with odd
*columns* shifted down, forcing the reference to rot90+flip every tensor on
the way in and out of the corrector (gridnet_models.py:178-186). Here the
stencil operates **directly on the Visium odd-right layout** -- odd rows
shifted half a unit right -- so that round-trip disappears entirely.

Formulation: a hex convolution with ``T`` stencil taps is one matmul.
For each tap we build the row-parity-correct shifted feature map (zero padded
at borders), concatenate taps along the channel axis, and contract
``(B*H*W, T*C_in) @ (T*C_in, C_out)`` -- a single large MXU-shaped GEMM
instead of hexagdly's multiple parity-strided torch convs. The parity select
is a cheap VPU `where` on a precomputed row mask; XLA fuses it into the
operand preparation.

Weight layout: ``kernel[t, ci, co]`` with taps ordered by
:func:`gridnext_tpu.geometry.hex_taps` (radius 1: C, W, E, NW, NE, SW, SE).
Like hexagdly's size-1 hex kernel, radius 1 has 7 independent weights per
(ci, co) pair; radius ``r`` has ``1 + 3r(r+1)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gridnext_tpu import geometry


def num_taps(radius: int) -> int:
    """Stencil size of a hex kernel: 1 + 3r(r+1) cells within distance r."""
    return 1 + 3 * radius * (radius + 1)


@functools.lru_cache(maxsize=None)
def _taps(radius: int):
    return geometry.hex_taps(radius)


def _shifted_tap_maps(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Gather the T parity-correct neighbor maps of ``x``.

    Args:
      x: (..., H, W, C) feature map in odd-right layout.
    Returns:
      (..., H, W, T, C) stacked neighbor features (zero at out-of-grid taps).
    """
    taps = _taps(radius)
    h, w = x.shape[-3], x.shape[-2]
    pad = [(0, 0)] * (x.ndim - 3) + [(radius, radius), (radius, radius), (0, 0)]
    xp = jnp.pad(x, pad)

    # row-parity mask, broadcast over (..., H, W, C)
    row_parity = (jnp.arange(h) % 2 == 1).reshape(
        (1,) * (x.ndim - 3) + (h, 1, 1)
    )

    def tap_slice(dr: int, dc: int) -> jnp.ndarray:
        return jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(xp, radius + dr, radius + dr + h, axis=-3),
            radius + dc, radius + dc + w, axis=-2,
        )

    maps = []
    for dr, ce, co in taps:
        if ce == co:
            maps.append(tap_slice(dr, ce))
        else:
            maps.append(jnp.where(row_parity, tap_slice(dr, co), tap_slice(dr, ce)))
    return jnp.stack(maps, axis=-2)


def hex_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None,
             radius: int = 1, precision=None) -> jnp.ndarray:
    """Hexagonal convolution on an odd-right grid.

    Args:
      x: (..., H, W, C_in) input feature map, odd-right indexed (``x[..., y, x_col, :]``).
      kernel: (T, C_in, C_out) tap weights, taps ordered per ``geometry.hex_taps(radius)``.
      bias: optional (C_out,).
      radius: hex stencil radius (1 => 7-cell kernel, the hexagdly
        ``kernel_size=1`` analog used by all reference correctors).

    Returns:
      (..., H, W, C_out).
    """
    t_expected = num_taps(radius)
    if kernel.shape[0] != t_expected:
        raise ValueError(
            f"kernel has {kernel.shape[0]} taps, expected {t_expected} for radius {radius}")
    stacked = _shifted_tap_maps(x, radius)  # (..., H, W, T, C_in)
    # f32 accumulation regardless of compute dtype: the 7*C_in-tap
    # contraction would otherwise accumulate in bf16 under bf16 activations,
    # silently diverging from the Pallas corrector backend (which accumulates
    # f32, ops/hexcorrector_pallas.py) and the flax Dense convention.
    out = jnp.einsum(
        "...tc,tcd->...d", stacked, kernel,
        precision=precision, preferred_element_type=jnp.float32,
    ).astype(jnp.result_type(x.dtype, kernel.dtype))
    if bias is not None:
        out = out + bias
    return out


def hex_conv_reference(x: np.ndarray, kernel: np.ndarray, bias: np.ndarray | None = None,
                       radius: int = 1) -> np.ndarray:
    """Slow numpy loop reference for testing ``hex_conv`` numerics.

    Walks every output cell and accumulates over explicit neighbor offsets.
    """
    taps = _taps(radius)
    x = np.asarray(x)
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    out = np.zeros((b, h, w, cout), dtype=np.result_type(x.dtype, kernel.dtype))
    for r in range(h):
        for c in range(w):
            for t, (dr, ce, co) in enumerate(taps):
                dc = co if (r % 2 == 1) else ce
                rr, cc = r + dr, c + dc
                if 0 <= rr < h and 0 <= cc < w:
                    out[:, r, c, :] += x[:, rr, cc, :] @ kernel[t]
    if bias is not None:
        out = out + bias
    if squeeze:
        out = out[0]
    return out
