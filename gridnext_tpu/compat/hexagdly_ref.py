"""Pure-numpy reference for hexagdly.Conv2d(kernel_size=1) semantics.

The reference's correction networks are stacks of ``hexagdly.Conv2d``
(gridnet_models.py:130-147). hexagdly is an external package (not installed
here); this module pins down its numerics from first principles so that

  * trained reference g-correctors can be converted
    (:func:`gridnext_tpu.compat.torch_convert.hex_kernel_from_hexagdly`), and
  * ``ops.hexconv`` gains an oracle that does NOT derive from
    ``geometry.HEX_TAPS_R1`` (the in-package tests' brute-force reference
    shares that table, so they only prove self-consistency).

Addressing. hexagdly stores hex data on a square grid with odd *columns*
shifted half a cell down (odd-q). That is evidenced inside the reference
repo itself: hexagdly_tools.py:68 draws cell (y, x) at center
``(x*sqrt(3)/2, -(y + (x%2)*0.5))``. Consequently the 6 neighbors of (y, x):

  same column:  (y-1, x) N and (y+1, x) S
  columns x+-1: even x -> rows y-1 (upper) and y (lower)
                odd  x -> rows y   (upper) and y+1 (lower)

Weight layout. A size-1 hexagonal kernel (7 cells) decomposes into
rectangular sub-kernels, hexagdly's core trick (Steppa & Holch, SoftwareX 9
(2019) 193-198): ``kernel0`` of shape (C_out, C_in, 3, 1) covering the
central column [N, C, S] top-to-bottom, and ``kernel1`` of shape
(C_out, C_in, 2, 2) covering the two adjacent columns, rows top-to-bottom
[upper, lower] and columns left-to-right [west, east]. Both are applied as
cross-correlations (torch ``F.conv2d``) with zero padding, so sub-kernel row
0 aligns with the topmost cell of its receptive field -- that fixes the
[upper, lower] / [west, east] orientation used here.

Visium odd-right grids enter this addressing via the reference's
rot90+flip pair (gridnet_models.py:178-186), which composes to a plain
spatial transpose (verified in tests/test_hexagdly_equiv.py): odd-r row y
becomes odd-q column y.
"""

from __future__ import annotations

import numpy as np


def hexagdly_conv2d_k1(x: np.ndarray, kernel0: np.ndarray, kernel1: np.ndarray,
                       bias: np.ndarray | None = None) -> np.ndarray:
    """hexagdly.Conv2d(kernel_size=1, stride=1) forward, looped numpy.

    Args:
      x: (B, C_in, H, W) input in odd-q addressing (odd columns shifted down).
      kernel0: (C_out, C_in, 3, 1) central-column sub-kernel [N, C, S].
      kernel1: (C_out, C_in, 2, 2) adjacent-columns sub-kernel
        [[upper-west, upper-east], [lower-west, lower-east]].
      bias: optional (C_out,).

    Returns:
      (B, C_out, H, W); out-of-grid neighbors contribute zero (zero padding).
    """
    x = np.asarray(x)
    b, ci, h, w = x.shape
    co = kernel0.shape[0]
    out = np.zeros((b, co, h, w), dtype=np.result_type(x, kernel0))

    def acc(dst_y, dst_x, src_y, src_x, wmat):
        if 0 <= src_y < h and 0 <= src_x < w:
            # (co, ci) @ (b, ci) -> (b, co)
            out[:, :, dst_y, dst_x] += x[:, :, src_y, src_x] @ wmat.T

    for y in range(h):
        for c in range(w):
            acc(y, c, y - 1, c, kernel0[:, :, 0, 0])  # N
            acc(y, c, y, c, kernel0[:, :, 1, 0])      # center
            acc(y, c, y + 1, c, kernel0[:, :, 2, 0])  # S
            upper = y - 1 if c % 2 == 0 else y
            acc(y, c, upper, c - 1, kernel1[:, :, 0, 0])      # upper-west
            acc(y, c, upper, c + 1, kernel1[:, :, 0, 1])      # upper-east
            acc(y, c, upper + 1, c - 1, kernel1[:, :, 1, 0])  # lower-west
            acc(y, c, upper + 1, c + 1, kernel1[:, :, 1, 1])  # lower-east
    if bias is not None:
        out = out + np.asarray(bias).reshape(1, co, 1, 1)
    return out


def hexagdly_conv2d_k2(x: np.ndarray, kernel0: np.ndarray, kernel1: np.ndarray,
                       kernel2: np.ndarray,
                       bias: np.ndarray | None = None) -> np.ndarray:
    """hexagdly.Conv2d(kernel_size=2, stride=1) forward, looped numpy.

    Size-2 hexagonal kernel = 19-cell hex disk, decomposed per the hexagdly
    sub-kernel scheme (column distance i gets a (2k+1-i)-row sub-kernel):

      kernel0: (C_out, C_in, 5, 1) central column, rows [-2..+2].
      kernel1: (C_out, C_in, 4, 2) columns +-1 [west, east]; in odd-q the
        topmost cell sits at row y-2 for even center columns and y-1 for odd
        (the half-cell shift, same parity rule as the k=1 'upper' row).
      kernel2: (C_out, C_in, 3, 2) columns +-2 [west, east]; same parity as
        the center column, so rows [-1..+1] regardless of parity.

    Cell rows/columns verified against cube-coordinate hex distance <= 2.
    """
    x = np.asarray(x)
    b, ci, h, w = x.shape
    co = kernel0.shape[0]
    out = np.zeros((b, co, h, w), dtype=np.result_type(x, kernel0))

    def acc(dst_y, dst_x, src_y, src_x, wmat):
        if 0 <= src_y < h and 0 <= src_x < w:
            out[:, :, dst_y, dst_x] += x[:, :, src_y, src_x] @ wmat.T

    for y in range(h):
        for c in range(w):
            for i in range(5):
                acc(y, c, y + i - 2, c, kernel0[:, :, i, 0])
            top = y - 2 if c % 2 == 0 else y - 1
            for i in range(4):
                acc(y, c, top + i, c - 1, kernel1[:, :, i, 0])
                acc(y, c, top + i, c + 1, kernel1[:, :, i, 1])
            for i in range(3):
                acc(y, c, y + i - 1, c - 2, kernel2[:, :, i, 0])
                acc(y, c, y + i - 1, c + 2, kernel2[:, :, i, 1])
    if bias is not None:
        out = out + np.asarray(bias).reshape(1, co, 1, 1)
    return out
