"""Visium lattice geometry: the single canonical home for coordinate math.

The 10x Genomics Visium array is a hexagonally packed lattice of 78 rows x 64
spots/row (4,992 spots). Spaceranger reports spot locations in a "pseudo-hex"
scheme: ``array_col`` in [0, 127] and ``array_row`` in [0, 77], where
``array_col + array_row`` is always even -- horizontally adjacent spots differ
by 2 in ``array_col``, and odd rows are offset by one half-step to the right.

Three coordinate systems are used throughout:

* **pseudo-hex** ``(col, row)`` -- Spaceranger native (col in [0,127]).
* **odd-right (oddr)** ``(x, y)`` -- dense square-grid storage: ``x`` in
  [0, 63], ``y`` in [0, 77]; odd rows implicitly shifted one half-unit right.
  All grid tensors in this package are odd-right indexed: ``grid[y, x]``.
* **Cartesian** -- physical positions with unit neighbor distance
  (``x = col/2``, ``y = row * sqrt(3)/2``).

Reference parity: utils.py:64-85 and imgprocess.py:26-45 in adaly/gridnext
(three duplicate copies there; one canonical implementation here). Functions
accept scalars or numpy arrays and are trivially vectorized.
"""

from __future__ import annotations

import numpy as np

# Visium array dimensions (reference: imgprocess.py:21-22)
VISIUM_H_ST = 78  # number of rows
VISIUM_W_ST = 64  # spots per row
VISIUM_N_SPOTS = VISIUM_H_ST * VISIUM_W_ST  # 4992 = 39 * 128 (TPU-lane friendly)

SQRT3_OVER_2 = np.sqrt(3.0) / 2.0


# --------------------------------------------------------------------------
# Coordinate transforms (vectorized; int semantics match reference exactly)
# --------------------------------------------------------------------------

def pseudo_hex_to_oddr(col, row):
    """Pseudo-hex (Visium ``array_col``/``array_row``) -> odd-right (x, y).

    Odd rows have odd ``array_col``; the reference computes ``(col-1)/2`` for
    them and ``col/2`` for even rows (utils.py:64-70). For valid parities this
    equals ``col // 2`` elementwise, which is what we use (vectorized).
    """
    col = np.asarray(col)
    row = np.asarray(row)
    x = (col - (row % 2)) // 2
    if x.ndim == 0:
        return int(x), int(row)
    return x.astype(np.int64), row.astype(np.int64)


def oddr_to_pseudo_hex(col, row):
    """Odd-right (x, y) -> pseudo-hex (``array_col``, ``array_row``).

    Inverse of :func:`pseudo_hex_to_oddr` (reference utils.py:73-79).
    """
    col = np.asarray(col)
    row = np.asarray(row)
    x = 2 * col + (row % 2)
    if x.ndim == 0:
        return int(x), int(row)
    return x.astype(np.int64), row.astype(np.int64)


def pseudo_to_true_hex(col, row):
    """Pseudo-hex -> Cartesian with unit neighbor spacing (utils.py:82-85)."""
    col = np.asarray(col, dtype=np.float64)
    row = np.asarray(row, dtype=np.float64)
    x = col / 2.0
    y = row * SQRT3_OVER_2
    if x.ndim == 0:
        return float(x), float(y)
    return x, y


def oddr_to_cartesian(col, row):
    """Odd-right -> Cartesian (odd rows shifted +0.5; rows scaled sqrt(3)/2)."""
    col = np.asarray(col, dtype=np.float64)
    row = np.asarray(row, dtype=np.float64)
    x = col + 0.5 * (np.asarray(row) % 2)
    y = row * SQRT3_OVER_2
    if x.ndim == 0:
        return float(x), float(y)
    return x, y


# --------------------------------------------------------------------------
# Hex neighborhoods on the odd-right grid
# --------------------------------------------------------------------------
# In odd-right addressing ("odd-r" offset coordinates: odd rows shifted
# right), the 6 neighbors of (row r, col c) are:
#   even r: (r, c-1) (r, c+1) (r-1, c-1) (r-1, c) (r+1, c-1) (r+1, c)
#   odd  r: (r, c-1) (r, c+1) (r-1, c)   (r-1, c+1) (r+1, c) (r+1, c+1)
# We encode each stencil tap as (dr, dc_even, dc_odd): the column offset
# depends on the parity of the *source* row r.

# Canonical tap order for the 7-cell (radius-1) hex stencil, center first.
# Used by ops.hexconv; changing this order changes kernel weight layout.
HEX_TAPS_R1 = (
    # (dr, dc_even, dc_odd)
    (0, 0, 0),    # C  (center)
    (0, -1, -1),  # W
    (0, 1, 1),    # E
    (-1, -1, 0),  # NW
    (-1, 0, 1),   # NE
    (1, -1, 0),   # SW
    (1, 0, 1),    # SE
)


def _oddr_to_cube(col, row):
    """Odd-r offset -> cube coordinates (q, r, s) for hex-distance math."""
    q = col - (row - (row & 1)) // 2
    r = row
    return q, r, -q - r


def _cube_to_oddr(q, r):
    col = q + (r - (r & 1)) // 2
    return col, r


def hex_taps(radius: int):
    """All stencil taps within hex distance ``radius`` as (dr, dc_even, dc_odd).

    Returns a tuple ordered by (hex ring, then dr, then dc_even); radius 1
    reproduces a permutation of :data:`HEX_TAPS_R1` (which is kept explicit
    for stable weight layout). Cell count is 1 + 3*radius*(radius+1),
    matching the hexagonal kernels of hexagdly (see SURVEY.md section 2.2).
    """
    if radius == 1:
        return HEX_TAPS_R1
    taps = []
    # Enumerate cube-coordinate offsets within the hex ball, then express the
    # column offset for even and odd source rows separately.
    for dq in range(-radius, radius + 1):
        for dr in range(max(-radius, -dq - radius), min(radius, -dq + radius) + 1):
            dist = max(abs(dq), abs(dr), abs(-dq - dr))
            if dist > radius:
                continue
            # source at even row r0=0: col0 = q0 ; dest row = dr
            q0e, r0e, _ = _oddr_to_cube(0, 0)
            ce, _ = _cube_to_oddr(q0e + dq, r0e + dr)
            # source at odd row r0=1: recompute and subtract source col
            q0o, r0o, _ = _oddr_to_cube(0, 1)
            co, rw = _cube_to_oddr(q0o + dq, r0o + dr)
            taps.append((dist, dr, ce, co))
    taps.sort()
    return tuple((dr, ce, co) for _, dr, ce, co in taps)


def hex_neighbor_table(h_st: int = VISIUM_H_ST, w_st: int = VISIUM_W_ST):
    """Dense neighbor index table for the odd-right lattice.

    Returns ``(neighbors, valid)`` where ``neighbors`` is int32
    ``(h_st, w_st, 6)`` holding the flat index ``y * w_st + x`` of each of the
    6 hex neighbors and ``valid`` is a bool mask of the same shape (False
    where the neighbor falls outside the array). Useful for graph
    construction (data.graph_data) and as ground truth in hexconv tests.
    """
    rows = np.arange(h_st)[:, None, None]
    cols = np.arange(w_st)[None, :, None]
    taps = np.array(HEX_TAPS_R1[1:], dtype=np.int64)  # (6, 3), skip center
    dr = taps[:, 0][None, None, :]
    dc = np.where((rows % 2) == 0, taps[:, 1][None, None, :], taps[:, 2][None, None, :])
    nr = rows + dr
    nc = cols + dc
    valid = (nr >= 0) & (nr < h_st) & (nc >= 0) & (nc < w_st)
    neighbors = np.where(valid, nr * w_st + nc, -1).astype(np.int32)
    return neighbors, valid


def pairwise_distances(points: np.ndarray) -> np.ndarray:
    """Condensed upper-triangle pairwise Euclidean distances.

    Vectorized equivalent of the reference's O(n^2) python loop
    (imgprocess.py:72-87); order matches (i<j row-major).
    """
    points = np.asarray(points, dtype=np.float64)
    n = len(points)
    iu, ju = np.triu_indices(n, k=1)
    diff = points[iu] - points[ju]
    return np.sqrt((diff * diff).sum(axis=-1))
