import numpy as np
import pytest

from gridnext_tpu import geometry as G


def _all_valid_pseudo_hex():
    """All 4992 valid Visium pseudo-hex coordinates."""
    rows = np.repeat(np.arange(G.VISIUM_H_ST), G.VISIUM_W_ST)
    cols_oddr = np.tile(np.arange(G.VISIUM_W_ST), G.VISIUM_H_ST)
    col, row = G.oddr_to_pseudo_hex(cols_oddr, rows)
    return col, row


def test_roundtrip_pseudo_hex_oddr():
    col, row = _all_valid_pseudo_hex()
    x, y = G.pseudo_hex_to_oddr(col, row)
    col2, row2 = G.oddr_to_pseudo_hex(x, y)
    np.testing.assert_array_equal(col, col2)
    np.testing.assert_array_equal(row, row2)
    assert x.min() == 0 and x.max() == G.VISIUM_W_ST - 1
    assert y.min() == 0 and y.max() == G.VISIUM_H_ST - 1


def test_scalar_matches_reference_semantics():
    # Reference behavior (utils.py:64-79): even row -> col/2, odd -> (col-1)/2
    assert G.pseudo_hex_to_oddr(6, 0) == (3, 0)
    assert G.pseudo_hex_to_oddr(7, 1) == (3, 1)
    assert G.oddr_to_pseudo_hex(3, 0) == (6, 0)
    assert G.oddr_to_pseudo_hex(3, 1) == (7, 1)


def test_pseudo_hex_parity_covers_grid():
    col, row = _all_valid_pseudo_hex()
    # array_col + array_row is always even on a real Visium array
    assert np.all((col + row) % 2 == 0)
    assert col.max() == 2 * (G.VISIUM_W_ST - 1) + 1  # 127
    assert len(np.unique(col * 1000 + row)) == G.VISIUM_N_SPOTS


def test_true_hex_unit_distance():
    # Physical neighbor distance must be 1.0 for all 6 hex directions.
    x0, y0 = G.pseudo_to_true_hex(10, 10)
    for dcol, drow in [(2, 0), (-2, 0), (1, 1), (-1, 1), (1, -1), (-1, -1)]:
        x1, y1 = G.pseudo_to_true_hex(10 + dcol, 10 + drow)
        d = np.hypot(x1 - x0, y1 - y0)
        np.testing.assert_allclose(d, 1.0, rtol=1e-12)


def test_oddr_cartesian_unit_distance():
    nbrs, valid = G.hex_neighbor_table(8, 8)
    xs, ys = G.oddr_to_cartesian(np.arange(8)[None, :].repeat(8, 0),
                                 np.arange(8)[:, None].repeat(8, 1))
    pos = np.stack([xs.ravel(), ys.ravel()], -1)
    for r in range(8):
        for c in range(8):
            for k in range(6):
                if valid[r, c, k]:
                    d = np.linalg.norm(pos[nbrs[r, c, k]] - pos[r * 8 + c])
                    np.testing.assert_allclose(d, 1.0, rtol=1e-12)


def test_hex_neighbor_table_symmetry():
    nbrs, valid = G.hex_neighbor_table()
    n = G.VISIUM_N_SPOTS
    adj = np.zeros((n, n), dtype=bool)
    flat_idx = np.arange(n).reshape(G.VISIUM_H_ST, G.VISIUM_W_ST)
    for k in range(6):
        src = flat_idx[valid[..., k]]
        dst = nbrs[..., k][valid[..., k]]
        adj[src, dst] = True
    # symmetric, no self edges, max 6 neighbors (graph_datasets.py:162-179 invariants)
    assert np.array_equal(adj, adj.T)
    assert not adj.diagonal().any()
    degs = adj.sum(1)
    assert degs.max() == 6
    # interior spots have exactly 6 neighbors
    interior = np.zeros((G.VISIUM_H_ST, G.VISIUM_W_ST), dtype=bool)
    interior[1:-1, 1:-1] = True
    assert np.all(degs[interior.ravel()] == 6)


def test_hex_taps_radius_counts():
    for r in [1, 2, 3]:
        taps = G.hex_taps(r)
        assert len(taps) == 1 + 3 * r * (r + 1)
    # radius-1 from the generic path covers the same cells as HEX_TAPS_R1
    generic = set(G.hex_taps(2))
    for tap in G.HEX_TAPS_R1:
        assert tap in generic


def test_hex_taps_r2_consistent_with_composition():
    # Every radius-2 tap must be reachable by composing two radius-1 steps.
    r1 = G.HEX_TAPS_R1
    reach_even = set()
    for dr1, ce1, co1 in r1:
        # first step from an even row (row 0)
        mid_r, mid_c = dr1, ce1
        for dr2, ce2, co2 in r1:
            dc2 = ce2 if mid_r % 2 == 0 else co2
            reach_even.add((mid_r + dr2, mid_c + dc2))
    taps2 = {(dr, ce) for dr, ce, _ in G.hex_taps(2)}
    assert taps2 == reach_even


def test_pairwise_distances_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(10, 2))
    ref = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            ref.append(np.sqrt(((pts[i] - pts[j]) ** 2).sum()))
    np.testing.assert_allclose(G.pairwise_distances(pts), np.array(ref), rtol=1e-12)
