"""The real Visium v1 slide template: barcode <-> lattice whitelist.

10x Genomics Visium v1 slides carry a fixed 78x64 pseudo-hex lattice of
4,992 spots, each with a fixed 16-mer oligo barcode -- the correspondence is
arbitrary (assigned at slide manufacture) and cannot be derived, so it ships
as a vendored data asset (``assets/visium_v1_template/``), exactly as the
reference packages it (``gridnext/visium_templates/tissue_positions.csv``,
consumed at imgprocess.py:309-317 to fabricate Loupe-compatible
pseudo-Visium arrays from plain images). Pseudo-Visium files built from this
template carry REAL barcodes, so their Loupe CSV exports re-import against
an actual Visium v1 barcode whitelist.

The template's columns are the Spaceranger v2 contract: ``barcode,
in_tissue, array_row, array_col, pxl_row_in_fullres, pxl_col_in_fullres``;
``in_tissue`` holds the template's pre-baked capture-area pattern (4,525 of
4,992 spots) which the reference propagates verbatim into simulated arrays.
"""

from __future__ import annotations

import gzip
import io
import json
from importlib import resources

_TEMPLATE_PKG = "gridnext_tpu.assets"
_TEMPLATE_DIR = "visium_v1_template"


def _asset_bytes(name: str) -> bytes:
    ref = resources.files(_TEMPLATE_PKG) / _TEMPLATE_DIR / name
    return ref.read_bytes()


def visium_v1_template():
    """The packaged Visium v1 slide template as a positions DataFrame.

    Returns a copy (callers mutate pixel columns when placing the lattice
    over an image): 4,992 rows, one per slide spot, with the real barcode
    whitelist and the full 78x64 pseudo-hex ``(array_row, array_col)``
    lattice. Parity: ``gridnext/visium_templates/tissue_positions.csv``
    (pinned row-for-row against the reference asset in
    tests/test_visium_template.py).
    """
    import pandas as pd

    raw = gzip.decompress(_asset_bytes("tissue_positions.csv.gz"))
    return pd.read_csv(io.BytesIO(raw))


def visium_v1_scalefactors() -> dict:
    """The packaged template ``scalefactors_json.json`` as a dict
    (``gridnext/visium_templates/scalefactors_json.json`` parity)."""
    return json.loads(_asset_bytes("scalefactors_json.json"))


def visium_v1_barcode_grid():
    """(78, 64) object array of barcodes in odd-right grid indexing.

    ``grid[oddr_y, oddr_x]`` is the real slide barcode of that lattice
    cell -- the inverse lookup used to stamp real barcodes onto generated
    odd-right grids.
    """
    import numpy as np

    from gridnext_tpu import geometry

    df = visium_v1_template()
    ox, oy = geometry.pseudo_hex_to_oddr(df["array_col"].to_numpy(),
                                         df["array_row"].to_numpy())
    grid = np.empty((geometry.VISIUM_H_ST, geometry.VISIUM_W_ST),
                    dtype=object)
    grid[oy, ox] = df["barcode"].to_numpy()
    return grid
