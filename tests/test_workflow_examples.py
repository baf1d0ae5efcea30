"""Regression floors for the research-workflow artifacts (BASELINE configs 4-5).

Each example runs end to end on simulated data at reduced settings; the
floors are far below the measured values (bin 1.0/1.0, markers 1.0/0.97,
concat ~parity with pca) so they catch breakage, not noise.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def test_bin_classifier_floor():
    import bin_classifier

    m = bin_classifier.main(["--epochs", "3", "--arrays", "3"])
    assert m["acc_f"] > 0.8 and m["acc_g"] > 0.8


def test_marker_genes_floor():
    import register_marker_genes

    m = register_marker_genes.main(["--epochs", "3", "--arrays", "3"])
    assert m["n_markers"] == 12
    assert m["acc_f"] > 0.7 and m["acc_g"] > 0.7


@pytest.mark.slow
def test_register_concat_floor():
    import register_concat

    m = register_concat.main(["--epochs", "2", "--arrays", "3"])
    # fusion must at least be competitive with its better unimodal input
    assert m["acc_concat"] > 0.6


def test_scbert_pretrain_floor():
    import scbert_pretrain

    losses = scbert_pretrain.main(["--steps", "8", "--vocab", "512",
                                   "--sim-genes", "64"])
    assert losses[-1] < losses[0] * 0.7  # masked-bin CE must drop materially
