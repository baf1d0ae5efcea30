"""Golden-artifact tests against the reference's committed prediction maps.

The reference ships per-array (7, 78, 64) logits/softmax/true maps and
flattened foreground arrays for the Maynard DLPFC benchmark
(outputs/maynard_*; SURVEY.md section 4.3). These pin down our conventions:
softmax axis, odd-right map orientation, and the exact foreground
flattening order of evaluate.flatten_foreground.
"""

import glob
import os

import numpy as np
import pytest

from gridnext_tpu.evaluate import flatten_foreground

GOLDEN = "/root/reference/outputs"

pytestmark = pytest.mark.skipif(not os.path.isdir(GOLDEN),
                                reason="reference outputs not mounted")


def _arrays(dirname):
    maps = sorted(glob.glob(os.path.join(GOLDEN, dirname, "*_smax_oddr.npy")))
    return [m.replace("_smax_oddr.npy", "") for m in maps]


def test_softmax_consistency_of_golden_maps():
    import jax.nn

    checked = 0
    for stem in _arrays("maynard_imgpred_maps")[:4]:
        logits = np.load(stem + "_logits_oddr.npy")   # (7, 78, 64)
        smax = np.load(stem + "_smax_oddr.npy")
        true = np.load(stem + "_true_oddr.npy")       # (78, 64)
        fg = true > 0
        ours = np.asarray(jax.nn.softmax(logits, axis=0))
        np.testing.assert_allclose(ours[:, fg], smax[:, fg], atol=2e-6)
        checked += 1
    assert checked > 0


def test_flatten_foreground_reproduces_golden_fgd_labels():
    """Our flattening contract must reproduce the committed fgd TRUE-label
    array exactly from the per-array true maps.

    (The fold-5 arrays are 151675+151676 -- verified by exhaustive pair
    search; the fgd *softmax* comes from a different CV model than the
    committed full-run maps, so only the labels are shared ground truth.)
    """
    fgd_true = np.load(os.path.join(GOLDEN, "maynard_imgpred_fgd",
                                    "maynard_true_6fold_5_oddr.npy"))
    fgd_smax = np.load(os.path.join(GOLDEN, "maynard_imgpred_fgd",
                                    "maynard_smax_g_6fold_5_oddr.npy"))

    parts = []
    for arr in ("151675", "151676"):
        smax = np.load(os.path.join(GOLDEN, "maynard_imgpred_maps",
                                    f"maynard_{arr}_smax_oddr.npy"))
        true = np.load(os.path.join(GOLDEN, "maynard_imgpred_maps",
                                    f"maynard_{arr}_true_oddr.npy"))
        s_fg, t_fg = flatten_foreground(smax, true)
        assert s_fg.shape[1] == 7
        parts.append(t_fg)
    t_cat = np.concatenate(parts)

    # exact agreement: spot order, foreground mask, and the label -1 shift
    np.testing.assert_array_equal(t_cat, fgd_true)
    # and the golden fgd softmax rows are proper distributions
    np.testing.assert_allclose(fgd_smax.sum(1), 1.0, atol=1e-5)


def test_golden_map_conventions():
    stem = _arrays("maynard_imgpred_maps")[0]
    true = np.load(stem + "_true_oddr.npy")
    assert true.shape == (78, 64)
    assert true.min() == 0 and 1 <= true.max() <= 7
    # background exists and foreground is a plausible tissue fraction
    fg_frac = (true > 0).mean()
    assert 0.3 < fg_frac < 1.0
