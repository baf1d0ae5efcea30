"""On-device training augmentation (pipeline.augment_patches + make_steps).

The TPU-native replacement for the reference tutorials' host-side
torchvision ``img_transforms`` augmentation: dihedral flips/rotations (and
optional photometric jitter) drawn per patch INSIDE the jitted train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gridnext_tpu.pipeline import augment_patches, make_train_augment


def _patches(shape=(16, 8, 8, 3), seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_identity_when_disabled():
    x = _patches()
    out = augment_patches(jax.random.key(0), x, flips=False, rotations=False)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_dihedral_preserves_pixels_and_shape():
    x = _patches()
    out = np.asarray(augment_patches(jax.random.key(1), x))
    assert out.shape == x.shape and out.dtype == x.dtype
    # flips/rotations permute pixels within a patch, never change values
    for i in range(len(x)):
        np.testing.assert_allclose(np.sort(out[i].ravel()),
                                   np.sort(x[i].ravel()))
    # ...and with 16 patches, at least one actually transformed
    assert any(not np.array_equal(out[i], x[i]) for i in range(len(x)))


def test_grid_form_augments_per_patch():
    x = _patches(shape=(2, 4, 4, 6, 6, 3))
    out = np.asarray(augment_patches(jax.random.key(2), x))
    assert out.shape == x.shape
    flat_in = x.reshape(-1, 6, 6, 3)
    flat_out = out.reshape(-1, 6, 6, 3)
    changed = [not np.array_equal(a, b) for a, b in zip(flat_in, flat_out)]
    # independent per-patch draws: some transformed, some identity
    # (P(all 32 identical) = (1/8)^32; P(none identity) = (7/8)^32 ~ 1.4%)
    assert any(changed) and not all(changed)


def test_rotations_only_is_the_rotation_subgroup():
    """rotations=True, flips=False must draw from {0, 90, 180, 270} only --
    never a reflection. A patch with an L-shaped mark distinguishes all 8
    dihedral images, so check every augmented patch equals some np.rot90."""
    x = np.zeros((64, 5, 5, 3), np.float32)
    x[:, 0, :, :] = 1.0   # top row
    x[:, :, 0, :] = 2.0   # left col (corner overwritten -> chiral L)
    out = np.asarray(augment_patches(jax.random.key(8), x, flips=False))
    ks = set()
    for i in range(len(x)):
        matches = [k for k in range(4)
                   if np.array_equal(out[i], np.rot90(x[i], k, axes=(0, 1)))]
        assert matches, f"patch {i} is not a pure rotation"
        ks.add(matches[0])
    assert ks == {0, 1, 2, 3}  # 64 draws hit every rotation w.h.p.


def test_deterministic_in_key():
    x = _patches()
    a = np.asarray(augment_patches(jax.random.key(3), x))
    b = np.asarray(augment_patches(jax.random.key(3), x))
    c = np.asarray(augment_patches(jax.random.key(4), x))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_photometric_jitter_is_affine_not_permutation():
    x = _patches()
    out = np.asarray(augment_patches(jax.random.key(5), x, flips=False,
                                     rotations=False, brightness=0.5,
                                     contrast=0.3))
    assert out.shape == x.shape
    assert not np.array_equal(out, x)
    # contrast preserves each patch's mean up to the brightness shift; with
    # contrast only, means are exactly preserved
    c_only = np.asarray(augment_patches(jax.random.key(6), x, flips=False,
                                        rotations=False, contrast=0.4))
    np.testing.assert_allclose(c_only.mean(axis=(1, 2, 3)),
                               x.mean(axis=(1, 2, 3)), rtol=1e-5, atol=1e-6)


def test_rejects_non_square():
    with pytest.raises(ValueError, match="square"):
        augment_patches(jax.random.key(0), np.zeros((4, 6, 8, 3), np.float32))


def test_mm_tuple_augments_image_only():
    aug = make_train_augment()
    img = _patches(shape=(4, 8, 8, 3))
    counts = np.random.default_rng(1).normal(size=(4, 20)).astype(np.float32)
    out_img, out_counts = aug(jax.random.key(7), (img, counts))
    np.testing.assert_array_equal(np.asarray(out_counts), counts)
    assert not np.array_equal(np.asarray(out_img), img)


def test_make_steps_augment_trains_and_leaves_eval_clean():
    """make_steps(augment=...): the train step consumes augmented inputs
    (different augmentation key per step via state.step), eval never
    augments, and the augmented run stays a valid training run."""
    from gridnext_tpu.models import TpuPatchClassifier
    from gridnext_tpu.train.loops import create_train_state, make_steps

    x = _patches(shape=(16, 16, 16, 3))
    y = np.random.default_rng(2).integers(0, 4, size=(16,)).astype(np.int64)
    f = TpuPatchClassifier(n_classes=4, stages=((8, 1),), stem_patch=8)
    tx = optax.sgd(1e-2)
    state = create_train_state(f, jax.random.key(0), jnp.asarray(x[:1]), tx)

    plain_train, plain_eval = make_steps(f, tx, "spot")
    aug_train, aug_eval = make_steps(f, tx, "spot", augment=make_train_augment())

    s_plain, m_plain = plain_train(state, jnp.asarray(x), jnp.asarray(y))
    s_aug, m_aug = aug_train(state, jnp.asarray(x), jnp.asarray(y))
    # augmentation changed what the step saw -> different grads/params
    assert not all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(s_plain.params),
                        jax.tree_util.tree_leaves(s_aug.params)))
    assert np.isfinite(float(m_aug["loss"]))
    # eval is augmentation-free: identical metrics through either factory
    e1 = plain_eval(state, jnp.asarray(x), jnp.asarray(y))
    e2 = aug_eval(state, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(e1["loss"]), float(e2["loss"]),
                               rtol=0, atol=0)
    # step-keyed stream: the SAME state re-runs to the SAME augmented result
    s_aug2, _ = aug_train(state, jnp.asarray(x), jnp.asarray(y))
    for a, b in zip(jax.tree_util.tree_leaves(s_aug.params),
                    jax.tree_util.tree_leaves(s_aug2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dihedral_transform_enumerates_the_group():
    from gridnext_tpu.pipeline import dihedral_transform

    x = _patches(shape=(1, 5, 5, 3))
    variants = [np.asarray(dihedral_transform(x, k)) for k in range(8)]
    for i in range(8):
        for j in range(i + 1, 8):
            assert not np.array_equal(variants[i], variants[j])
    np.testing.assert_array_equal(variants[0], x)  # k=0 is identity
    with pytest.raises(ValueError, match="0..7"):
        dihedral_transform(x, 8)


def _image_grid_case():
    from gridnext_tpu.models import GridNetHex, TpuPatchClassifier

    rng = np.random.default_rng(3)
    X = rng.normal(size=(2, 4, 4, 8, 8, 3)).astype(np.float32)
    Y = rng.integers(0, 4, size=(2, 4, 4))
    f = TpuPatchClassifier(n_classes=3, stages=((8, 1),), stem_patch=4)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    variables = g.init(jax.random.key(0), jnp.asarray(X[:1]))
    return g, variables, X, Y


def test_tta_is_the_dihedral_softmax_mean():
    from gridnext_tpu.evaluate import all_fgd_predictions
    from gridnext_tpu.pipeline import dihedral_transform

    g, variables, X, Y = _image_grid_case()
    want = np.mean([
        np.asarray(jax.nn.softmax(
            g.apply(variables, dihedral_transform(jnp.asarray(X), k),
                    train=False), axis=-1))
        for k in range(8)], axis=0)
    fg = Y.reshape(-1) > 0
    want_fg = want.reshape(-1, want.shape[-1])[fg]

    t, p, smax = all_fgd_predictions((X, Y), g, variables, batch_size=2,
                                     tta=True)
    np.testing.assert_allclose(smax, want_fg, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(p, np.argmax(want_fg, axis=1))


def test_tta_predictions_are_orientation_invariant():
    """Group closure: TTA over all 8 orientations gives the identical
    softmax whether the patches arrive rotated/flipped or not."""
    from gridnext_tpu.evaluate import all_fgd_predictions
    from gridnext_tpu.pipeline import dihedral_transform

    g, variables, X, Y = _image_grid_case()
    _, _, base = all_fgd_predictions((X, Y), g, variables, tta=True)
    for k in (1, 5):
        Xk = np.asarray(dihedral_transform(jnp.asarray(X), k))
        _, _, rot = all_fgd_predictions((Xk, Y), g, variables, tta=True)
        np.testing.assert_allclose(rot, base, rtol=1e-5, atol=1e-6)


def test_tta_rejects_count_inputs():
    from gridnext_tpu.evaluate import all_fgd_predictions
    from gridnext_tpu.models import CountMLP, GridNetHex

    rng = np.random.default_rng(0)
    X = rng.normal(size=(2, 8, 6, 10)).astype(np.float32)
    Y = rng.integers(0, 4, size=(2, 8, 6))
    g = GridNetHex(patch_classifier=CountMLP(n_classes=3), n_classes=3)
    variables = g.init(jax.random.key(0), jnp.asarray(X[:1]))
    with pytest.raises(ValueError, match="tta needs square image-patch"):
        all_fgd_predictions((X, Y), g, variables, tta=True)
