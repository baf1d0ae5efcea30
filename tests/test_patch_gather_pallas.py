"""Pallas patch-gather kernel vs lax.dynamic_slice ground truth.

Runs interpreted on the CPU test mesh (same code path as TPU up to Mosaic
lowering; the TPU-measured numbers live in docs/roadmap.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridnext_tpu.ops.patch_gather_pallas import gather_patches, pack_wsi

WIN = 16


def _ref_crop(img, y0, x0, win=WIN):
    h, w = img.shape[:2]
    out = []
    for yy, xx in zip(np.clip(y0, 0, h - win), np.clip(x0, 0, w - win)):
        out.append(img[yy:yy + win, xx:xx + win])
    return np.stack(out)


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (150, 300, 3), dtype=np.uint8)


def test_pack_wsi_layout(img):
    packed = np.asarray(pack_wsi(jnp.asarray(img)))
    assert packed.shape == (152, 384) and packed.dtype == np.int32
    # pixel (y, x) lives in lane (y, x): little-endian RGBX int32
    y, x = 7, 131
    want = int(img[y, x, 0]) | int(img[y, x, 1]) << 8 | int(img[y, x, 2]) << 16
    assert packed[y, x] == want
    assert (packed[150:] == 0).all() and (packed[:, 300:] == 0).all()


def test_gather_matches_dynamic_slice(img):
    rng = np.random.default_rng(1)
    h, w = img.shape[:2]
    y0 = rng.integers(0, h - WIN + 1, 20).astype(np.int32)
    x0 = rng.integers(0, w - WIN + 1, 20).astype(np.int32)
    # in-tile offsets in every class, incl. clamped edges + pad region
    y0[:4] = [0, h - WIN, h - WIN - 3, 5]
    x0[:4] = [w - WIN, 0, w - WIN - 5, 129]

    packed = pack_wsi(jnp.asarray(img))
    got = np.asarray(gather_patches(packed, jnp.asarray(y0), jnp.asarray(x0),
                                    WIN, orig_hw=(h, w), depth=4))
    np.testing.assert_array_equal(got, _ref_crop(img, y0, x0))


def test_gather_clamps_like_dynamic_slice(img):
    """Out-of-range corners clamp to the ORIGINAL image bounds -- pad
    rows/cols never leak into a patch."""
    h, w = img.shape[:2]
    y0 = np.asarray([-10, h + 50, h - WIN + 1], np.int32)
    x0 = np.asarray([w + 9, -3, w - WIN + 2], np.int32)
    packed = pack_wsi(jnp.asarray(img))
    got = np.asarray(gather_patches(packed, jnp.asarray(y0), jnp.asarray(x0),
                                    WIN, orig_hw=(h, w), depth=2))
    np.testing.assert_array_equal(got, _ref_crop(img, y0, x0))


def test_gather_multi_slide(img):
    """slide[i] routes each spot to its own packed image."""
    img2 = img[::-1].copy()
    rng = np.random.default_rng(2)
    h, w = img.shape[:2]
    y0 = rng.integers(0, h - WIN + 1, 10).astype(np.int32)
    x0 = rng.integers(0, w - WIN + 1, 10).astype(np.int32)
    slide = (np.arange(10) % 2).astype(np.int32)

    packed = jnp.stack([pack_wsi(jnp.asarray(img)),
                        pack_wsi(jnp.asarray(img2))])
    got = np.asarray(gather_patches(packed, jnp.asarray(y0), jnp.asarray(x0),
                                    WIN, jnp.asarray(slide),
                                    orig_hw=(h, w), depth=4))
    for k in range(10):
        src = img if slide[k] == 0 else img2
        np.testing.assert_array_equal(got[k], _ref_crop(src, y0[k:k+1],
                                                        x0[k:k+1])[0])


def test_gather_fewer_spots_than_depth(img):
    h, w = img.shape[:2]
    packed = pack_wsi(jnp.asarray(img))
    y0 = np.asarray([3, 40], np.int32)
    x0 = np.asarray([100, 7], np.int32)
    got = np.asarray(gather_patches(packed, jnp.asarray(y0), jnp.asarray(x0),
                                    WIN, orig_hw=(h, w), depth=8))
    np.testing.assert_array_equal(got, _ref_crop(img, y0, x0))


def test_gather_zero_spots(img):
    """An all-background slide (no in-tissue spots) yields an empty patch
    batch, matching the XLA extractor, instead of a kernel trace error."""
    h, w = img.shape[:2]
    packed = pack_wsi(jnp.asarray(img))
    got = np.asarray(gather_patches(packed, jnp.zeros((0,), jnp.int32),
                                    jnp.zeros((0,), jnp.int32),
                                    WIN, orig_hw=(h, w)))
    assert got.shape == (0, WIN, WIN, 3) and got.dtype == np.uint8


def test_gather_clamps_slide_index(img):
    """A slide index past the batch dim clamps (like the corners) instead of
    DMAing out of bounds."""
    img2 = img[::-1].copy()
    h, w = img.shape[:2]
    y0 = np.asarray([4, 8], np.int32)
    x0 = np.asarray([16, 32], np.int32)
    packed = jnp.stack([pack_wsi(jnp.asarray(img)),
                        pack_wsi(jnp.asarray(img2))])
    got = np.asarray(gather_patches(
        packed, jnp.asarray(y0), jnp.asarray(x0), WIN,
        jnp.asarray([5, -3], np.int32), orig_hw=(h, w), depth=2))
    np.testing.assert_array_equal(got[0], _ref_crop(img2, y0[:1], x0[:1])[0])
    np.testing.assert_array_equal(got[1], _ref_crop(img, y0[1:], x0[1:])[0])


def test_gather_rejects_window_larger_than_slide(img):
    """orig_hw smaller than the window must raise, not clamp corners
    negative (jnp.clip returns the max when max < min) and DMA out of
    bounds."""
    packed = pack_wsi(jnp.asarray(img))
    with pytest.raises(ValueError, match="smaller than"):
        gather_patches(packed, jnp.zeros((1,), jnp.int32),
                       jnp.zeros((1,), jnp.int32), WIN,
                       orig_hw=(WIN - 2, 300), depth=2)
