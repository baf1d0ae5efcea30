import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridnext_tpu import geometry as G
from gridnext_tpu.ops import hex_conv, hex_conv_reference
from gridnext_tpu.ops.hexconv import num_taps


@pytest.mark.parametrize("radius", [1, 2])
def test_hexconv_matches_bruteforce(radius):
    rng = np.random.default_rng(radius)
    x = rng.normal(size=(2, 12, 10, 3)).astype(np.float32)
    k = rng.normal(size=(num_taps(radius), 3, 5)).astype(np.float32)
    b = rng.normal(size=(5,)).astype(np.float32)

    got = np.asarray(hex_conv(jnp.asarray(x), jnp.asarray(k), jnp.asarray(b), radius=radius))
    want = hex_conv_reference(x, k, b, radius=radius)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_hexconv_center_only_is_pointwise():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    k = np.zeros((7, 4, 2), dtype=np.float32)
    k[0] = rng.normal(size=(4, 2))  # only the center tap
    got = np.asarray(hex_conv(jnp.asarray(x), jnp.asarray(k)))
    np.testing.assert_allclose(got, x @ k[0], rtol=1e-5, atol=1e-6)


def test_hexconv_neighbor_sum_matches_table():
    # Uniform weights over the 6 neighbor taps == sum over geometry's
    # neighbor table (independent adjacency derivation).
    rng = np.random.default_rng(1)
    h, w = G.VISIUM_H_ST, G.VISIUM_W_ST
    x = rng.normal(size=(h, w, 1)).astype(np.float32)
    k = np.ones((7, 1, 1), dtype=np.float32)
    k[0] = 0.0  # exclude center
    got = np.asarray(hex_conv(jnp.asarray(x), jnp.asarray(k)))[..., 0]

    nbrs, valid = G.hex_neighbor_table(h, w)
    flat = x[..., 0].ravel()
    want = np.where(valid, flat[nbrs], 0.0).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_hexconv_two_r1_equals_reference_r2_support():
    # Composing two radius-1 convs reaches exactly the radius-2 support:
    # impulse response support must match hex distance <= 2.
    impulse = np.zeros((1, 15, 15, 1), dtype=np.float32)
    impulse[0, 7, 7, 0] = 1.0
    k = np.ones((7, 1, 1), dtype=np.float32)
    once = hex_conv(jnp.asarray(impulse), jnp.asarray(k))
    twice = np.asarray(hex_conv(once, jnp.asarray(k)))[0, ..., 0]

    k2 = np.ones((num_taps(2), 1, 1), dtype=np.float32)
    support2 = hex_conv_reference(impulse, k2, radius=2)[0, ..., 0] > 0
    np.testing.assert_array_equal(twice > 0, support2)


def test_hexconv_grad_flows():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 2)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(7, 2, 3)).astype(np.float32))

    def loss(kernel):
        return jnp.sum(hex_conv(x, kernel) ** 2)

    g = jax.grad(loss)(k)
    assert g.shape == k.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_hexconv_jit_and_batch_shapes():
    f = jax.jit(lambda x, k: hex_conv(x, k))
    x = jnp.ones((3, G.VISIUM_H_ST, G.VISIUM_W_ST, 8))
    k = jnp.ones((7, 8, 16))
    out = f(x, k)
    assert out.shape == (3, G.VISIUM_H_ST, G.VISIUM_W_ST, 16)


def test_hexconv_tap_count_validation():
    with pytest.raises(ValueError):
        hex_conv(jnp.ones((1, 4, 4, 1)), jnp.ones((5, 1, 1)))


@pytest.mark.parametrize("seed", range(4))
def test_hexconv_randomized_shapes(seed):
    """Randomized shape/radius sweep against the brute-force reference."""
    rng = np.random.default_rng(100 + seed)
    h = int(rng.integers(3, 20))
    w = int(rng.integers(3, 20))
    cin = int(rng.integers(1, 9))
    cout = int(rng.integers(1, 9))
    radius = int(rng.integers(1, 3))
    b = int(rng.integers(1, 4))
    x = rng.normal(size=(b, h, w, cin)).astype(np.float32)
    k = rng.normal(size=(num_taps(radius), cin, cout)).astype(np.float32)
    bias = rng.normal(size=(cout,)).astype(np.float32)
    got = np.asarray(hex_conv(jnp.asarray(x), jnp.asarray(k), jnp.asarray(bias),
                              radius=radius))
    want = hex_conv_reference(x, k, bias, radius=radius)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_hexconv_bf16_accumulates_in_f32():
    # Under bf16 activations the 7*C_in-tap contraction must accumulate in
    # f32 (matching the Pallas corrector backend and the flax Dense
    # convention): with C_in large, bf16 accumulation would drift far beyond
    # input-rounding error, while f32 accumulation stays at ~bf16 input
    # precision relative to the f32 result.
    rng = np.random.default_rng(7)
    c_in = 256
    x = rng.normal(size=(1, 10, 8, c_in)).astype(np.float32)
    k = rng.normal(size=(7, c_in, 4)).astype(np.float32) / np.sqrt(7 * c_in)
    want = np.asarray(hex_conv(jnp.asarray(x), jnp.asarray(k)))

    got = hex_conv(jnp.asarray(x, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16))
    assert got.dtype == jnp.bfloat16
    err = np.abs(np.asarray(got, np.float32) - want)
    scale = np.abs(want) + 1.0
    # bf16 has ~3 decimal digits; f32 accumulation keeps relative error at
    # the input-rounding level (~1e-2 over a 1792-term sum of rounded
    # operands), far below what bf16 accumulation produces.
    assert np.max(err / scale) < 3e-2
