"""Cross-implementation oracle for the local-attention heads.

``models.performer.local_block_attention`` (blocked, rolled, gather-masked
-- the TPU path) vs ``compat.local_attention_ref`` (dense O(N^2) float64,
block-arithmetic masking, complex-plane rotary). The two share no code;
agreement pins the windowed semantics of the lucidrains ``local_attention``
package the reference uses for its local heads
(llm/performer_pytorch.py:355-370) without the package being installed --
closing the round-2 gap where rotary numerics were pinned only by
invariants (shift-equivariance/norm preservation)."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from gridnext_tpu.compat.local_attention_ref import (
    local_attention_ref,
    rotary_ref,
)
from gridnext_tpu.models.performer import (
    apply_rotary_pos_emb,
    local_block_attention,
    sinusoidal_rotary_freqs,
)


def _qkv(b=2, h=3, n=40, d=8, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((b, h, n, d)).astype(np.float32)
            for _ in range(3)]


def test_rotary_complex_oracle_matches_rotate_half():
    """cos/sin + rotate-half (ours / the package's formulation) == polar
    complex rotation (the oracle's), on q and k."""
    rng = np.random.default_rng(1)
    q, k = (rng.standard_normal((2, 3, 17, 12)).astype(np.float32)
            for _ in range(2))
    freqs = sinusoidal_rotary_freqs(17, 12)
    qr, kr = apply_rotary_pos_emb(jnp.asarray(q), jnp.asarray(k), freqs)
    np.testing.assert_allclose(np.asarray(qr), rotary_ref(q),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kr), rotary_ref(k),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "n,window,causal,rel_pos",
    # aligned + ragged sequence lengths x causal x rotary
    list(itertools.product([32, 37], [8], [False, True], [False, True])))
def test_local_block_attention_matches_dense_oracle(n, window, causal,
                                                    rel_pos):
    q, k, v = _qkv(n=n)
    got = np.asarray(local_block_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), window=window,
        causal=causal, rel_pos=rel_pos))
    want = local_attention_ref(q, k, v, window=window, causal=causal,
                               rel_pos=rel_pos)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_local_block_attention_masked_matches_dense_oracle(causal):
    q, k, v = _qkv(n=29, seed=3)
    rng = np.random.default_rng(4)
    mask = rng.random((2, 29)) > 0.3
    mask[:, 0] = True  # avoid the all-masked-first-query corner here
    got = np.asarray(local_block_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), window=8,
        causal=causal, mask=jnp.asarray(mask), rel_pos=True))
    want = local_attention_ref(q, k, v, window=8, causal=causal,
                               mask=mask, rel_pos=True)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_all_masked_query_rows_zero_in_both():
    """causal + first key masked: query 0 has zero valid keys; both
    implementations emit exact zeros for it (no uniform-softmax leak)."""
    q, k, v = _qkv(n=16, seed=5)
    mask = np.ones((2, 16), bool)
    mask[:, 0] = False
    got = np.asarray(local_block_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), window=4,
        causal=True, mask=jnp.asarray(mask)))
    want = local_attention_ref(q, k, v, window=4, causal=True, mask=mask)
    assert np.all(got[:, :, 0] == 0.0) and np.all(want[:, :, 0] == 0.0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
