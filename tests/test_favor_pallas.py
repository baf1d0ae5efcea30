"""Fused generalized-FAVOR linear attention vs the einsum reference.

The kernel (ops/favor_pallas.py) must reproduce
``favor.linear_attention(generalized_features(q), generalized_features(k),
v)`` exactly (same math, f32 accumulation), including ragged sequence
lengths (row masking) and non-128-multiple feature counts (column
masking), and be differentiable via its custom_vjp (backward = the einsum
path's VJP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridnext_tpu.ops import favor
from gridnext_tpu.ops.favor_pallas import (
    _einsum_reference,
    fused_generalized_linear_attention,
)


def _inputs(b=2, h=3, n=700, d=16, m=37, seed=0):
    rng = np.random.default_rng(seed)
    q, k, v = (rng.standard_normal((b, h, n, d)).astype(np.float32)
               for _ in range(3))
    proj = np.asarray(favor.orthogonal_gaussian_matrix(
        jax.random.key(1), m, d))
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(proj)


@pytest.mark.parametrize("n,m", [(512, 64), (700, 37), (1030, 266)])
def test_fused_matches_einsum_reference(n, m):
    q, k, v, proj = _inputs(n=n, m=m)
    got = fused_generalized_linear_attention(q, k, v, proj)
    want = _einsum_reference(q, k, v, proj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_fused_gradients_match_einsum_reference():
    q, k, v, proj = _inputs(n=260, m=20, d=8)

    def loss_fused(q, k, v):
        return jnp.sum(fused_generalized_linear_attention(q, k, v, proj) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_einsum_reference(q, k, v, proj) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_under_jit_and_remat():
    q, k, v, proj = _inputs(n=300, m=24, d=8)

    @jax.jit
    def f(q, k, v):
        g = jax.checkpoint(
            lambda q: jnp.sum(fused_generalized_linear_attention(
                q, k, v, proj)))
        return jax.grad(g)(q)

    out = f(q, k, v)
    assert np.isfinite(np.asarray(out)).all()
