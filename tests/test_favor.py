import jax
import jax.numpy as jnp
import numpy as np

from gridnext_tpu.ops import favor


def test_orthogonal_matrix_properties():
    key = jax.random.key(0)
    m = favor.orthogonal_gaussian_matrix(key, 96, 32, scaling=1)
    assert m.shape == (96, 32)
    # rows within each 32-block are orthogonal with norm sqrt(32)
    blk = np.asarray(m[:32])
    gram = blk @ blk.T
    np.testing.assert_allclose(gram, np.eye(32) * 32.0, atol=1e-3)

    m0 = favor.orthogonal_gaussian_matrix(key, 96, 32, scaling=0)
    norms = np.linalg.norm(np.asarray(m0), axis=1)
    # chi-distributed norms: mean close to sqrt(32)
    assert abs(norms.mean() - np.sqrt(32)) < 1.0


def test_softmax_kernel_approximates_attention():
    key = jax.random.key(1)
    d, n, r = 16, 24, 4096  # many features -> tight approximation
    kq, kk, kp = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 1, n, d)) * 0.5
    k = jax.random.normal(kk, (1, 1, n, d)) * 0.5
    proj = favor.orthogonal_gaussian_matrix(kp, r, d)

    qf = favor.softmax_kernel_features(q, proj, is_query=True)
    kf = favor.softmax_kernel_features(k, proj, is_query=False)
    approx = np.asarray(jnp.einsum("...nr,...mr->...nm", qf, kf))
    approx = approx / approx.sum(-1, keepdims=True)

    exact = jax.nn.softmax(jnp.einsum("...nd,...md->...nm", q, k) / np.sqrt(d), axis=-1)
    err = np.abs(approx - np.asarray(exact)).max()
    assert err < 0.02, err


def test_linear_attention_equals_explicit():
    key = jax.random.key(2)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.nn.relu(jax.random.normal(kq, (2, 3, 10, 8))) + 1e-3
    k = jax.nn.relu(jax.random.normal(kk, (2, 3, 10, 8))) + 1e-3
    v = jax.random.normal(kv, (2, 3, 10, 4))

    got = np.asarray(favor.linear_attention(q, k, v))
    # explicit normalized kernel attention
    scores = np.einsum("bhnr,bhmr->bhnm", np.asarray(q), np.asarray(k))
    want = np.einsum("bhnm,bhmd->bhnd", scores / scores.sum(-1, keepdims=True),
                     np.asarray(v))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_causal_linear_attention_matches_bruteforce():
    key = jax.random.key(3)
    kq, kk, kv = jax.random.split(key, 3)
    n = 50  # not a multiple of chunk to exercise padding
    q = jax.nn.relu(jax.random.normal(kq, (2, 2, n, 8))) + 1e-3
    k = jax.nn.relu(jax.random.normal(kk, (2, 2, n, 8))) + 1e-3
    v = jax.random.normal(kv, (2, 2, n, 4))

    got = np.asarray(favor.causal_linear_attention(q, k, v, chunk_size=16))

    qn, kn, vn = map(np.asarray, (q, k, v))
    scores = np.einsum("bhnr,bhmr->bhnm", qn, kn)
    mask = np.tril(np.ones((n, n), bool))
    scores = np.where(mask, scores, 0.0)
    want = np.einsum("bhnm,bhmd->bhnd", scores, vn)
    den = scores.sum(-1, keepdims=True) + 1e-6
    want = want / den
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


def test_generalized_kernel_no_projection():
    x = jnp.array([[-1.0, 2.0]])
    out = favor.generalized_kernel_features(x, projection=None)
    norm = x.shape[-1] ** -0.25
    np.testing.assert_allclose(
        np.asarray(out), np.maximum(np.asarray(x) * norm, 0) + 1e-3, rtol=1e-6)
