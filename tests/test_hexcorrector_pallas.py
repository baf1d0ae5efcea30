import jax
import jax.numpy as jnp
import numpy as np

from gridnext_tpu.models.gridnet import _HexCorrector
from gridnext_tpu.ops.hexcorrector_pallas import (
    fold_corrector_params,
    fused_hex_corrector,
)


def _setup(n_classes=5, c_in=8, h=12, w=10, b=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(b, h, w, c_in)).astype(np.float32)
    corr = _HexCorrector(n_classes=n_classes, use_bn=True)
    variables = corr.init(jax.random.key(seed), jnp.asarray(x))
    # make BN stats non-trivial so folding is actually exercised
    bs = jax.tree.map(lambda a: a + 0.3 * np.abs(rng.normal(size=a.shape)).astype(np.float32),
                      variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    return corr, variables, x


def test_fused_corrector_matches_flax_interpret():
    corr, variables, x = _setup()
    want = np.asarray(corr.apply(variables, jnp.asarray(x), train=False))

    kernels, biases, relu_flags = fold_corrector_params(
        variables["params"], variables["batch_stats"])
    got = np.asarray(fused_hex_corrector(
        jnp.asarray(x), kernels, biases, relu_flags, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_corrector_visium_shape_interpret():
    corr, variables, x = _setup(n_classes=7, c_in=4, h=78, w=64, b=1, seed=1)
    want = np.asarray(corr.apply(variables, jnp.asarray(x), train=False))
    kernels, biases, relu_flags = fold_corrector_params(
        variables["params"], variables["batch_stats"])
    got = np.asarray(fused_hex_corrector(
        jnp.asarray(x), kernels, biases, relu_flags, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_corrector_labels_interpret():
    """Fused argmax+mask output == logits path argmax'd on host."""
    corr, variables, x = _setup(n_classes=6, c_in=5, h=20, w=16, b=3, seed=2)
    from gridnext_tpu.ops.hexcorrector_pallas import fused_hex_corrector_labels

    kernels, biases, relu_flags = fold_corrector_params(
        variables["params"], variables["batch_stats"])
    logits = np.asarray(fused_hex_corrector(
        jnp.asarray(x), kernels, biases, relu_flags, interpret=True))
    rng = np.random.default_rng(0)
    fg = rng.integers(0, 2, size=x.shape[:3]).astype(np.int32)
    want = np.where(fg > 0, logits.argmax(-1) + 1, 0)

    got = np.asarray(fused_hex_corrector_labels(
        jnp.asarray(x), jnp.asarray(fg), kernels, biases, relu_flags,
        interpret=True))
    np.testing.assert_array_equal(got, want)
