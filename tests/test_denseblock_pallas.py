import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridnext_tpu.models import DenseNet
from gridnext_tpu.ops.denseblock_pallas import (
    build_densenet_fused_infer,
    fold_dense_block_params,
    fused_dense_block,
)


def _dense_variables(growth=8, block_config=(2, 3), init_feats=16, classes=5,
                     seed=0, patch=32):
    m = DenseNet(growth_rate=growth, block_config=block_config,
                 num_init_features=init_feats, num_classes=classes,
                 small_inputs=False)
    x = jnp.zeros((1, patch, patch, 3))
    return m, m.init(jax.random.key(seed), x)


def test_fused_block_matches_flax_layers_interpret():
    growth, n_layers, c0 = 8, 3, 16
    m, variables = _dense_variables(growth=growth, block_config=(n_layers,),
                                    init_feats=c0)
    params, stats = variables["params"], variables["batch_stats"]
    lp = [params[f"_DenseLayer_{i}"] for i in range(n_layers)]
    ls = [stats[f"_DenseLayer_{i}"] for i in range(n_layers)]
    folded = fold_dense_block_params(lp, ls, c0, growth)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 8, 8, c0)).astype(np.float32)

    # flax reference: run the dense layers with concat (eval-mode BN)
    from gridnext_tpu.models.densenet import _DenseLayer

    def flax_block(x):
        h = jnp.asarray(x)
        for i in range(n_layers):
            layer = _DenseLayer(growth, 4, 0.0, False)
            new = layer.apply(
                {"params": params[f"_DenseLayer_{i}"],
                 "batch_stats": stats[f"_DenseLayer_{i}"]}, h, False)
            h = jnp.concatenate([h, new], axis=-1)
        return h

    want = np.asarray(flax_block(x))
    got = np.asarray(fused_dense_block(
        jnp.asarray(x), folded["A1"], folded["B1"], folded["W1"],
        folded["A2"], folded["B2"], folded["W2"], c_in0=c0, growth=growth,
        batch_tile=2, interpret=True))
    # bf16 storage between layers: compare loosely but meaningfully
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
    # and labels agree where it matters: correlation near 1
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999


def test_fused_densenet_infer_matches_flax_interpret():
    m, variables = _dense_variables(growth=8, block_config=(2, 3),
                                    init_feats=16, classes=5, patch=32)
    infer = build_densenet_fused_infer(
        variables, block_config=(2, 3), num_init_features=16, growth=8,
        batch_tiles=(2, 2), interpret=True)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    want = np.asarray(m.apply(variables, jnp.asarray(x), train=False))
    got = np.asarray(infer(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_fused_densenet_infer_odd_spatial_dims():
    """Transitions floor odd spatial dims like nn.avg_pool/torch AvgPool2d
    (round-2 review fix: the pooling reshape required even dims)."""
    # 36px: stem+maxpool -> 9x9 (odd), first transition pools 9 -> 4
    m, variables = _dense_variables(growth=8, block_config=(2, 3),
                                    init_feats=16, classes=5, patch=36)
    infer = build_densenet_fused_infer(
        variables, block_config=(2, 3), num_init_features=16, growth=8,
        batch_tiles=(2, 2), interpret=True)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 36, 36, 3)).astype(np.float32)
    want = np.asarray(m.apply(variables, jnp.asarray(x), train=False))
    got = np.asarray(infer(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
