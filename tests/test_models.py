import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridnext_tpu.models import CountMLP, DenseNet, GridNet, GridNetHex, GridNetHexMM


def test_count_mlp_shapes():
    m = CountMLP(n_classes=7)
    x = jnp.ones((4, 250))
    vars_ = m.init(jax.random.key(0), x)
    y = m.apply(vars_, x)
    assert y.shape == (4, 7)
    # train mode mutates batch stats
    y2, mut = m.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert y2.shape == (4, 7)
    assert "batch_stats" in mut


def test_densenet_small_shapes():
    m = DenseNet(growth_rate=4, block_config=(2, 2), num_init_features=8,
                 num_classes=5, small_inputs=True)
    x = jnp.ones((2, 32, 32, 3))
    vars_ = m.init(jax.random.key(0), x)
    y = m.apply(vars_, x)
    assert y.shape == (2, 5)


def test_densenet_feature_mode():
    m = DenseNet(growth_rate=4, block_config=(2, 2), num_init_features=8,
                 num_classes=5, small_inputs=True, classify=False)
    x = jnp.ones((2, 32, 32, 3))
    vars_ = m.init(jax.random.key(0), x)
    y = m.apply(vars_, x)
    # feature dim: 8 + 2*4 = 16 -> transition 8 -> + 2*4 = 16
    assert y.shape == (2, 16)


def test_gridnet_hex_count_pipeline():
    f = CountMLP(n_classes=7)
    g = GridNetHex(patch_classifier=f, n_classes=7)
    x = jnp.ones((2, 12, 10, 50))  # (B, H, W, n_genes)
    vars_ = g.init(jax.random.key(0), x)
    y = g.apply(vars_, x)
    assert y.shape == (2, 12, 10, 7)


def test_gridnet_cartesian():
    f = CountMLP(n_classes=4)
    g = GridNet(patch_classifier=f, n_classes=4)
    x = jnp.ones((1, 9, 9, 20))
    vars_ = g.init(jax.random.key(0), x)
    y = g.apply(vars_, x)
    assert y.shape == (1, 9, 9, 4)


def test_gridnet_patch_chunk_equivalence():
    f = CountMLP(n_classes=3, batch_norm=False)
    x = jax.random.normal(jax.random.key(1), (1, 8, 6, 30))

    g_full = GridNetHex(patch_classifier=f, n_classes=3, patch_chunk=None)
    vars_ = g_full.init(jax.random.key(0), x)
    y_full = g_full.apply(vars_, x)

    # chunk that doesn't divide 48 exercises the padding path
    g_chunk = GridNetHex(patch_classifier=f, n_classes=3, patch_chunk=20)
    y_chunk = g_chunk.apply(vars_, x)
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_chunk),
                               rtol=1e-5, atol=1e-5)


def test_gridnet_patch_chunk_grads_flow_to_f():
    f = CountMLP(n_classes=3, batch_norm=False)
    x = jax.random.normal(jax.random.key(1), (1, 6, 6, 10))
    g = GridNetHex(patch_classifier=f, n_classes=3, patch_chunk=12)
    vars_ = g.init(jax.random.key(0), x)

    def loss(params):
        out = g.apply({"params": params, "batch_stats": vars_["batch_stats"]}, x)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(vars_["params"])
    f_grads = grads["patch_classifier"]
    leaf = jax.tree_util.tree_leaves(f_grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaf)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaf)


def test_gridnet_image_grid():
    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=6, small_inputs=True)
    g = GridNetHex(patch_classifier=f, n_classes=6, patch_chunk=16)
    x = jnp.ones((1, 4, 4, 16, 16, 3))  # (B, H, W, P, P, C)
    vars_ = g.init(jax.random.key(0), x)
    y = g.apply(vars_, x)
    assert y.shape == (1, 4, 4, 6)


def test_gridnet_mm_concat():
    f_img = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                     num_classes=6, small_inputs=True)
    f_cnt = CountMLP(n_classes=6)
    g = GridNetHexMM(image_classifier=f_img, count_classifier=f_cnt, n_classes=6)
    x_img = jnp.ones((1, 4, 4, 16, 16, 3))
    x_cnt = jnp.ones((1, 4, 4, 25))
    vars_ = g.init(jax.random.key(0), (x_img, x_cnt))
    pp = g.apply(vars_, (x_img, x_cnt), method="patch_predictions")
    assert pp.shape == (1, 4, 4, 12)  # count 6 + image 6, count first
    y = g.apply(vars_, (x_img, x_cnt))
    assert y.shape == (1, 4, 4, 6)


def test_gridnet_mm_count_chunk_equivalence():
    """Per-modality count_chunk changes memory scheduling, not numerics."""
    f_img = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                     num_classes=6, small_inputs=True)
    f_cnt = CountMLP(n_classes=6)
    x_img = jnp.asarray(np.random.default_rng(0).uniform(
        size=(1, 4, 4, 16, 16, 3)).astype(np.float32))
    x_cnt = jnp.asarray(np.random.default_rng(1).uniform(
        size=(1, 4, 4, 25)).astype(np.float32))

    g_ref = GridNetHexMM(image_classifier=f_img, count_classifier=f_cnt,
                         n_classes=6, patch_chunk=8)
    vars_ = g_ref.init(jax.random.key(0), (x_img, x_cnt))
    want = g_ref.apply(vars_, (x_img, x_cnt))

    g_cc = GridNetHexMM(image_classifier=f_img, count_classifier=f_cnt,
                        n_classes=6, patch_chunk=8, count_chunk=3)
    got = g_cc.apply(vars_, (x_img, x_cnt))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Torch parity (torch CPU is available in the environment)
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")


def _torch_densenet(num_classes=5):
    import sys
    sys.path.insert(0, "/root/reference")
    from gridnext.densenet import DenseNet as TorchDenseNet
    return TorchDenseNet(growth_rate=4, block_config=(2, 2), compression=0.5,
                         num_init_features=8, bn_size=4, drop_rate=0,
                         num_classes=num_classes, small_inputs=False, efficient=False)


def test_densenet_torch_parity():
    tm = _torch_densenet()
    tm.eval()
    sd = tm.state_dict()

    from gridnext_tpu.compat.torch_convert import densenet_from_torch
    variables = densenet_from_torch(sd, block_config=(2, 2), small_inputs=False)

    m = DenseNet(growth_rate=4, block_config=(2, 2), num_init_features=8,
                 bn_size=4, num_classes=5, small_inputs=False)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_count_mlp_torch_parity():
    tn = torch.nn.Sequential(
        torch.nn.Linear(40, 500), torch.nn.Linear(500, 100),
        torch.nn.BatchNorm1d(100), torch.nn.ReLU(),
        torch.nn.Linear(100, 100), torch.nn.Linear(100, 50),
        torch.nn.BatchNorm1d(50), torch.nn.ReLU(),
        torch.nn.Linear(50, 7))
    tn.eval()

    from gridnext_tpu.compat.torch_convert import count_mlp_from_torch
    variables = count_mlp_from_torch(tn.state_dict())
    m = CountMLP(n_classes=7)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 40)).astype(np.float32)
    with torch.no_grad():
        want = tn(torch.from_numpy(x)).numpy()
    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gridnet_mm_with_scbert_count_f():
    """scBERT as chunked count-f inside GridNetHexMM: the 'favor' collection
    must survive the chunk scan (regression for the smoke-script bug)."""
    from gridnext_tpu.models import scBERT

    f_img = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                     num_classes=3, small_inputs=True)
    f_cnt = scBERT(n_genes=12, bin_num=5, dim=16, depth=1, heads=2, n_classes=3)
    g = GridNetHexMM(image_classifier=f_img, count_classifier=f_cnt,
                     n_classes=3, patch_chunk=8)
    x_img = jnp.ones((1, 4, 4, 8, 8, 3))
    x_cnt = jnp.ones((1, 4, 4, 12))
    vars_ = g.init(jax.random.key(0), (x_img, x_cnt))
    assert "favor" in vars_
    y = g.apply(vars_, (x_img, x_cnt))
    assert y.shape == (1, 4, 4, 3)


def test_densenet_torch_parity_after_training():
    """Converter parity on a TRAINED torch model: a few SGD steps in train()
    mode give every BatchNorm non-trivial running stats (fresh init has
    mean=0/var=1, which would mask a BN running-stat mapping bug -- the
    closest this environment gets to a real densenet_ba44 checkpoint)."""
    tm = _torch_densenet()
    opt = torch.optim.SGD(tm.parameters(), lr=1e-2)
    rng = np.random.default_rng(7)
    tm.train()
    for _ in range(4):
        xb = torch.from_numpy(
            rng.normal(size=(8, 3, 64, 64)).astype(np.float32))
        yb = torch.from_numpy(rng.integers(0, 5, size=8))
        loss = torch.nn.functional.cross_entropy(tm(xb), yb)
        opt.zero_grad()
        loss.backward()
        opt.step()
    tm.eval()
    sd = tm.state_dict()
    # the stats really moved -- otherwise this test is no stronger than
    # the fresh-init one
    rm = [v for k, v in sd.items() if k.endswith("running_mean")]
    assert max(float(v.abs().max()) for v in rm) > 1e-3

    from gridnext_tpu.compat.torch_convert import densenet_from_torch
    variables = densenet_from_torch(sd, block_config=(2, 2), small_inputs=False)
    m = DenseNet(growth_rate=4, block_config=(2, 2), num_init_features=8,
                 bn_size=4, num_classes=5, small_inputs=False)
    x = rng.normal(size=(4, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_densenet_torch_label_map_identity():
    """North-star check (BASELINE.json): converted weights reproduce the
    torch pipeline's per-spot LABELS exactly on a batch of random patches."""
    tm = _torch_densenet(num_classes=7)
    tm.eval()
    from gridnext_tpu.compat.torch_convert import densenet_from_torch
    variables = densenet_from_torch(tm.state_dict(), block_config=(2, 2),
                                    small_inputs=False)
    m = DenseNet(growth_rate=4, block_config=(2, 2), num_init_features=8,
                 bn_size=4, num_classes=7, small_inputs=False)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(64, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().argmax(1)
    got = np.asarray(m.apply(variables, jnp.asarray(x))).argmax(1)
    np.testing.assert_array_equal(got, want)


def test_tpu_patch_classifier_shapes():
    import jax
    import jax.numpy as jnp

    from gridnext_tpu.models import GridNetHex, TpuPatchClassifier

    f = TpuPatchClassifier(n_classes=5)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    v = f.init(jax.random.key(0), x)
    assert f.apply(v, x, train=False).shape == (2, 5)

    feats = TpuPatchClassifier(n_classes=5, classify=False)
    vf = feats.init(jax.random.key(0), x)
    assert feats.apply(vf, x, train=False).shape == (2, 512)

    # composes into GridNetHex as an image f (tiny grid to stay CI-fast)
    g = GridNetHex(patch_classifier=f, n_classes=5, f_dim=5)
    xg = jnp.zeros((1, 4, 4, 32, 32, 3), jnp.float32)
    vg = g.init(jax.random.key(0), xg)
    assert g.apply(vg, xg, train=False).shape == (1, 4, 4, 5)


def test_tpu_patch_classifier_trains():
    import jax
    import numpy as np

    from gridnext_tpu.models import TpuPatchClassifier
    from gridnext_tpu.train import train_spotwise

    rng = np.random.default_rng(0)
    # two separable classes: bright vs dark patches
    y = rng.integers(0, 2, 64)
    X = (rng.normal(0.1, 0.05, (64, 32, 32, 3)) + 0.5 * y[:, None, None, None])
    X = X.astype(np.float32)
    f = TpuPatchClassifier(n_classes=2, stages=((128, 1),), stem_patch=8)
    state, val_hist, _ = train_spotwise(
        f, {"train": (X[:48], y[:48]), "val": (X[48:], y[48:])},
        num_epochs=3, batch_size=16, verbose=False)
    assert val_hist[-1] < val_hist[0]


def test_densenet_efficient_remat_usable_and_equivalent():
    """efficient=True (the documented memory-saving flag) must init, match
    efficient=False outputs, and backprop (round-2 review fix: the remat
    closure's first arg was an array, crashing flax's lifted transform)."""
    kw = dict(growth_rate=4, block_config=(2, 2), num_init_features=8,
              bn_size=4, num_classes=5, small_inputs=True)
    m_eff = DenseNet(efficient=True, **kw)
    m_std = DenseNet(efficient=False, **kw)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    v = m_eff.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(m_eff.apply(v, x, train=False)),
        np.asarray(m_std.apply(v, x, train=False)), rtol=1e-5, atol=1e-5)

    def loss(p, model):
        out, _ = model.apply({**v, "params": p}, x, train=True,
                             mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    g_eff = jax.grad(loss)(v["params"], m_eff)
    g_std = jax.grad(loss)(v["params"], m_std)
    for a, b in zip(jax.tree.leaves(g_eff), jax.tree.leaves(g_std)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_hexconv_params_stay_float32_under_bf16():
    """bf16 activations must not create bf16 master weights (round-2 review
    fix): params stay param_dtype=float32, output follows the compute dtype."""
    from gridnext_tpu.models import GridNetHex, TpuPatchClassifier

    g = GridNetHex(patch_classifier=TpuPatchClassifier(
        n_classes=5, dtype=jnp.bfloat16), n_classes=5)
    x = jnp.zeros((1, 4, 4, 32, 32, 3), jnp.float32)
    v = g.init(jax.random.key(0), x)
    dtypes = {a.dtype for a in jax.tree.leaves(v["params"])}
    assert dtypes == {jnp.dtype(jnp.float32)}, dtypes


def test_tpu_f_arch_meta_roundtrip():
    """model.json 'tpu_f' fields reconstruct the exact f (register must
    survive future default-shape changes; the default changed once in
    round 3 already)."""
    from gridnext_tpu.models import TpuPatchClassifier
    from gridnext_tpu.models.tpu_f import tpu_f_arch_kwargs, tpu_f_arch_meta

    f = TpuPatchClassifier(n_classes=5, stages=((128, 2), (256, 1)),
                           stem_patch=8, norm="layer")
    meta = tpu_f_arch_meta(f)
    import json

    meta = json.loads(json.dumps(meta))  # through the model.json round trip
    f2 = TpuPatchClassifier(n_classes=5, **tpu_f_arch_kwargs(meta))
    assert (f2.stages, f2.stem_patch, f2.norm) == (f.stages, f.stem_patch,
                                                   f.norm)
    # missing field = pre-round-3 checkpoint: the ORIGINAL default shape
    # those were trained on (NOT the since-changed class defaults)
    legacy = tpu_f_arch_kwargs(None)
    assert legacy == {"stages": ((128, 2), (256, 2), (512, 2)),
                      "stem_patch": 8, "norm": "layer"}
    TpuPatchClassifier(n_classes=5, **legacy)  # constructible


def test_chunked_f_keeps_sown_intermediates():
    """apply_f_chunked's nn.scan must not drop the 'intermediates'
    collection: a chunked scBERT's sown attention maps stack along a
    leading chunk axis instead of silently vanishing."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gridnext_tpu.models import GridNetHex, scBERT

    f = scBERT(n_genes=12, dim=8, depth=1, heads=2, dim_head=4, n_classes=3,
               sow_attention=True)
    x = jnp.zeros((1, 2, 2, 12))
    g = GridNetHex(patch_classifier=f, n_classes=3, patch_chunk=2)
    v = g.init(jax.random.key(0), x)
    out, inter = g.apply(v, x, mutable=["intermediates"])
    leaves = jax.tree_util.tree_leaves(inter)
    assert leaves and leaves[0].shape[0] == 2      # (n_chunks, ...) stacked
    # forward identical to the unchunked model
    out0 = GridNetHex(patch_classifier=f, n_classes=3,
                      patch_chunk=None).apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out0), atol=1e-5)
