import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridnext_tpu.models import CountMLP, GridNetHex
from gridnext_tpu.parallel import make_mesh, replicate, shard_grid_batch
from gridnext_tpu.parallel.mesh import default_mesh_shape
from gridnext_tpu.train.loops import (
    make_steps,
    create_train_state,
    make_gridwise_optimizer,
)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest sets host device count)")
    return jax.devices()[:8]


def _setup(seed=0, b=8, h=16, w=8, genes=24, classes=5):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(b, h, w, genes)).astype(np.float32)
    y = rng.integers(0, classes + 1, size=(b, h, w)).astype(np.int64)
    f = CountMLP(n_classes=classes)
    g = GridNetHex(patch_classifier=f, n_classes=classes)
    tx = make_gridwise_optimizer(1e-3, f_lr=1e-4)
    state = create_train_state(g, jax.random.key(0), jnp.asarray(x[:1]), tx)
    return g, tx, state, x, y


def test_mesh_shapes(eight_devices):
    assert default_mesh_shape(8) == {"data": 4, "spot": 2}
    assert default_mesh_shape(1) == {"data": 1, "spot": 1}
    mesh = make_mesh(default_mesh_shape(8), eight_devices)
    assert mesh.devices.shape == (4, 2)


def test_sharded_step_matches_single_device(eight_devices):
    import optax

    g, _, _, x, y = _setup()
    # SGD for the numerics comparison: adam's first step is ~sign(grad)*lr,
    # which amplifies f32 reduction-order noise on near-zero gradients.
    tx = optax.sgd(1e-2)
    state = create_train_state(g, jax.random.key(0), jnp.asarray(x[:1]), tx)
    train_step, eval_step = make_steps(g, tx, "grid")

    # single device
    s1, m1 = train_step(state, jnp.asarray(x), jnp.asarray(y))

    # data x spot sharded
    mesh = make_mesh(default_mesh_shape(8), eight_devices)
    state_r = replicate(state, mesh)
    xs, ys = shard_grid_batch((jnp.asarray(x), jnp.asarray(y)), mesh)
    s8, m8 = train_step(state_r, xs, ys)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5, atol=1e-6)
    assert int(m1["n_correct"]) == int(m8["n_correct"])
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_sharded_eval_and_input_placement(eight_devices):
    g, tx, state, x, y = _setup(seed=1)
    mesh = make_mesh({"data": 8}, eight_devices)
    xs, ys = shard_grid_batch((jnp.asarray(x), jnp.asarray(y)), mesh,
                              spot_axis=None)
    # batch axis really is distributed
    assert len(xs.sharding.device_set) == 8
    _, eval_step = make_steps(g, tx, "grid")
    m = eval_step(replicate(state, mesh), xs, ys)
    assert np.isfinite(float(m["loss"]))


def test_sharded_image_f_inference_matches_single_device(eight_devices):
    """Spot-classifier inference sharded over the patch axis: the serving
    scale-out layout (patches are embarrassingly parallel over chips)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gridnext_tpu.models import DenseNet

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=5, small_inputs=True)
    rng = np.random.default_rng(0)
    patches = rng.normal(size=(64, 16, 16, 3)).astype(np.float32)
    variables = f.init(jax.random.key(0), jnp.asarray(patches[:1]))

    fwd = jax.jit(lambda v, x: f.apply(v, x, train=False))
    want = np.asarray(fwd(variables, jnp.asarray(patches)))

    mesh = make_mesh({"data": 8}, eight_devices)
    xs = jax.device_put(jnp.asarray(patches), NamedSharding(mesh, P("data")))
    vr = replicate(variables, mesh)
    got = np.asarray(fwd(vr, xs))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sharded_image_model_matches_single_device(eight_devices):
    """Spot-sharded IMAGE registration (TpuPatchClassifier f + hex g): the
    f-over-patches + halo-exchanging corrector path where the FLOPs live."""
    import optax

    from gridnext_tpu.models import TpuPatchClassifier

    rng = np.random.default_rng(2)
    b, h, w, p, classes = 4, 8, 4, 32, 3
    x = rng.normal(size=(b, h, w, p, p, 3)).astype(np.float32)
    y = rng.integers(0, classes + 1, size=(b, h, w)).astype(np.int64)

    f = TpuPatchClassifier(n_classes=classes, stages=((128, 1),), stem_patch=8)
    g = GridNetHex(patch_classifier=f, n_classes=classes)
    tx = optax.sgd(1e-2)
    state = create_train_state(g, jax.random.key(0), jnp.asarray(x[:1]), tx)
    train_step, _ = make_steps(g, tx, "grid")

    s1, m1 = train_step(state, jnp.asarray(x), jnp.asarray(y))

    mesh = make_mesh(default_mesh_shape(8), eight_devices)
    state_r = replicate(state, mesh)
    xs, ys = shard_grid_batch((jnp.asarray(x), jnp.asarray(y)), mesh)
    s8, m8 = train_step(state_r, xs, ys)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4, atol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(s1.params),
                     jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_scbert_sequence_parallel_matches_single_device(eight_devices):
    """Token-axis (sequence-parallel) scBERT forward over the mesh.

    The 16,907-gene token axis is the long dimension of the framework's
    largest model; sharding it splits the FAVOR+ feature maps (the measured
    transcendental bottleneck, docs/roadmap.md) across chips. No manual
    collectives: the FAVOR einsums contract over the sharded axis, so the
    XLA SPMD partitioner inserts the psums (context Sum_n k'v^T and the
    denominator key-sum), and the AttentionClassifier head's Dense over
    tokens reduces the same way. SURVEY section 5.7 marks true SP as
    unnecessary at reference scale -- this certifies it works anyway.
    """
    from gridnext_tpu.models import scBERT
    from gridnext_tpu.parallel import shard_token_batch

    n_genes, classes = 1024, 4  # tokens = n_genes + 1 CLS = 1025 (uneven!)
    model = scBERT(n_genes=n_genes, dim=32, depth=2, heads=4,
                   n_classes=classes)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 6, size=(2, n_genes)).astype(np.float32)
    variables = model.init({"params": jax.random.key(0),
                            "favor": jax.random.key(1)}, jnp.asarray(x[:1]))

    fwd = jax.jit(lambda v, xb: model.apply(v, xb, train=False))
    ref = np.asarray(fwd(variables, jnp.asarray(x)))

    mesh = make_mesh({"data": 1, "seq": 8}, eight_devices)
    v_rep = replicate(variables, mesh)
    x_sh = shard_token_batch(jnp.asarray(x), mesh)
    out = np.asarray(fwd(v_rep, x_sh))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_public_train_gridwise_mesh_matches_single_device(eight_devices):
    """The PUBLIC multi-chip path: train_gridwise(mesh=...) must reproduce
    single-device training -- same losses, same final params -- including a
    partial final batch (padded with all-background arrays)."""
    import optax

    from gridnext_tpu.train import train_gridwise

    rng = np.random.default_rng(3)
    b, h, w, genes, classes = 6, 16, 8, 24, 5  # 6 arrays, batch 4 -> pad
    x = rng.normal(size=(b, h, w, genes)).astype(np.float32)
    y = rng.integers(0, classes + 1, size=(b, h, w)).astype(np.int64)
    g = GridNetHex(patch_classifier=CountMLP(n_classes=classes),
                   n_classes=classes)
    dls = {"train": (x, y), "val": (x[:2], y[:2])}

    def run(**kw):
        tx = optax.sgd(1e-2)  # avoid adam's reduction-order sensitivity
        state = create_train_state(g, jax.random.key(0), jnp.asarray(x[:1]), tx)
        return train_gridwise(g, dls, state=state, tx=tx, num_epochs=2,
                              batch_size=4, verbose=False, **kw)

    s1, vh1, th1 = run()
    mesh = make_mesh(default_mesh_shape(8), eight_devices)
    s8, vh8, th8 = run(mesh=mesh)

    np.testing.assert_allclose(th1, th8, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vh1, vh8, rtol=1e-5, atol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(s1.params),
                     jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-6)


def test_public_train_spotwise_mesh_matches_single_device(eight_devices):
    """train_spotwise(mesh_shape=...) == single-device, with a partial final
    batch exercising the -1-label padding of the masked spot CE."""
    import optax

    from gridnext_tpu.train import train_spotwise

    rng = np.random.default_rng(4)
    n, genes, classes = 44, 24, 5  # batch 16 -> final batch of 12 pads
    x = rng.normal(size=(n, genes)).astype(np.float32)
    y = rng.integers(0, classes, size=(n,)).astype(np.int64)
    f = CountMLP(n_classes=classes)
    dls = {"train": (x, y), "val": (x[:10], y[:10])}

    def run(**kw):
        tx = optax.sgd(1e-2)
        state = create_train_state(f, jax.random.key(0), jnp.asarray(x[:1]), tx)
        return train_spotwise(f, dls, state=state, tx=tx, num_epochs=2,
                              batch_size=16, verbose=False, **kw)

    s1, vh1, th1 = run()
    s8, vh8, th8 = run(mesh_shape={"data": 8})

    np.testing.assert_allclose(th1, th8, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vh1, vh8, rtol=1e-5, atol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(s1.params),
                     jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-6)


def test_mesh_batch_size_divisibility_error(eight_devices):
    from gridnext_tpu.train import train_spotwise

    rng = np.random.default_rng(5)
    x = rng.normal(size=(16, 8)).astype(np.float32)
    y = rng.integers(0, 3, size=(16,)).astype(np.int64)
    f = CountMLP(n_classes=3)
    with pytest.raises(ValueError, match="divisible"):
        train_spotwise(f, {"train": (x, y)}, num_epochs=1, batch_size=12,
                       mesh_shape={"data": 8}, verbose=False)


def test_cli_mesh_batch_validation_fails_fast(eight_devices):
    """An incompatible --mesh / --grid-batch-size pair must error BEFORE any
    training starts (not after hours of f training, at the g stage)."""
    import argparse

    from gridnext_tpu.cli import _checked_mesh_shape

    args = argparse.Namespace(mesh="data=4,spot=2", batch_size=8,
                              grid_batch_size=1)
    with pytest.raises(SystemExit, match="divisible"):
        _checked_mesh_shape(args, spot_batch=args.batch_size,
                            grid_batch=args.grid_batch_size)
    # compatible shapes pass through as the trainers' mesh_shape value
    args = argparse.Namespace(mesh="data=4,spot=2", batch_size=8,
                              grid_batch_size=4)
    assert _checked_mesh_shape(args, spot_batch=8, grid_batch=4) == \
        {"data": 4, "spot": 2}
    assert _checked_mesh_shape(argparse.Namespace(mesh=None)) is None


def test_shard_grid_batch_odd_h_falls_back(eight_devices):
    """An H the spot axis does not divide (odd-H HD lattice on spot=2) must
    place with H replicated + a warning, not crash inside device_put."""
    from gridnext_tpu.parallel.mesh import shard_spot_batch

    mesh = make_mesh({"data": 4, "spot": 2}, eight_devices)
    x = jnp.zeros((4, 77, 8, 3), jnp.float32)  # H=77 not divisible by 2
    with pytest.warns(UserWarning, match="not divisible by mesh axis 'spot'"):
        placed = shard_grid_batch(x, mesh)
    assert placed.sharding.spec == jax.sharding.PartitionSpec("data")

    # divisible H keeps the 2-D layout
    placed = shard_grid_batch(jnp.zeros((4, 78, 8, 3)), mesh)
    assert placed.sharding.spec == jax.sharding.PartitionSpec("data", "spot")

    # a batch the data axis does not divide is a config error, spelled out
    with pytest.raises(ValueError, match="batch dim 3 is not divisible"):
        shard_grid_batch(jnp.zeros((3, 78, 8, 3)), mesh)
    with pytest.raises(ValueError, match="not divisible by the mesh's 8"):
        shard_spot_batch(jnp.zeros((12, 24)), mesh)


def test_shard_token_batch_odd_tokens_fall_back(eight_devices):
    from gridnext_tpu.parallel import shard_token_batch

    mesh = make_mesh({"data": 1, "seq": 8}, eight_devices)
    with pytest.warns(UserWarning, match="not divisible by mesh axis 'seq'"):
        placed = shard_token_batch(jnp.zeros((1, 1025)), mesh)
    assert placed.sharding.spec == jax.sharding.PartitionSpec("data")


def test_resolve_mesh_accepts_string_mesh(eight_devices):
    """mesh='auto' (the natural slip for mesh_shape='auto') resolves instead
    of crashing later with an opaque AttributeError."""
    from gridnext_tpu.train.loops import _resolve_mesh

    mesh = _resolve_mesh("auto", None)
    assert mesh is not None and set(mesh.axis_names) == {"data", "spot"}
    mesh = _resolve_mesh({"data": 2}, None)
    assert mesh.axis_names == ("data",)
    assert _resolve_mesh(None, None) is None
