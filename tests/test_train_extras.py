import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gridnext_tpu.config import (
    DenseNetConfig,
    GridTrainConfig,
    SpotTrainConfig,
    load_config,
    save_config,
)
from gridnext_tpu.models import CountMLP, GridNetHex, scBERT
from gridnext_tpu.observability import MetricsLogger, StageTimer, read_metrics
from gridnext_tpu.train import train_spotwise
from gridnext_tpu.train.loops import (
    create_train_state,
    make_gridwise_optimizer,
    restore_train_state,
    save_checkpoint,
    train_gridwise,
)


def _grid_data(seed=0, n=3, h=8, w=6, g=12, c=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, h, w, g)).astype(np.float32)
    Y = rng.integers(0, c + 1, size=(n, h, w)).astype(np.int64)
    return X, Y


def test_checkpoint_resume_roundtrip(tmp_path):
    X, Y = _grid_data()
    f = CountMLP(n_classes=3)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    tx = make_gridwise_optimizer(1e-3, f_lr=1e-4)
    state = create_train_state(g, jax.random.key(0), X[:1], tx)

    state, _, _ = train_gridwise(g, {"train": (X, Y), "val": (X, Y)},
                                 state=state, tx=tx, num_epochs=2, verbose=False)
    ckpt = tmp_path / "state.msgpack"
    save_checkpoint(str(ckpt), state)

    template = create_train_state(g, jax.random.key(1), X[:1], tx)
    restored = restore_train_state(str(ckpt), template)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored (adam moments differ from fresh template)
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed training continues without error
    restored, _, _ = train_gridwise(g, {"train": (X, Y), "val": (X, Y)},
                                    state=restored, tx=tx, num_epochs=1,
                                    verbose=False)
    assert int(restored.step) >= int(state.step)


def test_scbert_training_with_redraw():
    n_genes = 24
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 6, size=(32, n_genes)).astype(np.float32)
    Y = rng.integers(0, 3, size=32).astype(np.int64)

    m = scBERT(n_genes=n_genes, bin_num=5, dim=16, depth=2, heads=2, n_classes=3)
    tx = optax.adam(1e-3)
    state = create_train_state(m, jax.random.key(0), jnp.asarray(X[:2]), tx)
    assert "favor" in state.extra_vars  # projections carried by TrainState

    favor_before = jax.tree_util.tree_leaves(state.extra_vars["favor"])

    state, val_hist, _ = train_spotwise(
        m, {"train": (X, Y), "val": (X, Y)}, state=state, tx=tx,
        num_epochs=2, batch_size=16, redraw_every=2, verbose=False)
    favor_after = jax.tree_util.tree_leaves(state.extra_vars["favor"])
    # projections redrawn at least once
    assert not all(np.allclose(a, b) for a, b in zip(favor_before, favor_after))
    assert len(val_hist) == 2 and np.isfinite(val_hist).all()


def test_metrics_logger_and_stage_timer(tmp_path):
    path = tmp_path / "metrics.jsonl"
    with MetricsLogger(path) as ml:
        ml.log(step=1, loss=0.5, acc=0.9)
        ml.log(step=2, loss=0.4, phase="val")
    recs = read_metrics(path)
    assert len(recs) == 2
    assert recs[0]["loss"] == 0.5 and recs[1]["phase"] == "val"

    t = StageTimer()
    with t("a"):
        pass
    with t("a"):
        pass
    with t("b"):
        pass
    assert t.counts["a"] == 2 and "a:" in t.report()


def test_config_roundtrip(tmp_path):
    cfg = GridTrainConfig(learning_rate=5e-4, f_lr=1e-5, num_epochs=3)
    p = tmp_path / "cfg.json"
    save_config(cfg, p)
    cfg2 = load_config(GridTrainConfig, p)
    assert cfg2 == cfg
    assert cfg2.as_kwargs()["f_lr"] == 1e-5

    dn = DenseNetConfig()
    assert tuple(dn.block_config) == (6, 12, 24, 16)
    sp = SpotTrainConfig()
    assert sp.batch_size == 128


def test_training_without_val_keeps_learned_params():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(64, 10)).astype(np.float32)
    Y = (X[:, 0] > 0).astype(np.int64)
    f = CountMLP(n_classes=2, batch_norm=False)
    state0 = None
    state, val_hist, train_hist = train_spotwise(
        f, {"train": (X, Y), "val": None}, num_epochs=3, batch_size=16,
        verbose=False)
    assert val_hist == []
    assert train_hist[-1] < train_hist[0]  # it learned...
    # ...and the returned params reflect the training (non-zero step,
    # output differs from a fresh init)
    assert int(state.step) > 0
    fresh = f.init(jax.random.key(0), jnp.asarray(X[:1]))
    out_trained = f.apply(state.variables(), jnp.asarray(X[:4]))
    out_fresh = f.apply(fresh, jnp.asarray(X[:4]))
    assert not np.allclose(np.asarray(out_trained), np.asarray(out_fresh))


def test_training_with_dropout_model():
    import flax.linen as nn

    class DropNet(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Dense(16)(x)
            x = nn.Dropout(0.5, deterministic=not train)(x)
            return nn.Dense(3)(x)

    rng = np.random.default_rng(1)
    X = rng.normal(size=(32, 8)).astype(np.float32)
    Y = rng.integers(0, 3, 32).astype(np.int64)
    state, val_hist, _ = train_spotwise(
        DropNet(), {"train": (X, Y), "val": (X, Y)}, num_epochs=2,
        batch_size=16, verbose=False)
    assert np.isfinite(val_hist).all()


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from gridnext_tpu.train.orbax_io import (restore_checkpoint_orbax,
                                             save_checkpoint_orbax)

    X, Y = _grid_data()
    f = CountMLP(n_classes=3)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    tx = make_gridwise_optimizer(1e-3)
    state = create_train_state(g, jax.random.key(0), X[:1], tx)
    state, _, _ = train_gridwise(g, {"train": (X, Y), "val": (X, Y)},
                                 state=state, tx=tx, num_epochs=1, verbose=False)

    save_checkpoint_orbax(tmp_path / "ckpt", state)
    template = create_train_state(g, jax.random.key(9), X[:1], tx)
    restored = restore_checkpoint_orbax(tmp_path / "ckpt", template)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_async_checkpoint(tmp_path):
    """block=False returns a live checkpointer; after wait_until_finished
    the restore matches, including un-fetched device arrays."""
    pytest.importorskip("orbax.checkpoint")
    from gridnext_tpu.train.orbax_io import (restore_checkpoint_orbax,
                                             save_checkpoint_orbax)

    X, Y = _grid_data()
    f = CountMLP(n_classes=3)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    tx = make_gridwise_optimizer(1e-3)
    state = create_train_state(g, jax.random.key(0), X[:1], tx)

    ckptr = save_checkpoint_orbax(tmp_path / "ckpt", state, block=False)
    assert ckptr is not None
    ckptr.wait_until_finished()
    ckptr.close()
    template = create_train_state(g, jax.random.key(9), X[:1], tx)
    restored = restore_checkpoint_orbax(tmp_path / "ckpt", template)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_restore_preserves_mesh_sharding(tmp_path):
    """A mesh training state round-trips through orbax WITH its device
    layout: replicated leaves come back replicated over every mesh device,
    and an explicitly sharded param comes back sharded -- no host-numpy
    round-trip, no post-restore device_put (the 'sharded checkpoints for
    bigger f's' story; the reference has no distributed state at all)."""
    pytest.importorskip("orbax.checkpoint")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gridnext_tpu.parallel import make_mesh, replicate
    from gridnext_tpu.train.orbax_io import (restore_checkpoint_orbax,
                                             save_checkpoint_orbax)

    mesh = make_mesh({"data": len(jax.devices())})
    X, Y = _grid_data(g=16)   # gene axis divisible by the 8-device mesh
    f = CountMLP(n_classes=3)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    tx = make_gridwise_optimizer(1e-3)

    def shard_first_kernel(state):
        # replicate everything, then shard one kernel over the mesh (input
        # axis 16 divides the test mesh) -- the layout a bigger-f
        # deployment would use
        state = replicate(state, mesh)
        k = state.params["patch_classifier"]["Dense_0"]["kernel"]
        sharded = NamedSharding(mesh, P("data", None))
        params = jax.tree_util.tree_map(lambda x: x, state.params)
        params["patch_classifier"]["Dense_0"]["kernel"] = jax.device_put(
            k, sharded)
        return state.replace(params=params), sharded

    state = create_train_state(g, jax.random.key(0), X[:1], tx)
    state, sharded = shard_first_kernel(state)
    save_checkpoint_orbax(tmp_path / "ckpt", state)

    template, _ = shard_first_kernel(
        create_train_state(g, jax.random.key(9), X[:1], tx))
    restored = restore_checkpoint_orbax(tmp_path / "ckpt", template)

    k = restored.params["patch_classifier"]["Dense_0"]["kernel"]
    assert k.sharding == sharded and not k.sharding.is_fully_replicated
    b = restored.params["patch_classifier"]["Dense_0"]["bias"]
    assert b.sharding.is_fully_replicated
    assert len(b.sharding.device_set) == len(jax.devices())
    for a, want in zip(jax.tree_util.tree_leaves(restored.params),
                       jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(want))


def test_async_checkpoint_writer(tmp_path):
    """Coalesced background writes: the last enqueued state per path lands
    on disk; wait() surfaces background failures."""
    from gridnext_tpu.train.async_ckpt import AsyncCheckpointWriter
    from gridnext_tpu.train.loops import load_checkpoint

    X, _ = _grid_data()
    f = CountMLP(n_classes=3)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    tx = make_gridwise_optimizer(1e-3)
    states = [create_train_state(g, jax.random.key(k), X[:1], tx)
              for k in range(3)]
    states = [s.replace(step=jnp.asarray(i)) for i, s in enumerate(states)]

    writer = AsyncCheckpointWriter()
    for s in states:               # rapid-fire: later enqueues may coalesce
        writer.save(tmp_path / "ck.msgpack", s)
    writer.wait()
    payload = load_checkpoint(tmp_path / "ck.msgpack")
    assert payload["step"] == 2    # the LAST state is what's on disk
    want = jax.device_get(states[2].params)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(payload["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    writer.save(tmp_path / "no_such_dir" / "x.msgpack", states[0])
    with pytest.raises(OSError):
        writer.wait()
    writer.close()

    # fail FAST: a background failure surfaces at the NEXT save (within an
    # epoch), not only at the end-of-training drain
    writer2 = AsyncCheckpointWriter()
    writer2.save(tmp_path / "also_missing" / "x.msgpack", states[0])
    with writer2._cv:
        while writer2._pending or writer2._in_flight:
            writer2._cv.wait()
    with pytest.raises(OSError):
        writer2.save(tmp_path / "ck2.msgpack", states[0])
    writer2.close()


def test_streaming_dataset_matches_materialized(tmp_path):
    """Subset-streamed training == materialized-array training, bit for bit.

    _iter_batches draws the same permutation for both loader forms, so the
    streamed path (train-image's RAM-bound fix) must be numerically
    identical to the materialized one.
    """
    import jax
    import numpy as np

    from gridnext_tpu.data import Subset, create_visium_dataset, simulate_spaceranger_dir
    from gridnext_tpu.models import CountMLP, GridNetHex
    from gridnext_tpu.train import train_gridwise

    sims = [simulate_spaceranger_dir(tmp_path / f"a{i}", seed=i, n_genes=20,
                                     n_classes=3) for i in range(3)]
    gdat = create_visium_dataset([s["spaceranger_dir"] for s in sims],
                                 use_count=True, use_image=False, spatial=True,
                                 annot_files=[s["annot_file"] for s in sims],
                                 minimum_detection_rate=None)
    log1p = np.log1p
    Xg, Yg = gdat.materialize()
    Xg = log1p(Xg)

    g = GridNetHex(patch_classifier=CountMLP(n_classes=3), n_classes=3)
    kw = dict(num_epochs=2, verbose=False, rng=jax.random.key(0))
    state_mat, val_m, _ = train_gridwise(
        g, {"train": (Xg[:2], Yg[:2]), "val": (Xg[2:], Yg[2:])}, **kw)
    state_str, val_s, _ = train_gridwise(
        g, {"train": Subset(gdat, [0, 1], log1p),
            "val": Subset(gdat, [2], log1p)}, **kw)
    np.testing.assert_allclose(val_m, val_s, rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
                 jax.device_get(state_mat.params),
                 jax.device_get(state_str.params))


def test_all_fgd_predictions_remainder_batch():
    """batch_size that doesn't divide N: padded, not recompiled; same output."""
    import jax
    import numpy as np

    from gridnext_tpu.evaluate import all_fgd_predictions
    from gridnext_tpu.models import CountMLP, GridNetHex

    rng = np.random.default_rng(0)
    X = rng.normal(size=(3, 8, 6, 10)).astype(np.float32)
    Y = rng.integers(0, 4, size=(3, 8, 6))
    g = GridNetHex(patch_classifier=CountMLP(n_classes=3), n_classes=3)
    variables = g.init(jax.random.key(0), X[:1])

    ref = all_fgd_predictions((X, Y), g, variables, batch_size=1)
    out = all_fgd_predictions((X, Y), g, variables, batch_size=2)  # 2 + 1 pad
    for a, b in zip(ref, out):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    # return_grids: unflattened per-array (label, softmax) pairs whose
    # foreground flattening reproduces the flat outputs exactly -- and the
    # remainder-batch PAD rows must not leak extra grids
    *out2, grids = all_fgd_predictions((X, Y), g, variables, batch_size=2,
                                       return_grids=True)
    for a, b in zip(out, out2):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    assert len(grids) == 3
    from gridnext_tpu.evaluate import flatten_foreground

    flat_s, flat_t = zip(*(flatten_foreground(s, y) for y, s in grids))
    np.testing.assert_allclose(np.concatenate(flat_s), out2[2],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.concatenate(flat_t), out2[0])


def test_count_frame_cache_invalidates_on_rewrite(tmp_path):
    import gzip
    import os
    import time

    from gridnext_tpu.data.datasets import _read_count_frame

    path = str(tmp_path / "c.unified.tsv.gz")

    def write(vals):
        with gzip.open(path, "wt") as fh:
            fh.write("Gene\t0_0\t1_1\n")
            for i, v in enumerate(vals):
                fh.write(f"G{i}\t{v}\t{v + 1}\n")

    write([1, 2])
    f1 = _read_count_frame(path)
    assert f1.iloc[0, 0] == 1
    time.sleep(0.01)
    write([5, 6])
    f2 = _read_count_frame(path)
    assert f2.iloc[0, 0] == 5, "stale cached frame served after rewrite"


def test_resume_reproduces_uninterrupted_run(tmp_path):
    """Train 2 epochs, resume to 4 == train 4 straight (VERDICT r2 #5):
    bit-identical metric tail and final params, including optimizer state
    round-trip, shuffle-RNG fast-forward, and best-val carry-over."""
    import optax

    from gridnext_tpu.models import CountMLP, GridNetHex
    from gridnext_tpu.train import create_train_state, train_gridwise

    rng = np.random.default_rng(11)
    b, h, w, genes, classes = 6, 12, 8, 16, 4
    x = rng.normal(size=(b, h, w, genes)).astype(np.float32)
    y = rng.integers(0, classes + 1, size=(b, h, w)).astype(np.int64)
    dls = {"train": (x[:4], y[:4]), "val": (x[4:], y[4:])}

    def fresh():
        g = GridNetHex(patch_classifier=CountMLP(n_classes=classes),
                       n_classes=classes)
        tx = optax.adam(1e-3)
        state = create_train_state(g, jax.random.key(0), jnp.asarray(x[:1]), tx)
        return g, tx, state

    # uninterrupted 4 epochs
    g, tx, state = fresh()
    out_a = tmp_path / "a.msgpack"
    s4, vh4, th4 = train_gridwise(g, dls, state=state, tx=tx, num_epochs=4,
                                  batch_size=2, outfile=str(out_a),
                                  verbose=False)

    # 2 epochs, "crash", resume to 4 from the .latest checkpoint
    g, tx, state = fresh()
    out_b = tmp_path / "b.msgpack"
    _, vh2, th2 = train_gridwise(g, dls, state=state, tx=tx, num_epochs=2,
                                 batch_size=2, outfile=str(out_b),
                                 verbose=False)
    g, tx, state = fresh()  # new process: template state only
    sr, vhr, thr = train_gridwise(g, dls, state=state, tx=tx, num_epochs=4,
                                  batch_size=2, outfile=str(out_b),
                                  resume=str(out_b) + ".latest", verbose=False)

    np.testing.assert_array_equal(th4, th2 + thr)
    np.testing.assert_array_equal(vh4, vh2 + vhr)
    for a, b_ in zip(jax.tree_util.tree_leaves(s4.params),
                     jax.tree_util.tree_leaves(sr.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_mse_padding_integer_targets_stay_masked():
    """Partial-batch padding with integer regression targets: np.nan cast
    into int64 silently becomes INT64_MIN, which isfinite() would treat as
    a VALID row and poison the loss with ~(9.2e18)^2 on every remainder
    batch. _pad_batch must promote integer spot_mse targets to float."""
    from gridnext_tpu.train.loops import _pad_batch, _spot_mse

    x = np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32)
    y = np.arange(6, dtype=np.int64).reshape(3, 2)    # integer targets
    xp, yp = _pad_batch(x, y, 8, "spot_mse")
    assert len(yp) == 8 and np.issubdtype(yp.dtype, np.floating)
    assert np.isnan(yp[3:]).all()                      # pads ARE masked
    loss, _, n = _spot_mse(jnp.zeros((8, 2)), jnp.asarray(yp))
    assert int(n) == 3
    assert np.isfinite(float(loss))
    # == unpadded mean over the real rows
    want = np.mean((0.0 - y.astype(np.float32)) ** 2)
    np.testing.assert_allclose(float(loss), want, rtol=1e-6)


def test_train_spotwise_mse_integer_targets_nondivisible():
    """End-to-end: loss='mse' with int targets and len % batch_size != 0
    must produce finite losses (the reproduced round-3 review bug)."""
    rng = np.random.default_rng(1)
    X = rng.normal(size=(7, 5)).astype(np.float32)
    Y = rng.integers(0, 4, size=(7, 2))               # int64 targets
    model = CountMLP(n_classes=2, hidden=(8, 8, 8, 8))
    state, _, train_hist = train_spotwise(
        model, {"train": (X, Y), "val": None}, loss="mse",
        num_epochs=2, batch_size=4, verbose=False)
    assert len(train_hist) == 2
    assert all(np.isfinite(v) for v in train_hist)


def test_pad_batch_unsigned_labels_cast_signed():
    """-1 pad markers need a signed dtype: uint8 labels must not wrap to a
    'valid' class 255 (NumPy 1.x) or raise (2.x)."""
    import numpy as np

    from gridnext_tpu.train.loops import _pad_batch

    x = np.zeros((3, 4), np.float32)
    y = np.array([1, 2, 3], np.uint8)
    xp, yp = _pad_batch(x, y, 5, "spot")
    assert np.issubdtype(yp.dtype, np.signedinteger)
    assert list(yp) == [1, 2, 3, -1, -1]
    # full batches cast too: one label dtype (= one trace) per epoch
    _, yf = _pad_batch(x, y, 3, "spot")
    assert np.issubdtype(yf.dtype, np.signedinteger)


def test_empty_val_split_does_not_pin_best():
    """A zero-item val loader must not fabricate a 0.0 'best' loss."""
    import jax
    import numpy as np

    from gridnext_tpu.models import CountMLP
    from gridnext_tpu.train import train_spotwise

    X = np.random.default_rng(0).normal(size=(8, 6)).astype(np.float32)
    y = np.arange(8) % 3
    dls = {"train": (X, y), "val": (X[:0], y[:0])}
    state, val_hist, train_hist = train_spotwise(
        CountMLP(n_classes=3), dls, num_epochs=2, batch_size=4,
        verbose=False)
    assert val_hist == []           # no fake 0.0 entries
    assert len(train_hist) == 2


def test_sample_input_prefers_sample_item():
    """Model-init sampling uses the cheap sample_item() hook (a full
    __getitem__ on a streaming image grid costs ~3k JPEG decodes)."""
    import numpy as np

    from gridnext_tpu.data.datasets import Subset
    from gridnext_tpu.train.loops import _sample_input

    class Lazy:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            raise AssertionError("expensive __getitem__ must not run")

        def sample_item(self):
            return np.zeros((3, 4), np.float32)

    out = _sample_input(Lazy())
    assert out.shape == (1, 3, 4)
    # streaming Subset views sample through the backing dataset + transform
    sub = Subset(Lazy(), [0], transform=lambda x: x[:2])
    assert _sample_input(sub).shape == (1, 2, 4)


def test_orbax_overwrite_is_atomic_swap(tmp_path):
    """Overwriting an orbax checkpoint writes beside and renames: no
    force=True pre-delete window where the only checkpoint is gone, and no
    tmp/old droppings remain."""
    import os

    import jax
    import numpy as np
    import optax
    import pytest

    pytest.importorskip("orbax.checkpoint")
    from gridnext_tpu.models import CountMLP
    from gridnext_tpu.train import create_train_state
    from gridnext_tpu.train.orbax_io import (restore_checkpoint_orbax,
                                             save_checkpoint_orbax)
    import jax.numpy as jnp

    f = CountMLP(n_classes=3)
    s1 = create_train_state(f, jax.random.key(0), jnp.zeros((1, 6)),
                            optax.adam(1e-3))
    s2 = create_train_state(f, jax.random.key(1), jnp.zeros((1, 6)),
                            optax.adam(1e-3))
    path = tmp_path / "ckpt"
    save_checkpoint_orbax(path, s1)
    save_checkpoint_orbax(path, s2)          # overwrite
    restored = restore_checkpoint_orbax(path, s1)
    for a, b in zip(jax.tree_util.tree_leaves(s2.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    leftovers = [d for d in os.listdir(tmp_path)
                 if ".tmp-" in d or ".old-" in d]
    assert not leftovers


def test_async_checkpoint_writer_failure_handling(tmp_path):
    """Two distinct background failures both surface (first raised, second
    as a note), and close() after a failure still stops + joins the worker
    instead of leaking a thread parked in cv.wait()."""
    from gridnext_tpu.train.async_ckpt import AsyncCheckpointWriter

    X, _ = _grid_data()
    f = CountMLP(n_classes=3)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    tx = make_gridwise_optimizer(1e-3)
    state = create_train_state(g, jax.random.key(0), X[:1], tx)

    writer = AsyncCheckpointWriter()
    writer.save(tmp_path / "missing_a" / "x.msgpack", state)
    with writer._cv:                     # let the first failure record
        while writer._pending or writer._in_flight:
            writer._cv.wait()
    with writer._cv:                     # inject a second distinct failure
        writer._errors.append(RuntimeError("second write failed"))
    with pytest.raises(OSError) as exc_info:
        writer.close()
    notes = getattr(exc_info.value, "__notes__", [])
    assert any("second write failed" in n for n in notes)
    assert not writer._errors            # nothing silently retained
    # the worker must be stopped and joined despite the raise
    assert writer._stop
    assert writer._thread is None or not writer._thread.is_alive()
    # and a post-close wait() reports clean (no stale error state)
    writer.wait()


def test_load_f_params_carries_extra_collections():
    """A Performer/scBERT f's 'favor' projections must travel into the
    composed g state with the params -- the trained f weights were
    validated against THOSE projections, not g-init's fresh draw."""
    from gridnext_tpu.models import scBERT
    from gridnext_tpu.train import load_f_params

    f = scBERT(n_genes=12, dim=8, depth=1, heads=2, n_classes=3)
    xs = jnp.zeros((2, 12), jnp.float32)
    fv = f.init({"params": jax.random.key(1), "favor": jax.random.key(2)}, xs)

    g = GridNetHex(patch_classifier=f, n_classes=3)
    tx = make_gridwise_optimizer(1e-3)
    xg = jnp.zeros((1, 4, 4, 12), jnp.float32)
    state = create_train_state(
        g, {"params": jax.random.key(3), "favor": jax.random.key(4)}, xg, tx)

    assert "favor" in (state.extra_vars or {})  # the collection exists at init
    state2 = load_f_params(state, fv)
    got = jax.tree_util.tree_leaves(
        state2.extra_vars["favor"]["patch_classifier"])
    want = jax.tree_util.tree_leaves(fv["favor"])
    init = jax.tree_util.tree_leaves(
        state.extra_vars["favor"]["patch_classifier"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(want, init))    # f's draw differs from g-init's
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # params still load as before
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(
            state2.params["patch_classifier"])[0]),
        np.asarray(jax.tree_util.tree_leaves(fv["params"])[0]))


def test_all_fgd_predictions_forward_cache():
    """Repeated calls with the same model reuse one jitted forward (the CLI
    evaluates per array in a loop; each call used to re-trace + recompile)."""
    from gridnext_tpu.evaluate import _forward_fn, all_fgd_predictions

    f = CountMLP(n_classes=3)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    assert _forward_fn(g, None) is _forward_fn(g, None)
    assert _forward_fn(g, None) is not _forward_fn(g, "patch_predictions")

    X = np.random.default_rng(0).normal(size=(2, 4, 4, 5)).astype(np.float32)
    Y = np.ones((2, 4, 4), np.int64)
    tx = make_gridwise_optimizer(1e-3)
    state = create_train_state(g, jax.random.key(0), jnp.asarray(X[:1]), tx)
    yt, yp, ys = all_fgd_predictions((X, Y), g, state.variables())
    assert yt.shape == (32,) and ys.shape == (32, 3)


def test_resolve_mesh_rejects_both_args():
    import pytest

    from gridnext_tpu.train.loops import _resolve_mesh

    with pytest.raises(ValueError, match="not both"):
        _resolve_mesh("auto", {"data": 8})
