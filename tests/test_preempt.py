"""Preemption-safe training: SIGTERM -> batch-boundary checkpoint -> resume.

The reference has no elastic-recovery story (SURVEY §5.3 "absent"; its
training.py cannot resume at all). Ours: train/preempt.py + the trainers'
batch-boundary guard polls + ``batches_done`` mid-epoch resume. The
contract pinned here: a preempted-then-resumed run's PARAMETER TRAJECTORY
is bit-identical to an uninterrupted run (the interrupted epoch's logged
train metrics cover only the post-resume batches, by design)."""

import signal

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gridnext_tpu.models import CountMLP, GridNetHex
from gridnext_tpu.train import (
    TrainingPreempted,
    create_train_state,
    load_checkpoint,
    train_gridwise,
)
from gridnext_tpu.train.preempt import (
    active,
    install_preemption_handler,
    uninstall_preemption_handler,
)


class _TriggerDataset:
    """Map-style (x, y) dataset that trips the guard at the Nth item access
    (0 disables) -- a deterministic stand-in for SIGTERM arriving mid-epoch."""

    def __init__(self, x, y, trigger_at=0):
        self.x, self.y = x, y
        self.trigger_at = trigger_at
        self.accesses = 0

    def __len__(self):
        return len(self.y)

    def __getitem__(self, i):
        self.accesses += 1
        if self.trigger_at and self.accesses == self.trigger_at:
            active().trigger()
        return self.x[i], self.y[i]


@pytest.fixture
def guard():
    g = install_preemption_handler()
    g.reset()
    yield g
    uninstall_preemption_handler()


def _data(classes=4):
    rng = np.random.default_rng(11)
    b, h, w, genes = 10, 12, 8, 16
    x = rng.normal(size=(b, h, w, genes)).astype(np.float32)
    y = rng.integers(0, classes + 1, size=(b, h, w)).astype(np.int64)
    return x, y


def _fresh(x, classes=4):
    g = GridNetHex(patch_classifier=CountMLP(n_classes=classes),
                   n_classes=classes)
    tx = optax.adam(1e-3)
    state = create_train_state(g, jax.random.key(0), jnp.asarray(x[:1]), tx)
    return g, tx, state


def _run(x, y, outfile, *, trigger_at=0, val_trigger_at=0, resume=None,
         num_epochs=3, mesh_shape=None):
    train = _TriggerDataset(x[:8], y[:8], trigger_at)
    val = _TriggerDataset(x[8:], y[8:], val_trigger_at)
    g, tx, state = _fresh(x)
    return train_gridwise(g, {"train": train, "val": val}, state=state,
                          tx=tx, num_epochs=num_epochs, batch_size=2,
                          outfile=str(outfile), resume=resume, verbose=False,
                          mesh_shape=mesh_shape)


def test_midepoch_preempt_resume_matches_uninterrupted(tmp_path, guard):
    x, y = _data()
    s3, vh3, th3 = _run(x, y, tmp_path / "a.msgpack")

    # preempt mid-epoch-1 (trigger during the epoch's 2nd/3rd batch staging)
    out = tmp_path / "b.msgpack"
    with pytest.raises(TrainingPreempted) as ei:
        _run(x, y, out, trigger_at=8 + 3)
    ckpt = ei.value.checkpoint
    assert ckpt == str(out) + ".latest"
    meta = load_checkpoint(ckpt)
    assert meta["epochs_done"] == 1
    assert 0 < meta["batches_done"] < 4      # genuinely mid-epoch

    guard.reset()
    sr, vhr, thr = _run(x, y, out, resume=ckpt)
    # parameter trajectory bit-identical to the uninterrupted run
    for a, b in zip(jax.tree_util.tree_leaves(s3.params),
                    jax.tree_util.tree_leaves(sr.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # epoch 1's resumed train metric covers only the remaining batches (by
    # design, not asserted); everything downstream matches exactly
    assert thr[1:] == th3[2:]
    assert vhr == vh3[1:]


def test_val_phase_preempt_skips_whole_train_on_resume(tmp_path, guard):
    x, y = _data()
    s3, vh3, th3 = _run(x, y, tmp_path / "a.msgpack")

    out = tmp_path / "b.msgpack"
    with pytest.raises(TrainingPreempted):
        # first val access of epoch 1 (epoch 0 val reads 2 items)
        _run(x, y, out, val_trigger_at=2 + 1)
    meta = load_checkpoint(str(out) + ".latest")
    assert meta["epochs_done"] == 1
    assert meta["batches_done"] == 4         # the full train phase

    guard.reset()
    sr, vhr, thr = _run(x, y, out, resume=str(out) + ".latest")
    for a, b in zip(jax.tree_util.tree_leaves(s3.params),
                    jax.tree_util.tree_leaves(sr.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # epoch 1 trained fully pre-preemption; resume re-runs only its val
    assert th3 == (np.asarray(th3[:2]).tolist() + thr)
    assert vhr == vh3[1:]


def test_midepoch_preempt_resume_on_mesh(tmp_path, guard):
    """Preempt + resume under the public mesh path: the replicated state
    checkpoints and restores onto the mesh, and the resumed trajectory is
    bit-identical to an UNINTERRUPTED mesh run (the mesh is the oracle:
    mesh-vs-single-device agreement is only approximate after many adam
    steps -- reduction-order noise amplifies chaotically -- and is
    certified separately in tests/test_parallel.py)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    x, y = _data()
    shape = {"data": 2, "spot": 2}
    s3, _, _ = _run(x, y, tmp_path / "a.msgpack", mesh_shape=shape)

    out = tmp_path / "b.msgpack"
    with pytest.raises(TrainingPreempted):
        _run(x, y, out, trigger_at=8 + 3, mesh_shape=shape)
    meta = load_checkpoint(str(out) + ".latest")
    assert meta["epochs_done"] == 1 and 0 < meta["batches_done"] < 4

    guard.reset()
    sr, _, _ = _run(x, y, out, resume=str(out) + ".latest", mesh_shape=shape)
    for a, b in zip(jax.tree_util.tree_leaves(s3.params),
                    jax.tree_util.tree_leaves(sr.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_preempt_checkpoint_is_mesh_portable(tmp_path, guard):
    """Elastic recovery across device counts: a job preempted on one mesh
    resumes on a DIFFERENT mesh (or a single device) -- params are
    replicated in the checkpoint and batches_done counts batches, so the
    resume position is device-layout-agnostic. (Exact numerics across
    layouts are NOT expected -- reduction order differs -- only that the
    right remaining work runs.)"""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    x, y = _data()
    out = tmp_path / "b.msgpack"
    with pytest.raises(TrainingPreempted):
        _run(x, y, out, trigger_at=8 + 3, mesh_shape={"data": 2, "spot": 2})
    import shutil

    preempted = tmp_path / "preempted.ckpt"   # resumes overwrite '.latest'
    shutil.copy(str(out) + ".latest", preempted)
    meta = load_checkpoint(str(preempted))
    assert 0 < meta["batches_done"] < 4

    # resume layouts: single device, and a different mesh factorization
    # (the data axis must still divide batch_size=2)
    for i, shape in enumerate((None, {"data": 2, "spot": 4})):
        guard.reset()
        sr, vhr, thr = _run(x, y, tmp_path / f"r{i}.msgpack",
                            resume=str(preempted), mesh_shape=shape)
        assert int(sr.step) == 3 * 4         # full run's step count
        assert len(vhr) == 2 and len(thr) == 2
        assert all(np.isfinite(v) for v in vhr + thr)


def test_midepoch_resume_rejects_changed_batch_size(tmp_path, guard):
    """batches_done is in batch units: resuming with a different batch size
    (or shuffle seed) would silently train the wrong samples -- hard error."""
    x, y = _data()
    out = tmp_path / "b.msgpack"
    with pytest.raises(TrainingPreempted):
        _run(x, y, out, trigger_at=8 + 3)
    guard.reset()

    train = _TriggerDataset(x[:8], y[:8])
    g, tx, state = _fresh(x)
    with pytest.raises(ValueError, match="batch_size"):
        train_gridwise(g, {"train": train}, state=state, tx=tx,
                       num_epochs=3, batch_size=4, verbose=False,
                       resume=str(out) + ".latest")
    with pytest.raises(ValueError, match="shuffle_seed"):
        train_gridwise(g, {"train": train}, state=state, tx=tx,
                       num_epochs=3, batch_size=2, shuffle_seed=9,
                       verbose=False, resume=str(out) + ".latest")


def test_real_sigterm_sets_the_guard(guard):
    assert not guard.triggered
    signal.raise_signal(signal.SIGTERM)
    assert guard.triggered
    guard.reset()


def test_cli_train_count_preempts_with_exit_75_and_resumes(tmp_path, guard):
    """Pre-triggered guard -> train-count exits 75 with a '.latest' on disk;
    guard reset + --resume completes and saves the model."""
    from gridnext_tpu.cli import main

    sim = tmp_path / "sim"
    main(["simulate", "--out", str(sim), "--arrays", "2", "--genes", "12",
          "--classes", "3"])
    dirs = [str(sim / a) for a in ("a0", "a1")]
    annots = [str(sim / a / f"{a}_annotations.csv") for a in ("a0", "a1")]
    argv = ["train-count", "--spaceranger", *dirs, "--annots", *annots,
            "--out", str(tmp_path / "model"), "--epochs", "2"]

    guard.trigger()                      # SIGTERM already pending at start
    with pytest.raises(SystemExit) as ei:
        main(argv)
    assert ei.value.code == 75
    assert (tmp_path / "model" / "f_state.msgpack.latest").exists()

    guard.reset()
    main(argv + ["--resume"])
    assert (tmp_path / "model" / "model.json").exists()


def test_repeated_install_hooks_new_signals():
    """A second install_preemption_handler call naming additional signals
    must hook them (previously silently dropped once a guard existed)."""
    import signal

    from gridnext_tpu.train.preempt import (install_preemption_handler,
                                            uninstall_preemption_handler)

    try:
        g1 = install_preemption_handler((signal.SIGTERM,))
        g2 = install_preemption_handler((signal.SIGTERM, signal.SIGUSR1))
        assert g1 is g2
        assert signal.getsignal(signal.SIGUSR1) == g1.trigger
        # double-trigger is safe (plain flag, no Event lock re-entry)
        g1.trigger()
        g1.trigger()
        assert g1.triggered
        g1.reset()
    finally:
        uninstall_preemption_handler()
    assert signal.getsignal(signal.SIGUSR1) in (signal.SIG_DFL,
                                                signal.Handlers.SIG_DFL)


def test_preempt_trigger_is_consumed_by_the_raise(tmp_path, guard):
    """The latched trigger belongs to the run it preempted: after
    TrainingPreempted, an in-process resume must run to completion instead
    of re-preempting after one batch per phase forever."""
    x, y = _data()
    out = tmp_path / "consume.msgpack"
    with pytest.raises(TrainingPreempted):
        _run(x, y, out, trigger_at=8 + 3)
    assert not guard.triggered          # consumed by the raise, not by tests
    state, vh, th = _run(x, y, out, resume=str(out) + ".latest")
    # resumed mid-epoch-1: epochs 1..2 run to completion (2 val entries);
    # before the consume fix this raised TrainingPreempted again instead
    assert len(vh) == 2
