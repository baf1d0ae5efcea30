"""Multi-controller (pod-slice) support: parallel/multihost.py.

The capstone test spawns a REAL 2-process jax.distributed cluster over
localhost (4 virtual CPU devices each -> a global 8-device {'data': 4,
'spot': 2} mesh whose 'data' axis spans the processes) and pins the public
train step's trajectory -- through both the replicated-host and the
process-local-IO batch placements -- to the single-process unsharded run.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridnext_tpu.parallel import (
    global_grid_batch,
    global_spot_batch,
    is_primary,
    local_shard_indices,
    make_mesh,
    shard_grid_batch,
    shard_spot_batch,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest sets host device count)")
    return jax.devices()[:8]


def test_local_shard_indices_partition():
    for n in (0, 1, 7, 8, 12, 4992):
        for count in (1, 2, 3, 8):
            shards = [local_shard_indices(n, index=i, count=count)
                      for i in range(count)]
            flat = [j for r in shards for j in r]
            assert flat == list(range(n))  # cover, in order, disjoint
            sizes = [len(r) for r in shards]
            assert max(sizes) - min(sizes) <= 1  # balanced
    assert list(local_shard_indices(5)) == list(range(5))  # single-process
    with pytest.raises(ValueError):
        local_shard_indices(5, index=2, count=2)


def test_single_process_is_primary():
    assert is_primary()


def test_global_batches_match_device_put_path(eight_devices):
    """Single-process degenerate case: the process-local constructors (full
    local data) must produce exactly what the device_put path produces --
    values AND shardings -- for grid, spot, and odd-H-fallback layouts."""
    mesh = make_mesh({"data": 4, "spot": 2}, eight_devices)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 16, 8, 3)).astype(np.float32)
    y = rng.integers(0, 4, size=(8,)).astype(np.int64)

    for build, ref in ((global_grid_batch, shard_grid_batch),
                       (global_spot_batch, shard_spot_batch)):
        got = build((x, y), mesh)
        want = ref((jnp.asarray(x), jnp.asarray(y)), mesh)
        for g, w in zip(got, want):
            assert g.sharding == w.sharding, (g.sharding, w.sharding)
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    # odd H: both paths fall back to data-only sharding identically
    x_odd = x[:, :15]
    with pytest.warns(UserWarning, match="not divisible"):
        want = shard_grid_batch(jnp.asarray(x_odd), mesh)
    got = global_grid_batch(x_odd, mesh)
    assert got.sharding == want.sharding
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cli_multihost_flags_parse_and_validate():
    from gridnext_tpu.cli import _init_multihost, build_parser

    p = build_parser()
    a = p.parse_args(["--multihost", "train-count", "--spaceranger", "x",
                      "--annots", "y", "--out", "z"])
    assert a.multihost and a.coordinator is None  # bare flag, cmd survives
    a = p.parse_args(["--coordinator", "h:1234,2,0", "register", "--model",
                      "m", "--spaceranger", "s", "--out", "o"])
    assert a.coordinator == "h:1234,2,0"
    # malformed hand-wired spec fails fast, before any cluster init
    with pytest.raises(SystemExit, match="--coordinator"):
        _init_multihost("not-a-spec")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cpu_cluster_matches_single_process(eight_devices):
    """Real multi-controller certification (see module docstring)."""
    from tests._multihost_case import REFERENCE_CASE

    # single-process unsharded reference trajectory
    state, _, train_step, (x, y) = REFERENCE_CASE()
    ref_losses = []
    for _ in range(2):
        state, m = train_step(state, jnp.asarray(x), jnp.asarray(y))
        ref_losses.append(float(m["loss"]))
    ref_psum = float(sum(float(jnp.sum(p))
                         for p in jax.tree.leaves(state.params)))

    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # keep the TPU-tunnel sitecustomize out of the workers; they pin cpu
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    worker = os.path.join(REPO, "tests", "_multihost_worker.py")
    procs = [subprocess.Popen(
                 [sys.executable, worker, coord, "2", str(pid)],
                 env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                 text=True)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for rec in outs:  # every process, both placement paths
        for path in ("replicated", "local"):
            np.testing.assert_allclose(rec["losses"][path], ref_losses,
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(rec["psum"][path], ref_psum,
                                       rtol=1e-5, atol=1e-5)
    # the two processes observed the identical replicated result
    assert outs[0]["losses"] == outs[1]["losses"]
    # misordered mesh (batch axis within-process) raised the loud
    # validation error on every process (ADVICE r3)
    assert all(rec["bad_mesh_raised"] is True for rec in outs)


def test_cli_multihost_rejected_for_non_trainer_subcommands():
    """--multihost outside the trainer subcommands would have every pod
    host write identical output paths concurrently; the CLI rejects it up
    front (ADVICE r3)."""
    from gridnext_tpu.cli import main

    with pytest.raises(SystemExit, match="training subcommands"):
        main(["--multihost", "register", "--model", "m",
              "--spaceranger", "s", "--out", "o"])
    with pytest.raises(SystemExit, match="training subcommands"):
        main(["--coordinator", "h:1,2,0", "evaluate", "--model", "m",
              "--spaceranger", "s", "--annots", "a", "--out", "o"])
