"""Worker for tests/test_multihost.py's real 2-process cluster test.

Launched twice (process_id 0 and 1), each with 4 virtual CPU devices; the
two join one jax.distributed cluster (global mesh {'data': 4, 'spot': 2}
over 8 devices, the 'data' axis spanning the processes) and run the public
``make_steps`` gridwise train step twice, through BOTH batch-placement
paths:

  * replicated-host: every process assembles the identical global batch and
    ``shard_grid_batch`` places it (the path the unmodified trainers use);
  * process-local IO: each process passes only its ``local_shard_indices``
    rows through ``global_grid_batch``.

Prints one JSON line with the per-step losses of both paths and a param
checksum; the parent test pins them equal to a single-process unsharded
run. Usage: _multihost_worker.py <coordinator> <num_processes> <process_id>
"""

import json
import os
import sys

# 4 local CPU devices per process, BEFORE any jax backend init.
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # beat any sitecustomize override

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gridnext_tpu.parallel import (  # noqa: E402
    global_grid_batch,
    initialize_multihost,
    local_shard_indices,
    make_mesh,
    replicate,
    shard_grid_batch,
)
from tests._multihost_case import REFERENCE_CASE  # noqa: E402


def main():
    coord, num, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    initialize_multihost(coordinator_address=coord, num_processes=num,
                         process_id=pid, initialization_timeout=60)
    assert jax.process_count() == num, jax.process_count()
    assert len(jax.devices()) == 4 * num, len(jax.devices())

    state0, tx, train_step, (x, y) = REFERENCE_CASE()
    # All 8 global devices: 'data' leads, so its shards 0-1 land on process
    # 0 and 2-3 on process 1 (jax.devices() orders by process); 'spot'
    # stays within-process.
    mesh = make_mesh({"data": 4, "spot": 2})
    assert mesh.devices.size == 4 * num

    out = {"process": pid, "losses": {}}
    for path in ("replicated", "local"):
        state = replicate(state0, mesh)
        losses = []
        for _ in range(2):
            if path == "replicated":
                xb, yb = shard_grid_batch((x, y), mesh)
            else:
                rows = local_shard_indices(len(x))
                xb, yb = global_grid_batch(
                    (x[rows.start:rows.stop], y[rows.start:rows.stop]), mesh)
            state, m = train_step(state, xb, yb)
            losses.append(float(m["loss"]))
        out["losses"][path] = losses
        out.setdefault("psum", {})[path] = float(
            sum(float(jax.numpy.sum(p)) for p in jax.tree.leaves(state.params)))

    # A user-ordered mesh that puts the batch ('data') axis WITHIN a
    # process must fail loudly in the process-local path (ADVICE r3) --
    # not surface as an opaque shape error or silent row misplacement.
    bad_mesh = make_mesh({"spot": 2, "data": 4})
    rows = local_shard_indices(len(x))
    try:
        global_grid_batch((x[rows.start:rows.stop], y[rows.start:rows.stop]),
                          bad_mesh)
        out["bad_mesh_raised"] = False
    except ValueError as e:
        out["bad_mesh_raised"] = "process" in str(e) and "data=N" in str(e)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
