"""Multi-controller (multi-host pod-slice) execution support.

The reference is single-process, single-device (SURVEY.md section 2.3).
``parallel.mesh`` scales it to a single-controller device mesh; this module
extends the same programs to REAL pod slices (v5e-16 and beyond), where JAX
runs one Python process per host and every process sees the GLOBAL device
mesh but can address only its local chips.

Execution model (the standard JAX multi-controller recipe):

* Every process runs the IDENTICAL training program — same model, same
  shuffle RNG, same epoch structure. ``initialize_multihost()`` (a thin
  wrapper over ``jax.distributed.initialize``) wires the processes into one
  cluster; after it, ``jax.devices()`` is global and ``parallel.make_mesh``
  builds the global mesh unchanged.
* Batch placement: a host batch that is identical on every process may be
  placed with plain ``jax.device_put`` against a global-mesh
  ``NamedSharding`` — each process materializes only its addressable
  shards.  That is exactly what ``shard_grid_batch``/``shard_spot_batch``
  already do, so the single-controller trainers run unmodified; each
  process just pays the (host-side) cost of assembling the full batch.
* For IO-heavy pipelines (image patches at 128px, HD dense tiles) that
  redundancy is real money: ``local_shard_indices`` gives each process its
  slice of the batch to read from disk, and ``global_spot_batch`` /
  ``global_grid_batch`` assemble the global on-device array from the
  process-LOCAL rows via ``jax.make_array_from_process_local_data`` — no
  process ever touches another host's bytes.
* File outputs (checkpoints, metrics JSONL, Loupe CSVs) come from the
  PRIMARY process only (``is_primary``); on a shared filesystem every
  process writing the same path would race.  ``train/loops.py`` gates its
  checkpoint writer and metrics logger on this automatically.

Certified by ``tests/test_multihost.py``: a real 2-process CPU cluster
(``jax.distributed`` over localhost, 4 virtual devices per process) runs
the public ``make_steps`` train step over a global {'data': 2, 'spot': 2}
mesh and reproduces the single-process trajectory bit-for-bit, through
both the replicated-host and process-local-IO placement paths.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         local_device_ids: Optional[Sequence[int]] = None,
                         **kw) -> int:
    """Join this process to a multi-controller JAX cluster; return its index.

    Thin, idempotent wrapper over ``jax.distributed.initialize``: on Cloud
    TPU pods all arguments are discovered from the metadata server, so
    ``initialize_multihost()`` with no arguments is the normal call; on
    hand-wired clusters (including the CPU test cluster) pass
    ``coordinator_address='host:port'``, ``num_processes`` and
    ``process_id``.  Calling it when the cluster is already initialized
    (or on a single-process run that never initializes one) is a no-op.
    """
    if not jax.distributed.is_initialized():
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
            **kw)
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns file outputs (checkpoints, metrics,
    exported CSVs).  Always true single-process, so write-path code gated
    on it behaves identically outside a cluster."""
    return jax.process_index() == 0


def local_shard_indices(n_items: int,
                        index: Optional[int] = None,
                        count: Optional[int] = None) -> range:
    """This process's contiguous slice of ``range(n_items)``.

    Balanced partition (sizes differ by at most 1, earlier processes take
    the remainder) — the per-process read set for IO-sharded batch
    assembly.  ``index``/``count`` default to the live
    ``jax.process_index()``/``jax.process_count()`` so the same code runs
    unmodified single-process (where it returns the full range).
    """
    if count is None:
        count = jax.process_count()
    if index is None:
        index = jax.process_index()
    if not 0 <= index < count:
        raise ValueError(f"process index {index} outside [0, {count})")
    base, rem = divmod(n_items, count)
    start = index * base + min(index, rem)
    stop = start + base + (1 if index < rem else 0)
    return range(start, stop)


def _check_batch_axes_span_processes(mesh: Mesh, batch_axes) -> None:
    """Validate that the batch mesh axes partition processes contiguously.

    ``_from_local`` assumes each process's ``local_shard_indices`` row
    slice lands exactly on the batch-axis shards its own devices hold.
    That is true iff, raveling the device grid over ``batch_axes`` (in
    axis order), the device->process assignment is an ascending sequence
    of equal contiguous blocks. A user-ordered mesh like
    ``--mesh spot=2,data=4`` (dict order preserved by make_mesh) breaks
    it -- previously surfacing as an opaque
    make_array_from_process_local_data shape error or, worse, silently
    wrong row placement. Fail here with an actionable message instead.
    """
    n_proc = jax.process_count()
    if n_proc == 1:
        return
    names = list(mesh.axis_names)
    batch = [a for a in batch_axes if a in names]
    order = ([names.index(a) for a in batch]
             + [i for i, a in enumerate(names) if a not in batch])
    devs = np.transpose(mesh.devices, order)
    lead = int(np.prod([mesh.shape[a] for a in batch], dtype=int))
    devs = devs.reshape(lead, -1)
    procs = np.array([[d.process_index for d in row] for row in devs])
    slice_proc = procs[:, 0]
    problem = None
    if (procs != slice_proc[:, None]).any():
        problem = ("a batch-axis shard spans devices from different "
                   "processes")
    else:
        counts = np.bincount(slice_proc, minlength=n_proc)
        if (np.diff(slice_proc) < 0).any() or len(set(counts)) != 1:
            problem = ("the device->process assignment along the batch "
                       "axis is not an ascending sequence of equal "
                       "contiguous blocks")
    if problem:
        raise ValueError(
            f"mesh axes {dict(mesh.shape)} cannot assemble process-local "
            f"batches: {problem}. The batch axes {tuple(batch)} must span "
            "processes contiguously -- put the process-spanning ('data') "
            "axis FIRST in the mesh spec (make_mesh preserves axis order; "
            "e.g. use data=N,spot=M, not spot=M,data=N), or pass fully "
            "replicated host batches (shard_*_batch) instead of the "
            "global_*_batch path")


def _from_local(local_tree, mesh: Mesh, spec_fn):
    """Assemble global arrays from process-local rows.

    Each process passes only ITS rows of the batch (its
    ``local_shard_indices`` slice, in order); the result is the same
    global array the replicated-host path produces.  Requires the batch
    mesh axes to be the process-spanning ones — true for every mesh
    ``make_mesh`` builds on a pod, where ``jax.devices()`` orders devices
    by process and the leading ('data') axis therefore spans hosts —
    and VALIDATED per call by ``_check_batch_axes_span_processes``.
    """
    def place(x):
        spec = spec_fn(x)
        # the row/batch dim is dim 0: its spec entry (string or tuple of
        # axis names) is what must span processes contiguously
        first = spec[0] if len(spec) else None
        batch_axes = (tuple(first) if isinstance(first, (tuple, list))
                      else (first,) if first is not None
                      else tuple(mesh.axis_names))
        _check_batch_axes_span_processes(mesh, batch_axes)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(place, local_tree)


def global_spot_batch(local_tree, mesh: Mesh):
    """Process-local-IO counterpart of ``shard_spot_batch``: the item axis
    shards over every mesh axis; each process contributes the rows it
    loaded.  Per-process row counts must follow ``local_shard_indices`` of
    the GLOBAL batch size (itself divisible by ``mesh.size``)."""
    names = tuple(mesh.axis_names)
    return _from_local(local_tree, mesh, lambda x: P(names))


def global_grid_batch(local_tree, mesh: Mesh, data_axis: str = "data",
                      spot_axis: Optional[str] = "spot"):
    """Process-local-IO counterpart of ``shard_grid_batch``: batch dim over
    ``data`` (spanning processes), grid H over ``spot`` (within-process),
    with the same non-divisible-H fallback to data-only sharding."""
    spot = spot_axis if spot_axis in mesh.axis_names else None
    spot_n = mesh.shape[spot] if spot is not None else 1

    def spec(x):
        if x.ndim >= 2 and spot is not None and x.shape[1] % spot_n == 0:
            return P(data_axis, spot)
        return P(data_axis)

    return _from_local(local_tree, mesh, spec)
