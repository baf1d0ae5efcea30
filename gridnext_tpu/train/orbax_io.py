"""Optional orbax-backed checkpointing for TrainState.

The default checkpoint format is flax-msgpack (train.loops.save_checkpoint)
-- single file, dependency-free. This adapter offers the same TrainState
round-trip through orbax (async-capable, directory-per-step layout) for
deployments standardized on it. orbax is an optional dependency; functions
raise a clear ImportError when absent.
"""

from __future__ import annotations

import jax

from gridnext_tpu.train.loops import TrainState


def _require_orbax():
    try:
        import orbax.checkpoint as ocp
        return ocp
    except ImportError as e:
        raise ImportError("orbax checkpointing requires the optional "
                          "'orbax-checkpoint' package") from e


class _SwappingCheckpointer:
    """Async-save handle that atomically swaps the finished checkpoint into
    place on ``wait_until_finished()`` (write-then-rename; see
    :func:`save_checkpoint_orbax`)."""

    def __init__(self, ckptr, swap):
        self._ckptr = ckptr
        self._swap = swap
        self._swapped = False

    def wait_until_finished(self):
        self._ckptr.wait_until_finished()
        if not self._swapped:
            self._swap()
            self._swapped = True

    def close(self):
        self.wait_until_finished()
        self._ckptr.close()


def save_checkpoint_orbax(path, state: TrainState, *, block: bool = True):
    """Write a TrainState to ``path`` (a directory) via orbax.

    Overwrites are ATOMIC-replACE, like the msgpack path (loops.py
    save_checkpoint): the new checkpoint is written to a sibling tmp
    directory and renamed over ``path`` only once complete. (orbax's own
    ``force=True`` deletes the existing directory BEFORE writing the new
    one -- a crash in that window would lose the only checkpoint, which is
    unacceptable for the periodic-overwrite '.latest' pattern.)

    ``block=False`` uses orbax's asynchronous machinery (StandardCheckpointer
    is an AsyncCheckpointer): device arrays are passed through un-fetched so
    the device->host transfer and disk write happen in the background while
    training continues -- the right default for mesh runs, where stalling
    every chip on a serial host write wastes the whole slice. Returns a
    handle; the caller must call ``wait_until_finished()`` (which performs
    the atomic swap) and ``close()`` before relying on the files. With
    ``block=True`` (default) everything is on disk when this returns and
    None is returned.
    """
    import os
    import shutil

    ocp = _require_orbax()
    payload = {
        # device arrays pass through as-is: orbax fetches them itself,
        # off-thread when async
        "params": state.params,
        "batch_stats": state.batch_stats,
        "extra_vars": state.extra_vars,
        "opt_state": state.opt_state,
        "step": jax.device_get(state.step),
    }
    final = os.path.abspath(str(path))
    tmp = f"{final}.tmp-{os.getpid()}"
    if os.path.isdir(tmp):          # leftover from a killed earlier attempt
        shutil.rmtree(tmp)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp, payload)        # fresh dir: no force, no pre-delete

    def swap():
        old = f"{final}.old-{os.getpid()}"
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.isdir(old):
            shutil.rmtree(old)

    if block:
        ckptr.wait_until_finished()
        swap()
        ckptr.close()
        return None
    return _SwappingCheckpointer(ckptr, swap)


def _abstract_leaf(leaf):
    """Template leaf -> restore spec. jax.Array leaves become abstract
    ShapeDtypeStructs CARRYING THEIR SHARDING, so orbax materializes each
    restored array directly on device with the template's layout -- for a
    mesh TrainState (replicated DP state, or explicitly sharded params for
    larger f's) that means no host-numpy round-trip and no post-restore
    device_put/reshard. Host (numpy/python) leaves restore as host values,
    preserving the old behavior for single-device templates."""
    if isinstance(leaf, jax.Array):
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                    sharding=leaf.sharding)
    return leaf


def restore_checkpoint_orbax(path, state_template: TrainState) -> TrainState:
    """Restore a TrainState saved by :func:`save_checkpoint_orbax`.

    ``state_template`` (a freshly created state for the same model+optimizer)
    provides the tree structure, dtypes, AND device placement: leaves that
    are device arrays restore straight onto their template sharding (see
    :func:`_abstract_leaf`), so a mesh-sharded training state round-trips
    without resharding.
    """
    import os

    ocp = _require_orbax()
    template = jax.tree_util.tree_map(_abstract_leaf, {
        "params": state_template.params,
        "batch_stats": state_template.batch_stats,
        "extra_vars": state_template.extra_vars,
        "opt_state": state_template.opt_state,
    })
    template["step"] = jax.device_get(state_template.step)
    with ocp.StandardCheckpointer() as ckptr:
        payload = ckptr.restore(os.path.abspath(str(path)), template)
    return state_template.replace(
        params=payload["params"], batch_stats=payload["batch_stats"],
        extra_vars=payload["extra_vars"], opt_state=payload["opt_state"],
        step=payload["step"])
