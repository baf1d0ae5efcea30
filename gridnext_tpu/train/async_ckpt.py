"""Asynchronous checkpoint writes: the train loop never stalls on I/O.

``save_checkpoint`` blocks on ``jax.device_get`` (full params off-chip)
plus the msgpack disk write; at the trainers' every-epoch '.latest' cadence
that is dead device time -- the problem orbax's ``AsyncCheckpointer``
exists to solve. ``jax.Array``s are immutable, so a background thread can
fetch and serialize a snapshot *taken at enqueue time* while the main loop
keeps dispatching training steps; the write observes exactly the state
that was passed in, never a later one.

Per-path coalescing keeps at most one pending write per file: if epoch
N+1's '.latest' is enqueued while epoch N's still waits, epoch N's payload
is dropped -- its bytes on disk would be overwritten immediately anyway,
and a crash between the two leaves the epoch-N-1 file intact (writes stay
atomic via save_checkpoint's tmp+rename).

The reference has no analog: training.py:79-84,184-195 torch.saves
synchronously inside the epoch loop.
"""

from __future__ import annotations

import threading

from gridnext_tpu.train.loops import save_checkpoint


class AsyncCheckpointWriter:
    """Background checkpoint writer with per-path coalescing.

    Usage::

        writer = AsyncCheckpointWriter()
        writer.save(path, state, extra_meta={...})   # returns immediately
        ...
        writer.wait()   # block until all enqueued writes are on disk
    """

    def __init__(self):
        self._cv = threading.Condition()
        self._pending: dict = {}          # path -> (state, kwargs)
        self._in_flight: int = 0
        self._stop = False
        self._errors: list = []
        self._thread = None

    def _ensure_thread(self):
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()

    def _worker(self):
        while True:
            with self._cv:
                while not self._pending and not self._stop:
                    self._cv.wait()
                if self._stop and not self._pending:
                    return
                path = next(iter(self._pending))
                state, kwargs = self._pending.pop(path)
                self._in_flight += 1
            try:
                save_checkpoint(path, state, **kwargs)
            except BaseException as e:   # surface at wait(), don't die silent
                with self._cv:
                    self._errors.append(e)
            finally:
                with self._cv:
                    self._in_flight -= 1
                    self._cv.notify_all()

    def _raise_errors_locked(self):
        """Re-raise the first recorded failure; later ones (e.g. the
        best-val AND the '.latest' write both failing) ride along as
        exception notes instead of being silently discarded."""
        if not self._errors:
            return
        err, rest = self._errors[0], self._errors[1:]
        self._errors.clear()
        for other in rest:
            err.add_note(
                f"another background checkpoint write also failed: {other!r}")
        raise err

    def save(self, path, state, **kwargs):
        """Enqueue a write of ``state`` to ``path`` (save_checkpoint kwargs
        pass through). Replaces any not-yet-started write to the same path.

        Fails FAST: if an earlier background write failed (disk full,
        unwritable dir), the error re-raises here -- at the next save, i.e.
        within an epoch -- instead of after all remaining epochs trained
        with every save silently failing (the synchronous-save semantics).
        """
        with self._cv:
            self._raise_errors_locked()
            self._pending[str(path)] = (state, kwargs)
            self._ensure_thread()
            self._cv.notify_all()

    def wait(self):
        """Block until every enqueued write is durably on disk; re-raise the
        first background failure (any others ride along as notes)."""
        with self._cv:
            while self._pending or self._in_flight:
                self._cv.wait()
            self._raise_errors_locked()

    def close(self):
        try:
            self.wait()
        finally:
            # stop and join even when wait() re-raises a write failure --
            # otherwise the daemon worker parks in cv.wait() forever and
            # each failed run leaks one blocked thread
            with self._cv:
                self._stop = True
                self._cv.notify_all()
            if self._thread is not None:
                self._thread.join(timeout=60)
