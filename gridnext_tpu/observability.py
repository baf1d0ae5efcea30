"""Observability: profiler hooks, stage timers, structured metric logging.

The reference's only observability is wall-clock prints and tqdm bars
(SURVEY.md section 5.1/5.5). Here:

* :func:`profile_trace` -- context manager around ``jax.profiler.trace``
  (view with TensorBoard / xprof); :func:`annotate` nests named regions.
* :class:`StageTimer` -- cheap named wall-clock stages with a summary dict.
* :class:`MetricsLogger` -- append-only JSONL of structured metric dicts
  (step, wall time, arbitrary scalars), the machine-readable replacement for
  the reference's ``print('%s Loss: ...')``.
"""

from __future__ import annotations

import contextlib
import json
import time

import numpy as np
from typing import Optional


@contextlib.contextmanager
def profile_trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a JAX profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in xprof timelines)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulating named wall-clock stages.

    >>> t = StageTimer()
    >>> with t("etl"): ...
    >>> with t("train"): ...
    >>> t.summary()  # {'etl': ..., 'train': ...}
    """

    def __init__(self):
        import threading

        self.totals: dict = {}
        self.counts: dict = {}
        # stages may close concurrently (the HTTP server times decode on
        # many handler threads); the read-modify-write must not lose adds
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.totals[name] = self.totals.get(name, 0.0) + dt
                self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return dict(self.totals)

    def report(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = [f"{k}: {v:.3f}s ({v / total * 100:.1f}%, n={self.counts[k]})"
                 for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])]
        return "\n".join(lines)


class MetricsLogger:
    """Append-only JSONL metric stream."""

    def __init__(self, path, flush_every: int = 1):
        self.path = str(path)
        self._fh = open(self.path, "a")
        self._since_flush = 0
        self._flush_every = flush_every
        self._t0 = time.time()

    def log(self, step: Optional[int] = None, **metrics):
        rec = {"wall_s": round(time.time() - self._t0, 3)}
        if step is not None:
            rec["step"] = int(step)
        for k, v in metrics.items():
            if isinstance(v, (bool, str, list, dict, type(None))):
                # preserved verbatim BEFORE the float attempt: float(True)
                # and float("007") would otherwise succeed and silently
                # change the type (bool identity, leading zeros)
                rec[k] = v
                continue
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                if hasattr(v, "tolist"):
                    rec[k] = np.asarray(v).tolist() if hasattr(v, "shape") else v.tolist()
                else:
                    rec[k] = str(v)
        self._fh.write(json.dumps(rec) + "\n")
        self._since_flush += 1
        if self._since_flush >= self._flush_every:
            self._fh.flush()
            self._since_flush = 0

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_metrics(path) -> list:
    """Read a MetricsLogger JSONL stream back as a list of dicts."""
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]
