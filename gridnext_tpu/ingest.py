"""Host-ingest pipeline: decode slides ahead, stage them onto the device.

The production registration loop is three stages with very different costs:

  decode (host CPU, ~0.15-1 GB/s JPEG)  ->  transfer (PCIe ~10 GB/s)
      ->  register (TPU, serving.SlideRegistrar)

:class:`SlideSource` overlaps them: a background thread decodes slide N+1
while slide N transfers (``jax.device_put`` is asynchronous) and slide N-1
registers on the device -- the reference's hot loop (imgprocess.py:185-238)
is a fully serial decode->crop->forward per slide. Prefetch is bounded, so
at most ``prefetch`` decoded slides are ever resident on the host and
staged on the device (slides are GB-scale).

Typical use:

    registrar = SlideRegistrar.from_gridnet(g, variables)
    source = SlideSource(image_files, spaceranger_dirs)
    for i, wsi, positions in source:
        labels = registrar(wsi, positions)
    print(source.timer.report())          # per-stage seconds
    print(source.throughput())            # decode/transfer GB/s

Every stage is timed with observability.StageTimer; ``throughput()`` turns
the byte counters into GB/s so the ingest side is measurable on any host
(on the axon relay the transfer number characterizes the relay link, not
the framework -- see docs/roadmap.md).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Optional, Sequence

import numpy as np

from gridnext_tpu.observability import StageTimer


def decode_slide(image_file, convert: str = "RGB") -> np.ndarray:
    """Decode one slide to (H, W, 3) uint8 (PIL/libjpeg; RGBA/grayscale
    slides convert -- the serving gather expects 3 channels)."""
    from PIL import Image

    Image.MAX_IMAGE_PIXELS = None
    with Image.open(image_file) as im:
        return np.asarray(im.convert(convert))


class SlideSource:
    """Iterate ``(index, device_wsi, positions)`` with overlapped stages.

    Args:
      image_files: fullres slide images, one per array.
      spaceranger_dirs: optional matching Spaceranger dirs; when given, each
        item carries the array's positions DataFrame (else None).
      hd_binning: Visium HD binned-output name for position lookup.
      prefetch: decoded-slide queue depth AND device staging depth (2 =
        double buffering).
      decode: override the decode function (image_file -> (H, W, 3) uint8).
      pack: also run ops.patch_gather_pallas.pack_wsi on-device at staging
        (async, overlaps the previous slide's registration) and yield
        :class:`PackedWSI` items -- takes the ~6 ms/slide pack off the
        registration dispatch. Requires a pallas-extractor registrar.
    """

    def __init__(self, image_files: Sequence, spaceranger_dirs: Optional[Sequence] = None,
                 hd_binning: Optional[str] = None, prefetch: int = 2,
                 decode=None, timer: Optional[StageTimer] = None,
                 pack: bool = False):
        if spaceranger_dirs is not None and len(spaceranger_dirs) != len(image_files):
            raise ValueError("need one spaceranger dir per image file")
        self.image_files = [str(f) for f in image_files]
        self.spaceranger_dirs = ([str(s) for s in spaceranger_dirs]
                                 if spaceranger_dirs is not None else None)
        self.hd_binning = hd_binning
        self.prefetch = max(1, int(prefetch))
        self.decode = decode or decode_slide
        self.timer = timer if timer is not None else StageTimer()
        self.pack = bool(pack)
        self._pack_fn = None        # jitted pack_wsi, built on first use
        self._iter_stop = None      # current iteration's cancel event
        self.bytes_decoded = 0
        self.bytes_staged = 0

    def _positions(self, i):
        if self.spaceranger_dirs is None:
            return None
        from gridnext_tpu.io import read_positions

        return read_positions(self.spaceranger_dirs[i], self.hd_binning)

    def _decode_worker(self, out_q: queue.Queue, stop: threading.Event):
        # Every put is stop-aware: if the consumer abandons iteration (an
        # exception mid-loop, an early break), the thread must not block
        # forever on the bounded queue pinning GB-scale decoded slides.
        def put(item) -> bool:
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    pass
            return False

        try:
            for i, f in enumerate(self.image_files):
                if stop.is_set():
                    return
                with self.timer("decode"):
                    arr = self.decode(f)
                self.bytes_decoded += arr.nbytes
                # positions parse rides the decode thread too: at HD scale
                # (~147k rows) it costs hundreds of ms that must overlap
                # registration, not sit on the consumer's dispatch path
                if self.spaceranger_dirs is not None:
                    with self.timer("positions"):
                        pos = self._positions(i)
                else:
                    pos = None
                if not put((i, arr, pos)):
                    return
            put(None)
        except BaseException as e:  # surface in the consumer, don't hang it
            put(e)

    def __len__(self):
        return len(self.image_files)

    def __iter__(self):
        import collections

        import jax

        decoded: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()   # per-iteration so the source re-iterates
        self._iter_stop = stop
        worker = threading.Thread(target=self._decode_worker,
                                  args=(decoded, stop),
                                  name="gnx-slide-decode", daemon=True)
        worker.start()

        staged = collections.deque()

        def stage_next() -> bool:
            # stop-aware get: if close() cancels mid-iteration the worker
            # exits WITHOUT the None sentinel -- a bare .get() would then
            # hang the consumer forever once the queue drains
            while True:
                try:
                    item = decoded.get(timeout=0.2)
                    break
                except queue.Empty:
                    if stop.is_set() and not worker.is_alive():
                        return False    # cancelled: treat as exhausted
            if item is None:
                return False
            if isinstance(item, BaseException):
                raise item
            i, arr, pos = item
            with self.timer("stage"):
                # async put: returns immediately, transfer overlaps compute
                dev = jax.device_put(arr)
                if self.pack:
                    from gridnext_tpu.ops.patch_gather_pallas import (
                        PackedWSI, pack_wsi)

                    if self._pack_fn is None:   # one wrapper: trace cache
                        self._pack_fn = jax.jit(pack_wsi)
                    # async dispatch too: the pack runs on-device behind
                    # the previous slide's registration
                    dev = PackedWSI(self._pack_fn(dev), arr.shape[:2])
            self.bytes_staged += arr.nbytes
            staged.append((i, dev, pos))
            return True

        try:
            draining = False
            for _ in range(self.prefetch):
                if not stage_next():
                    draining = True
                    break
            while staged:
                item = staged.popleft()
                if not draining:
                    draining = not stage_next()
                yield item
        finally:
            # abandoned generator (consumer raised / broke early) or normal
            # exhaustion: cancel the decode thread and release any queued
            # decoded slides rather than holding them for the process's life
            stop.set()
            try:
                while True:
                    decoded.get_nowait()
            except queue.Empty:
                pass

    def close(self):
        """Cancel the in-flight iteration's decode thread (idempotent; the
        iterator's own cleanup calls this path automatically when the
        consuming generator is closed or garbage-collected)."""
        if self._iter_stop is not None:
            self._iter_stop.set()

    def throughput(self) -> dict:
        """{'decode_gb_s', 'stage_gb_s'} from the accumulated stage timings.

        'stage' measures the dispatch side of the async device_put; for the
        true link rate block on the staged arrays first (or read
        timer.summary() around a full consume-loop).
        """
        t = self.timer.summary()
        out = {}
        if t.get("decode"):
            out["decode_gb_s"] = self.bytes_decoded / 1e9 / t["decode"]
        if t.get("stage"):
            out["stage_gb_s"] = self.bytes_staged / 1e9 / t["stage"]
        return out
