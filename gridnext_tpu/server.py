"""Resident registration server: load once, register per HTTP request.

The framework ships two offline serving shapes -- the batch CLI
(``register`` driving serving.register_slides) and portable deployment
artifacts (``export`` / ``serve-artifact``). This module adds the third
production shape: a RESIDENT endpoint whose weights are loaded and whose
XLA programs stay compiled across requests, so per-slide latency is the
device dispatch, not model construction. The reference has no serving
surface at all -- its registration is a hand-driven notebook loop over a
live torch module (utils.py:20-57 fed by imgprocess.py:162-238).

Design:

* **stdlib-only** (``http.server.ThreadingHTTPServer``): zero new
  dependencies, trivially containerized behind any production proxy.
* **Slides are referenced by filesystem path** (shared volume or
  object-store mount -- the norm for GB-scale WSIs). Pixels never travel
  through the socket; responses carry the label grid (ints) and optionally
  the Loupe CSV text.
* **Decode overlaps compute**: host JPEG decode (PIL) runs on the request
  handler's own thread OUTSIDE the device lock, so decoding request N+1
  overlaps registering request N -- the same pipelining
  :class:`~gridnext_tpu.ingest.SlideSource` gives batch cohorts.
* **One device dispatch at a time** (``threading.Lock``): a single
  accelerator runs one program anyway; serializing at the dispatch keeps
  per-request latencies honest instead of queueing inside the runtime.

Protocol (JSON over HTTP)::

    GET  /healthz | /info   -> 200, service + model metadata
    GET  /metrics           -> 200, request counts + per-stage seconds
    POST /register          -> body {"spaceranger": DIR,
                                     "image": PATH,      # image/MM models
                                     "loupe": true,      # include CSV text
                                     "out": PATH}        # write CSV server-side
      response: {"labels": [[...]], "shape": [H, W], "classes": [...],
                 "n_foreground": N, "hex_coords": bool, "loupe_csv": "..."?,
                 "out": PATH?}   (labels: 0 = background, 1..C foreground)

Errors: 400 with ``{"error": msg}`` for bad requests (missing fields,
unknown paths, shape/gene-axis mismatches), 404 for unknown routes, 500
for unexpected failures.

Typical use::

    python -m gridnext_tpu serve --model runs/img_model --port 8000 \\
        --warmup slide0.jpg spaceranger0/
    curl -s localhost:8000/register -d \\
        '{"image": "slide1.jpg", "spaceranger": "sr1/", "loupe": true}'

or in-process::

    service = RegistrationService.from_model_dir("runs/img_model")
    httpd = make_server(service, "127.0.0.1", 8000)
    httpd.serve_forever()
"""

from __future__ import annotations

import io as _io
import json
import os
import threading
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional, Sequence

import numpy as np

from gridnext_tpu.observability import StageTimer

__all__ = ["RegistrationService", "RegistrationHTTPServer", "make_server",
           "load_artifact"]


def load_artifact(path):
    """Read + validate an exported registration artifact and its sidecar.

    Returns ``(exported, sidecar_dict)`` with the jax.export deserialization
    done and the sidecar checked for the image-registration fields; raises
    ``ValueError`` / ``FileNotFoundError`` with actionable messages (the
    same checks ``serve-artifact`` performs, reusable in-process).
    """
    if not os.path.exists(path):
        raise FileNotFoundError(f"artifact {path} not found")
    sidecar_path = str(path) + ".json"
    if not os.path.exists(sidecar_path):
        raise FileNotFoundError(
            f"{sidecar_path} not found -- the JSON sidecar written by "
            "`export` must travel with the artifact (it carries the "
            "spot-input geometry and class names)")
    with open(path, "rb") as fh:
        blob = fh.read()
    try:
        with open(sidecar_path) as fh:
            side = json.load(fh)
    except json.JSONDecodeError as e:
        raise ValueError(f"{sidecar_path} is not valid JSON ({e})")
    dense = side.get("kind") == "dense"
    if "n_spots" not in side and not dense:
        raise ValueError(
            "this sidecar has no n_spots -- count/MM grid artifacts are "
            "plain functions of in-memory grids; the server registers "
            "image artifacts (wsi -> labels)")
    required = {"classes", "h_st", "w_st", "wsi_shape", "window_px"}
    required |= {"extent"} if dense else set()
    missing = sorted(required - side.keys())
    if missing:
        raise ValueError(
            f"{sidecar_path} is missing required fields {missing} -- "
            "re-export the artifact (`export --model ... --wsi-shape H W`)")
    try:
        from jax import export as jexport

        exported = jexport.deserialize(bytearray(blob))
    except Exception as e:
        raise ValueError(f"{path} is not a jax.export StableHLO artifact "
                         f"({type(e).__name__}: {e})")
    import jax

    here = jax.default_backend()
    accept = {here} | ({"cuda", "rocm"} if here == "gpu" else set())
    platforms = [str(p).lower()
                 for p in (getattr(exported, "platforms", None)
                           or getattr(exported, "lowering_platforms", ()))]
    if platforms and not accept & set(platforms):
        raise ValueError(
            f"this artifact was exported for platforms {platforms} but the "
            f"current backend is {here!r} -- re-export with --platforms "
            "including it (pure-XLA artifacts only; Pallas paths are "
            "backend-specific)")
    return exported, side


_UNFITTED = object()   # submit() sentinel: no pre-fitted dense plan


class _MicroBatcher:
    """Continuous micro-batching for concurrent slide requests.

    One dispatcher thread owns the device: each cycle it takes whatever
    requests accumulated WHILE the previous dispatch ran (no artificial
    wait -- batches form under load, a lone request dispatches alone at
    zero added latency), groups same-shape slides, and registers each
    group in one :meth:`SlideRegistrar.register_batch` call. Measured on
    the v5e, batched dispatch beats single-slide serving (192,728 vs
    184,197 spots/s at batch 8 vs 4 for the TPU-shaped f --
    docs/roadmap.md), so a loaded server gets throughput a per-request
    lock would leave on the table.
    """

    def __init__(self, registrar, max_batch: int = 8):
        import queue as _queue

        self.registrar = registrar
        self.max_batch = max(1, int(max_batch))
        self._q: "_queue.Queue" = _queue.Queue()
        self.dispatches = 0
        self.batched_slides = 0
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="gnx-serve-batcher")
        self._thread.start()

    def submit(self, wsi, positions, plan=_UNFITTED):
        """Block until the dispatcher registers this slide; returns the
        (H, W) label grid (or re-raises the dispatch error).

        ``plan``: an optional pre-fitted dense plan (``None`` meaning
        "fitted; not a dense lattice") computed on the CALLING thread --
        square-HD plan fits are hundreds of ms of host lstsq that would
        otherwise serialize on the device-owning dispatcher thread."""
        done = threading.Event()
        slot: dict = {}
        self._q.put((wsi, positions, plan, done, slot))
        while not done.wait(5.0):
            if not self._thread.is_alive():   # pragma: no cover - bug guard
                raise RuntimeError("micro-batcher dispatcher thread died; "
                                   "restart the server")
        if "error" in slot:
            raise slot["error"]
        return slot["labels"]

    @staticmethod
    def _shape_key(wsi):
        from gridnext_tpu.ops.patch_gather_pallas import PackedWSI

        return (("packed",) + tuple(wsi.orig_hw)
                if isinstance(wsi, PackedWSI) else tuple(wsi.shape))

    def _dispatch(self, group):
        # routing (dense per-slide / singleton / stacked batch) is THE
        # canonical serving.dispatch_group -- shared with register_slides
        # so the CLI batch loop and the resident server can never diverge
        from gridnext_tpu.serving import dispatch_group

        try:
            items = [(k, wsi, pos)
                     for k, (wsi, pos, _, _, _) in enumerate(group)]
            plans = {k: plan for k, (_, _, plan, _, _) in enumerate(group)
                     if plan is not _UNFITTED}
            stats: dict = {}
            for k, labels, _ in dispatch_group(self.registrar, items,
                                               plans=plans, stats=stats):
                _, _, _, done, slot = group[k]
                slot["labels"] = labels
                done.set()
            self.batched_slides += stats.get("batched", 0)
        except BaseException as e:  # deliver to every waiter, keep serving
            self._fail(group, e)

    @staticmethod
    def _fail(items, err):
        for _, _, _, done, slot in items:
            if not done.is_set():
                slot["error"] = err
                done.set()

    def _run(self):
        import queue as _queue

        while True:
            batch = [self._q.get()]
            while len(batch) < self.max_batch:   # drain what piled up
                try:
                    batch.append(self._q.get_nowait())
                except _queue.Empty:
                    break
            try:
                groups: dict = {}
                for item in batch:
                    groups.setdefault(self._shape_key(item[0]),
                                      []).append(item)
            except BaseException as e:
                # grouping failed (malformed wsi, ...): fail THIS batch's
                # waiters instead of killing the dispatcher thread --
                # every later submit() would otherwise hang forever
                self._fail(batch, e)
                continue
            for group in groups.values():
                self.dispatches += 1
                self._dispatch(group)


class RegistrationService:
    """A resident registration backend: one model (or artifact), many
    requests. Construct via :meth:`from_model_dir` (any trained model
    directory: image, count, or multimodal), :meth:`from_artifact`
    (an ``export``-ed StableHLO blob + sidecar), or :meth:`from_registrar`
    (an in-process :class:`~gridnext_tpu.serving.SlideRegistrar` -- custom
    f's and tests).

    ``register_fn(image_path_or_None, spaceranger_dir, timer) -> (H, W)
    int labels`` does the per-request work; the service adds locking
    conventions (the fn itself takes the device lock around dispatches so
    host decode stays concurrent), request accounting, and Loupe export.
    """

    def __init__(self, register_fn: Callable, classes: Sequence[str], *,
                 model: str = "", hex_coords: bool = True,
                 hd_binning: Optional[str] = None, needs_image: bool = True,
                 extra_info: Optional[dict] = None):
        self._register_fn = register_fn
        self.classes = list(classes)
        self.model = model
        self.hex_coords = bool(hex_coords)
        self.hd_binning = hd_binning
        self.needs_image = bool(needs_image)
        self.extra_info = dict(extra_info or {})
        self.timer = StageTimer()
        self.requests = 0
        self.errors = 0
        self._stats_lock = threading.Lock()

    # ---------------------------------------------------------------- build

    @classmethod
    def from_registrar(cls, registrar, classes: Sequence[str], *,
                       model: str = "", hd_binning: Optional[str] = None,
                       max_batch: int = 8):
        """Wrap a built :class:`~gridnext_tpu.serving.SlideRegistrar`.

        Concurrent requests micro-batch: slides that queue up while a
        dispatch runs register together in ONE device dispatch
        (:class:`_MicroBatcher`, up to ``max_batch`` same-shape slides;
        square-HD slides route through the dense-tiling path per slide).
        """
        import jax

        from gridnext_tpu.ingest import decode_slide
        from gridnext_tpu.io import read_positions

        batcher = _MicroBatcher(registrar, max_batch=max_batch)
        pack_fn = None
        if (getattr(registrar, "extractor", None) == "pallas"
                and registrar.hex_coords):
            from gridnext_tpu.ops.patch_gather_pallas import pack_wsi

            pack_fn = jax.jit(pack_wsi)         # one trace, all requests

        def register_fn(image, srd, timer):
            if image is None:
                raise ValueError("this model registers slides; the request "
                                 "must carry an 'image' path")
            if not os.path.exists(image):
                raise FileNotFoundError(f"image {image} not found")
            with timer("decode"):
                wsi_np = decode_slide(image)
            with timer("positions"):
                pos = read_positions(srd, hd_binning)
            wsi = jax.device_put(wsi_np)        # async; overlaps prior work
            plan = _UNFITTED
            if pack_fn is not None:
                from gridnext_tpu.ops.patch_gather_pallas import PackedWSI

                # pack at request time: the ~6 ms/slide RGBX pack dispatches
                # (async) behind whatever the batcher is running, instead of
                # serializing on the device-owning dispatcher thread -- the
                # same staging-time convention as ingest.SlideSource(pack=True)
                with timer("pack"):
                    wsi = PackedWSI(pack_fn(wsi), wsi_np.shape[:2])
            elif not registrar.hex_coords:
                # square HD: the dense-lattice fit is host lstsq over ~1e5
                # bins -- do it here, concurrently across requests, and hand
                # the dispatcher a ready plan
                with timer("dense_fit"):
                    plan = registrar.dense_plan(wsi_np, pos)
            with timer("register"):             # queue wait + dispatch
                return batcher.submit(wsi, pos, plan)

        svc = cls(register_fn, classes, model=model,
                  hex_coords=registrar.hex_coords, hd_binning=hd_binning,
                  extra_info={"window_px": registrar.window_size,
                              "patch_px": registrar.patch_size,
                              "max_batch": batcher.max_batch})
        svc.batcher = batcher
        return svc

    @classmethod
    def from_model_dir(cls, model_dir, mesh=None, max_batch: int = 8):
        """Resident service for ANY trained model directory (model.json +
        g_state.msgpack, as written by the train-* commands): image models
        serve through the jitted SlideRegistrar (concurrent requests
        micro-batched up to ``max_batch`` slides per dispatch), count
        models through the jitted grid forward, multimodal models through
        the jitted MM forward (datasets built per request from the
        validated caches)."""
        from gridnext_tpu.modeldir import load_model_dir

        meta, classes, variables = load_model_dir(model_dir)
        name = meta.get("model", "")
        if name.endswith(("DenseNet121", "TpuPatchClassifier")):
            return cls._image_service(meta, classes, variables, mesh,
                                      max_batch)
        if mesh is not None:
            # fail loudly: a count/MM forward is one small dispatch -- a
            # silently ignored mesh would misreport the serving topology
            raise ValueError(f"mesh serving applies to image models; "
                             f"{name!r} serves single-device")
        if name in ("GridNetHexMM", "GridNetMM"):
            return cls._mm_service(meta, classes, variables)
        if name.endswith("CountMLP"):
            return cls._count_service(meta, classes, variables)
        raise ValueError(f"don't know how to serve model {name!r}")

    @classmethod
    def _image_service(cls, meta, classes, variables, mesh=None,
                       max_batch: int = 8):
        from gridnext_tpu.modeldir import image_registrar_from_meta

        registrar = image_registrar_from_meta(meta, classes, variables,
                                              mesh=mesh)
        return cls.from_registrar(registrar, classes,
                                  model=meta.get("model", ""),
                                  hd_binning=meta.get("hd_binning"),
                                  max_batch=max_batch)

    @classmethod
    def _count_service(cls, meta, classes, variables):
        import jax
        import jax.numpy as jnp

        from gridnext_tpu.data import CountGridDataset
        from gridnext_tpu.io.unify import validated_unified_cache
        from gridnext_tpu.modeldir import grid_model_from_meta

        g = grid_model_from_meta(meta, classes)
        grid_dims = meta.get("grid_dims")
        log1p = bool(meta.get("log1p"))
        lock = threading.Lock()
        fwd = jax.jit(lambda x: jnp.argmax(
            g.apply(variables, x, train=False), -1).astype(jnp.int32) + 1)

        def register_fn(image, srd, timer):
            cfile = validated_unified_cache(srd, meta.get("hd_binning"),
                                            genes=meta.get("genes"))
            with timer("load"):
                if grid_dims is not None:
                    gdat = CountGridDataset([cfile], Visium=False,
                                            h_st=grid_dims[0],
                                            w_st=grid_dims[1])
                else:
                    gdat = CountGridDataset([cfile])
                x, _ = gdat[0]
            fg = x.sum(-1) > 0                 # tissue support: RAW counts
            if log1p:
                x = np.log1p(x)
            with lock, timer("register"):
                labels = np.asarray(fwd(jnp.asarray(x[None]))[0])
            return np.where(fg, labels, 0)

        return cls(register_fn, classes, model=meta.get("model", ""),
                   hex_coords=grid_dims is None,
                   hd_binning=meta.get("hd_binning"), needs_image=False)

    @classmethod
    def _mm_service(cls, meta, classes, variables):
        import jax
        import jax.numpy as jnp

        from gridnext_tpu.io.unify import validated_unified_cache
        from gridnext_tpu.modeldir import mm_model_from_meta

        g = mm_model_from_meta(meta, classes)
        grid_dims = meta.get("grid_dims")
        lock = threading.Lock()
        fwd = jax.jit(lambda xi, xc: jnp.argmax(
            g.apply(variables, (xi, xc), train=False),
            -1).astype(jnp.int32) + 1)
        # the scBERT gene2vec transform needs a cohort array to map feature
        # IDs -> symbols; build it lazily from the first request's array
        # (every request's cache is validated against the SAME training
        # gene axis, so any array defines the identical transform)
        state = {"transform": None}

        def count_transform(srd):
            if meta.get("count_f") == "scbert":
                if state["transform"] is None:
                    from gridnext_tpu.modeldir import scbert_count_transform

                    state["transform"], _ = scbert_count_transform(
                        [srd], meta.get("hd_binning"),
                        meta["scbert_vocab"])
                return state["transform"]
            return np.log1p if meta.get("log1p") else None

        def register_fn(image, srd, timer):
            if image is None:
                raise ValueError("multimodal models register (image, "
                                 "spaceranger) pairs; the request must "
                                 "carry an 'image' path")
            if not os.path.exists(image):
                raise FileNotFoundError(f"image {image} not found")
            validated_unified_cache(srd, meta.get("hd_binning"),
                                    genes=meta.get("genes"))
            with timer("load"):
                if meta.get("dense_ingest") and grid_dims:
                    from gridnext_tpu.data import (DenseWSIGridDataset,
                                                   create_visium_dataset)

                    img_ds = DenseWSIGridDataset(
                        [image], [srd], None,
                        patch_size=meta.get("patch_px", 128),
                        hd_binning=meta.get("hd_binning"),
                        grid_dims=tuple(grid_dims))
                    cnt_ds = create_visium_dataset(
                        [srd], spatial=True, use_count=True,
                        use_image=False, hd_binning=meta.get("hd_binning"),
                        grid_dims=tuple(grid_dims),
                        minimum_detection_rate=None)
                    xi, xc = img_ds[0][0], cnt_ds[0][0]
                else:
                    from gridnext_tpu.data import create_visium_dataset

                    mm = create_visium_dataset(
                        [srd], spatial=True, use_count=True, use_image=True,
                        fullres_image_files=[image],
                        patch_size_px=meta.get("patch_px", 128),
                        window_size_px=meta.get("window_px"),
                        hd_binning=meta.get("hd_binning"),
                        grid_dims=tuple(grid_dims) if grid_dims else None,
                        minimum_detection_rate=None)
                    xi, xc = mm[0][0]
            fg = xc.sum(-1) > 0                # tissue mask from RAW counts
            t = count_transform(srd)
            if t is not None:
                xc = t(xc)
            with lock, timer("register"):
                labels = np.asarray(fwd(jnp.asarray(xi[None]),
                                        jnp.asarray(xc[None]))[0])
            return np.where(fg, labels, 0)

        return cls(register_fn, classes, model=meta.get("model", ""),
                   hex_coords=grid_dims is None,
                   hd_binning=meta.get("hd_binning"))

    @classmethod
    def from_artifact(cls, path):
        """Resident service for an ``export``-ed image-registration
        artifact (StableHLO blob + JSON sidecar): no model code is ever
        constructed -- the deployment-unit server."""
        import jax
        import jax.numpy as jnp

        from gridnext_tpu.ingest import decode_slide
        from gridnext_tpu.io import read_positions
        from gridnext_tpu.serving import artifact_spot_inputs

        exported, side = load_artifact(path)
        fn = exported.call
        dense = side.get("kind") == "dense"
        hexc = side.get("hex_coords", True)
        hd_binning = side.get("hd_binning")
        lock = threading.Lock()

        def register_fn(image, srd, timer):
            if image is None:
                raise ValueError("artifact serving registers slides; the "
                                 "request must carry an 'image' path")
            if not os.path.exists(image):
                raise FileNotFoundError(f"image {image} not found")
            with timer("decode"):
                wsi = decode_slide(image)
            if list(wsi.shape) != list(side["wsi_shape"]):
                raise ValueError(
                    f"slide {image} is {tuple(wsi.shape)} but the artifact "
                    f"was exported for {tuple(side['wsi_shape'])} (shapes "
                    "are static; re-export with --wsi-shape)")
            with timer("positions"):
                pos = read_positions(srd, hd_binning)
            if dense:
                from gridnext_tpu.serving import fit_dense_lattice

                plan = fit_dense_lattice(pos, side["h_st"], side["w_st"],
                                         side["window_px"],
                                         tuple(side["wsi_shape"]))
                if plan is None or plan[0] != "exact":
                    raise ValueError(
                        f"{srd} is not an exact integer-pitch lattice; "
                        "this dense artifact can't serve it")
                _, oy0, ox0, fg, ey, ex = plan
                if [int(ey), int(ex)] != list(side["extent"]):
                    raise ValueError(
                        f"{srd} extent ({ey}, {ex}) differs from the "
                        f"artifact's {side['extent']} (shapes are static; "
                        "re-export)")
                with lock, timer("register"):
                    return np.asarray(fn(wsi, jnp.int32(oy0),
                                         jnp.int32(ox0), jnp.asarray(fg)))
            ins = artifact_spot_inputs(
                wsi.shape, pos, side["n_spots"],
                window_size=side["window_px"], h_st=side["h_st"],
                w_st=side["w_st"], hex_coords=hexc)
            with lock, timer("register"):
                return np.asarray(fn(wsi, *map(jnp.asarray, ins)))

        return cls(register_fn, side["classes"],
                   model=side.get("model", "artifact"), hex_coords=hexc,
                   hd_binning=hd_binning,
                   extra_info={"artifact": str(path),
                               "window_px": side.get("window_px"),
                               "kind": side.get("kind", "spots")})

    # ------------------------------------------------------------- requests

    def register(self, spaceranger, image=None) -> np.ndarray:
        """Register one array -> (H, W) int label grid (0 = background)."""
        if not spaceranger or not isinstance(spaceranger, str):
            raise ValueError(
                "request must carry a 'spaceranger' directory path string")
        if image is not None and not isinstance(image, str):
            raise ValueError("'image' must be a path string")
        if not os.path.isdir(spaceranger):
            raise FileNotFoundError(
                f"spaceranger dir {spaceranger} not found")
        with self._stats_lock:
            self.requests += 1
        return np.asarray(self._register_fn(image, spaceranger, self.timer))

    def note_error(self):
        """Count a failed request (handler threads are concurrent)."""
        with self._stats_lock:
            self.errors += 1

    def reset_metrics(self):
        """Zero the request/error counters and stage timings -- used after
        warmup so /metrics reports steady-state serving, not the one-off
        XLA compile."""
        with self._stats_lock:
            self.requests = 0
            self.errors = 0
            self.timer.totals.clear()
            self.timer.counts.clear()
            batcher = getattr(self, "batcher", None)
            if batcher is not None:
                batcher.dispatches = 0
                batcher.batched_slides = 0

    def loupe_csv(self, labels, spaceranger) -> str:
        """Loupe-format (Barcode, AARs) CSV text for a label grid."""
        from gridnext_tpu.evaluate import to_loupe_annots
        from gridnext_tpu.io import find_position_file

        buf = _io.StringIO()
        to_loupe_annots(labels, find_position_file(spaceranger,
                                                   self.hd_binning),
                        buf, annot_names=self.classes,
                        hex_coords=self.hex_coords)
        return buf.getvalue()

    def handle_register(self, body: dict) -> dict:
        """One POST /register body -> response dict (the HTTP-free core,
        directly callable in-process and in tests)."""
        labels = self.register(body.get("spaceranger"),
                               image=body.get("image"))
        resp = {"labels": labels.tolist(),
                "shape": list(labels.shape),
                "classes": self.classes,
                "hex_coords": self.hex_coords,
                "n_foreground": int((labels > 0).sum())}
        if body.get("loupe") or body.get("out"):
            if body.get("out") is not None and not isinstance(body["out"], str):
                raise ValueError("'out' must be a path string")
            csv_text = self.loupe_csv(labels, body["spaceranger"])
            if body.get("out"):
                out = body["out"]
                os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
                with open(out, "w") as fh:
                    fh.write(csv_text)
                resp["out"] = out
            if body.get("loupe"):
                resp["loupe_csv"] = csv_text
        return resp

    def info(self) -> dict:
        import jax

        return {"status": "ok", "model": self.model,
                "classes": self.classes, "hex_coords": self.hex_coords,
                "hd_binning": self.hd_binning,
                "needs_image": self.needs_image,
                "backend": jax.default_backend(),
                "requests": self.requests, **self.extra_info}

    def metrics(self) -> dict:
        out = {"requests": self.requests, "errors": self.errors,
               "stage_seconds": self.timer.summary(),
               "stage_counts": dict(self.timer.counts)}
        batcher = getattr(self, "batcher", None)
        if batcher is not None:
            out["dispatches"] = batcher.dispatches
            out["batched_slides"] = batcher.batched_slides
        return out


class _Handler(BaseHTTPRequestHandler):
    server_version = "gridnext-tpu-serve"

    @property
    def service(self) -> RegistrationService:
        return self.server.service

    def _json(self, code: int, obj: dict):
        payload = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_GET(self):  # noqa: N802 (http.server API)
        if self.path in ("/healthz", "/info"):
            self._json(200, self.service.info())
        elif self.path == "/metrics":
            self._json(200, self.service.metrics())
        else:
            self._json(404, {"error": f"unknown route {self.path}"})

    def do_POST(self):  # noqa: N802
        if self.path != "/register":
            self._json(404, {"error": f"unknown route {self.path}"})
            return
        import contextlib

        try:
            length = int(self.headers.get("Content-Length") or 0)
            body = json.loads(self.rfile.read(length) or b"{}")
            if not isinstance(body, dict):
                raise ValueError("request body must be a JSON object")
            result = self.service.handle_register(body)
        except (ValueError, KeyError, TypeError, FileNotFoundError,
                json.JSONDecodeError) as e:
            self.service.note_error()
            with contextlib.suppress(OSError):   # client may be gone
                self._json(400, {"error": str(e)})
            return
        except Exception as e:  # surface, don't kill the server thread
            self.service.note_error()
            traceback.print_exc()
            with contextlib.suppress(OSError):
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
            return
        try:
            self._json(200, result)
        except OSError:
            # the client disconnected while the (large) 200 payload was
            # being written: the registration itself SUCCEEDED -- don't
            # count a service error or write a second response onto the
            # dead socket
            self.log_message("client disconnected during response write")

    def log_message(self, fmt, *args):
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *args)


class RegistrationHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer bound to one :class:`RegistrationService`.

    Threads are daemonic (a hung client can't block shutdown) and handler
    threads only contend on the service's device lock -- host-side decode
    runs concurrently across requests.
    """

    daemon_threads = True
    allow_reuse_address = True

    def __init__(self, addr, service: RegistrationService,
                 verbose: bool = False):
        self.service = service
        self.verbose = verbose
        super().__init__(addr, _Handler)


def make_server(service: RegistrationService, host: str = "127.0.0.1",
                port: int = 8000, verbose: bool = False):
    """Bind a :class:`RegistrationHTTPServer` (``port=0`` picks a free
    port; read it back from ``server.server_address[1]``)."""
    return RegistrationHTTPServer((host, port), service, verbose=verbose)
