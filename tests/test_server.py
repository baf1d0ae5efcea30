"""Resident HTTP registration server (gridnext_tpu/server.py).

Covers the three construction paths (from_registrar / from_model_dir for
count+MM / from_artifact), the HTTP protocol (healthz, metrics, register,
error codes), and that served labels are identical to the in-process
serving/forward paths.
"""

import contextlib
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from gridnext_tpu import geometry as G
from gridnext_tpu.data import simulate_spaceranger_dir
from gridnext_tpu.io import read_positions
from gridnext_tpu.models import DenseNet, GridNetHex
from gridnext_tpu.server import RegistrationService, load_artifact, make_server
from gridnext_tpu.serving import SlideRegistrar


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    root = tmp_path_factory.mktemp("server")
    return simulate_spaceranger_dir(root / "arr", seed=0, n_genes=10,
                                    n_classes=3, image=True,
                                    spot_spacing_px=16)


@pytest.fixture(scope="module")
def tiny_registrar(sim):
    """Tiny DenseNet f + GridNetHex corrector SlideRegistrar (XLA paths)."""
    import jax
    import jax.numpy as jnp

    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    patch = 8
    x0 = jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST, patch, patch, 3))
    variables = g.init(jax.random.key(0), x0)
    registrar = SlideRegistrar.from_gridnet(
        g, variables, patch_size=patch, normalize=None, patch_chunk=None,
        use_pallas_corrector=False,
        corrector_apply=lambda grid: g.apply(
            variables, grid, train=False,
            method=lambda m, x, train: m.corrector(x, train=train)))
    return registrar


@contextlib.contextmanager
def _serve(service):
    httpd = make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{httpd.server_address[1]}"
    finally:
        httpd.shutdown()
        httpd.server_close()


def _get(url):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_image_service_end_to_end(sim, tiny_registrar, tmp_path):
    import jax.numpy as jnp
    from PIL import Image

    service = RegistrationService.from_registrar(
        tiny_registrar, ["L1", "L2", "L3"], model="GridNetHex+TinyDenseNet")

    # ground truth: the in-process registrar on the same inputs
    wsi = jnp.asarray(np.asarray(Image.open(str(sim["image_file"]))))
    pos = read_positions(str(sim["spaceranger_dir"]))
    want = np.asarray(tiny_registrar(wsi, pos))

    with _serve(service) as base:
        code, health = _get(base + "/healthz")
        assert code == 200 and health["status"] == "ok"
        assert health["classes"] == ["L1", "L2", "L3"]
        assert health["needs_image"] is True

        out_csv = tmp_path / "srv_loupe.csv"
        code, resp = _post(base + "/register",
                           {"image": str(sim["image_file"]),
                            "spaceranger": str(sim["spaceranger_dir"]),
                            "loupe": True, "out": str(out_csv)})
        assert code == 200, resp
        got = np.asarray(resp["labels"])
        np.testing.assert_array_equal(got, want)
        assert resp["shape"] == [G.VISIUM_H_ST, G.VISIUM_W_ST]
        assert resp["n_foreground"] == int((want > 0).sum())
        # Loupe CSV: returned text == file written server-side, and it
        # matches the evaluate.to_loupe_annots output exactly
        assert resp["loupe_csv"].startswith("Barcode,AARs")
        assert out_csv.read_text() == resp["loupe_csv"]
        assert resp["loupe_csv"] == service.loupe_csv(
            want, str(sim["spaceranger_dir"]))

        # error surfaces: missing fields / paths -> 400, unknown route -> 404
        code, resp = _post(base + "/register", {"image": str(sim["image_file"])})
        assert code == 400 and "spaceranger" in resp["error"]
        code, resp = _post(base + "/register",
                           {"spaceranger": str(sim["spaceranger_dir"])})
        assert code == 400 and "image" in resp["error"]
        code, resp = _post(base + "/register",
                           {"image": "/nonexistent.jpg",
                            "spaceranger": str(sim["spaceranger_dir"])})
        assert code == 400
        # malformed TYPES are bad requests too, not 500s (documented
        # error contract; an int would otherwise probe a file descriptor)
        code, resp = _post(base + "/register", {"spaceranger": 123})
        assert code == 400 and "string" in resp["error"]
        code, resp = _post(base + "/register",
                           {"image": ["x"],
                            "spaceranger": str(sim["spaceranger_dir"])})
        assert code == 400 and "string" in resp["error"]
        code, _ = _get(base + "/bogus")
        assert code == 404

        code, metrics = _get(base + "/metrics")
        assert code == 200
        assert metrics["requests"] >= 1 and metrics["errors"] >= 3
        assert metrics["stage_seconds"].get("register", 0) > 0

        # warmup path zeroes the counters so /metrics is steady-state only
        service.reset_metrics()
        code, metrics = _get(base + "/metrics")
        assert metrics["requests"] == 0 and metrics["errors"] == 0
        assert metrics["stage_seconds"] == {} and metrics["dispatches"] == 0


def test_count_model_dir_service(sim, tmp_path):
    """from_model_dir on a count model dir == the direct grid forward."""
    import jax
    import jax.numpy as jnp
    import optax

    from gridnext_tpu.data import create_visium_dataset
    from gridnext_tpu.models import CountMLP
    from gridnext_tpu.train import create_train_state, save_checkpoint

    srd = str(sim["spaceranger_dir"])
    grids = create_visium_dataset([srd], spatial=True, use_count=True,
                                  use_image=False)
    x, _ = grids[0]
    from gridnext_tpu.io import unified_cache_path
    from gridnext_tpu.io.unify import read_unified_genes

    genes = read_unified_genes(unified_cache_path(srd))
    classes = ["A", "B", "C"]
    f = CountMLP(n_classes=3)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    state = create_train_state(g, jax.random.key(1),
                               jnp.asarray(np.log1p(x))[None],
                               optax.adam(1e-3))

    model_dir = tmp_path / "count_model"
    model_dir.mkdir()
    save_checkpoint(str(model_dir / "g_state.msgpack"), state,
                    include_opt_state=False)
    (model_dir / "model.json").write_text(json.dumps(
        {"classes": classes, "n_genes": len(genes), "genes": genes,
         "log1p": True, "hd_binning": None, "grid_dims": None,
         "model": "GridNetHex+CountMLP"}))

    service = RegistrationService.from_model_dir(str(model_dir))
    assert service.needs_image is False

    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    logits = g.apply(variables, jnp.asarray(np.log1p(x))[None], train=False)
    want_labels = np.asarray(jnp.argmax(logits[0], -1)) + 1
    want = np.where(x.sum(-1) > 0, want_labels, 0)

    resp = service.handle_register({"spaceranger": srd, "loupe": True})
    np.testing.assert_array_equal(np.asarray(resp["labels"]), want)
    assert resp["hex_coords"] is True
    assert resp["loupe_csv"].startswith("Barcode,AARs")

    # gene-axis guard: a model trained on different genes refuses the cache
    (model_dir / "model.json").write_text(json.dumps(
        {"classes": classes, "n_genes": 2, "genes": ["g1", "g2"],
         "log1p": True, "hd_binning": None, "grid_dims": None,
         "model": "GridNetHex+CountMLP"}))
    bad = RegistrationService.from_model_dir(str(model_dir))
    with pytest.raises(ValueError, match="gene set"):
        bad.handle_register({"spaceranger": srd})


def test_mm_model_dir_service(sim, tmp_path):
    """from_model_dir on a multimodal dir == the direct MM forward."""
    import jax
    import jax.numpy as jnp
    import optax

    from gridnext_tpu.data import create_visium_dataset
    from gridnext_tpu.modeldir import mm_model_from_meta
    from gridnext_tpu.io import unified_cache_path
    from gridnext_tpu.io.unify import read_unified_genes
    from gridnext_tpu.train import create_train_state, save_checkpoint

    srd = str(sim["spaceranger_dir"])
    genes = read_unified_genes(unified_cache_path(srd))
    classes = ["A", "B", "C"]
    meta = {"classes": classes, "patch_px": 8, "window_px": None,
            "patch_chunk": None, "count_chunk": None,
            "n_genes": len(genes), "genes": genes, "log1p": True,
            "count_f": "mlp", "image_f": "tpu",
            "tpu_f": {"stages": [[8, 1]], "stem_patch": 4, "norm": "rms"},
            "hd_binning": None, "grid_dims": None, "dense_ingest": False,
            "model": "GridNetHexMM"}
    g = mm_model_from_meta(meta, classes)

    mm = create_visium_dataset([srd], spatial=True, use_count=True,
                               use_image=True,
                               fullres_image_files=[str(sim["image_file"])],
                               patch_size_px=8, minimum_detection_rate=None)
    (xi, xc), _ = mm[0]
    sample = (jnp.asarray(xi)[None], jnp.asarray(np.log1p(xc))[None])
    state = create_train_state(g, jax.random.key(2), sample,
                               optax.adam(1e-3))
    model_dir = tmp_path / "mm_model"
    model_dir.mkdir()
    save_checkpoint(str(model_dir / "g_state.msgpack"), state,
                    include_opt_state=False)
    (model_dir / "model.json").write_text(json.dumps(meta))

    service = RegistrationService.from_model_dir(str(model_dir))
    assert service.needs_image is True

    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    logits = g.apply(variables, sample, train=False)
    want_labels = np.asarray(jnp.argmax(logits[0], -1)) + 1
    want = np.where(xc.sum(-1) > 0, want_labels, 0)

    resp = service.handle_register({"spaceranger": srd,
                                    "image": str(sim["image_file"])})
    np.testing.assert_array_equal(np.asarray(resp["labels"]), want)

    # --mesh is image-model-only: a silently ignored mesh would misreport
    # the serving topology, so construction fails loudly
    with pytest.raises(ValueError, match="image models"):
        RegistrationService.from_model_dir(str(model_dir), mesh=object())


def test_artifact_service_matches_live(sim, tmp_path, tiny_registrar):
    """from_artifact serves an export-ed blob identically to the live
    registrar -- the resident deployment-unit server."""
    import jax.numpy as jnp
    from PIL import Image

    wsi_np = np.asarray(Image.open(str(sim["image_file"])))
    pos = read_positions(str(sim["spaceranger_dir"]))
    want = np.asarray(tiny_registrar(jnp.asarray(wsi_np), pos))

    n_spots = 5120
    blob = tiny_registrar.export(wsi_np.shape, n_spots=n_spots)
    art = tmp_path / "reg.stablehlo"
    art.write_bytes(blob)
    (tmp_path / "reg.stablehlo.json").write_text(json.dumps(
        {"classes": ["L1", "L2", "L3"], "h_st": G.VISIUM_H_ST,
         "w_st": G.VISIUM_W_ST, "wsi_shape": list(wsi_np.shape),
         "window_px": tiny_registrar.window_size, "n_spots": n_spots,
         "hex_coords": True, "model": "GridNetHex+TinyDenseNet"}))

    service = RegistrationService.from_artifact(str(art))
    with _serve(service) as base:
        code, resp = _post(base + "/register",
                           {"image": str(sim["image_file"]),
                            "spaceranger": str(sim["spaceranger_dir"])})
    assert code == 200, resp
    np.testing.assert_array_equal(np.asarray(resp["labels"]), want)

    # wrong-shape slide -> 400 with the static-shape message
    from PIL import Image as PILImage

    small = tmp_path / "small.jpg"
    PILImage.fromarray(wsi_np[:64, :64]).save(small)
    with _serve(service) as base:
        code, resp = _post(base + "/register",
                           {"image": str(small),
                            "spaceranger": str(sim["spaceranger_dir"])})
    assert code == 400 and "exported for" in resp["error"]


def test_load_artifact_validation(tmp_path):
    with pytest.raises(FileNotFoundError, match="not found"):
        load_artifact(str(tmp_path / "missing.blob"))

    blob = tmp_path / "orphan.blob"
    blob.write_bytes(b"xx")
    with pytest.raises(FileNotFoundError, match="sidecar"):
        load_artifact(str(blob))

    # a grid (count/MM) sidecar has no n_spots: the server refuses it
    (tmp_path / "orphan.blob.json").write_text(json.dumps(
        {"classes": ["a"], "grid_shapes": [[78, 64, 10]]}))
    with pytest.raises(ValueError, match="n_spots"):
        load_artifact(str(blob))


def test_micro_batcher_groups_concurrent_requests():
    """Requests that queue while a dispatch runs batch into ONE
    register_batch call; results route back to the right waiters and a
    dispatch error reaches every member of its group."""
    import jax.numpy as jnp

    from gridnext_tpu.server import _MicroBatcher

    calls = []
    gate = threading.Event()
    entered = threading.Event()       # dispatcher is inside __call__

    class FakeRegistrar:
        hex_coords = True

        def __call__(self, wsi, pos):
            entered.set()
            gate.wait()               # hold the dispatcher: others queue up
            calls.append(("single", 1))
            return np.full((2, 2), pos)

        def register_batch(self, wsis, poss):
            if any(p < 0 for p in poss):
                raise RuntimeError("boom")
            calls.append(("batch", len(poss)))
            return np.stack([np.full((2, 2), p) for p in poss])

    b = _MicroBatcher(FakeRegistrar(), max_batch=8)
    results, errors = {}, {}

    def worker(i):
        try:
            results[i] = b.submit(jnp.zeros((4, 4, 3)), i)
        except Exception as e:
            errors[i] = e

    import time

    def wait_for(cond, what):
        deadline = time.time() + 60
        while not cond():
            if time.time() > deadline:
                raise AssertionError(f"timed out waiting for {what}")
            time.sleep(0.01)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(5)]
    threads[0].start()
    wait_for(entered.is_set, "dispatcher to pick request #0")
    for t in threads[1:]:
        t.start()
    wait_for(lambda: b._q.qsize() == 4, "4 requests to queue")
    gate.set()
    for t in threads:
        t.join(timeout=30)
    assert calls == [("single", 1), ("batch", 4)]
    for i in range(5):
        np.testing.assert_array_equal(results[i], np.full((2, 2), i))

    # error delivery: a failing group raises in EVERY member, and the
    # dispatcher survives to serve the next request
    t_err = [threading.Thread(target=worker, args=(i,)) for i in (-1, -2)]
    gate.clear()
    entered.clear()
    threads[0] = threading.Thread(target=worker, args=(10,))
    threads[0].start()                                # occupies dispatcher
    wait_for(entered.is_set, "dispatcher to pick request #10")
    for t in t_err:
        t.start()
    wait_for(lambda: b._q.qsize() == 2, "error pair to queue")
    gate.set()
    for t in [threads[0]] + t_err:
        t.join(timeout=30)
    assert isinstance(errors[-1], RuntimeError)
    assert isinstance(errors[-2], RuntimeError)
    np.testing.assert_array_equal(results[10], np.full((2, 2), 10))
    assert b.submit(jnp.zeros((4, 4, 3)), 7)[0, 0] == 7   # still alive


def test_micro_batcher_routes_square_hd_dense():
    """Non-hex (square-HD) groups: slides with an exact dense plan register
    per-slide through register_dense; the rest still batch together."""
    import jax.numpy as jnp

    from gridnext_tpu.server import _UNFITTED, _MicroBatcher

    calls = []

    class FakeHDRegistrar:
        hex_coords = False

        def dense_plan(self, wsi, pos):
            return ("exact",) if pos % 2 == 0 else None   # evens go dense

        def register_dense(self, wsi, pos, plan=None):
            calls.append(("dense", pos))
            return np.full((2, 2), pos)

        def __call__(self, wsi, pos):
            calls.append(("single", pos))
            return np.full((2, 2), pos)

        def register_batch(self, wsis, poss):
            calls.append(("batch", tuple(poss)))
            return np.stack([np.full((2, 2), p) for p in poss])

    b = _MicroBatcher(FakeHDRegistrar(), max_batch=8)
    # stop the dispatcher from draining one-by-one: pre-load the queue,
    # then start the thread's work by submitting through the API from
    # threads so they all land before the first cycle picks them up
    import queue as _queue

    done_evts, slots = [], []
    for p in (0, 1, 2, 3):
        done = threading.Event()
        slot = {}
        b._q.put((jnp.zeros((4, 4, 3)), p, _UNFITTED, done, slot))
        done_evts.append(done)
        slots.append(slot)
    for d in done_evts:
        assert d.wait(60)
    for p, slot in zip((0, 1, 2, 3), slots):
        assert "error" not in slot, slot.get("error")
        np.testing.assert_array_equal(slot["labels"], np.full((2, 2), p))
    dense = [c for c in calls if c[0] == "dense"]
    batched = [c for c in calls if c[0] in ("batch", "single")]
    assert {c[1] for c in dense} == {0, 2}
    # odds registered together (one batch) or singly if they raced apart
    flat = []
    for kind, v in batched:
        flat.extend(v if isinstance(v, tuple) else [v])
    assert sorted(flat) == [1, 3]


def test_micro_batcher_survives_malformed_submission():
    """A wsi the grouping can't key (no .shape) fails THAT request instead
    of killing the dispatcher thread; later submissions still serve."""
    import jax.numpy as jnp

    from gridnext_tpu.server import _MicroBatcher

    class FakeRegistrar:
        hex_coords = True

        def __call__(self, wsi, pos):
            return np.full((2, 2), pos)

        def register_batch(self, wsis, poss):
            return np.stack([np.full((2, 2), p) for p in poss])

    b = _MicroBatcher(FakeRegistrar(), max_batch=4)
    with pytest.raises(AttributeError):
        b.submit(object(), 3)          # no .shape -> grouping raises
    assert b._thread.is_alive()
    np.testing.assert_array_equal(b.submit(jnp.zeros((4, 4, 3)), 7),
                                  np.full((2, 2), 7))


def test_micro_batcher_uses_prefitted_dense_plan():
    """A plan computed on the request thread is handed to register_dense
    without re-fitting on the dispatcher."""
    import jax.numpy as jnp

    from gridnext_tpu.server import _MicroBatcher

    class FakeHDRegistrar:
        hex_coords = False

        def dense_plan(self, wsi, pos):
            raise AssertionError("dispatcher must not re-fit a passed plan")

        def register_dense(self, wsi, pos, plan=None):
            assert plan == ("exact", "prefit")
            return np.full((2, 2), pos)

        def __call__(self, wsi, pos):
            return np.full((2, 2), pos)

        def register_batch(self, wsis, poss):
            return np.stack([np.full((2, 2), p) for p in poss])

    b = _MicroBatcher(FakeHDRegistrar(), max_batch=4)
    out = b.submit(jnp.zeros((4, 4, 3)), 5, plan=("exact", "prefit"))
    np.testing.assert_array_equal(out, np.full((2, 2), 5))
    # plan=None means "fitted, not dense": routes to the per-bin path
    out = b.submit(jnp.zeros((4, 4, 3)), 6, plan=None)
    np.testing.assert_array_equal(out, np.full((2, 2), 6))
