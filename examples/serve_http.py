"""Resident-server example: keep a registration model loaded behind an
HTTP endpoint and push slides through it as requests.

Simulates a small image cohort, builds a SlideRegistrar, starts the
stdlib HTTP server (server.py -- the same machinery as
`python -m gridnext_tpu serve --model DIR`), then issues sequential and
CONCURRENT registration requests. Concurrent requests that queue while a
device dispatch runs micro-batch into one `register_batch` dispatch; the
final /metrics line shows dispatches < requests when batching engaged.

The reference has no serving surface at all -- each registration is a
fresh notebook session over a live torch module (utils.py:20-57).

Run: PYTHONPATH=. python examples/serve_http.py [--requests N]
"""

import argparse
import json
import tempfile
import threading
import time
import urllib.request


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=6,
                    help="concurrent registration requests to fire")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or tempfile.mkdtemp(prefix="gridnext_serve_")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gridnext_tpu import geometry as G
    from gridnext_tpu.data import simulate_spaceranger_dir
    from gridnext_tpu.models import DenseNet, GridNetHex
    from gridnext_tpu.server import RegistrationService, make_server
    from gridnext_tpu.serving import SlideRegistrar

    sims = [simulate_spaceranger_dir(f"{out}/arr{i}", seed=i, n_genes=8,
                                     n_classes=3, image=True,
                                     spot_spacing_px=16)
            for i in range(2)]

    # a small f keeps the example fast anywhere; swap in densenet121 /
    # TpuPatchClassifier + trained variables for real serving
    f = DenseNet(growth_rate=4, block_config=(2,), num_init_features=8,
                 num_classes=3, small_inputs=True)
    g = GridNetHex(patch_classifier=f, n_classes=3)
    patch = 8
    variables = g.init(jax.random.key(0),
                       jnp.zeros((1, G.VISIUM_H_ST, G.VISIUM_W_ST,
                                  patch, patch, 3)))
    registrar = SlideRegistrar.from_gridnet(
        g, variables, patch_size=patch, normalize=None, patch_chunk=None,
        use_pallas_corrector=jax.default_backend() == "tpu",
        corrector_apply=(
            None if jax.default_backend() == "tpu" else
            lambda gr: g.apply(variables, gr, train=False,
                               method=lambda m, x, train:
                               m.corrector(x, train=train))))
    service = RegistrationService.from_registrar(
        registrar, ["WM", "GM", "Layer"], model="GridNetHex+DenseNet(tiny)")

    httpd = make_server(service, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    print("serving on", base)

    def post(body):
        req = urllib.request.Request(base + "/register",
                                     data=json.dumps(body).encode())
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read())

    # one warm request (absorbs the XLA compile), timed cold vs warm
    body0 = {"image": str(sims[0]["image_file"]),
             "spaceranger": str(sims[0]["spaceranger_dir"]), "loupe": True}
    t0 = time.perf_counter()
    resp = post(body0)
    print(f"first request (compile included): {time.perf_counter()-t0:.1f}s,"
          f" {resp['n_foreground']} foreground spots")
    t0 = time.perf_counter()
    post(body0)
    print(f"warm request: {time.perf_counter()-t0:.2f}s")

    # concurrent requests: decode overlaps device work, queued slides
    # micro-batch into shared dispatches
    results, failures = [], []
    def worker(i):
        s = sims[i % len(sims)]
        try:
            results.append(post({"image": str(s["image_file"]),
                                 "spaceranger": str(s["spaceranger_dir"])}))
        except Exception as e:      # surface, don't vacuously pass below
            failures.append(e)
    def fire_round():
        start = time.perf_counter()
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(args.requests)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return time.perf_counter() - start

    fire_round()              # cold: compiles the batched-dispatch shapes
    results.clear()
    dt = fire_round()         # warm: the steady-state serving number
    if failures:
        raise SystemExit(f"{len(failures)} requests failed: {failures[0]}")
    assert len(results) == args.requests
    n_spots = sum(r["n_foreground"] for r in results)
    with urllib.request.urlopen(base + "/metrics") as r:
        metrics = json.loads(r.read())
    print(f"{args.requests} concurrent requests (warm): {dt:.2f}s total "
          f"({n_spots/dt:,.0f} foreground spots/s through the socket)")
    print(f"micro-batching: {metrics['requests']} requests -> "
          f"{metrics['dispatches']} dispatches "
          f"({metrics['batched_slides']} slides rode shared dispatches)")
    per_stage = {k: round(v, 2)
                 for k, v in metrics["stage_seconds"].items()}
    print("per-stage seconds:", per_stage)
    httpd.shutdown()
    httpd.server_close()

    assert all(np.asarray(r["labels"]).shape == (G.VISIUM_H_ST,
                                                 G.VISIUM_W_ST)
               for r in results)
    print("OK")


if __name__ == "__main__":
    main()
