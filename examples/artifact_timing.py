"""Deployment-artifact timing: exported StableHLO vs the live jitted path.

`SlideRegistrar.export` serializes the full registration pipeline (patch
gather -> f -> fused corrector -> label grid, weights embedded) as a
jax.export StableHLO artifact -- the deployment unit a serving container
reloads with NO model code (the reference has no deployment story at all;
its serving is a Python loop over a live torch module, utils.py:20-57).
Label identity artifact == live is pinned in tests/test_serving.py on the
CPU mesh; this script measures what tests cannot: on REAL TPU hardware,

  1. export cost (trace + lower + serialize) and artifact size,
  2. deserialize cost and compile-on-load (first call) vs the live jit's
     first-call compile,
  3. steady-state throughput: scan-chained ms/slide inside one jit for
     both paths (the artifact inlines as a StableHLO call), plus eager
     per-call wall times (both include the same relay round-trip floor),
  4. a dual-platform (tpu+cpu) portable export made ON the TPU backend,
     reloaded and label-checked in a JAX_PLATFORMS=cpu subprocess -- the
     "export once, serve anywhere" contract.

Inputs are synthesized on device (the axon relay's host->device link would
otherwise dominate; docs/roadmap.md Infrastructure). Measured numbers are
recorded in docs/roadmap.md.

Run (real TPU, background it -- remote compiles take minutes):
  PYTHONPATH=.:/root/.axon_site python examples/artifact_timing.py
Scaled-down smoke (any backend):
  python examples/artifact_timing.py --small --skip-portable
"""

import argparse
import os
import subprocess
import sys
import tempfile
import time

import numpy as np


def _lattice_positions(h_st, w_st, spacing, margin):
    """Full in-tissue lattice as a Spaceranger-style positions frame."""
    import pandas as pd

    from gridnext_tpu import geometry

    oy = np.repeat(np.arange(h_st), w_st)
    ox = np.tile(np.arange(w_st), h_st)
    col, row = geometry.oddr_to_pseudo_hex(ox, oy)
    x, y = geometry.oddr_to_cartesian(ox, oy)
    return pd.DataFrame({
        "in_tissue": np.ones(h_st * w_st, np.int64),
        "array_row": row, "array_col": col,
        "pxl_row_in_fullres": np.rint(y * spacing).astype(np.int64) + margin,
        "pxl_col_in_fullres": np.rint(x * spacing).astype(np.int64) + margin,
    })


def _eager_times(fn, n):
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn())                       # fetch = the only reliable sync
        out.append(time.perf_counter() - t0)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=16,
                    help="scan-chained registrations per timed dispatch")
    ap.add_argument("--calls", type=int, default=8,
                    help="eager per-call timing samples")
    ap.add_argument("--small", action="store_true",
                    help="12x10 lattice smoke config (any backend)")
    ap.add_argument("--skip-portable", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gridnext_tpu.models import TpuPatchClassifier
    from gridnext_tpu.models.gridnet import _HexCorrector
    from gridnext_tpu.ops.hexcorrector_pallas import fold_corrector_params
    from gridnext_tpu.serving import (SlideRegistrar,
                                      load_exported_registration)

    h_st, w_st = (12, 10) if args.small else (78, 64)
    n_classes = 7
    patch = args.patch
    spacing, margin = int(patch * 1.07), patch
    pos = _lattice_positions(h_st, w_st, spacing, margin)
    n_spots = h_st * w_st
    wsi_h = int(pos["pxl_row_in_fullres"].max() + margin)
    wsi_w = int(pos["pxl_col_in_fullres"].max() + margin)
    print(f"lattice {h_st}x{w_st} ({n_spots} spots @ {patch}px), synthetic "
          f"WSI {wsi_h}x{wsi_w}x3 ({wsi_h * wsi_w * 3 / 1e9:.2f} GB) on "
          f"{jax.devices()[0].device_kind}", flush=True)

    f = TpuPatchClassifier(n_classes=n_classes, dtype=jnp.bfloat16)
    f_vars = f.init(jax.random.key(0),
                    jnp.zeros((1, patch, patch, 3), jnp.float32))
    corr = _HexCorrector(n_classes=n_classes, use_bn=True)
    corr_vars = corr.init(jax.random.key(1),
                          jnp.zeros((1, h_st, w_st, n_classes)))
    kernels, biases, relu_flags = fold_corrector_params(
        corr_vars["params"], corr_vars["batch_stats"])

    def f_apply(patches):
        return f.apply(f_vars, patches, train=False)

    chunk = n_spots if n_spots < 624 else 624
    reg = SlideRegistrar(f_apply, kernels, biases, relu_flags,
                         patch_size=patch, patch_chunk=chunk,
                         h_st=h_st, w_st=w_st)
    wsi = jax.jit(lambda k: jax.random.randint(
        k, (wsi_h, wsi_w, 3), 0, 255, jnp.uint8))(jax.random.key(2))

    # --- live path: first-call compile, then eager steady state -----------
    t0 = time.perf_counter()
    live_labels = reg(wsi, pos)
    t_live_compile = time.perf_counter() - t0
    live_times = _eager_times(lambda: reg(wsi, pos), args.calls)
    print(f"live jit: first call (compile) {t_live_compile:.1f} s, then "
          f"median {np.median(live_times) * 1e3:.1f} ms/call "
          f"(min {min(live_times) * 1e3:.1f})", flush=True)

    # --- export / reload ---------------------------------------------------
    t0 = time.perf_counter()
    blob = reg.export(wsi.shape, n_spots=n_spots)
    t_export = time.perf_counter() - t0
    t0 = time.perf_counter()
    art = load_exported_registration(blob)
    t_load = time.perf_counter() - t0
    print(f"export {t_export:.1f} s -> {len(blob) / 1e6:.1f} MB artifact; "
          f"deserialize {t_load * 1e3:.0f} ms", flush=True)

    oy, ox, y_px, x_px = reg.spot_inputs(wsi.shape, pos, n_spots=n_spots)
    a_in = tuple(jnp.asarray(v) for v in (oy, ox, y_px, x_px))
    art_j = jax.jit(art)
    t0 = time.perf_counter()
    art_labels = np.asarray(art_j(wsi, *a_in))
    t_art_compile = time.perf_counter() - t0
    art_times = _eager_times(lambda: art_j(wsi, *a_in), args.calls)
    print(f"artifact: first call (compile-on-load) {t_art_compile:.1f} s, "
          f"then median {np.median(art_times) * 1e3:.1f} ms/call "
          f"(min {min(art_times) * 1e3:.1f})", flush=True)
    # Label parity. On TPU the artifact reproduces the live labels exactly
    # (the measured claim this script exists to pin); off-TPU, two
    # separately compiled XLA programs may flip argmax at bf16 near-ties,
    # so enforce the device-portable contract instead: flips only at
    # sub-tolerance top-2 margins, and only onto the runner-up class
    # (serving.label_parity_report).
    from gridnext_tpu.serving import label_parity_report

    if (art_labels == live_labels).all():
        n_flips = 0
        print("labels: artifact == live (exact)", flush=True)
    else:
        logits, _fg = reg.register_logits(wsi, pos)
        n_flips = label_parity_report(live_labels, art_labels, logits)
        assert jax.default_backend() != "tpu", \
            "artifact != live on TPU -- the exactness contract is broken"
        print(f"labels: artifact == live up to {n_flips} near-tie flips "
              f"({n_flips / art_labels.size:.2%} of sites; expected only "
              "off-TPU, where separately compiled XLA programs may reorder "
              "float reductions)", flush=True)

    # --- scan-chained compute: relay-latency-free ms/slide ------------------
    # Jitter the spot centers per iteration (a different registration each
    # time) and chain REPEATS inside one jit; fetch one scalar. The artifact
    # call inlines into the scan body as a StableHLO module call, so this is
    # the pure compute comparison.
    y0, x0 = jnp.asarray(y_px), jnp.asarray(x_px)
    oyj, oxj = jnp.asarray(oy), jnp.asarray(ox)

    def chained(call):
        # NOTE: the WSI must be an ARGUMENT, not a closure -- a closed-over
        # device array lowers as an HLO constant, and a 0.25 GB constant
        # blows the relay's remote-compile request limit (HTTP 413).
        def run(wsi_arg, key):
            def body(carry, k):
                dy, dx = jax.random.randint(k, (2, n_spots), -4, 5,
                                            jnp.int32)
                lab = call(wsi_arg, oyj, oxj, y0 + dy, x0 + dx)
                return carry + jnp.sum(lab), None

            tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                  jax.random.split(key, args.repeats))
            return tot

        return jax.jit(run)

    results = {"export_s": t_export, "blob_mb": len(blob) / 1e6,
               "deserialize_s": t_load, "live_compile_s": t_live_compile,
               "artifact_compile_s": t_art_compile,
               "live_call_ms": float(np.median(live_times)) * 1e3,
               "artifact_call_ms": float(np.median(art_times)) * 1e3}
    live_fn = chained(lambda w, a, b, c, d: reg._register(w, a, b, c, d))
    art_fn = chained(art)
    for name, fn in (("live", live_fn), ("artifact", art_fn)):
        int(fn(wsi, jax.random.key(3)))        # compile
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            int(fn(wsi, jax.random.key(4 + i)))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / args.repeats
        results[f"chained_{name}_ms_slide"] = per * 1e3
        print(f"scan-chained {name}: {per * 1e3:.1f} ms/slide "
              f"({n_spots / per:,.0f} spots/s)", flush=True)

    # --- portable dual-platform export, served on CPU ----------------------
    if args.skip_portable:
        return results
    # Pallas kernels lower for the current backend only; the portable unit
    # uses the pure-XLA extractor + corrector. Small shapes: the CPU side
    # must run in seconds.
    ph, pw = 12, 10
    ppos = _lattice_positions(ph, pw, spacing, margin)
    pn = ph * pw
    pwsi_shape = (int(ppos["pxl_row_in_fullres"].max() + margin),
                  int(ppos["pxl_col_in_fullres"].max() + margin), 3)

    def corr_apply(grid):
        return corr.apply(corr_vars, grid, train=False)

    preg = SlideRegistrar(f_apply, patch_size=patch, patch_chunk=pn,
                          h_st=ph, w_st=pw, use_pallas_corrector=False,
                          corrector_apply=corr_apply, extractor="xla")
    here = jax.default_backend()
    platforms = [here, "cpu"] if here != "cpu" else ["cpu"]
    t0 = time.perf_counter()
    pblob = preg.export(pwsi_shape, n_spots=pn, platforms=platforms)
    print(f"portable export (platforms={platforms}): "
          f"{time.perf_counter() - t0:.1f} s -> {len(pblob) / 1e6:.1f} MB",
          flush=True)

    pwsi = np.asarray(jax.jit(lambda k: jax.random.randint(
        k, pwsi_shape, 0, 255, jnp.uint8))(jax.random.key(7)))
    want = np.asarray(preg(jnp.asarray(pwsi), ppos))
    pin = preg.spot_inputs(pwsi_shape, ppos, n_spots=pn)
    with tempfile.TemporaryDirectory(prefix="gnx_artifact_") as td:
        npz = os.path.join(td, "case.npz")
        np.savez(npz, blob=np.frombuffer(pblob, np.uint8), wsi=pwsi,
                 oy=pin[0], ox=pin[1], y_px=pin[2], x_px=pin[3], want=want)
        code = (
            "import numpy as np, time\n"
            "from gridnext_tpu.serving import load_exported_registration\n"
            f"d = np.load({npz!r})\n"
            "fn = load_exported_registration(d['blob'].tobytes())\n"
            "t0 = time.perf_counter()\n"
            "got = np.asarray(fn(d['wsi'], d['oy'], d['ox'], d['y_px'],"
            " d['x_px']))\n"
            "agree = float((got == d['want']).mean())\n"
            "assert agree >= 0.98, f'label agreement {agree:.3f}'\n"
            "print(f'cpu subprocess: load+call {time.perf_counter()-t0:.2f}"
            " s; label agreement vs tpu-live {agree:.3f} (bf16 rounding "
            "differs across backends)')\n")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=600)
        sys.stderr.write(r.stderr[-2000:])
        print(r.stdout, end="", flush=True)
        if r.returncode:
            raise SystemExit(f"cpu subprocess failed ({r.returncode})")
    return results


if __name__ == "__main__":
    main()
