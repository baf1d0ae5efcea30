"""Visium HD TRAINING at capture-area scale: 147k-bin grids through GridNet.

Serving a full 16um HD lattice was measured at 3.21M bins/s
(bench.bench_tpu_image_hd, SlideRegistrar.register_dense). This artifact
closes the training side: one forward and one full training step
(fwd + bwd + adam, f AND corrector optimizers) over a (1, 384, 384, 32,
32, 3) image grid -- 147,456 bins, 30x the Visium spot count, ~0.9 GB of
bf16 patches per array -- with `patch_chunk` bounding f's activation
memory. Measured ms/array recorded in docs/roadmap.md.

The reference cannot express this workload at all: its square-lattice
GridNet (gridnet_models.py:51-66) loads per-spot JPEGs through a host
DataLoader and was only ever run on 78x64 Visium lattices.

Inputs are generated on device (jax.random under jit) so the measurement
is the model, not the axon relay's host->device link.

Run (real TPU, background it -- remote compiles take minutes):
  PYTHONPATH=.:/root/.axon_site python examples/visium_hd_fullscale.py
Scaled-down smoke (any backend):
  python examples/visium_hd_fullscale.py --grid 8 8 --patch-px 32 --patch-chunk 16
"""

import argparse
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, nargs=2, default=(384, 384),
                    help="bin lattice (16um binning of the 6.5mm capture "
                         "area ~ 384x384)")
    ap.add_argument("--patch-px", type=int, default=32,
                    help="pixels per bin patch (16um at ~0.5um/px fullres)")
    ap.add_argument("--patch-chunk", type=int, default=1536,
                    help="bins per f chunk (bounds activation memory; must "
                         "divide the bin count)")
    ap.add_argument("--n-classes", type=int, default=7)
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gridnext_tpu.models import GridNet, TpuPatchClassifier
    from gridnext_tpu.train import make_gridwise_optimizer, make_steps
    from gridnext_tpu.train.loops import create_train_state

    h, w = args.grid
    p = args.patch_px
    n_bins = h * w
    assert n_bins % args.patch_chunk == 0, "patch_chunk must divide h*w"
    print(f"stack: TpuPatchClassifier({p}px, bf16) -> GridNet Cartesian "
          f"corrector, lattice {h}x{w} ({n_bins} bins, "
          f"{n_bins * p * p * 3 * 2 / 1e9:.2f} GB bf16 patches/array), "
          f"patch_chunk={args.patch_chunk}")

    f = TpuPatchClassifier(n_classes=args.n_classes, dtype=jnp.bfloat16)
    g = GridNet(patch_classifier=f, n_classes=args.n_classes,
                patch_chunk=args.patch_chunk)

    def make_batch(key):
        ki, ky = jax.random.split(key)
        x = jax.random.uniform(ki, (1, h, w, p, p, 3), jnp.bfloat16)
        y = jax.random.randint(ky, (1, h, w), 0, args.n_classes + 1
                               ).astype(jnp.int32)
        return x, y

    make_batch_j = jax.jit(make_batch)
    x, y = make_batch_j(jax.random.key(0))

    t0 = time.time()
    variables = g.init(jax.random.key(1), x[:, :2, :2])  # tiny-lattice init
    n_params = sum(a.size for a in jax.tree_util.tree_leaves(
        variables["params"]))
    print(f"init done in {time.time() - t0:.0f}s; {n_params / 1e6:.1f}M params")

    fwd = jax.jit(lambda v, xi: g.apply(v, xi, train=False))
    print("compiling forward (minutes via remote compile)...")
    t0 = time.time()
    out = fwd(variables, x)
    s0 = float(jnp.sum(out))  # sync
    print(f"first forward (compile+run): {time.time() - t0:.0f}s, "
          f"out {out.shape}, sum {s0:.2f}")

    x, y = make_batch_j(jax.random.key(2))
    t0 = time.time()
    s1 = float(jnp.sum(fwd(variables, x)))
    dt_fwd = time.time() - t0
    print(f"FORWARD: {dt_fwd * 1e3:.0f} ms/array "
          f"({n_bins / dt_fwd:,.0f} bins/s) [sum {s1:.2f}]")

    results = {"forward_ms_per_array": dt_fwd * 1e3}
    if not args.skip_train:
        tx = make_gridwise_optimizer(1e-3, f_lr=1e-4)  # f AND g train
        state = create_train_state(g, jax.random.key(1), x[:, :2, :2], tx)
        train_step, _ = make_steps(g, tx, "grid")
        print("compiling training step...")
        t0 = time.time()
        state, m = train_step(state, x, y)
        _ = float(m["loss"])
        print(f"first step (compile+run): {time.time() - t0:.0f}s, "
              f"loss {float(m['loss']):.3f}")
        x, y = make_batch_j(jax.random.key(3))
        t0 = time.time()
        state, m = train_step(state, x, y)
        loss = float(m["loss"])  # sync
        dt_step = time.time() - t0
        print(f"TRAIN STEP: {dt_step * 1e3:.0f} ms/array "
              f"({n_bins / dt_step:,.0f} bins/s fwd+bwd+adam) "
              f"[loss {loss:.3f}]")
        results["train_ms_per_array"] = dt_step * 1e3
    return results


if __name__ == "__main__":
    main()
