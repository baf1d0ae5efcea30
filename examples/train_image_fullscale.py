"""Classic Visium image TRAINING at full-lattice scale: DenseNet f + hex g.

Serving this stack is the bench.py headline (full-slide registration,
DenseNet-121 f + fused hex corrector). This artifact closes the image
TRAINING cell of the measured matrix: one forward and one full gridwise
training step (fwd + bwd + adam, f AND corrector optimizers -- the joint
fine-tuning mode of the reference's train_gridwise with an f_opt,
training.py:159-171) over a (1, 78, 64, 128, 128, 3) patch grid -- 4,992
spots, the workload of Tutorial_visium_image.ipynb cell 13 -- with
``patch_chunk`` + remat bounding f's activation memory exactly like the
reference's atonce_patch_limit checkpointing (gridnet_models.py:85-104).
Measured ms/array recorded in docs/roadmap.md.

``--f tpu`` swaps in TpuPatchClassifier (the recommended new-training f);
``--g-only`` freezes f (the tutorials' default two-stage recipe, f trained
spotwise first).

Inputs are generated on device (jax.random under jit) so the measurement
is the model, not the axon relay's host->device link.

Run (real TPU, background it -- remote compiles take minutes):
  PYTHONPATH=.:/root/.axon_site python examples/train_image_fullscale.py
Scaled-down smoke (any backend):
  python examples/train_image_fullscale.py --grid 6 8 --patch-px 32 \
      --patch-chunk 16 --f-arch tiny
"""

import argparse
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, nargs=2, default=(78, 64),
                    help="Visium odd-right lattice (h, w)")
    ap.add_argument("--patch-px", type=int, default=128,
                    help="pixels per spot patch (BASELINE config 2: 128px)")
    ap.add_argument("--patch-chunk", type=int, default=624,
                    help="spots per f chunk (bounds activation memory; must "
                         "divide h*w)")
    ap.add_argument("--n-classes", type=int, default=7)
    ap.add_argument("--f-arch", choices=("densenet121", "tpu", "tiny"),
                    default="densenet121",
                    help="densenet121 = checkpoint-parity f; tpu = "
                         "TpuPatchClassifier; tiny = smoke-test DenseNet")
    ap.add_argument("--g-only", action="store_true",
                    help="freeze f (two-stage tutorial recipe) instead of "
                         "joint f+g fine-tuning")
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gridnext_tpu.models import (DenseNet, GridNetHex,
                                     TpuPatchClassifier, densenet121)
    from gridnext_tpu.train import make_gridwise_optimizer, make_steps
    from gridnext_tpu.train.loops import create_train_state

    h, w = args.grid
    p = args.patch_px
    n_spots = h * w
    if n_spots % args.patch_chunk:
        raise SystemExit("--patch-chunk must divide h*w")

    if args.f_arch == "densenet121":
        f = densenet121(num_classes=args.n_classes, dtype=jnp.bfloat16)
    elif args.f_arch == "tpu":
        f = TpuPatchClassifier(n_classes=args.n_classes, dtype=jnp.bfloat16)
    else:
        f = DenseNet(growth_rate=8, block_config=(2, 2), num_init_features=16,
                     num_classes=args.n_classes, dtype=jnp.bfloat16)
    g = GridNetHex(patch_classifier=f, n_classes=args.n_classes,
                   patch_chunk=args.patch_chunk)
    mode = "g-only (f frozen)" if args.g_only else "joint f+g"
    print(f"stack: {args.f_arch}({p}px, bf16) -> hex corrector, lattice "
          f"{h}x{w} ({n_spots} spots, "
          f"{n_spots * p * p * 3 * 2 / 1e9:.2f} GB bf16 patches/array), "
          f"patch_chunk={args.patch_chunk}, {mode}")

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
    print("compiling forward (minutes via remote compile)...", flush=True)
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
          f"({n_spots / dt_fwd:,.0f} spots/s) [sum {s1:.2f}]")

    results = {"forward_ms_per_array": dt_fwd * 1e3}
    if not args.skip_train:
        # f_lr=None freezes f via the multi_transform zero-branch
        tx = make_gridwise_optimizer(1e-3,
                                     f_lr=None if args.g_only else 1e-4)
        state = create_train_state(g, jax.random.key(1), x[:, :2, :2], tx)
        train_step, _ = make_steps(g, tx, "grid")
        print("compiling training step...", flush=True)
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
              f"({n_spots / dt_step:,.0f} spots/s fwd+bwd+adam) "
              f"[loss {loss:.3f}]")
        results["train_ms_per_array"] = dt_step * 1e3
    return results


if __name__ == "__main__":
    main()
