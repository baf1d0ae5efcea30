"""Full-REFERENCE-scale multimodal stack: DenseNet-121 + scBERT in GridNetHexMM.

The reference's scripts/multimodal_model_test.py:52-68 wires a DenseNet-121
image-f and a full-vocabulary scBERT count-f into GridNetHexMM -- and then
leaves the forward pass commented out (:72-80). This artifact actually RUNS
that stack at reference scale on TPU: the vendored 16,906-gene gene2vec
vocabulary (16,907 tokens after the CLS-like append), dim=200/depth=6/
heads=10 scBERT, DenseNet-121 over 224px patches, the full 78x64 Visium
lattice, `patch_chunk` bounding activation memory -- one forward AND one
training step, with measured ms/array (recorded in docs/roadmap.md).

Inputs are generated on device (jax.random under jit) so the measurement is
the model, not the axon relay's host->device link.

Run (real TPU, background it -- remote compiles take minutes):
  PYTHONPATH=.:/root/.axon_site python examples/scbert_mm_fullscale.py
Scaled-down smoke (any backend):
  python examples/scbert_mm_fullscale.py --grid 4 4 --vocab 512 --image-px 32
"""

import argparse
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, nargs=2, default=(78, 64))
    ap.add_argument("--vocab", type=int, default=16906,
                    help="gene vocabulary size (reference: 16,906)")
    ap.add_argument("--image-px", type=int, default=224)
    ap.add_argument("--patch-chunk", type=int, default=128,
                    help="spots per image-f chunk (atonce_patch_limit analog)")
    ap.add_argument("--count-chunk", type=int, default=8,
                    help="spots per count-f chunk (scBERT FF activations at "
                         "16,907 tokens are ~54 MB/spot in f32; 8 matches "
                         "the measured round-2 serving sweet spot)")
    ap.add_argument("--n-classes", type=int, default=7)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gridnext_tpu.models import GridNetHexMM, densenet121, scBERT
    from gridnext_tpu.train import make_gridwise_optimizer, make_steps
    from gridnext_tpu.train.loops import create_train_state

    h, w = args.grid
    n_spots = h * w
    p = args.image_px
    print(f"stack: scBERT(vocab={args.vocab}, dim=200, depth={args.depth}, "
          f"heads=10) + DenseNet-121({p}px) -> GridNetHexMM, grid {h}x{w} "
          f"({n_spots} spots), patch_chunk={args.patch_chunk}, "
          f"count_chunk={args.count_chunk}")

    f_image = densenet121(num_classes=args.n_classes, dtype=jnp.bfloat16)
    # generalized (ReLU) FAVOR features: the measured serving configuration
    # (halves the transcendental cost vs softmax features; docs/roadmap.md)
    f_count = scBERT(n_genes=args.vocab, bin_num=5, dim=200, depth=args.depth,
                     heads=10, n_classes=args.n_classes,
                     generalized_attention=True)
    g = GridNetHexMM(image_classifier=f_image, count_classifier=f_count,
                     n_classes=args.n_classes, patch_chunk=args.patch_chunk,
                     count_chunk=args.count_chunk)

    def make_batch(key):
        ki, kc, ky = jax.random.split(key, 3)
        x_img = jax.random.uniform(ki, (1, h, w, p, p, 3), jnp.bfloat16)
        x_cnt = jax.random.randint(kc, (1, h, w, args.vocab), 0, 5
                                   ).astype(jnp.float32)
        y = jax.random.randint(ky, (1, h, w), 0, args.n_classes + 1
                               ).astype(jnp.int32)
        return x_img, x_cnt, y

    make_batch_j = jax.jit(make_batch)
    x_img, x_cnt, y = make_batch_j(jax.random.key(0))

    print("initializing (eval_shape first keeps host RAM bounded)...")
    t0 = time.time()
    variables = g.init({"params": jax.random.key(1),
                        "favor": jax.random.key(2)}, (x_img, x_cnt))
    n_params = sum(a.size for a in jax.tree_util.tree_leaves(
        variables["params"]))
    print(f"init done in {time.time() - t0:.0f}s; {n_params / 1e6:.1f}M params")

    fwd = jax.jit(lambda v, xi, xc: g.apply(v, (xi, xc), train=False))
    print("compiling forward (minutes via remote compile)...")
    t0 = time.time()
    out = fwd(variables, x_img, x_cnt)
    s0 = float(jnp.sum(out))  # sync
    print(f"first forward (compile+run): {time.time() - t0:.0f}s, "
          f"out {out.shape}, sum {s0:.2f}")

    x_img, x_cnt, y = make_batch_j(jax.random.key(3))
    t0 = time.time()
    s1 = float(jnp.sum(fwd(variables, x_img, x_cnt)))
    dt_fwd = time.time() - t0
    print(f"FORWARD: {dt_fwd * 1e3:.0f} ms/array "
          f"({n_spots / dt_fwd:.1f} spots/s) [sum {s1:.2f}]")

    results = {"forward_ms_per_array": dt_fwd * 1e3}
    if not args.skip_train:
        tx = make_gridwise_optimizer(1e-3)
        state = create_train_state(g, {"params": jax.random.key(1),
                                       "favor": jax.random.key(2)},
                                   (x_img, x_cnt), tx)
        train_step, _ = make_steps(g, tx, "grid")
        print("compiling training step...")
        t0 = time.time()
        state, m = train_step(state, (x_img, x_cnt), y)
        _ = float(m["loss"])
        print(f"first step (compile+run): {time.time() - t0:.0f}s, "
              f"loss {float(m['loss']):.3f}")
        x_img, x_cnt, y = make_batch_j(jax.random.key(4))
        t0 = time.time()
        state, m = train_step(state, (x_img, x_cnt), y)
        loss = float(m["loss"])  # sync
        dt_step = time.time() - t0
        print(f"TRAIN STEP: {dt_step * 1e3:.0f} ms/array "
              f"({n_spots / dt_step:.1f} spots/s fwd+bwd+adam) "
              f"[loss {loss:.3f}]")
        results["train_ms_per_array"] = dt_step * 1e3
    return results


if __name__ == "__main__":
    main()
