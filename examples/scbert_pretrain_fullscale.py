"""scBERT masked-bin PRETRAINING at full reference scale, measured on TPU.

examples/scbert_pretrain.py demonstrates the MLM recipe at toy scale; this
artifact completes the scBERT production story (serving, fine-tune, and
multimodal are measured in docs/roadmap.md) by measuring pretraining
throughput at the real configuration: the 16,906-gene gene2vec vocabulary
(sequences fed at vocabulary length; max_seq_len is 16,907 so the
pretrained params load straight into ``scBERT``, which appends the
CLS-like token -- llm/scbert.py:117-120), dim=200 / depth=6 / heads=10,
``remat`` bounding activation memory and generalized (ReLU) FAVOR features
(the measured 2x serving configuration). The objective is the scBERT
paper's masked-expression-bin prediction: corrupt 15% of binned tokens with
the mask id (bin_num + 1), cross-entropy only at masked positions.

Batches are generated ON DEVICE (tokens, mask, and corruption all under
jit) so the measurement is the model, not the axon relay's host->device
link. Measured steps/s recorded in docs/roadmap.md.

Run (real TPU, background it -- remote compiles take minutes):
  PYTHONPATH=.:/root/.axon_site python examples/scbert_pretrain_fullscale.py
Scaled-down smoke (any backend):
  python examples/scbert_pretrain_fullscale.py --vocab 512 --depth 2 --batch 2
"""

import argparse
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=16906,
                    help="gene vocabulary (reference: 16,906)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--bin-num", type=int, default=5)
    ap.add_argument("--dim", type=int, default=200,
                    help="width; 200 = reference checkpoint shape. Width is "
                         "nearly FREE on TPU (measured flat 200..384, "
                         "docs/roadmap.md): new pretrains should prefer "
                         "256 with --heads 8")
    ap.add_argument("--heads", type=int, default=10)
    ap.add_argument("--mask-prob", type=float, default=0.15)
    ap.add_argument("--timed-steps", type=int, default=3)
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute (params stay f32)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from gridnext_tpu.models import PerformerLM

    mask_id = args.bin_num + 1
    print(f"PerformerLM(num_tokens={args.bin_num + 2}, "
          f"seq_len={args.vocab}, dim={args.dim}, depth={args.depth}, heads={args.heads}, "
          f"remat, generalized features{', bf16' if args.bf16 else ''}), "
          f"batch={args.batch}, mask_prob={args.mask_prob} on "
          f"{jax.devices()[0].device_kind}", flush=True)

    lm = PerformerLM(num_tokens=args.bin_num + 2,
                     max_seq_len=args.vocab + 1,   # scBERT appends 1 token
                     dim=args.dim, depth=args.depth, heads=args.heads,
                     remat=True,
                     generalized_attention=True,
                     dtype=jnp.bfloat16 if args.bf16 else None)

    def make_batch(key):
        kt, km = jax.random.split(key)
        targets = jax.random.randint(kt, (args.batch, args.vocab), 0,
                                     args.bin_num + 1, jnp.int32)
        mask = jax.random.uniform(km, targets.shape) < args.mask_prob
        tokens = jnp.where(mask, mask_id, targets)
        return tokens, targets, mask.astype(jnp.float32)

    make_batch_j = jax.jit(make_batch)
    tokens, targets, mask = make_batch_j(jax.random.key(0))

    t0 = time.time()
    variables = lm.init({"params": jax.random.key(1),
                         "favor": jax.random.key(2)}, tokens)
    params, favor = variables["params"], variables["favor"]
    n_params = sum(a.size for a in jax.tree_util.tree_leaves(params))
    print(f"init {time.time() - t0:.0f}s; {n_params / 1e6:.1f}M params",
          flush=True)

    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, tokens, targets, mask):
        def loss_fn(p):
            logits = lm.apply({"params": p, "favor": favor}, tokens,
                              train=False)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, targets)
            return (ce * mask).sum() / jnp.maximum(mask.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    print("compiling training step (minutes via remote compile)...",
          flush=True)
    t0 = time.time()
    params, opt_state, loss = train_step(params, opt_state, tokens, targets,
                                         mask)
    print(f"first step (compile+run): {time.time() - t0:.0f}s, "
          f"masked-bin CE {float(loss):.4f}", flush=True)

    times = []
    for i in range(args.timed_steps):
        tokens, targets, mask = make_batch_j(jax.random.key(3 + i))
        t0 = time.time()
        params, opt_state, loss = train_step(params, opt_state, tokens,
                                             targets, mask)
        loss = float(loss)                     # sync via scalar fetch
        times.append(time.time() - t0)
        print(f"step {i}: {times[-1] * 1e3:.0f} ms, CE {loss:.4f}",
              flush=True)
    best = min(times)
    print(f"PRETRAIN: {best * 1e3:.0f} ms/step at batch={args.batch} "
          f"({args.batch / best:.2f} seq/s, "
          f"{args.batch * args.vocab / best / 1e6:.2f}M tokens/s)",
          flush=True)
    return {"ms_per_step": best * 1e3, "seq_per_sec": args.batch / best,
            "tokens_per_sec": args.batch * args.vocab / best}


if __name__ == "__main__":
    main()
