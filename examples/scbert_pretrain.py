"""scBERT masked-expression pretraining (the recipe the reference assumes).

The reference fine-tunes an scBERT checkpoint pretrained upstream with
masked-language-modeling over binned expression (TencentAILab scBERT; the
repo itself ships no pretraining code -- llm/scbert.py only consumes the
checkpoint). This example makes the framework self-sufficient: PerformerLM
with per-token outputs + the paper's MLM objective (mask expression bins,
predict the true bin) on simulated counts, using the vendored gene2vec
vocabulary. The pretrained params load straight into ``scBERT`` for the
fine-tuning flow of examples/scbert_count.py (token vocabulary: bins
0..bin_num plus mask id bin_num+1 = PerformerLM's num_tokens=bin_num+2,
llm/scbert.py:98).

Run: PYTHONPATH=. python examples/scbert_pretrain.py [--steps N]
"""

import argparse
import os
import tempfile

import numpy as np


def mask_tokens(rng, tokens, mask_id, mask_prob=0.15):
    """scBERT-style MLM corruption: replace a random subset with the mask id.

    Returns (corrupted, target_mask); loss is computed only at masked spots.
    """
    mask = rng.random(tokens.shape) < mask_prob
    corrupted = np.where(mask, mask_id, tokens)
    return corrupted, mask


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--arrays", type=int, default=2)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--vocab", type=int, default=1024)
    ap.add_argument("--sim-genes", type=int, default=100)
    ap.add_argument("--bin-num", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    out = args.out or tempfile.mkdtemp(prefix="gridnext_scbert_pt_")

    import jax
    import jax.numpy as jnp
    import optax

    from gridnext_tpu.data import simulate_spaceranger_dir
    from gridnext_tpu.models import PerformerLM
    from gridnext_tpu.models.scbert import load_gene2vec_names, preprocess_scbert
    from gridnext_tpu.io.spaceranger import read_feature_matrix, read_feature_names

    gene2vec = load_gene2vec_names()[:args.vocab]
    sim_genes = list(gene2vec[:: len(gene2vec) // args.sim_genes][:args.sim_genes])
    sims = [simulate_spaceranger_dir(os.path.join(out, f"a{i}"), seed=i,
                                     n_genes=args.sim_genes, n_classes=4,
                                     gene_names=sim_genes)
            for i in range(args.arrays)]

    mats = []
    for s in sims:
        frame = read_feature_matrix(s["spaceranger_dir"])
        symbols = list(read_feature_names(
            s["spaceranger_dir"])["gene_symbol"].loc[frame.index])
        mats.append(preprocess_scbert(frame.values.T, symbols,
                                      target_genes=gene2vec)[0])
    X = np.concatenate(mats)  # (spots, vocab) log-binned floats
    tokens_all = np.minimum(X, args.bin_num).astype(np.int32)
    mask_id = args.bin_num + 1
    print(f"pretraining corpus: {tokens_all.shape[0]} spots x "
          f"{tokens_all.shape[1]} genes")

    lm = PerformerLM(num_tokens=args.bin_num + 2, max_seq_len=len(gene2vec),
                     dim=64, depth=2, heads=4)
    rng = jax.random.key(0)
    variables = lm.init({"params": rng, "favor": rng},
                        jnp.zeros((1, len(gene2vec)), jnp.int32))
    params, favor = variables["params"], variables["favor"]
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, tokens, targets, mask):
        def loss_fn(p):
            logits = lm.apply({"params": p, "favor": favor}, tokens,
                              train=False)  # (B, n, num_tokens)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, targets)
            return (ce * mask).sum() / jnp.maximum(mask.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    np_rng = np.random.default_rng(0)
    losses = []
    for step in range(args.steps):
        idx = np_rng.choice(len(tokens_all), size=args.batch, replace=False)
        targets = tokens_all[idx]
        corrupted, mask = mask_tokens(np_rng, targets, mask_id)
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(corrupted), jnp.asarray(targets),
            jnp.asarray(mask, jnp.float32))
        losses.append(float(loss))
        if step % 4 == 0 or step == args.steps - 1:
            print(f"step {step:3d}  masked-bin CE {losses[-1]:.4f}")

    ckpt = os.path.join(out, "scbert_pretrained.msgpack")
    from flax import serialization

    with open(ckpt, "wb") as fh:
        fh.write(serialization.to_bytes(
            {"params": jax.device_get(params), "favor": jax.device_get(favor)}))
    print(f"saved pretrained LM to {ckpt}")
    return losses


if __name__ == "__main__":
    main()
