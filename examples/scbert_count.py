"""scBERT count registration end to end on simulated data (no downloads).

The Tutorial path for transformer-scale count classification: simulate Visium
arrays whose genes are real gene2vec symbols, preprocess raw counts into the
16,906-gene scBERT input space (vendored vocabulary -- the data asset the
reference ships as llm/gene2vec_names.csv), and fine-tune scBERT with the
reference's freeze policy (final norm + last-but-one performer layer + head,
llm/scbert.py:124-132).

Defaults use a small model config and a truncated (--vocab 2048) slice of the
vendored vocabulary so the script finishes in CI time on this 1-CPU container
(~50 s/step at full sequence length); ``--full-scale`` switches to the
reference scBERT config over all 16,906 genes (dim 200, depth 6, heads 10 --
llm/scbert.py:88-104), sized for the TPU.

Run: PYTHONPATH=. python examples/scbert_count.py [--steps N] [--full-scale]
"""

import argparse
import os
import tempfile

import numpy as np


def load_cohort(dirs, annots, gene2vec):
    """Raw counts + symbols + labels per array, the way a scBERT user would."""
    from gridnext_tpu.io import read_annotfile
    from gridnext_tpu.io.spaceranger import (
        positions_to_coord_strings, read_feature_matrix, read_feature_names,
        read_positions)

    per_array = []
    all_labels = set()
    for srd, afile in zip(dirs, annots):
        frame = read_feature_matrix(srd)  # (genes x barcodes), ENSEMBL index
        symbols = list(read_feature_names(srd)["gene_symbol"].loc[frame.index])
        positions = read_positions(srd)
        coords = positions_to_coord_strings(positions, frame.columns)
        coord_strs, annot_strs = read_annotfile(
            afile, position_file=os.path.join(
                srd, "outs", "spatial", "tissue_positions.csv"))
        lut = dict(zip(coord_strs, annot_strs))
        keep = [i for i, c in enumerate(coords) if c in lut]
        labels = [lut[coords[i]] for i in keep]
        all_labels.update(labels)
        per_array.append((frame.values.T[keep], labels, symbols))

    # class encoding over the UNION of annotations across arrays
    # (count_datasets.py:117-125 semantics); var_names are per array -- gene
    # orderings/filtered sets may differ between Spaceranger runs
    class_names = sorted(all_labels)
    enc = {c: i for i, c in enumerate(class_names)}
    xs = [counts for counts, _, _ in per_array]
    ys = [np.array([enc[l] for l in labels], np.int64)
          for _, labels, _ in per_array]
    var_names = [symbols for _, _, symbols in per_array]
    return xs, ys, var_names, class_names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--arrays", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sim-genes", type=int, default=200)
    ap.add_argument("--vocab", type=int, default=2048,
                    help="use the first N gene2vec symbols as the input space")
    ap.add_argument("--val-spots", type=int, default=64)
    ap.add_argument("--full-scale", action="store_true",
                    help="reference scBERT config (dim 200, depth 6, heads 10)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or tempfile.mkdtemp(prefix="gridnext_scbert_")

    import jax
    import jax.numpy as jnp
    import optax

    from gridnext_tpu.data import simulate_spaceranger_dir
    from gridnext_tpu.models import scBERT
    from gridnext_tpu.models.scbert import (
        finetune_param_labels, load_gene2vec_names, preprocess_scbert)

    gene2vec = load_gene2vec_names()  # vendored asset, no path needed
    print(f"gene2vec vocabulary: {len(gene2vec)} symbols")
    if not args.full_scale:
        gene2vec = gene2vec[:args.vocab]

    if args.sim_genes > len(gene2vec):
        ap.error(f"--sim-genes ({args.sim_genes}) must be <= the vocabulary "
                 f"size ({len(gene2vec)}; see --vocab)")

    # --- simulate a cohort whose genes are real gene2vec symbols -----------
    sim_genes = list(gene2vec[:: len(gene2vec) // args.sim_genes][:args.sim_genes])
    sims = [simulate_spaceranger_dir(os.path.join(out, f"array{i}"), seed=i,
                                     n_genes=args.sim_genes, n_classes=4,
                                     gene_names=sim_genes)
            for i in range(args.arrays)]
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]

    xs, ys, var_names, class_names = load_cohort(dirs, annots, gene2vec)
    n_classes = len(class_names)

    # --- preprocess into the 16,906-gene scBERT input space ----------------
    proc = [preprocess_scbert(x, vn, target_genes=gene2vec)[0]
            for x, vn in zip(xs, var_names)]
    x_train = np.concatenate(proc[:-1])
    y_train = np.concatenate(ys[:-1])
    x_val, y_val = proc[-1], ys[-1]
    print(f"train {x_train.shape}, val {x_val.shape}, classes {class_names}")

    # --- model + finetune-frozen optimizer ----------------------------------
    if args.full_scale:
        dim, depth, heads = 200, 6, 10
    else:
        dim, depth, heads = 64, 2, 4
    model = scBERT(n_genes=len(gene2vec), dim=dim, depth=depth, heads=heads,
                   n_classes=n_classes)
    rng = jax.random.key(0)
    variables = model.init({"params": rng, "favor": rng},
                           jnp.zeros((1, len(gene2vec)), jnp.float32))
    params = variables["params"]
    favor = variables["favor"]  # FAVOR+ random projections (fixed here)
    labels = finetune_param_labels(params, depth=depth)
    n_train = sum(int(np.prod(p.shape)) for p, l in
                  zip(jax.tree.leaves(params), jax.tree.leaves(labels))
                  if l == "train")
    print(f"fine-tuning {n_train:,} of "
          f"{sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params)):,} params")
    tx = optax.multi_transform(
        {"train": optax.adam(1e-4), "frozen": optax.set_to_zero()}, labels)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = model.apply({"params": p, "favor": favor}, xb,
                                 train=False)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = (logits.argmax(-1) == yb).mean()
        return params, opt_state, loss, acc

    @jax.jit
    def predict(params, xb):
        return model.apply({"params": params, "favor": favor}, xb,
                           train=False).argmax(-1)

    step_rng = np.random.default_rng(0)
    for step in range(args.steps):
        idx = step_rng.choice(len(x_train), size=args.batch, replace=False)
        params, opt_state, loss, acc = train_step(
            params, opt_state, jnp.asarray(x_train[idx]), jnp.asarray(y_train[idx]))
        if step % 5 == 0 or step == args.steps - 1:
            print(f"step {step:3d}  loss {float(loss):.4f}  acc {float(acc):.3f}")

    # --- validate on (a subsample of) the held-out array ---------------------
    if len(x_val) > args.val_spots:
        sub = np.random.default_rng(1).choice(
            len(x_val), size=args.val_spots, replace=False)
        x_val, y_val = x_val[sub], y_val[sub]
    preds = []
    for i in range(0, len(x_val), args.batch):
        preds.append(np.asarray(predict(params, jnp.asarray(x_val[i:i + args.batch]))))
    val_acc = float((np.concatenate(preds) == y_val).mean())
    print(f"held-out array accuracy: {val_acc:.3f} "
          f"(chance {1.0 / n_classes:.3f})")
    return val_acc


if __name__ == "__main__":
    main()
