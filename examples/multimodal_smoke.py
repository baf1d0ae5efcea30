"""Multimodal model smoke test (scripts/multimodal_model_test.py analog).

Builds the full DenseNet-121 + scBERT + GridNetHexMM stack -- optionally
loading converted PyTorch checkpoints -- and runs a forward pass on random
grids. Unlike the reference script (whose assertion block is commented out,
multimodal_model_test.py:72-80), this one actually executes the forward.

Run: PYTHONPATH=. python examples/multimodal_smoke.py \
    [--densenet-ckpt X.pth] [--scbert-ckpt Y.pth] [--gene2vec g2v.npy]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--densenet-ckpt", default=None)
    ap.add_argument("--scbert-ckpt", default=None)
    ap.add_argument("--gene2vec", default=None)
    ap.add_argument("--n-classes", type=int, default=7)
    ap.add_argument("--n-genes", type=int, default=16906)
    ap.add_argument("--grid", type=int, nargs=2, default=(8, 8),
                    help="grid size for the smoke forward (full Visium: 78 64)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gridnext_tpu.models import GridNetHexMM, densenet121, scBERT

    # Load checkpoints FIRST: the scBERT checkpoint may carry the gene2vec
    # positional table, which is a model-construction parameter.
    dn = sb = None
    g2v = np.load(args.gene2vec) if args.gene2vec else None
    if args.densenet_ckpt:
        import torch

        from gridnext_tpu.compat.torch_convert import densenet_from_torch
        dn = densenet_from_torch(torch.load(args.densenet_ckpt,
                                            map_location="cpu"))
        print(f"loaded DenseNet weights from {args.densenet_ckpt}")
    if args.scbert_ckpt:
        import torch

        from gridnext_tpu.compat.scbert_convert import scbert_from_torch
        sb, g2v_ckpt = scbert_from_torch(
            torch.load(args.scbert_ckpt, map_location="cpu"), depth=6)
        if g2v is None and g2v_ckpt is not None:
            g2v = g2v_ckpt
            print("using gene2vec positional table from the checkpoint")
        print(f"loaded scBERT weights from {args.scbert_ckpt}")

    f_image = densenet121(num_classes=args.n_classes)
    f_count = scBERT(n_genes=args.n_genes, bin_num=5, dim=200, depth=6,
                     heads=10, n_classes=args.n_classes, g2v_weights=g2v)
    g = GridNetHexMM(image_classifier=f_image, count_classifier=f_count,
                     n_classes=args.n_classes, patch_chunk=32)

    h, w = args.grid
    rng = np.random.default_rng(0)
    x_img = jnp.asarray(rng.uniform(size=(1, h, w, 224, 224, 3)), jnp.float32)
    x_cnt = jnp.asarray(rng.uniform(0, 5, size=(1, h, w, args.n_genes)),
                        jnp.float32)

    print("initializing GridNetHexMM (DenseNet-121 + scBERT)...")
    variables = g.init(jax.random.key(0), (x_img, x_cnt))

    if dn is not None:
        variables["params"]["image_classifier"] = dn["params"]
        variables["batch_stats"]["image_classifier"] = dn["batch_stats"]
    if sb is not None:
        variables["params"]["count_classifier"] = sb["params"]
        if "favor" in sb:
            variables.setdefault("favor", {})["count_classifier"] = sb["favor"]

    pp = g.apply(variables, (x_img, x_cnt), method="patch_predictions")
    print("patch_predictions:", pp.shape)  # (1, h, w, 2*n_classes)
    out = g.apply(variables, (x_img, x_cnt))
    print("forward:", out.shape)           # (1, h, w, n_classes)
    assert out.shape == (1, h, w, args.n_classes)
    assert np.isfinite(np.asarray(out)).all()
    print("smoke test OK")


if __name__ == "__main__":
    main()
