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

    g2v = np.load(args.gene2vec) if args.gene2vec else None

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

    if args.densenet_ckpt:
        import torch

        from gridnext_tpu.compat.torch_convert import densenet_from_torch
        sd = torch.load(args.densenet_ckpt, map_location="cpu")
        dn = densenet_from_torch(sd)
        variables["params"]["image_classifier"] = dn["params"]
        variables["batch_stats"]["image_classifier"] = dn["batch_stats"]
        print(f"loaded DenseNet weights from {args.densenet_ckpt}")

    if args.scbert_ckpt:
        import torch

        from gridnext_tpu.compat.scbert_convert import scbert_from_torch
        sd = torch.load(args.scbert_ckpt, map_location="cpu")
        sb, g2v_w = scbert_from_torch(sd, depth=6)
        variables["params"]["count_classifier"] = sb["params"]
        if "favor" in sb:
            variables.setdefault("favor", {})["count_classifier"] = sb["favor"]
        print(f"loaded scBERT weights from {args.scbert_ckpt}")

    pp = g.apply(variables, (x_img, x_cnt), method="patch_predictions")
    print("patch_predictions:", pp.shape)  # (1, h, w, 2*n_classes)
    out = g.apply(variables, (x_img, x_cnt))
    print("forward:", out.shape)           # (1, h, w, n_classes)
    assert out.shape == (1, h, w, args.n_classes)
    assert np.isfinite(np.asarray(out)).all()
    print("smoke test OK")


if __name__ == "__main__":
    main()
