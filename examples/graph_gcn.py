"""Graph workflow: Visium arrays as hex graphs + HexGCN node classification.

Builds jraph-style graph dicts from simulated Spaceranger outputs
(``visium_to_graphdata``: spots as nodes, O(N) hex adjacency -- the
reference's graph_datasets.py:18-159 without torch_geometric), pads them to
jit-static shapes, and trains the segment-sum HexGCN the reference leaves to
user code.

Run: PYTHONPATH=. python examples/graph_gcn.py [--steps N] [--out DIR]
"""

import argparse
import os
import tempfile

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--arrays", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    out = args.out or tempfile.mkdtemp(prefix="gridnext_gcn_")

    import jax
    import jax.numpy as jnp
    import optax

    from gridnext_tpu.data.graph_data import pad_graph, visium_to_graphdata
    from gridnext_tpu.data.simulate import simulate_spaceranger_dir
    from gridnext_tpu.models import HexGCN, graph_node_loss

    sims = [simulate_spaceranger_dir(os.path.join(out, f"array{i}"), seed=i,
                                     n_genes=40, n_classes=4)
            for i in range(args.arrays)]
    g = visium_to_graphdata([s["spaceranger_dir"] for s in sims],
                            annot_files=[s["annot_file"] for s in sims])
    # pad to a static shape (jit compiles once; padding edges self-loop on a
    # padding node, so real nodes never receive padding messages)
    g = pad_graph(g, ((g["nodes"].shape[0] + 127) // 128) * 128 + 128)
    print(f"{int(g['node_mask'].sum())} spots across {args.arrays} arrays, "
          f"{g['edges'].shape[1]} edges, classes: {list(g['classes'])}")

    nodes = jnp.asarray(np.log1p(g["nodes"]))
    edges = jnp.asarray(g["edges"])
    y = jnp.asarray(g["y"])
    mask = jnp.asarray(g["node_mask"])

    model = HexGCN(n_classes=len(g["classes"]), hidden=64, depth=3)
    params = model.init(jax.random.key(0), nodes, edges)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def lf(p):
            loss, corr, n = graph_node_loss(
                model.apply(p, nodes, edges), y, mask)
            return loss, (corr, n)

        (loss, (corr, n)), grads = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        # n is the raw labeled-node count: guard against an all-padding batch
        return (optax.apply_updates(params, upd), opt, loss,
                corr / jnp.maximum(n, 1))

    acc = 0.0
    for i in range(args.steps):
        params, opt, loss, acc = step(params, opt)
        if i % 20 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(loss):.4f} acc {float(acc):.3f}")
    print(f"final node accuracy: {float(acc):.3f}")
    return {"acc": float(acc), "n_nodes": int(g["node_mask"].sum())}


if __name__ == "__main__":
    main()
