import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from gridnext_tpu.data.graph_data import (
    hex_adjacency,
    pad_graph,
    visium_to_graphdata,
)
from gridnext_tpu.data.simulate import simulate_spaceranger_dir
from gridnext_tpu import plotting


@pytest.fixture(scope="module")
def sims(tmp_path_factory):
    root = tmp_path_factory.mktemp("gviz")
    return [simulate_spaceranger_dir(root / f"a{i}", seed=i, n_genes=15,
                                     n_classes=3) for i in range(2)]


def test_hex_adjacency_invariants(sims):
    from gridnext_tpu import geometry as G

    # adjacency over full lattice must match geometry's neighbor table
    from gridnext_tpu.data.simulate import lattice_positions
    _, col, row = lattice_positions()
    edges = hex_adjacency(np.stack([col, row], 1))
    n = G.VISIUM_N_SPOTS
    deg = np.bincount(edges[0], minlength=n)
    assert deg.max() == 6
    # symmetric, no self edges (the reference's own __main__ invariants)
    s = set(map(tuple, edges.T))
    assert all((b, a) in s for a, b in list(s)[:500])
    assert all(a != b for a, b in s)
    nbrs, valid = G.hex_neighbor_table()
    assert len(s) == int(valid.sum())


def test_visium_to_graphdata_multi_array(sims):
    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    g = visium_to_graphdata(dirs, annot_files=annots)
    n0 = int((sims[0]["label_grid"] > 0).sum())
    n1 = int((sims[1]["label_grid"] > 0).sum())
    assert g["nodes"].shape[0] == n0 + n1
    assert g["y"].shape == (n0 + n1,)
    assert list(g["classes"]) == sims[0]["class_names"]
    # second array's edges are offset past the first array's nodes
    assert g["edges"][:, g["n_edge"][0]:].min() >= n0
    assert g["n_node"].tolist() == [n0, n1]

    # graph-level labels supersede node labels
    g2 = visium_to_graphdata(dirs, annot_files=annots, array_lbls=["t1", "t2"])
    assert g2["y"].tolist() == [0, 1]


def test_pad_graph(sims):
    g = visium_to_graphdata(sims[0]["spaceranger_dir"],
                            annot_files=sims[0]["annot_file"])
    n = g["nodes"].shape[0]
    gp = pad_graph(g, n + 10)
    assert gp["nodes"].shape[0] == n + 10
    assert gp["node_mask"].sum() == n
    assert (gp["y"][n:] == -1).all()
    # padding edges are self-loops on the first pad node
    e = g["edges"].shape[1]
    assert (gp["edges"][:, e:] == n).all()


def test_hexgcn_learns_node_classification(sims):
    """HexGCN trains above chance on a padded simulated graph; padding nodes
    never receive real messages (masked loss ignores them)."""
    import jax
    import jax.numpy as jnp
    import optax

    from gridnext_tpu.models import HexGCN, graph_node_loss

    dirs = [s["spaceranger_dir"] for s in sims]
    annots = [s["annot_file"] for s in sims]
    g = visium_to_graphdata(dirs, annot_files=annots)
    g = pad_graph(g, g["nodes"].shape[0] + 16)

    nodes = jnp.asarray(np.log1p(g["nodes"]))
    edges = jnp.asarray(g["edges"])
    y = jnp.asarray(g["y"])
    mask = jnp.asarray(g["node_mask"])

    model = HexGCN(n_classes=len(g["classes"]), hidden=32, depth=2)
    params = model.init(jax.random.key(0), nodes, edges)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def lf(p):
            logits = model.apply(p, nodes, edges)
            loss, corr, n = graph_node_loss(logits, y, mask)
            return loss, (corr, n)

        (loss, (corr, n)), grads = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, upd), opt, loss,
                corr / jnp.maximum(n, 1))

    acc0 = None
    for i in range(60):
        params, opt, loss, acc = step(params, opt)
        if acc0 is None:
            acc0 = float(acc)
    assert float(acc) > 0.7, f"final acc {float(acc)} (chance ~0.33)"
    assert float(acc) > acc0

    # a padding node's logits must be independent of real node features
    logits_a = model.apply(params, nodes, edges)
    nodes_b = nodes.at[0].set(nodes[0] + 100.0)
    logits_b = model.apply(params, nodes_b, edges)
    n_real = int(g["node_mask"].sum())
    np.testing.assert_allclose(np.asarray(logits_a[n_real:]),
                               np.asarray(logits_b[n_real:]), rtol=1e-5)


def test_performance_curves_perfect_predictions():
    rng = np.random.default_rng(0)
    true = rng.integers(0, 3, 300)
    smax = np.eye(3)[true] * 0.98 + 0.01
    fig, ax, mauroc, mauprc = plotting.performance_curves(
        true, smax, class_names=["a", "b", "c"])
    np.testing.assert_allclose(mauroc, [1.0], atol=1e-9)
    np.testing.assert_allclose(mauprc, [1.0], atol=1e-9)

    # multi-condition overlay
    fig, ax, mauroc, mauprc = plotting.performance_curves(
        true, [smax, np.full_like(smax, 1 / 3)], condition_names=["good", "rand"])
    assert mauroc.shape == (2,)
    assert mauroc[0] > mauroc[1]


def test_plot_confusion_and_label_tensor():
    y = np.array([0, 0, 1, 1, 2, 2])
    p = np.array([0, 1, 1, 1, 2, 0])
    fig, ax = plotting.plot_confusion(y, p, class_names=["a", "b", "c"])
    assert fig is not None

    # classes absent from the cohort must NOT collapse the matrix: with
    # observed classes {0, 1, 3} of a 4-class model the heatmap must stay
    # 4x4 so rows align with class_names (labels= pinning)
    y = np.array([0, 1, 3, 3])
    p = np.array([0, 1, 1, 3])
    fig, ax = plotting.plot_confusion(y, p, class_names=list("abcd"))
    mesh = ax.collections[0]
    assert mesh.get_array().size == 16

    grid = np.zeros((6, 5), dtype=int)
    grid[1, 1] = 1
    grid[2, 3] = 2
    ax = plotting.plot_label_tensor(grid, class_names=["x", "y"], Visium=True)
    assert ax is not None


def test_misclass_density_vectorized():
    smax = np.zeros((2, 2, 3))
    smax[0, 0] = [0.7, 0.2, 0.1]
    smax[1, 1] = [0.1, 0.1, 0.8]
    true = np.array([[1, 0], [0, 3]])
    mcd = plotting.misclass_density(smax, true)
    np.testing.assert_allclose(mcd, [[0.3, 0.0], [0.0, 0.2]], atol=1e-9)


def test_class_boundaries_and_hexplots():
    true = np.array([[1, 1, 2], [1, 2, 2], [0, 2, 2]])
    base = np.random.default_rng(0).uniform(size=true.shape)
    fig = plotting.plot_class_boundaries(base, true)
    assert fig is not None

    ax = plotting.plot_hextensor(base, layout="odd-r")
    assert ax is not None
    ax = plotting.plot_hextensor(base, layout="odd-q")
    assert ax is not None
    ax = plotting.plot_squaretensor(base)
    assert ax is not None
    with pytest.raises(ValueError):
        plotting.plot_hextensor(base, layout="bogus")


def test_visium_to_graphdata_mixed_annots_rejected(sims):
    with pytest.raises(ValueError, match="mixes annotated"):
        visium_to_graphdata([s["spaceranger_dir"] for s in sims],
                            annot_files=[sims[0]["annot_file"], None])


def test_plot_cv_curves():
    from gridnext_tpu import plotting

    rng = np.random.default_rng(0)
    tr, va = rng.random((4, 6)), rng.random((4, 6))
    fig, ax = plotting.plot_cv_curves(tr, va)
    assert fig is not None
    # errorbar centers are the across-fold means
    lines = [ln for ln in ax.get_lines() if len(ln.get_xdata()) == 6]
    np.testing.assert_allclose(lines[0].get_ydata(), tr.mean(0))
    import matplotlib.pyplot as plt

    plt.close("all")


def test_performance_curves_absent_class_finite_macro():
    """A class with zero examples in `true` must not poison the macro
    AUROC/AUPRC with NaN (sklearn's roc_curve yields nan tpr there);
    absent classes are excluded from the macro instead."""
    import matplotlib

    matplotlib.use("Agg")
    import numpy as np

    from gridnext_tpu.plotting import performance_curves

    rng = np.random.default_rng(0)
    true = rng.integers(0, 2, 100)      # class 2 absent
    smax = rng.dirichlet([1.0, 1.0, 1.0], 100)
    fig, ax, mroc, mpr = performance_curves(true, smax,
                                            class_names=["a", "b", "c"])
    assert np.isfinite(mroc) and np.isfinite(mpr)
    import matplotlib.pyplot as plt

    plt.close(fig)
