"""Graph models over Visium hex graphs (jraph-style dicts).

The reference builds ``torch_geometric.Data`` containers
(graph_datasets.py:18-159) but ships no GNN that consumes them -- user code
was expected to bring its own model. Here the tier is completed with a
TPU-friendly graph convolution over :mod:`gridnext_tpu.data.graph_data`'s
padded arrays: message passing is two ``segment_sum`` ops over a static-shape
edge list, which XLA lowers to scatter-adds -- no ragged work, fully
jit-compatible with ``pad_graph`` outputs (padding edges self-loop on a
padding node, so real nodes never receive padding messages).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class HexGCN(nn.Module):
    """Node classifier: stacked mean-aggregation graph convolutions.

    Each layer computes ``h' = relu(LN(W_self h + W_nbr mean_{j->i} h_j))``;
    a final Dense maps to class logits. Inputs are the ``nodes`` (N, F) and
    ``edges`` (2, E) arrays of a (padded) graph dict; N and E are static
    under jit.
    """

    n_classes: int
    hidden: int = 128
    depth: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, nodes, edges, train: bool = False):
        send, recv = edges[0], edges[1]
        n = nodes.shape[0]
        deg = jax.ops.segment_sum(jnp.ones(send.shape, nodes.dtype), recv,
                                  num_segments=n)
        inv_deg = 1.0 / jnp.maximum(deg, 1.0)
        h = nodes
        for _ in range(self.depth):
            agg = jax.ops.segment_sum(h[send], recv, num_segments=n)
            agg = agg * inv_deg[:, None]
            h = (nn.Dense(self.hidden)(h)
                 + nn.Dense(self.hidden, use_bias=False)(agg))
            h = nn.relu(nn.LayerNorm()(h))
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(self.n_classes)(h)


def graph_node_loss(logits, y, node_mask=None):
    """Masked node-classification CE.

    ``y`` uses the graph encoding of :func:`visium_to_graphdata` /
    :func:`pad_graph`: labels in [0, C), padding/unlabeled nodes -1.
    Returns (mean_loss, n_correct, n). ``n`` is the RAW labeled-node count
    (so epoch-level sums stay exact); guard accuracy divisions with
    ``jnp.maximum(n, 1)`` — a batch with zero labeled nodes yields n=0.
    """
    valid = y >= 0
    if node_mask is not None:
        valid = valid & node_mask
    safe_y = jnp.where(valid, y, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, safe_y[:, None], axis=-1)[:, 0]
    n = jnp.maximum(valid.sum(), 1)
    loss = -(jnp.where(valid, ll, 0.0).sum()) / n
    correct = (jnp.argmax(logits, -1) == safe_y) & valid
    return loss, correct.sum(), valid.sum()
