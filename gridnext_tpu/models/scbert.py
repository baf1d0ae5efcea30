"""scBERT: PerformerLM over the gene2vec vocabulary, as a count-spot f.

Parity with llm/scbert.py: expression binning into ``bin_num`` tokens with an
appended CLS-like feature (llm/scbert.py:116-121), the AttentionClassifier
head (llm/scbert.py:136-161), a finetune param-freeze policy (all but the
final norm, the last-but-one performer layer, and the head;
llm/scbert.py:124-132), and the count preprocessing recipe
(llm/scbert.py:16-75) implemented without a scanpy dependency.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gridnext_tpu.models.performer import PerformerLM

SCBERT_N_GENES = 16906  # gene2vec vocabulary size (llm/gene2vec_names.csv)


class AttentionClassifier(nn.Module):
    """Token-embedding pooling head: 1x(dim) conv -> MLP (llm/scbert.py:136-161)."""

    seq_len: int = SCBERT_N_GENES + 1
    dropout: float = 0.0
    h_dim: int = 128
    out_dim: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, n, dim). Torch Conv2d(1,1,(1,dim)) == Dense(dim -> 1).
        if x.shape[1] != self.seq_len:
            # the torch head's fc1 in_features bakes in the sequence length
            # (llm/scbert.py:149-153); catch a mismatch at trace time instead
            # of silently training a differently-shaped head
            raise ValueError(
                f"AttentionClassifier built for seq_len={self.seq_len} but "
                f"got {x.shape[1]} tokens")
        h = nn.Dense(1, name="conv1")(x)[..., 0]  # (B, n)
        h = nn.relu(h)
        h = nn.Dense(512, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.h_dim, name="fc2")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(self.out_dim, name="fc3")(h)


class scBERT(nn.Module):
    """Performer LM over binned log-expression; classifier head optional.

    ``__call__(x, train)`` with x (B, n_genes) float log-binned expression.
    With ``n_classes``: returns (B, n_classes) logits (the count-f interface
    of GridNetHexMM). Without: per-token logits for self-supervised training.
    """

    n_genes: int = SCBERT_N_GENES
    bin_num: int = 5
    dim: int = 200
    depth: int = 6
    heads: int = 10
    # Attention geometry. The reference-checkpoint shape is dim_head=64 with
    # nb_features=None -> dim_head*ln(dim_head)=266 random features. For NEW
    # training, fewer features are a measured throughput lever on TPU (the
    # (B, heads, n_genes, m) feature tensors dominate the layer cost):
    # nb_features=64 is +49% pretraining step rate at full scale and with
    # generalized (ReLU) features m is a capacity knob, not a softmax
    # approximation bound (docs/roadmap.md width/features sweeps).
    dim_head: int = 64
    nb_features: Optional[int] = None
    local_attn_heads: int = 0
    n_classes: Optional[int] = None
    g2v_weights: Optional[np.ndarray] = None
    remat: bool = False
    ff_dropout: float = 0.0
    attn_dropout: float = 0.0
    sow_attention: bool = False  # expose per-layer attention maps (O(n^2)!)
    dtype: Optional[jnp.dtype] = None  # compute dtype (e.g. bf16 serving)
    # ReLU random features: ~1.5x serving throughput at full scale (halves
    # the exp cost; see docs/roadmap.md). Changes the kernel approximation.
    generalized_attention: bool = False

    def setup(self):
        head = None
        if self.n_classes is not None:
            head = AttentionClassifier(seq_len=self.n_genes + 1, dropout=0.0,
                                       h_dim=128, out_dim=self.n_classes,
                                       name="to_out")
        self.lm = PerformerLM(
            num_tokens=self.bin_num + 2, max_seq_len=self.n_genes + 1,
            dim=self.dim, depth=self.depth, heads=self.heads,
            dim_head=self.dim_head, nb_features=self.nb_features,
            local_attn_heads=self.local_attn_heads,
            pos_emb_kind="gene2vec" if self.g2v_weights is not None else "none",
            g2v_weights=self.g2v_weights, remat=self.remat,
            ff_dropout=self.ff_dropout, attn_dropout=self.attn_dropout,
            sow_attention=self.sow_attention, dtype=self.dtype,
            generalized_attention=self.generalized_attention,
            head_module=head, name="performer_lm")

    def __call__(self, x, train: bool = False):
        # Bin: clip values above bin_num, cast to tokens, append zero feature
        # (llm/scbert.py:117-120).
        x = jnp.minimum(x, self.bin_num).astype(jnp.int32)
        cls = jnp.zeros((x.shape[0], 1), jnp.int32)
        x = jnp.concatenate([x, cls], axis=-1)
        return self.lm(x, train=train)


def finetune_param_labels(params: dict, depth: int) -> dict:
    """Optax label tree for scBERT fine-tuning: 'train' vs 'frozen'.

    Trainable: final LayerNorm, the last-but-one performer layer, and the
    classifier head (llm/scbert.py:124-132). Use with
    ``optax.multi_transform({'train': opt, 'frozen': optax.set_to_zero()},
    labels)``.
    """
    def label(path, _):
        keys = [str(getattr(p, "key", p)) for p in path]
        joined = "/".join(keys)
        trainable = (
            keys[0] == "to_out"                    # classifier head (root)
            or "performer_lm/norm" in joined       # final LayerNorm
            or f"layers_{depth - 2}_" in joined    # torch layers[-2]
            or f"wrap_{depth - 2}_" in joined
        )
        return "train" if trainable else "frozen"

    return jax.tree_util.tree_map_with_path(label, params)


def preprocess_scbert(X, var_names: Sequence[str], *, target_genes: Sequence[str],
                      target_depth: float = 1e4, min_genes: Optional[int] = None,
                      min_depth: Optional[float] = None):
    """Reindex counts to a reference gene list, depth-normalize, log2(1+x).

    Pure-numpy port of llm/scbert.py:16-75 (no scanpy/anndata dependency):

    Args:
      X: (n_spots, n_genes) raw counts (dense or scipy sparse).
      var_names: gene names aligned with X's columns.
      target_genes: ordered reference gene list (e.g. the 16,906 gene2vec
        names); genes absent from ``var_names`` become zero columns.

    Returns:
      (X_new, keep_mask): (n_kept, len(target_genes)) float32 processed
      matrix and the row-filter mask applied.
    """
    import scipy.sparse as sp

    if sp.issparse(X):
        X = np.asarray(X.todense())
    X = np.asarray(X, dtype=np.float32)

    target_index = {g: i for i, g in enumerate(target_genes)}
    out = np.zeros((X.shape[0], len(target_genes)), np.float32)
    src_cols, dst_cols = [], []
    seen = set()
    for j, g in enumerate(var_names):
        if g in target_index and g not in seen:  # var_names_make_unique analog
            src_cols.append(j)
            dst_cols.append(target_index[g])
            seen.add(g)
    out[:, dst_cols] = X[:, src_cols]

    keep = np.ones(out.shape[0], bool)
    if min_genes is not None:
        keep &= (out > 0).sum(1) >= min_genes
    if min_depth is not None:
        keep &= out.sum(1) >= min_depth
    out = out[keep]

    depths = out.sum(1, keepdims=True)
    depths[depths == 0] = 1.0
    out = out / depths * target_depth
    out = np.log2(1.0 + out)
    return out, keep


def load_gene2vec_names(path: Optional[str] = None) -> list:
    """Ordered gene2vec gene list defining scBERT's input order.

    With no argument, loads the vendored 16,906-symbol vocabulary
    (``gridnext_tpu/assets/gene2vec_names.csv``, the data asset the reference
    ships as llm/gene2vec_names.csv and consumes at llm/scbert.py:38-42).
    Pass ``path`` to use a custom list.
    """
    if path is None:
        from importlib import resources

        path = resources.files("gridnext_tpu.assets") / "gene2vec_names.csv"
        with path.open() as fh:
            names = [line.strip() for line in fh if line.strip()]
        if len(names) != SCBERT_N_GENES:
            raise RuntimeError(
                f"vendored gene2vec vocabulary has {len(names)} entries, "
                f"expected {SCBERT_N_GENES}")
        return names
    import pandas as pd

    return list(pd.read_csv(path, header=None, index_col=0).index)
