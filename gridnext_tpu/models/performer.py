"""Performer (FAVOR+ linear-attention transformer), flax/TPU-native.

Functional parity with the reference's scBERT-adapted Performer
(llm/performer_pytorch.py): softmax/generalized random-feature attention with
periodic projection redraw, optional local-window heads, PreLayerNorm /
ScaleNorm / ReZero wrappers, GLU feed-forward with chunking, absolute /
gene2vec positional embeddings, and token-tied logits.

TPU re-design notes:
* Random projections live in their own ``favor`` variable collection --
  redraw is a pure function (:func:`redraw_projections`) the training loop
  calls every ``feature_redraw_interval`` steps, replacing the reference's
  in-place buffer mutation (llm/performer_pytorch.py:532-546).
* The reference's reversible layers (llm/reversible.py) exist purely to
  avoid storing activations; ``remat=True`` wraps each block in
  ``jax.checkpoint`` -- the idiomatic XLA equivalent (SURVEY.md section 2.3).
* Causal attention uses the chunked-scan kernel in ops.favor instead of the
  fast_transformers CUDA op.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gridnext_tpu.ops import favor


def default_nb_features(dim_head: int) -> int:
    """FAVOR+ random-feature count m = d*ln(d) (performer_pytorch.py:217);
    the checkpoint-parity value -- see docs/roadmap.md for the measured
    speed/capacity trade at smaller m with generalized features."""
    return int(dim_head * math.log(dim_head))


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

class FastAttention(nn.Module):
    """FAVOR+ attention core over (B, H, N, dh) q/k/v."""

    dim_head: int
    nb_features: Optional[int] = None
    ortho_scaling: int = 0
    causal: bool = False
    generalized_attention: bool = False
    kernel_fn: Callable = jax.nn.relu
    no_projection: bool = False
    sow_attention: bool = False  # sow head-mean |implicit attention| maps
    dtype: Optional[jnp.dtype] = None  # storage dtype for the feature maps

    @nn.compact
    def __call__(self, q, k, v):
        if self.no_projection:
            qf = jax.nn.softmax(q, axis=-1)
            kf = jnp.exp(k - jnp.max(k)) if self.causal else jax.nn.softmax(k, axis=-2)
        else:
            nb = self.nb_features or default_nb_features(self.dim_head)
            def init_proj():
                if self.has_rng("params"):
                    rng = self.make_rng("params")
                else:
                    # no params rng (e.g. the collection re-created inside
                    # apply with mutable=['favor']): derive a key from the
                    # module PATH so every layer still gets a DISTINCT
                    # projection -- a fixed key(0) would silently give all
                    # depth layers one identical "random" matrix
                    import zlib

                    rng = jax.random.key(
                        zlib.crc32("/".join(self.path).encode()))
                return favor.orthogonal_gaussian_matrix(
                    rng, nb, self.dim_head, self.ortho_scaling)

            proj = self.variable("favor", "projection", init_proj).value
            if self.generalized_attention:
                qf = favor.generalized_kernel_features(q, proj, self.kernel_fn)
                kf = favor.generalized_kernel_features(k, proj, self.kernel_fn)
            else:
                qf = favor.softmax_kernel_features(q, proj, is_query=True)
                kf = favor.softmax_kernel_features(k, proj, is_query=False)
        if self.sow_attention and not self.causal:
            # interpretation maps (llm/performer_pytorch.py:263-273 analog):
            # retrieve via model.apply(..., mutable=['intermediates'])
            w = jnp.abs(favor.implicit_attention_weights(qf, kf))
            self.sow("intermediates", "attention", jnp.mean(w, axis=-3))
        # NOTE: casting qf/kf/v to bf16 here was measured SLOWER on v5e (the
        # casts break XLA fusion of the feature computation into the
        # attention einsums); keep the feature maps in f32. The dtype field
        # remains for future fused-kernel use.
        if self.causal:
            return favor.causal_linear_attention(qf, kf, v)
        return favor.linear_attention(qf, kf, v)


def sinusoidal_rotary_freqs(n: int, dim: int, dtype=jnp.float32):
    """Rotary angle table of the ``local_attention`` package's
    SinusoidalEmbeddings: theta_i = 10000^(-2i/dim), freqs duplicated over
    the two half-dims (GPT-NeoX half-rotation convention)."""
    inv = 1.0 / (10000.0 ** (jnp.arange(0, dim, 2, dtype=dtype) / dim))
    freqs = jnp.arange(n, dtype=dtype)[:, None] * inv[None, :]
    return jnp.concatenate([freqs, freqs], axis=-1)  # (n, dim)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb(q, k, freqs):
    """q, k: (..., N, d); freqs (N, d). Matches ``local_attention``'s
    apply_rotary_pos_emb (q and k share positions in self-attention)."""
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)

    def rot(t):
        return t * cos + _rotate_half(t) * sin

    return rot(q), rot(k)


def interleaved_rotary_angles(n: int, dim: int, dtype=jnp.float32):
    """Angle table for the *interleaved* (GPT-J) rotary convention used by
    the reference's layer-level helpers (llm/performer_pytorch.py:430-444):
    theta_i = 10000^(-2i/dim), one angle per adjacent (2i, 2i+1) pair."""
    inv = 1.0 / (10000.0 ** (jnp.arange(0, dim, 2, dtype=dtype) / dim))
    return jnp.arange(n, dtype=dtype)[:, None] * inv[None, :]  # (n, dim//2)


def _rotate_every_two(x):
    x1, x2 = x[..., ::2], x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rotary_interleaved(q, k, angles):
    """Interleaved-pair rotary on q and k: each adjacent feature pair
    (2i, 2i+1) is rotated by ``angles[pos, i]`` in the complex plane --
    the math of the reference's ``apply_rotary_pos_emb``/``rotate_every_two``
    (llm/performer_pytorch.py:432-444; dead code there: PerformerLM sets
    ``layer_pos_emb = Always(None)`` on every path, :594-597). q, k:
    (..., N, d); angles (N, d//2). Distinct from the half-rotation (NeoX)
    convention of :func:`apply_rotary_pos_emb`, which matches the
    ``local_attention`` package for the local heads."""
    sin = jnp.repeat(jnp.sin(angles), 2, axis=-1)
    cos = jnp.repeat(jnp.cos(angles), 2, axis=-1)

    def rot(t):
        return t * cos + _rotate_every_two(t) * sin

    return rot(q), rot(k)


def local_block_attention(q, k, v, window: int, causal: bool = False,
                          mask=None, rel_pos: bool = False,
                          attn_dropout: Optional[Callable] = None):
    """Blockwise local attention: each block attends to itself + the previous
    block (+ the next when non-causal) -- the lucidrains ``local_attention``
    window semantics used by the reference (llm/performer_pytorch.py:369).

    ``rel_pos=True`` applies the package's relative positional embedding:
    the reference always passes ``rel_pos_emb_config=(dim_head, local_heads)``
    for its local heads, which in the (unpinned, current) ``local_attention``
    package means parameterless sinusoidal *rotary* embeddings on q and k --
    scores then depend on relative offsets only (shift-equivariance pinned in
    tests/test_performer.py). No weights, so checkpoints with local heads
    convert without extra state.

    q, k, v: (B, H, N, d); optional key ``mask`` (B, N) bool (True = keep).
    N is padded to the window internally.
    """
    b, h, n, d = q.shape
    pad = (-n) % window
    if mask is not None:
        mask = jnp.asarray(mask, bool)
        if pad:
            mask = jnp.pad(mask, ((0, 0), (0, pad)))
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    if rel_pos:
        # package order: autopad first, then rotary over padded positions
        # (pad is at the end, so real-token angles are unaffected)
        q, k = apply_rotary_pos_emb(
            q, k, sinusoidal_rotary_freqs(q.shape[2], d, q.dtype))
    nb = q.shape[2] // window

    def blocks(x):
        return x.reshape(b, h, nb, window, d)

    qb, kb, vb = blocks(q), blocks(k), blocks(v)

    def look(x, offset):
        return jnp.roll(x, -offset, axis=2)

    ks = [look(kb, -1), kb] + ([look(kb, 1)] if not causal else [])
    vs = [look(vb, -1), vb] + ([look(vb, 1)] if not causal else [])
    kcat = jnp.concatenate(ks, axis=3)   # (B, H, nb, k*window, d)
    vcat = jnp.concatenate(vs, axis=3)

    scores = jnp.einsum("bhgnd,bhgmd->bhgnm", qb, kcat) / math.sqrt(d)

    # validity mask: rolled-in blocks from the other end are invalid
    blk = jnp.arange(nb)
    seq_pos = blk[:, None] * window + jnp.arange(window)[None, :]  # (nb, window)
    valid_cols = []
    col_pos = []
    offs = [-1, 0] + ([1] if not causal else [])
    for off in offs:
        nb_idx = blk + off
        ok = (nb_idx >= 0) & (nb_idx < nb)
        pos = nb_idx[:, None] * window + jnp.arange(window)[None, :]
        valid_cols.append(jnp.broadcast_to(ok[:, None], (nb, window)))
        col_pos.append(pos)
    valid = jnp.concatenate(valid_cols, axis=1)       # (nb, k*window)
    col_pos = jnp.concatenate(col_pos, axis=1)

    big_neg = jnp.finfo(scores.dtype).min
    m = valid[None, None, :, None, :]
    # padded tail positions are invalid keys
    m = m & (col_pos[None, None, :, None, :] < n)
    if causal:
        m = m & (col_pos[None, None, :, None, :] <= seq_pos[None, None, :, :, None])
    if mask is not None:
        # key-side input mask: gather the mask at each block's key positions
        key_mask = mask[:, jnp.clip(col_pos, 0, mask.shape[1] - 1)]  # (B, nb, kw)
        m = m & key_mask[:, None, :, None, :]
    scores = jnp.where(m, scores, big_neg)
    attn = jax.nn.softmax(scores, axis=-1)
    # a query whose keys are ALL masked (e.g. causal + mask[b, 0]=False)
    # would otherwise get a uniform softmax over invalid keys, leaking
    # masked/out-of-window values -- zero its output instead (the
    # lucidrains package's own all-masked-row convention)
    any_valid = jnp.any(jnp.broadcast_to(m, scores.shape), axis=-1,
                        keepdims=True)
    attn = jnp.where(any_valid, attn, 0.0)
    if attn_dropout is not None:
        # reference parity: LocalAttention drops out the post-softmax
        # attention weights during training (performer_pytorch.py:369),
        # separate from SelfAttention's output dropout
        attn = attn_dropout(attn)
    out = jnp.einsum("bhgnm,bhgmd->bhgnd", attn, vcat)
    out = out.reshape(b, h, nb * window, d)
    return out[:, :, :n]


class SelfAttention(nn.Module):
    """Multi-head attention with a FAVOR+ global / windowed local head split
    (llm/performer_pytorch.py:344-417)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    local_heads: int = 0
    local_window_size: int = 256
    # reference parity default: SelfAttention always hands LocalAttention a
    # rel_pos_emb_config (llm/performer_pytorch.py:369)
    local_rel_pos: bool = True
    # rotary on the *global* FAVOR heads (the reference's injection point,
    # llm/performer_pytorch.py:397-398). Off by default: PerformerLM never
    # produces a layer pos_emb (:594-597), so parity checkpoints need False.
    rotary: bool = False
    causal: bool = False
    nb_features: Optional[int] = None
    generalized_attention: bool = False
    kernel_fn: Callable = jax.nn.relu
    dropout: float = 0.0
    no_projection: bool = False
    qkv_bias: bool = False
    sow_attention: bool = False
    dtype: Optional[jnp.dtype] = None  # compute dtype for the dense layers

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        if not 0 <= self.local_heads <= h:
            # the reference asserts this too (performer_pytorch.py:494);
            # local_heads > heads would otherwise run SILENTLY with every
            # head local (negative gh slices wrap)
            raise ValueError(f"local_heads={self.local_heads} must be in "
                             f"[0, heads={h}]")
        inner = h * dh
        gh = h - self.local_heads

        def qkv(name):
            return nn.Dense(inner, use_bias=self.qkv_bias, name=name,
                            dtype=self.dtype)(x) \
                .reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = qkv("to_q"), qkv("to_k"), qkv("to_v")

        outs = []
        if gh > 0:
            # FAVOR+ feature maps stay f32 for stable exp()s; the flops live
            # in the Dense layers above/below, which honor self.dtype
            fa = FastAttention(dim_head=dh, nb_features=self.nb_features,
                               causal=self.causal,
                               generalized_attention=self.generalized_attention,
                               kernel_fn=self.kernel_fn,
                               no_projection=self.no_projection,
                               sow_attention=self.sow_attention,
                               dtype=self.dtype,
                               name="fast_attention")
            qg = q[:, :gh].astype(jnp.float32)
            kg = k[:, :gh].astype(jnp.float32)
            vg = v[:, :gh].astype(jnp.float32)
            if mask is not None:
                # reference masks only v (llm/performer_pytorch.py:397-399);
                # phi(k) of masked positions stays in the FAVOR denominator
                vg = vg * mask[:, None, :, None]
            if self.rotary:
                qg, kg = apply_rotary_interleaved(
                    qg, kg, interleaved_rotary_angles(n, dh, jnp.float32))
            outs.append(fa(qg, kg, vg))
        if self.local_heads > 0:
            local_drop = None
            if self.dropout > 0:
                drop = nn.Dropout(self.dropout, name="local_attn_drop")
                local_drop = lambda a: drop(a, deterministic=not train)  # noqa: E731
            outs.append(local_block_attention(
                q[:, gh:], k[:, gh:], v[:, gh:],
                window=self.local_window_size, causal=self.causal, mask=mask,
                rel_pos=self.local_rel_pos, attn_dropout=local_drop))

        out = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        if self.dtype is not None:
            out = out.astype(self.dtype)
        out = nn.Dense(self.dim, name="to_out", dtype=self.dtype)(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0
    glu: bool = False
    chunks: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def ff(xc):
            if self.glu:
                a = nn.Dense(self.dim * self.mult * 2, name="w1",
                             dtype=self.dtype)(xc)
                a, gate = jnp.split(a, 2, axis=-1)
                # reference gates as act(first_half) * second_half
                # (llm/performer_pytorch.py:337-338)
                h = jax.nn.gelu(a, approximate=False) * gate
            else:
                h = jax.nn.gelu(nn.Dense(self.dim * self.mult, name="w1",
                                         dtype=self.dtype)(xc),
                                approximate=False)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            return nn.Dense(self.dim, name="w2", dtype=self.dtype)(h)

        if self.chunks <= 1:
            return ff(x)
        parts = jnp.array_split(x, self.chunks, axis=1)
        return jnp.concatenate([ff(p) for p in parts], axis=1)


class _ScaleNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1,))
        n = jnp.linalg.norm(x, axis=-1, keepdims=True).clip(self.eps)
        return x / n * g


class Performer(nn.Module):
    """depth x (SelfAttention, FeedForward) with pre-norm residuals."""

    dim: int
    depth: int
    heads: int
    dim_head: int = 64
    local_attn_heads: Union[int, Sequence[int]] = 0
    local_window_size: int = 256
    rotary: bool = False          # interleaved rotary on the global heads
    causal: bool = False
    ff_mult: int = 4
    nb_features: Optional[int] = None
    feature_redraw_interval: int = 1000
    remat: bool = False           # activation-memory saving (reversible analog)
    ff_chunks: int = 1
    generalized_attention: bool = False
    kernel_fn: Callable = jax.nn.relu
    use_scalenorm: bool = False
    use_rezero: bool = False
    ff_glu: bool = False
    ff_dropout: float = 0.0
    attn_dropout: float = 0.0
    no_projection: bool = False
    qkv_bias: bool = True
    sow_attention: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        local_heads = self.local_attn_heads
        if isinstance(local_heads, int):
            local_heads = (local_heads,) * self.depth
        assert len(local_heads) == self.depth

        for i, lh in enumerate(local_heads):
            attn = SelfAttention(
                dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                local_heads=lh, local_window_size=self.local_window_size,
                rotary=self.rotary,
                causal=self.causal, nb_features=self.nb_features,
                generalized_attention=self.generalized_attention,
                kernel_fn=self.kernel_fn, dropout=self.attn_dropout,
                no_projection=self.no_projection, qkv_bias=self.qkv_bias,
                sow_attention=self.sow_attention, dtype=self.dtype,
                name=f"layers_{i}_attn")
            ff = FeedForward(dim=self.dim, mult=self.ff_mult,
                             dropout=self.ff_dropout, glu=self.ff_glu,
                             chunks=self.ff_chunks, dtype=self.dtype,
                             name=f"layers_{i}_ff")

            def block(mdl, h, attn=attn, ff=ff, i=i):
                h = h + self._wrapped(attn, h, mask, train, f"wrap_{i}_attn")
                h = h + self._wrapped(ff, h, None, train, f"wrap_{i}_ff")
                return h

            # remat only outside initialization: creating params inside the
            # lifted checkpoint trace raises UnexpectedTracerError, and the
            # saved-memory semantics only matter under grad anyway. Param
            # names are identical either way (pinned by test_performer).
            if self.remat and not self.is_initializing():
                x = nn.remat(block, prevent_cse=False)(self, x)
            else:
                x = block(self, x)
        return x

    def _wrapped(self, mod, x, mask, train, name):
        if self.use_scalenorm:
            x = _ScaleNorm(name=name + "_norm")(x)
        elif self.use_rezero:
            pass  # no pre-norm; residual scaled below
        else:
            x = nn.LayerNorm(name=name + "_norm")(x)
        out = mod(x, mask=mask, train=train) if isinstance(mod, SelfAttention) \
            else mod(x, train=train)
        if self.use_rezero:
            # reference initializes the ReZero gain to 1e-3
            g = self.param(name + "_rezero_g",
                           nn.initializers.constant(1e-3), (1,))
            out = out * g
        return out


class AbsolutePositionalEmbedding(nn.Module):
    dim: int
    max_seq_len: int

    @nn.compact
    def __call__(self, x):
        emb = self.param("embedding", nn.initializers.normal(0.02),
                         (self.max_seq_len, self.dim))
        return emb[: x.shape[1]]


class PerformerLM(nn.Module):
    """Token LM over gene sequences (llm/performer_pytorch.py:553-648).

    ``pos_emb_kind``: 'gene2vec' (requires ``g2v_weights``), 'absolute', or
    'none'. The reference defaults to gene2vec but its weight asset
    (gene2vec_16906.npy) is absent from the repo (SURVEY.md section 8); pass
    the array explicitly if you have it.
    """

    num_tokens: int
    max_seq_len: int
    dim: int
    depth: int
    heads: int
    dim_head: int = 64
    local_attn_heads: Union[int, Sequence[int]] = 0
    local_window_size: int = 256
    rotary: bool = False          # interleaved rotary on the global heads
    causal: bool = False
    ff_mult: int = 4
    nb_features: Optional[int] = None
    feature_redraw_interval: int = 1000
    remat: bool = False
    ff_chunks: int = 1
    ff_glu: bool = False
    emb_dropout: float = 0.0
    ff_dropout: float = 0.0
    attn_dropout: float = 0.0
    generalized_attention: bool = False
    kernel_fn: Callable = jax.nn.relu
    use_scalenorm: bool = False
    use_rezero: bool = False
    no_projection: bool = False
    tie_embed: bool = False
    pos_emb_kind: str = "none"
    g2v_weights: Optional[np.ndarray] = None
    qkv_bias: bool = False
    sow_attention: bool = False
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)
    head_module: Optional[nn.Module] = None  # custom output head (e.g. scBERT)

    def head(self, x, train: bool = False):
        if self.head_module is not None:
            return self.head_module(x, train=train)
        return nn.Dense(self.num_tokens, name="to_out")(x)

    @nn.compact
    def __call__(self, x, return_encodings: bool = False, mask=None,
                 train: bool = False):
        assert x.shape[1] <= self.max_seq_len

        tok_emb = nn.Embed(self.num_tokens, self.dim, name="token_emb")
        tok = tok_emb(x)
        if self.pos_emb_kind == "gene2vec":
            if self.g2v_weights is None:
                raise ValueError("gene2vec positional embedding requires g2v_weights "
                                 "(the reference asset gene2vec_16906.npy)")
            w = jnp.asarray(self.g2v_weights, jnp.float32)
            w = jnp.concatenate([w, jnp.zeros((1, w.shape[1]), w.dtype)], axis=0)
            tok = tok + w[: x.shape[1]]
        elif self.pos_emb_kind == "absolute":
            tok = tok + AbsolutePositionalEmbedding(
                self.dim, self.max_seq_len, name="pos_emb")(x)
        elif self.pos_emb_kind != "none":
            raise ValueError(self.pos_emb_kind)

        if self.dtype is not None:
            tok = tok.astype(self.dtype)
        h = nn.Dropout(self.emb_dropout, deterministic=not train)(tok)
        h = Performer(
            dim=self.dim, depth=self.depth, heads=self.heads,
            dim_head=self.dim_head, local_attn_heads=self.local_attn_heads,
            local_window_size=self.local_window_size, rotary=self.rotary,
            causal=self.causal,
            ff_mult=self.ff_mult, nb_features=self.nb_features,
            feature_redraw_interval=self.feature_redraw_interval,
            remat=self.remat, ff_chunks=self.ff_chunks,
            generalized_attention=self.generalized_attention,
            kernel_fn=self.kernel_fn, use_scalenorm=self.use_scalenorm,
            use_rezero=self.use_rezero, ff_glu=self.ff_glu,
            ff_dropout=self.ff_dropout, attn_dropout=self.attn_dropout,
            no_projection=self.no_projection, qkv_bias=self.qkv_bias,
            sow_attention=self.sow_attention, dtype=self.dtype,
            name="performer")(h, mask=mask, train=train)
        h = h.astype(jnp.float32)
        h = nn.LayerNorm(name="norm")(h)
        if return_encodings:
            return h
        if self.tie_embed:
            return tok_emb.attend(h)
        return self.head(h, train=train)


def redraw_projections(variables: dict, rng, scaling: int = 0) -> dict:
    """Fresh orthogonal projections for every FastAttention (pure function).

    Call every ``feature_redraw_interval`` training steps
    (llm/performer_pytorch.py:532-546 semantics). Pass ``scaling=1`` if the
    model was built with ``ortho_scaling=1`` so redraws match the init
    distribution.
    """
    favor_tree = variables.get("favor")
    if favor_tree is None:
        return variables
    leaves, treedef = jax.tree_util.tree_flatten(favor_tree)
    keys = jax.random.split(rng, len(leaves))
    new = [favor.orthogonal_gaussian_matrix(k, l.shape[0], l.shape[1], scaling)
           for k, l in zip(keys, leaves)]
    out = dict(variables)
    out["favor"] = jax.tree_util.tree_unflatten(treedef, new)
    return out
