import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridnext_tpu.models.performer import (
    Performer,
    PerformerLM,
    SelfAttention,
    local_block_attention,
    redraw_projections,
)
from gridnext_tpu.models.scbert import (
    AttentionClassifier,
    finetune_param_labels,
    preprocess_scbert,
    scBERT,
)


def test_self_attention_shapes():
    m = SelfAttention(dim=32, heads=4, dim_head=8)
    x = jax.random.normal(jax.random.key(0), (2, 20, 32))
    v = m.init(jax.random.key(1), x)
    y = m.apply(v, x)
    assert y.shape == (2, 20, 32)
    assert "favor" in v  # projection matrix collection exists


def test_self_attention_local_global_mix():
    m = SelfAttention(dim=32, heads=4, dim_head=8, local_heads=2,
                      local_window_size=8)
    x = jax.random.normal(jax.random.key(0), (2, 20, 32))
    v = m.init(jax.random.key(1), x)
    y = m.apply(v, x)
    assert y.shape == (2, 20, 32)


def test_local_block_attention_matches_windowed_softmax():
    # With window >= n and non-causal, local attention == full softmax attention.
    key = jax.random.key(0)
    q, k, v = (jax.random.normal(k_, (1, 2, 10, 8))
               for k_ in jax.random.split(key, 3))
    got = np.asarray(local_block_attention(q, k, v, window=16))
    scores = np.einsum("bhnd,bhmd->bhnm", np.asarray(q), np.asarray(k)) / np.sqrt(8)
    want = np.einsum("bhnm,bhmd->bhnd",
                     np.asarray(jax.nn.softmax(scores, -1)), np.asarray(v))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_local_block_attention_causal_respects_order():
    key = jax.random.key(1)
    q, k, v = (jax.random.normal(k_, (1, 1, 12, 4))
               for k_ in jax.random.split(key, 3))
    out1 = np.asarray(local_block_attention(q, k, v, window=4, causal=True))
    # changing future tokens must not alter past outputs
    k2 = k.at[:, :, 8:].set(0.0)
    v2 = v.at[:, :, 8:].set(0.0)
    out2 = np.asarray(local_block_attention(q, k2, v2, window=4, causal=True))
    np.testing.assert_allclose(out1[:, :, :8], out2[:, :, :8], rtol=1e-5, atol=1e-6)


def test_performer_forward_and_remat_equivalence():
    x = jax.random.normal(jax.random.key(0), (2, 16, 24))
    m = Performer(dim=24, depth=2, heads=3, dim_head=8)
    v = m.init(jax.random.key(1), x)
    y = m.apply(v, x)

    m_remat = Performer(dim=24, depth=2, heads=3, dim_head=8, remat=True)
    y_remat = m_remat.apply(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_remat),
                               rtol=1e-5, atol=1e-5)


def test_performer_scalenorm_rezero():
    x = jax.random.normal(jax.random.key(0), (1, 8, 16))
    for kw in ({"use_scalenorm": True}, {"use_rezero": True}):
        m = Performer(dim=16, depth=1, heads=2, dim_head=8, **kw)
        v = m.init(jax.random.key(1), x)
        y = m.apply(v, x)
        assert y.shape == x.shape
    # rezero starts near-identity (gains init to 1e-3, reference parity)
    m = Performer(dim=16, depth=1, heads=2, dim_head=8, use_rezero=True)
    v = m.init(jax.random.key(1), x)
    gains = [g for path, g in jax.tree_util.tree_flatten_with_path(v["params"])[0]
             if "rezero_g" in "/".join(str(getattr(q, "key", q)) for q in path)]
    assert gains and all(np.allclose(g, 1e-3) for g in gains)
    np.testing.assert_allclose(np.asarray(m.apply(v, x)), np.asarray(x),
                               atol=2e-2)


def test_performer_lm_tied_and_untied():
    x = jnp.ones((2, 12), jnp.int32)
    lm = PerformerLM(num_tokens=7, max_seq_len=16, dim=16, depth=1, heads=2,
                     dim_head=8)
    v = lm.init(jax.random.key(0), x)
    y = lm.apply(v, x)
    assert y.shape == (2, 12, 7)

    lm_tied = PerformerLM(num_tokens=7, max_seq_len=16, dim=16, depth=1,
                          heads=2, dim_head=8, tie_embed=True)
    v2 = lm_tied.init(jax.random.key(0), x)
    y2 = lm_tied.apply(v2, x)
    assert y2.shape == (2, 12, 7)

    enc = lm.apply(v, x, return_encodings=True)
    assert enc.shape == (2, 12, 16)


def test_redraw_projections_changes_favor_only():
    x = jax.random.normal(jax.random.key(0), (1, 8, 16))
    m = Performer(dim=16, depth=2, heads=2, dim_head=8)
    v = m.init(jax.random.key(1), x)
    v2 = redraw_projections(v, jax.random.key(42))
    p_old = jax.tree_util.tree_leaves(v["favor"])
    p_new = jax.tree_util.tree_leaves(v2["favor"])
    assert all(a.shape == b.shape for a, b in zip(p_old, p_new))
    assert not any(np.allclose(a, b) for a, b in zip(p_old, p_new))
    # params untouched
    for a, b in zip(jax.tree_util.tree_leaves(v["params"]),
                    jax.tree_util.tree_leaves(v2["params"])):
        np.testing.assert_array_equal(a, b)
    # output changes but remains finite
    y2 = m.apply(v2, x)
    assert np.isfinite(np.asarray(y2)).all()


def test_scbert_classifier_forward():
    n_genes = 64
    m = scBERT(n_genes=n_genes, bin_num=5, dim=16, depth=2, heads=2,
               n_classes=3)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 8, (2, n_genes)),
                    jnp.float32)
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 3)

    labels = finetune_param_labels(v["params"], depth=2)
    vals = set(jax.tree_util.tree_leaves(labels))
    assert vals == {"train", "frozen"}
    # head must be trainable, first-layer attention frozen
    flat = {"/".join(str(getattr(p, "key", p)) for p in path): lbl
            for path, lbl in jax.tree_util.tree_flatten_with_path(labels)[0]}
    assert all(v_ == "train" for k, v_ in flat.items() if k.startswith("to_out"))
    # torch layers[-2] == layers_0 at depth 2 is trainable; the LAST layer is frozen
    assert all(v_ == "frozen" for k, v_ in flat.items() if "layers_1_" in k)
    assert all(v_ == "train" for k, v_ in flat.items() if "layers_0_" in k)
    assert flat["performer_lm/token_emb/embedding"] == "frozen"


def test_scbert_pretraining_head():
    m = scBERT(n_genes=32, bin_num=5, dim=16, depth=1, heads=2)
    x = jnp.zeros((1, 32), jnp.float32)
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 33, 7)  # per-token logits over bin_num+2 tokens


def test_scbert_gene2vec_positional():
    g2v = np.random.default_rng(0).normal(size=(32, 16)).astype(np.float32)
    m = scBERT(n_genes=32, bin_num=5, dim=16, depth=1, heads=2, n_classes=2,
               g2v_weights=g2v)
    x = jnp.zeros((1, 32), jnp.float32)
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 2)


def test_preprocess_scbert():
    X = np.array([[2, 0, 4], [0, 0, 0], [1, 1, 1]], dtype=float)
    var = ["GeneB", "GeneX", "GeneA"]
    target = ["GeneA", "GeneB", "GeneC"]
    out, keep = preprocess_scbert(X, var, target_genes=target, min_depth=1)
    assert keep.tolist() == [True, False, True]
    assert out.shape == (2, 3)
    # row 0: GeneA=4, GeneB=2, GeneC=0 -> depth 6 -> [4,2,0]/6*1e4 -> log2(1+x)
    want0 = np.log2(1 + np.array([4, 2, 0]) / 6 * 1e4)
    np.testing.assert_allclose(out[0], want0, rtol=1e-5)


def test_attention_classifier_shapes():
    m = AttentionClassifier(seq_len=20, out_dim=4)
    x = jax.random.normal(jax.random.key(0), (3, 20, 16))
    v = m.init(jax.random.key(1), x)
    y = m.apply(v, x)
    assert y.shape == (3, 4)


def test_sow_attention_maps():
    m = scBERT(n_genes=16, bin_num=5, dim=16, depth=2, heads=2, n_classes=3,
               sow_attention=True)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 6, (2, 16)), jnp.float32)
    v = m.init(jax.random.key(0), x)
    v = {k: v[k] for k in v if k != "intermediates"}
    logits, state = m.apply(v, x, mutable=["intermediates"])
    assert logits.shape == (2, 3)
    inter = state["intermediates"]
    maps = jax.tree_util.tree_leaves(inter)
    # one (B, n, n) map per layer, rows normalized
    n = 17  # n_genes + appended feature
    per_layer = [l for l in maps if l.ndim == 3 and l.shape[-1] == n]
    assert len(per_layer) == 2
    for w in per_layer:
        assert w.shape == (2, n, n)
        np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-4)


def test_local_attention_mask_blocks_keys():
    key = jax.random.key(2)
    q, k, v = (jax.random.normal(k_, (1, 1, 8, 4))
               for k_ in jax.random.split(key, 3))
    mask = jnp.ones((1, 8), bool).at[0, 4:].set(False)
    out_m = np.asarray(local_block_attention(q, k, v, window=8, mask=mask))
    # equivalent: zero out masked keys entirely and attend over the rest
    scores = np.einsum("bhnd,bhmd->bhnm", np.asarray(q), np.asarray(k)) / 2.0
    scores[..., 4:] = -1e30
    want = np.einsum("bhnm,bhmd->bhnd",
                     np.asarray(jax.nn.softmax(jnp.asarray(scores), -1)),
                     np.asarray(v))
    np.testing.assert_allclose(out_m, want, rtol=1e-4, atol=1e-5)


def test_scbert_generalized_attention_option():
    m = scBERT(n_genes=16, bin_num=5, dim=16, depth=1, heads=2, n_classes=2,
               generalized_attention=True)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 6, (2, 16)), jnp.float32)
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 2) and np.isfinite(np.asarray(y)).all()


def test_local_rotary_rel_pos_properties():
    """Rotary rel-pos on local heads: relative-only scores + norm preserving.

    The reference always enables rel_pos_emb_config for local heads
    (llm/performer_pytorch.py:369); in the current local_attention package
    that is sinusoidal rotary on q/k. Shifting the input by one full window
    must leave interior outputs unchanged (scores depend on offsets only),
    and rotation must preserve per-position vector norms.
    """
    import jax.numpy as jnp

    from gridnext_tpu.models.performer import (
        apply_rotary_pos_emb, local_block_attention, sinusoidal_rotary_freqs)

    rng = np.random.default_rng(0)
    b, h, n, d, w = 2, 2, 96, 16, 16
    q, k, v = (rng.normal(size=(b, h, n, d)).astype(np.float32) for _ in range(3))

    # norm preservation
    freqs = sinusoidal_rotary_freqs(n, d)
    qr, kr = apply_rotary_pos_emb(jnp.asarray(q), jnp.asarray(k), freqs)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(qr), axis=-1),
                               np.linalg.norm(q, axis=-1), rtol=1e-5)

    # rel_pos changes the output at all
    out_plain = np.asarray(local_block_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), window=w))
    out_rot = np.asarray(local_block_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), window=w, rel_pos=True))
    assert np.abs(out_rot - out_plain).max() > 1e-3

    # shift by one window: interior outputs identical (relative-only scores)
    out_shift = np.asarray(local_block_attention(
        jnp.asarray(q[:, :, w:]), jnp.asarray(k[:, :, w:]),
        jnp.asarray(v[:, :, w:]), window=w, rel_pos=True))
    interior = slice(w, n - 2 * w)  # unaffected by either sequence boundary
    np.testing.assert_allclose(out_shift[:, :, interior],
                               out_rot[:, :, w:][:, :, interior],
                               rtol=1e-4, atol=1e-5)


def test_self_attention_local_heads_with_rel_pos():
    import jax
    import jax.numpy as jnp

    from gridnext_tpu.models.performer import SelfAttention

    m = SelfAttention(dim=32, heads=4, dim_head=8, local_heads=2,
                      local_window_size=8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 24, 32)),
                    jnp.float32)
    v = m.init({"params": jax.random.key(0), "favor": jax.random.key(1)}, x)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 24, 32)
    # rel_pos off is a different function (legacy behavior reachable)
    m0 = SelfAttention(dim=32, heads=4, dim_head=8, local_heads=2,
                       local_window_size=8, local_rel_pos=False)
    out0 = m0.apply(v, x, train=False)
    assert np.abs(np.asarray(out - out0)).max() > 1e-4


def test_performer_remat_init_works():
    """remat=True must be usable from scratch: init (no UnexpectedTracerError),
    apply parity with remat=False, grad parity (round-2 review fix)."""
    x = jax.random.normal(jax.random.key(0), (2, 16, 24))
    m_remat = Performer(dim=24, depth=2, heads=3, dim_head=8, remat=True)
    v = m_remat.init(jax.random.key(1), x)          # crashed before the fix
    m = Performer(dim=24, depth=2, heads=3, dim_head=8)
    np.testing.assert_allclose(np.asarray(m_remat.apply(v, x)),
                               np.asarray(m.apply(v, x)), rtol=1e-5, atol=1e-5)

    def loss(p, model):
        return jnp.sum(model.apply({**v, "params": p}, x) ** 2)

    g_r = jax.grad(loss)(v["params"], m_remat)
    g_n = jax.grad(loss)(v["params"], m)
    # recompute reorders fp ops (exp-heavy FAVOR features): tolerance loose
    for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_n)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_local_block_attention_all_masked_row_is_zero():
    """A query whose keys are ALL masked must output zeros, not a uniform
    average over masked values (round-2 review fix)."""
    from gridnext_tpu.models.performer import local_block_attention

    b, h, n, d, w = 1, 2, 8, 4, 4
    q = jax.random.normal(jax.random.key(0), (b, h, n, d))
    k = jax.random.normal(jax.random.key(1), (b, h, n, d))
    v = jax.random.normal(jax.random.key(2), (b, h, n, d))
    mask = jnp.ones((b, n), bool).at[0, 0].set(False)
    # causal: query 0's only visible key is position 0, which is masked
    out = local_block_attention(q, k, v, window=w, causal=True, mask=mask,
                                rel_pos=False)
    np.testing.assert_allclose(np.asarray(out[0, :, 0]), 0.0, atol=1e-7)
    # other rows unaffected vs an unmasked-except-0 run remains finite
    assert np.isfinite(np.asarray(out)).all()


def test_interleaved_rotary_matches_complex_oracle():
    """apply_rotary_interleaved == rotating each adjacent (2i, 2i+1) feature
    pair by angles[pos, i] in the complex plane (independent oracle for the
    reference's rotate_every_two math, llm/performer_pytorch.py:432-444)."""
    from gridnext_tpu.models.performer import (
        apply_rotary_interleaved, interleaved_rotary_angles)

    n, d = 7, 8
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 3, n, d)).astype(np.float32)
    k = rng.normal(size=(2, 3, n, d)).astype(np.float32)
    ang = np.asarray(interleaved_rotary_angles(n, d))
    qr, kr = apply_rotary_interleaved(jnp.asarray(q), jnp.asarray(k),
                                      jnp.asarray(ang))

    def oracle(t):
        z = t[..., ::2] + 1j * t[..., 1::2]          # (..., n, d//2)
        z = z * np.exp(1j * ang)                      # rotate each pair
        out = np.empty_like(t)
        out[..., ::2], out[..., 1::2] = z.real, z.imag
        return out

    np.testing.assert_allclose(np.asarray(qr), oracle(q), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kr), oracle(k), rtol=1e-5, atol=1e-5)
    # rotation preserves per-pair (hence per-vector) norms
    np.testing.assert_allclose(np.linalg.norm(np.asarray(qr), axis=-1),
                               np.linalg.norm(q, axis=-1), rtol=1e-5)


def test_interleaved_rotary_scores_are_relative():
    """Post-rotary q.k dot products depend only on the position offset:
    shifting both positions by s leaves the score unchanged."""
    from gridnext_tpu.models.performer import (
        apply_rotary_interleaved, interleaved_rotary_angles)

    n, d, s = 12, 6, 4
    rng = np.random.default_rng(1)
    qv = rng.normal(size=d).astype(np.float32)
    kv = rng.normal(size=d).astype(np.float32)
    q = jnp.broadcast_to(jnp.asarray(qv), (1, 1, n, d))
    k = jnp.broadcast_to(jnp.asarray(kv), (1, 1, n, d))
    ang = interleaved_rotary_angles(n, d)
    qr, kr = apply_rotary_interleaved(q, k, ang)
    scores = np.asarray(jnp.einsum("bhid,bhjd->bhij", qr, kr))[0, 0]
    i, j = 2, 5
    np.testing.assert_allclose(scores[i, j], scores[i + s, j + s],
                               rtol=1e-5, atol=1e-5)


def test_performer_rotary_option():
    """rotary=True initializes (no new params -- parameterless), changes the
    global-head outputs, and rotary=False stays checkpoint-compatible."""
    x = jax.random.normal(jax.random.key(0), (2, 10, 16))
    kw = dict(dim=16, depth=1, heads=2, dim_head=8, nb_features=8)
    m0 = Performer(**kw)
    m1 = Performer(rotary=True, **kw)
    p0 = m0.init(jax.random.key(1), x)
    y0 = m0.apply(p0, x)
    y1 = m1.apply(p0, x)  # same params load: no extra state
    assert y0.shape == y1.shape
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_neox_rotary_matches_complex_oracle():
    """apply_rotary_pos_emb (half-rotation/NeoX, the local-head convention)
    == rotating each (i, i + d/2) feature pair by freqs[pos, i] in the
    complex plane -- an independent oracle complementing the invariance
    tests (shift-equivariance, norm preservation) that pin the local heads."""
    from gridnext_tpu.models.performer import (apply_rotary_pos_emb,
                                               sinusoidal_rotary_freqs)

    n, d = 9, 8
    rng = np.random.default_rng(3)
    q = rng.normal(size=(2, 2, n, d)).astype(np.float32)
    k = rng.normal(size=(2, 2, n, d)).astype(np.float32)
    freqs = np.asarray(sinusoidal_rotary_freqs(n, d))  # (n, d), halves equal
    ang = freqs[:, : d // 2]
    qr, kr = apply_rotary_pos_emb(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(freqs))

    def oracle(t):
        z = t[..., : d // 2] + 1j * t[..., d // 2:]   # pair (i, i + d/2)
        z = z * np.exp(1j * ang)
        return np.concatenate([z.real, z.imag], axis=-1)

    np.testing.assert_allclose(np.asarray(qr), oracle(q), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kr), oracle(k), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(qr), axis=-1),
                               np.linalg.norm(q, axis=-1), rtol=1e-5)


def test_local_heads_exceeding_heads_rejected():
    """local_heads > heads must error (the reference asserts it too,
    performer_pytorch.py:494) -- a negative global-head slice would
    otherwise run silently with every head local."""
    import jax
    import jax.numpy as jnp
    import pytest

    from gridnext_tpu.models.performer import SelfAttention

    sa = SelfAttention(dim=16, heads=2, dim_head=4, local_heads=3)
    with pytest.raises(ValueError, match="local_heads"):
        sa.init(jax.random.key(0), jnp.zeros((1, 8, 16)))


def test_local_attention_prob_dropout_active_in_train():
    """Local heads carry the reference's attention-probability dropout
    (LocalAttention(dropout=...), performer_pytorch.py:369), not just the
    output-projection dropout."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gridnext_tpu.models.performer import SelfAttention

    sa = SelfAttention(dim=16, heads=2, dim_head=4, local_heads=2,
                       dropout=0.5)
    v = sa.init(jax.random.key(0), jnp.zeros((1, 8, 16)))
    x = jnp.ones((1, 8, 16))
    y1 = sa.apply(v, x, train=True, rngs={"dropout": jax.random.key(1)})
    y2 = sa.apply(v, x, train=True, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(y1, y2)
    np.testing.assert_array_equal(np.asarray(sa.apply(v, x, train=False)),
                                  np.asarray(sa.apply(v, x, train=False)))


def test_favor_recreated_projections_differ_per_layer():
    """Re-creating the 'favor' collection without a params rng (e.g.
    restoring params-only state) must still give every layer a DISTINCT
    projection -- a fixed fallback key would silently degrade FAVOR+ by
    sharing one matrix across all depth layers."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gridnext_tpu.models.performer import Performer

    p = Performer(dim=16, depth=2, heads=2, dim_head=4)
    v = p.init(jax.random.key(0), jnp.zeros((1, 8, 16)))
    _, new = p.apply({"params": v["params"]}, jnp.zeros((1, 8, 16)),
                     mutable=["favor"])
    projs = jax.tree_util.tree_leaves(new["favor"])
    assert len(projs) == 2
    assert not np.allclose(projs[0], projs[1])
