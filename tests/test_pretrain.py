"""Masked-LM pretraining (train_mlm / pretrain-scbert).

The upstream recipe the reference's scBERT checkpoint assumes
(TencentAILab scBERT; the reference repo ships no pretraining code --
llm/scbert.py:79 only consumes the checkpoint). Covers the public
``train_mlm`` loop, its mesh path, pad-row masking, and the CLI
pretrain-scbert -> train-mm --scbert-ckpt transfer contract.
"""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gridnext_tpu.models import PerformerLM
from gridnext_tpu.train import create_train_state, train_mlm
from gridnext_tpu.train.loops import make_mlm_steps

BIN_NUM = 5
MASK_ID = BIN_NUM + 1
NUM_TOKENS = BIN_NUM + 2


def _tiny_lm(seq_len):
    return PerformerLM(num_tokens=NUM_TOKENS, max_seq_len=seq_len + 1,
                       dim=16, depth=2, heads=2, generalized_attention=True)


def _corpus(n=96, seq=32, seed=0):
    # skewed bin marginals (real binned expression is mostly bin 0), so the
    # MLM loss has structure to learn fast
    rng = np.random.default_rng(seed)
    return rng.choice(BIN_NUM + 1, size=(n, seq),
                      p=[0.7, 0.15, 0.08, 0.04, 0.02, 0.01]).astype(np.int32)


def test_train_mlm_learns_and_checkpoints(tmp_path):
    tokens = _corpus()
    out = str(tmp_path / "lm.msgpack")
    state, val_hist, train_hist = train_mlm(
        _tiny_lm(tokens.shape[1]),
        {"train": tokens, "val": tokens[:32]},
        mask_id=MASK_ID, learning_rate=5e-3, num_epochs=3, batch_size=32,
        outfile=out, redraw_every=2, verbose=False)
    # improves across epochs and ends below the uniform-prediction floor
    assert train_hist[-1] < train_hist[0]
    assert min(val_hist) < np.log(NUM_TOKENS)
    # best-val checkpoint + resume point on disk
    assert os.path.exists(out) and os.path.exists(out + ".latest")
    # returned state carries the best-val params (device_get'able tree)
    assert int(state.step) == 3 * 3  # 96/32 batches x 3 epochs


def test_mlm_pad_rows_are_ignored():
    tokens = _corpus(n=8)
    model = _tiny_lm(tokens.shape[1])
    tx = optax.sgd(1e-2)
    state = create_train_state(model, jax.random.key(0),
                               jnp.asarray(tokens[:1]), tx)
    _, eval_step = make_mlm_steps(model, tx, mask_id=MASK_ID)
    dummy = jnp.zeros((8, 1), jnp.int8)
    # all-pad batch: zero valid positions, finite zero loss
    y_pad = jnp.full_like(jnp.asarray(tokens), -1)
    m = eval_step(state, dummy, y_pad)
    assert int(m["n"]) == 0 and float(m["loss"]) == 0.0
    # half-pad batch counts exactly the real rows' masked positions
    y_half = jnp.asarray(np.concatenate(
        [tokens[:4], np.full_like(tokens[:4], -1)]))
    m_half = eval_step(state, dummy, y_half)
    m_real = eval_step(state, dummy, jnp.asarray(tokens[:4]))
    # the eval mask key is FIXED but shape-dependent draws differ, so compare
    # against the half batch's own first-four-rows mask: valid count must be
    # strictly positive and smaller than a full batch's
    assert 0 < int(m_half["n"]) < int(eval_step(
        state, dummy, jnp.asarray(tokens))["n"])
    assert np.isfinite(float(m_half["loss"]))
    del m_real


def test_train_mlm_mesh_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    tokens = _corpus(n=44)  # batch 16 -> final batch of 12 pads

    def run(**kw):
        model = _tiny_lm(tokens.shape[1])
        tx = optax.sgd(1e-2)
        state = create_train_state(model, jax.random.key(0),
                                   jnp.asarray(tokens[:1]), tx)
        return train_mlm(model, {"train": tokens, "val": tokens[:12]},
                         mask_id=MASK_ID, state=state, tx=tx, num_epochs=2,
                         batch_size=16, verbose=False, **kw)

    s1, vh1, th1 = run()
    s8, vh8, th8 = run(mesh_shape={"data": 4, "spot": 2})
    np.testing.assert_allclose(th1, th8, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vh1, vh8, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_train_mlm_sequence_parallel_matches_single_device():
    """The PUBLIC sequence-parallel pretraining path: train_mlm with a
    'seq' mesh axis shards the gene-token axis (the FAVOR feature tensors
    -- the measured memory hog at full scBERT scale, docs/roadmap.md) and
    must reproduce single-device training exactly. Batch divisibility is
    against the 'data' axis alone (2 here, not 8): sequence parallelism
    exists precisely so small batches can span many chips."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    tokens = _corpus(n=20, seq=32)  # batch 6 over data=2; final batch pads

    def run(**kw):
        model = _tiny_lm(tokens.shape[1])
        tx = optax.sgd(1e-2)
        state = create_train_state(model, jax.random.key(0),
                                   jnp.asarray(tokens[:1]), tx)
        return train_mlm(model, {"train": tokens, "val": tokens[:6]},
                         mask_id=MASK_ID, state=state, tx=tx, num_epochs=2,
                         batch_size=6, verbose=False, **kw)

    s1, vh1, th1 = run()
    s8, vh8, th8 = run(mesh_shape={"data": 2, "seq": 4})
    np.testing.assert_allclose(th1, th8, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vh1, vh8, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_train_mlm_preempt_resume_matches_uninterrupted(tmp_path):
    """Mid-epoch preemption during MLM pretraining resumes bit-identically:
    the on-device corruption is keyed on state.step, so the restored step
    counter reproduces the exact mask sequence for the remaining batches."""
    from gridnext_tpu.train import TrainingPreempted
    from gridnext_tpu.train.preempt import (
        install_preemption_handler,
        uninstall_preemption_handler,
    )

    tokens = _corpus(n=96)

    def run(out, resume=None):
        return train_mlm(_tiny_lm(tokens.shape[1]),
                         {"train": tokens, "val": tokens[:16]},
                         mask_id=MASK_ID, learning_rate=5e-3, num_epochs=3,
                         batch_size=16, outfile=str(out), resume=resume,
                         redraw_every=2, verbose=False)

    s3, vh3, _ = run(tmp_path / "a.msgpack")

    guard = install_preemption_handler()
    try:
        out = tmp_path / "b.msgpack"

        class Trip:  # trip the guard partway through epoch 1's train phase
            def __init__(self):
                self.n = 0

            def __len__(self):
                return len(tokens)

            def __getitem__(self, i):
                self.n += 1
                if self.n == 96 + 40:
                    guard.trigger()
                return np.zeros((1,), np.int8), tokens[i]

        with pytest.raises(TrainingPreempted):
            train_mlm(_tiny_lm(tokens.shape[1]),
                      {"train": Trip(), "val": tokens[:16]},
                      mask_id=MASK_ID, learning_rate=5e-3, num_epochs=3,
                      batch_size=16, outfile=str(out), redraw_every=2,
                      verbose=False)
        guard.reset()
        sr, vhr, _ = run(out, resume=str(out) + ".latest")
    finally:
        uninstall_preemption_handler()

    for a, b in zip(jax.tree_util.tree_leaves(s3.params),
                    jax.tree_util.tree_leaves(sr.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert vhr == vh3[1:]


def test_pretrain_cli_transfers_into_scbert(tmp_path):
    """simulate --gene2vec-names -> pretrain-scbert -> every LM weight lands
    under scBERT's performer_lm scope; only the classifier head re-inits
    (the head-swap protocol, llm/scbert.py:110-122)."""
    import flax

    from gridnext_tpu.cli import _load_scbert_ckpt, _merge_matching_params, main
    from gridnext_tpu.models.scbert import scBERT

    sim = str(tmp_path / "sim")
    main(["simulate", "--out", sim, "--arrays", "1", "--genes", "24",
          "--classes", "3", "--gene2vec-names"])
    dirs = sorted(glob.glob(os.path.join(sim, "*/")))
    out = str(tmp_path / "pt")
    main(["pretrain-scbert", "--spaceranger", *[d.rstrip("/") for d in dirs],
          "--out", out, "--epochs", "1", "--batch-size", "64",
          "--scbert-vocab", "32", "--scbert-dim", "16",
          "--scbert-depth", "2", "--scbert-heads", "2",
          "--scbert-dim-head", "8", "--scbert-features", "16",
          "--redraw-every", "0"])
    ckpt = os.path.join(out, "scbert_lm.msgpack")
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(out, "pretrain.json"))

    loaded = _load_scbert_ckpt(ckpt, depth=2)
    assert set(loaded) >= {"params", "favor"}
    assert set(loaded["params"]) == {"performer_lm"}  # auto-nested raw LM
    assert "performer_lm" in loaded["favor"]

    # matching attention geometry (the FAVOR projection shape depends on
    # dim_head/nb_features; pretrain.json records what was used)
    pj = json.load(open(os.path.join(out, "pretrain.json")))
    assert pj["dim_head"] == 8 and pj["nb_features"] == 16
    model = scBERT(n_genes=32, bin_num=BIN_NUM, dim=16, depth=2, heads=2,
                   dim_head=8, nb_features=16,
                   n_classes=3, generalized_attention=True)
    st = create_train_state(model, jax.random.key(0),
                            jnp.zeros((1, 32), jnp.float32), optax.adam(1e-4))
    skipped = []
    merged = _merge_matching_params(st.params, loaded["params"], skipped)
    assert skipped == ["/to_out (missing)"]  # head swap only
    flat_m = flax.traverse_util.flatten_dict(merged["performer_lm"])
    flat_p = flax.traverse_util.flatten_dict(loaded["params"]["performer_lm"])
    for k, v in flat_m.items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat_p[k]),
                                      err_msg="/".join(k))
    # the merged fine-tune model runs
    y = model.apply({"params": merged, "favor": st.extra_vars["favor"]},
                    jnp.zeros((2, 32), jnp.float32))
    assert y.shape == (2, 3)


def test_warm_started_preempt_resume_matches_uninterrupted(tmp_path):
    """Resume must replay the FAVOR redraw stream of a WARM-STARTED run
    (state entered at step > 0): the checkpoint records redraws_done, so
    fast-forwarding doesn't assume the run began at step 0 (which would
    replay step//redraw_every splits and silently diverge)."""
    from gridnext_tpu.train import TrainingPreempted
    from gridnext_tpu.train.preempt import (
        install_preemption_handler,
        uninstall_preemption_handler,
    )

    tokens = _corpus(n=96)
    model = _tiny_lm(tokens.shape[1])

    # Warm start: 2 epochs leave state.step = 12 with redraw_every unset,
    # so the continuation's first redraw happens at its OWN first boundary
    warm, _, _ = train_mlm(model, {"train": tokens}, mask_id=MASK_ID,
                           learning_rate=5e-3, num_epochs=2, batch_size=16,
                           verbose=False)
    assert int(warm.step) == 12

    def cont(out, data, resume=None):
        return train_mlm(model, {"train": data, "val": tokens[:16]},
                         mask_id=MASK_ID, learning_rate=5e-3, num_epochs=3,
                         batch_size=16, outfile=str(out), state=warm,
                         resume=resume, redraw_every=5, verbose=False)

    s_full, _, _ = cont(tmp_path / "a.msgpack", tokens)

    guard = install_preemption_handler()
    try:
        out = tmp_path / "b.msgpack"

        class Trip:  # preempt partway through epoch 1's train phase
            def __init__(self):
                self.n = 0

            def __len__(self):
                return len(tokens)

            def __getitem__(self, i):
                self.n += 1
                if self.n == 96 + 40:
                    guard.trigger()
                return np.zeros((1,), np.int8), tokens[i]

        with pytest.raises(TrainingPreempted):
            cont(out, Trip())
        guard.reset()
        s_r, _, _ = cont(out, tokens, resume=str(out) + ".latest")
    finally:
        uninstall_preemption_handler()

    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_r.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_mlm_seq_axis_pads_indivisible_tokens():
    """Real vocab sizes rarely divide a 'seq' axis (16,907 = 11*29*53), so
    train_mlm pads the token axis with -1 columns instead of silently
    replicating tokens (ADVICE r3): no divisibility warning fires, and the
    run exactly matches single-device training on the same padded corpus
    (pad targets are ignored by the masked loss)."""
    import warnings

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    tokens = _corpus(n=20, seq=30)  # 30 % 4 != 0 -> pads to 32
    padded = np.concatenate(
        [tokens, np.full((len(tokens), 2), -1, tokens.dtype)], axis=1)

    from gridnext_tpu.train import mlm_token_len

    def run(corpus, **kw):
        # max_seq_len sized via the public helper (the CLI's recipe)
        model = _tiny_lm(mlm_token_len(
            corpus.shape[1], mesh_shape=kw.get("mesh_shape")) - 1)
        tx = optax.sgd(1e-2)
        state = create_train_state(model, jax.random.key(0),
                                   jnp.asarray(np.maximum(corpus[:1], 0)), tx)
        return train_mlm(model, {"train": corpus, "val": corpus[:6]},
                         mask_id=MASK_ID, state=state, tx=tx, num_epochs=2,
                         batch_size=6, verbose=False, **kw)

    s1, vh1, th1 = run(padded)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any replicate-warning -> failure
        s8, vh8, th8 = run(tokens, mesh_shape={"data": 2, "seq": 4})
    np.testing.assert_allclose(th1, th8, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vh1, vh8, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_train_mlm_seq_pad_unsigned_corpus():
    """Unsigned corpora widen to signed before -1 padding: a uint8 corpus
    with an indivisible token axis must train identically to the same
    corpus as int32 (previously the -1 pads wrapped to 255 and became real
    MLM targets)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from gridnext_tpu.train import mlm_token_len

    tokens_i32 = _corpus(n=12, seq=30)
    tokens_u8 = tokens_i32.astype(np.uint8)

    def run(corpus):
        model = _tiny_lm(mlm_token_len(
            corpus.shape[1], mesh_shape={"data": 2, "seq": 4}) - 1)
        tx = optax.sgd(1e-2)
        state = create_train_state(model, jax.random.key(0),
                                   jnp.asarray(tokens_i32[:1]), tx)
        return train_mlm(model, {"train": corpus}, mask_id=MASK_ID,
                         state=state, tx=tx, num_epochs=1, batch_size=6,
                         verbose=False, mesh_shape={"data": 2, "seq": 4})

    _, _, th_i = run(tokens_i32)
    _, _, th_u = run(tokens_u8)
    np.testing.assert_allclose(th_i, th_u, rtol=1e-6, atol=1e-7)
