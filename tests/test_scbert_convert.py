"""Numerical parity: reference torch PerformerLM/scBERT -> converted flax.

The reference module imports `local_attention` (not installed); scBERT never
uses it (local_attn_heads=0 default), so we stub the import and compare the
full forward numerically, sharing the torch FAVOR+ projection matrices via
the converter's 'favor' collection.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# --- stub optional deps so the reference module imports --------------------
if "local_attention" not in sys.modules:
    stub = types.ModuleType("local_attention")

    class _LocalAttention:  # pragma: no cover - must never be instantiated
        def __init__(self, *a, **k):
            raise AssertionError("local attention path should be unused")

    stub.LocalAttention = _LocalAttention
    sys.modules["local_attention"] = stub

for _name in ("scanpy", "anndata"):  # imported by reference scbert.py, unused here
    if _name not in sys.modules:
        sys.modules[_name] = types.ModuleType(_name)

sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from gridnext_tpu.compat.scbert_convert import performer_lm_from_torch, scbert_from_torch
from gridnext_tpu.models.performer import PerformerLM
from gridnext_tpu.models.scbert import scBERT


def _torch_lm(depth=2, dim=16, heads=2, num_tokens=7, max_seq_len=33):
    from gridnext.llm.performer_pytorch import PerformerLM as TorchPerformerLM

    torch.manual_seed(0)
    return TorchPerformerLM(
        num_tokens=num_tokens, max_seq_len=max_seq_len, dim=dim, depth=depth,
        heads=heads, dim_head=8, g2v_position_emb=False, qkv_bias=False)


def test_performer_lm_parity():
    depth, dim, heads, num_tokens, seq = 2, 16, 2, 7, 20
    tm = _torch_lm(depth, dim, heads, num_tokens, 33)
    tm.eval()

    variables, g2v = performer_lm_from_torch(tm.state_dict(), depth=depth)
    assert g2v is None

    rng = np.random.default_rng(0)
    x = rng.integers(0, num_tokens, (2, seq))
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    m = PerformerLM(num_tokens=num_tokens, max_seq_len=33, dim=dim,
                    depth=depth, heads=heads, dim_head=8, qkv_bias=False)
    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_scbert_parity():
    # The reference head hardcodes dim=200 and in_features=16907
    # (llm/scbert.py:137-139), so parity must run at true scBERT width.
    from gridnext.llm.scbert import scBERT as TorchScBERT

    n_genes, depth, n_classes = 16906, 2, 4
    torch.manual_seed(1)
    tm = TorchScBERT(n_genes=n_genes, bin_num=5, dim=200, depth=depth, heads=2,
                     g2v_pos_embed=False, n_classes=n_classes)
    tm.eval()

    variables, g2v = scbert_from_torch(tm.state_dict(), depth=depth)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 8, (1, n_genes)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.copy())).numpy()

    m = scBERT(n_genes=n_genes, bin_num=5, dim=200, depth=depth, heads=2,
               n_classes=n_classes)
    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_scbert_finetune_labels_on_converted():
    from gridnext_tpu.models.scbert import finetune_param_labels

    from gridnext.llm.scbert import scBERT as TorchScBERT

    tm = TorchScBERT(n_genes=16, bin_num=5, dim=16, depth=2, heads=2,
                     g2v_pos_embed=False, n_classes=3)
    variables, _ = scbert_from_torch(tm.state_dict(), depth=2)
    labels = finetune_param_labels(variables["params"], depth=2)
    leaves = set(jax.tree_util.tree_leaves(labels))
    assert leaves == {"train", "frozen"}


def test_glu_feedforward_parity():
    """GLU gating order must match the reference: act(first_half) * second."""
    from gridnext.llm.performer_pytorch import FeedForward as TorchFF

    from gridnext_tpu.models.performer import FeedForward

    torch.manual_seed(0)
    tff = TorchFF(dim=16, mult=2, glu=True)
    tff.eval()
    sd = tff.state_dict()
    variables = {"params": {
        "w1": {"kernel": sd["w1.weight"].numpy().T, "bias": sd["w1.bias"].numpy()},
        "w2": {"kernel": sd["w2.weight"].numpy().T, "bias": sd["w2.bias"].numpy()},
    }}
    m = FeedForward(dim=16, mult=2, glu=True)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    with torch.no_grad():
        want = tff(torch.from_numpy(x)).numpy()
    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cli_load_scbert_ckpt_torch_pth(tmp_path):
    """CLI --scbert-ckpt accepts a torch .pth and converts on the fly,
    including the wrapped {'model_state_dict': ...} layout."""
    from gridnext.llm.scbert import scBERT as TorchScBERT

    from gridnext_tpu.cli import _load_scbert_ckpt

    torch.manual_seed(2)
    tm = TorchScBERT(n_genes=16906, bin_num=5, dim=200, depth=2, heads=2,
                     g2v_pos_embed=False, n_classes=3)
    for layout in (tm.state_dict(), {"model_state_dict": tm.state_dict()}):
        p = tmp_path / "ck.pth"
        torch.save(layout, p)
        variables = _load_scbert_ckpt(str(p), depth=2)
        assert "params" in variables
        assert "performer_lm" in variables["params"]
        assert "to_out" in variables["params"]  # head hoisted to root scope
        want, _ = scbert_from_torch(tm.state_dict(), depth=2)
        a = jax.tree_util.tree_leaves(variables["params"])
        b = jax.tree_util.tree_leaves(want["params"])
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
