"""First-principles dense reference for lucidrains ``local_attention``.

The reference's Performer uses windowed local heads via the external
``local_attention`` package (llm/performer_pytorch.py:355-370), which is not
installed here. Like :mod:`gridnext_tpu.compat.hexagdly_ref` does for
hexagdly, this module pins the package's numerics from first principles so
that ``models.performer.local_block_attention`` (the blocked/rolled TPU
implementation) gains an oracle that shares NO code with it: scores are
materialized as one dense (N, N) matrix and masked by explicit block
arithmetic, and rotary embeddings are applied by complex-plane rotation
rather than the cos/sin + rotate-half identity.

Semantics pinned (lucidrains local-attention, default configuration the
reference requests):

* The sequence is auto-padded at the END to a multiple of ``window``;
  queries/keys are assigned to blocks of ``window`` consecutive positions.
* Query block ``g`` may attend keys in blocks ``g-1 .. g+1`` non-causally
  (``look_backward=1, look_forward=1``) and ``g-1 .. g`` causally
  (``look_forward=0``), additionally requiring ``j <= i`` causally
  (``exact_windowsize=False``: the WHOLE previous block is visible).
* Padded tail positions are never valid keys; an optional (B, N) input mask
  removes further keys. Queries left with zero valid keys output zeros.
* ``rel_pos``: parameterless sinusoidal *rotary* embeddings
  (SinusoidalEmbeddings, base 10000, GPT-NeoX half-rotation pairing of
  feature ``j`` with ``j + d/2``) applied to q and k at their ABSOLUTE
  padded positions -- scores then depend only on relative offsets.

Everything is computed in float64 numpy so the oracle also serves as a
precision reference for the f32 device path.
"""

from __future__ import annotations

import numpy as np

__all__ = ["rotary_ref", "local_attention_ref"]


def rotary_ref(x: np.ndarray, positions: np.ndarray | None = None,
               base: float = 10000.0) -> np.ndarray:
    """Rotary-embed ``x`` (..., N, d) by complex-plane rotation.

    Feature pair ``(x[j], x[j + d/2])`` at sequence position ``p`` is treated
    as the complex number ``x[j] + i x[j+d/2]`` and multiplied by
    ``exp(i * p * base**(-2j/d))`` -- the polar form of the NeoX convention
    (the ``local_attention`` package's SinusoidalEmbeddings +
    apply_rotary_pos_emb compute the same rotation via cos/sin tables and a
    rotate-half; equality of the two formulations is what the tests pin).
    """
    x = np.asarray(x, np.float64)
    d = x.shape[-1]
    if d % 2:
        raise ValueError("rotary needs an even feature dim")
    n = x.shape[-2]
    if positions is None:
        positions = np.arange(n, dtype=np.float64)
    theta = positions[:, None] * base ** (
        -np.arange(0, d, 2, dtype=np.float64) / d)  # (N, d/2)
    z = x[..., : d // 2] + 1j * x[..., d // 2:]
    z = z * np.exp(1j * theta)
    return np.concatenate([z.real, z.imag], axis=-1)


def local_attention_ref(q: np.ndarray, k: np.ndarray, v: np.ndarray,
                        window: int, causal: bool = False,
                        mask: np.ndarray | None = None,
                        rel_pos: bool = False) -> np.ndarray:
    """Dense O(N^2) windowed attention with the package's window semantics.

    q, k, v: (B, H, N, d); optional key ``mask`` (B, N) bool (True = keep).
    Returns (B, H, N, d) float64.
    """
    q = np.asarray(q, np.float64)
    k = np.asarray(k, np.float64)
    v = np.asarray(v, np.float64)
    b, h, n, d = q.shape
    pad = (-n) % window
    npad = n + pad
    if pad:
        zsl = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = (np.pad(t, zsl) for t in (q, k, v))
    if rel_pos:
        # package order: autopad first, rotary over padded absolute positions
        q, k = rotary_ref(q), rotary_ref(k)

    pos = np.arange(npad)
    blk = pos // window
    dblk = blk[None, :] - blk[:, None]               # key block - query block
    look_forward = 0 if causal else 1
    allowed = (dblk >= -1) & (dblk <= look_forward)  # (Npad, Npad) [i, j]
    allowed &= pos[None, :] < n                      # padded tail: never a key
    if causal:
        allowed &= pos[None, :] <= pos[:, None]
    allowed = np.broadcast_to(allowed, (b, npad, npad)).copy()
    if mask is not None:
        # pad columns get False; real-position masking comes from `mask`
        # itself (the padded tail is already excluded by `pos < n` above)
        keym = np.pad(np.asarray(mask, bool), ((0, 0), (0, pad)))
        allowed &= keym[:, None, :]

    scores = np.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(d)
    scores = np.where(allowed[:, None], scores, -np.inf)
    # row-wise softmax; all-masked rows (no valid key) output zeros
    any_valid = allowed.any(axis=-1)[:, None]        # (B, 1, Npad)
    smax = np.max(np.where(np.isneginf(scores), -1e30, scores),
                  axis=-1, keepdims=True)
    ex = np.exp(scores - smax)
    ex = np.where(np.isneginf(scores), 0.0, ex)
    attn = ex / np.maximum(ex.sum(axis=-1, keepdims=True), 1e-300)
    out = np.einsum("bhnm,bhmd->bhnd", attn, v)
    out = np.where(any_valid[..., None], out, 0.0)
    return out[:, :, :n]
