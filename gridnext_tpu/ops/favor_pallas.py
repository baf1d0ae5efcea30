"""Fused generalized-FAVOR linear attention (Pallas TPU).

Motivation (docs/roadmap.md, late round 3): at scBERT's checkpoint
geometry (heads=10, dim_head=64, m = 266 random features) the einsum path
materializes the (B, h, N, m) feature tensors in HBM -- ~720 MB each at
batch 4 full scale -- and those tensors dominate the per-layer cost (the
measured step time is flat in model width but drops 49% when m shrinks).
This kernel computes phi(k)/phi(q) blockwise in VMEM and never writes them
to HBM: per (b, h) it

  pass 1: accumulates  k_sum = sum_n phi(k_n)          (m,)
                       context = sum_n phi(k_n) v_n^T  (m, d)
  pass 2: emits        out_n = (phi(q_n) @ context) / (phi(q_n) . k_sum)

which is exactly ``favor.linear_attention(qf, kf, v)`` with
``qf/kf = favor.generalized_kernel_features(..., relu)`` (the reference
math: llm/performer_pytorch.py:104-117,155-160) -- equality is pinned in
tests/test_favor_pallas.py.

Only the FORWARD is fused. The public wrapper carries a ``jax.custom_vjp``
whose backward differentiates the plain einsum implementation, so the op
is a drop-in under jit/grad/remat: training keeps today's backward cost,
serving (and the remat re-forward) get the fused path.

MEASURED OUTCOME (v5e, parity shape B=8 h=10 N=16907 d=64 m=266): the
fused forward runs 43.5 ms vs 30.7 ms for the standalone einsum path --
0.7x, flat across _BLK 512..2048 (4096 exceeds the 16 MB scoped-vmem
stack), and removing the in-kernel transposes bought only ~6%. The
standalone einsum number itself OVERSTATES the in-model cost: 6 layers x
30 ms would exceed the whole measured 108 ms scBERT forward, i.e. XLA
already fuses/overlaps this op inside the model better than a standalone
kernel boundary allows. Like ops/denseblock_pallas.py, this kernel is
kept as measured evidence that the einsum lowering is the right one --
the productive levers for the FAVOR stack are ``nb_features`` and bf16
(docs/roadmap.md), not manual fusion. NOT wired into FastAttention.

TPU grid notes: the grid is (B*h, N/blk) with the N axis innermost;
accumulator outputs are indexed by (b*h) only, relying on Pallas TPU's
sequential-grid output revisiting for the accumulation. Feature columns
beyond m and rows beyond N are masked INSIDE the kernel (the ReLU-kernel
``+ eps`` would otherwise leak eps-features from padding into k_sum /
context).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from gridnext_tpu.ops import favor

_EPS = 1e-3            # generalized_kernel_features kernel_epsilon
_BLK = 512             # sequence rows per grid step


def _einsum_reference(q, k, v, proj):
    """The unfused path this kernel must match (and whose VJP serves as
    the fused op's backward)."""
    qf = favor.generalized_kernel_features(q, proj, jax.nn.relu)
    kf = favor.generalized_kernel_features(k, proj, jax.nn.relu)
    return favor.linear_attention(qf, kf, v)


def _features(xb, proj):
    """relu((c*x) @ proj^T) + eps without an explicit transpose: contract
    the d axes directly (an in-kernel .T is a VPU relayout every step)."""
    c = xb.shape[-1] ** -0.25
    dash = jax.lax.dot_general(xb * c, proj, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return jax.nn.relu(dash) + _EPS                 # (blk, m_pad)


def _accum_kernel(n_real, m_real, k_ref, v_ref, proj_ref, ctx_ref, ksum_ref):
    blk = pl.program_id(1)
    feats = _features(k_ref[0], proj_ref[...])
    # mask feature cols >= m_real and sequence rows >= n_real: the +eps of
    # the ReLU kernel would otherwise pollute the accumulators
    col_ok = jax.lax.broadcasted_iota(jnp.int32, feats.shape, 1) < m_real
    row = jax.lax.broadcasted_iota(jnp.int32, feats.shape, 0)
    row_ok = blk * _BLK + row < n_real
    feats = jnp.where(col_ok & row_ok, feats, 0.0)

    @pl.when(blk == 0)
    def _():
        ctx_ref[...] = jnp.zeros_like(ctx_ref)
        ksum_ref[...] = jnp.zeros_like(ksum_ref)

    ctx_ref[0] += jax.lax.dot_general(
        feats, v_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (m_pad, d), no .T
    ksum_ref[0, 0] += jnp.sum(feats, axis=0)


def _apply_kernel(m_real, q_ref, proj_ref, ctx_ref, ksum_ref, o_ref):
    feats = _features(q_ref[0], proj_ref[...])
    # pad cols of ksum/context are exactly zero (masked in pass 1), so
    # feats' eps there cancels out of both numerator and denominator
    den = jnp.dot(feats, ksum_ref[0, 0][:, None],
                  preferred_element_type=jnp.float32)          # (blk, 1)
    num = jnp.dot(feats, ctx_ref[0],
                  preferred_element_type=jnp.float32)          # (blk, d)
    o_ref[0] = num / den
    del m_real  # masking unnecessary here; see comment above


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_generalized_linear_attention(q, k, v, proj):
    """ReLU-FAVOR linear attention with in-VMEM feature maps.

    Args:
      q, k, v: (B, H, N, d) float arrays (f32 recommended; the kernel
        accumulates in f32 regardless).
      proj: (m, d) projection (the ``favor`` collection's buffer).
    Returns:
      (B, H, N, d) float32, numerically matching
      ``favor.linear_attention(generalized_features(q), ..., v)``.
    """
    return _fused_fwd_impl(q, k, v, proj)


def _fused_fwd_impl(q, k, v, proj, interpret=None):
    if interpret is None:
        from gridnext_tpu.ops.pallas_support import default_interpret
        interpret = default_interpret()
    b, h, n, d = q.shape
    m = proj.shape[0]
    m_pad = -(-m // 128) * 128
    n_pad = -(-n // _BLK) * _BLK
    bh = b * h

    def flat(x):
        x = x.reshape(bh, n, d).astype(jnp.float32)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    qf_, kf_, vf_ = flat(q), flat(k), flat(v)
    projp = jnp.pad(proj.astype(jnp.float32), ((0, m_pad - m), (0, 0)))
    nblk = n_pad // _BLK

    ctx, ksum = pl.pallas_call(
        functools.partial(_accum_kernel, n, m),
        grid=(bh, nblk),
        in_specs=[
            pl.BlockSpec((1, _BLK, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, _BLK, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((m_pad, d), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, m_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, m_pad), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, m_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, 1, m_pad), jnp.float32),
        ],
        interpret=interpret,
    )(kf_, vf_, projp)

    out = pl.pallas_call(
        functools.partial(_apply_kernel, m),
        grid=(bh, nblk),
        in_specs=[
            pl.BlockSpec((1, _BLK, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((m_pad, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, m_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, m_pad), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _BLK, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), jnp.float32),
        interpret=interpret,
    )(qf_, projp, ctx, ksum)
    return out[:, :n].reshape(b, h, n, d)


def _fwd(q, k, v, proj):
    return _fused_fwd_impl(q, k, v, proj), (q, k, v, proj)


def _bwd(res, g):
    q, k, v, proj = res
    _, vjp = jax.vjp(_einsum_reference, q, k, v, proj)
    return vjp(g.astype(jnp.float32))


fused_generalized_linear_attention.defvjp(_fwd, _bwd)
