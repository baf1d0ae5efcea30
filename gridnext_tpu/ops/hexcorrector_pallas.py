"""Fused hex-corrector Pallas kernel: the whole g-network in one VMEM pass.

The GridNetHex corrector is 5 radius-1 hex convolutions with two fused
BN+ReLU stages (models/gridnet.py _HexCorrector; reference
gridnet_models.py:128-148). A 78x64 grid at 32 channels is ~640 KB -- far
under VMEM -- so the entire stack runs on-chip per array: one HBM read of
the f-output grid, one HBM write of the logits, nothing in between. The XLA
path materializes each layer's (B, H, W, 7, C) tap stack in HBM; this kernel
keeps every intermediate in VMEM scratch.

Inference-path kernel: BatchNorm (eval mode) is folded into the conv weights
beforehand (:func:`fold_corrector_params`). Each hex conv is one MXU matmul
(H*W, 7*C_in) @ (7*C_in, C_out) over parity-selected tap maps built from a
zero-padded VMEM scratch buffer.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gridnext_tpu.geometry import HEX_TAPS_R1


# ReLU placement of the 5-layer _HexCorrector (after layers 1 and 3) --
# the single source of truth shared by fold_corrector_params and any
# caller replaying folded kernels from a cache (bench.py)
CORRECTOR_RELU_FLAGS = (False, True, False, True, False)


def fold_corrector_params(params: dict, batch_stats=None, eps: float = 1e-5):
    """Fold eval-mode BN into the hex-conv weights of a _HexCorrector.

    Returns (kernels, biases, relu_flags): 5 folded (7, C_in, C_out) kernels
    and (C_out,) biases; relu after layers 1 and 3. Handles ``use_bn=False``
    correctors (no BatchNorm params / batch_stats) by skipping the fold.
    """
    kernels, biases = [], []
    for i in range(5):
        hc = params[f"HexConv_{i}"]
        kernels.append(np.asarray(hc["kernel"], np.float32))
        biases.append(np.asarray(hc["bias"], np.float32))

    for bn_idx, layer in ((0, 1), (1, 3)):
        if f"BatchNorm_{bn_idx}" not in params:
            continue  # use_bn=False corrector
        bn_p = params[f"BatchNorm_{bn_idx}"]
        if not batch_stats or f"BatchNorm_{bn_idx}" not in batch_stats:
            raise ValueError(
                "corrector has BatchNorm params but no batch_stats were "
                "provided; pass variables['batch_stats']['corrector']")
        bn_s = batch_stats[f"BatchNorm_{bn_idx}"]
        s = np.asarray(bn_p["scale"]) / np.sqrt(np.asarray(bn_s["var"]) + eps)
        kernels[layer] = kernels[layer] * s  # scale out-channels
        biases[layer] = (biases[layer] - np.asarray(bn_s["mean"])) * s \
            + np.asarray(bn_p["bias"])

    return kernels, biases, CORRECTOR_RELU_FLAGS


def _corrector_kernel(x_ref, *refs, h, w, relu_flags, n_layers,
                      emit_labels=False):
    """refs = ([fg_ref,] w0, b0, ..., w{L-1}, b{L-1}, out_ref, scratch_ref).

    ``emit_labels``: instead of logits, write int32 label grids directly --
    argmax over classes, +1 for foreground, 0 where the fg mask is unset.
    Fusing the argmax and background masking here keeps the final reduction
    on-chip (no logits round-trip to HBM, no separate argmax/where dispatch).
    """
    fg_ref = None
    if emit_labels:
        fg_ref, refs = refs[0], refs[1:]
    out_ref = refs[2 * n_layers]
    scratch = refs[2 * n_layers + 1]

    taps = HEX_TAPS_R1
    row_parity = jax.lax.broadcasted_iota(jnp.int32, (h, 1, 1), 0) % 2 == 1

    cur = x_ref[0]  # (H, W, C_in)
    for layer in range(n_layers):
        w_l = refs[2 * layer][...]
        b_l = refs[2 * layer + 1][...]
        c_in = w_l.shape[1]
        c_out = w_l.shape[2]

        # zero-pad into scratch: (H+2, W+2, Cmax)
        scratch[...] = jnp.zeros_like(scratch)
        scratch[1:h + 1, 1:w + 1, :c_in] = cur

        # Accumulate one (H*W, C_in) @ (C_in, C_out) matmul per tap: keeps at
        # most one shifted map live at a time (the concatenated 7*C_in form
        # exceeds scoped VMEM at lane-padded widths).
        out = jnp.broadcast_to(b_l, (h * w, c_out))
        for t, (dr, ce, co) in enumerate(taps):
            even = scratch[1 + dr:1 + dr + h, 1 + ce:1 + ce + w, :c_in]
            if ce == co:
                tap_map = even
            else:
                odd = scratch[1 + dr:1 + dr + h, 1 + co:1 + co + w, :c_in]
                tap_map = jnp.where(row_parity, odd, even)
            out = out + jnp.dot(tap_map.reshape(h * w, c_in), w_l[t],
                                preferred_element_type=jnp.float32)
        out = out.reshape(h, w, c_out)
        if relu_flags[layer]:
            out = jnp.maximum(out, 0.0)
        cur = out

    if emit_labels:
        labels = jnp.argmax(cur, axis=-1).astype(jnp.int32) + 1
        out_ref[0] = jnp.where(fg_ref[0] > 0, labels, 0)
    else:
        out_ref[0] = cur


def _fused_corrector_call(x, fg, kernels, biases, relu_flags, interpret):
    """Shared pallas_call scaffold for both public entry points.

    ``fg=None`` emits (B, H, W, n_classes) float32 logits; a foreground mask
    emits (B, H, W) int32 label grids (argmax + bg mask fused in-kernel).
    One builder so scratch sizing, VMEM limits, and the interpret fallback
    can never diverge between the two variants.
    """
    if interpret is None:
        # one shared heuristic across every Pallas kernel in the package
        from gridnext_tpu.ops.pallas_support import default_interpret
        interpret = default_interpret()
    b, h, w, c_in = x.shape
    n_layers = len(kernels)
    c_max = max(k.shape[1] for k in kernels)
    emit_labels = fg is not None

    inputs = [x.astype(jnp.float32)]
    in_specs = [pl.BlockSpec((1, h, w, c_in), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    if emit_labels:
        inputs.append(fg.astype(jnp.int32))
        in_specs.append(pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    for k, bia in zip(kernels, biases):
        inputs.extend([jnp.asarray(k, jnp.float32),
                       jnp.asarray(bia, jnp.float32)])
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    if emit_labels:
        out_specs = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, h, w), jnp.int32)
    else:
        n_out = kernels[-1].shape[2]
        out_specs = pl.BlockSpec((1, h, w, n_out), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, h, w, n_out), jnp.float32)

    kernel = functools.partial(
        _corrector_kernel, h=h, w=w, relu_flags=tuple(relu_flags),
        n_layers=n_layers, emit_labels=emit_labels)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2, c_max), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # channel lanes pad 32->128, and Mosaic double-buffers the grid
            # blocks; the default 16 MB scoped limit is too tight for the
            # fused 5-layer stack at full Visium size.
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.jit, static_argnames=("relu_flags", "interpret"))
def fused_hex_corrector(x: jnp.ndarray, kernels: Sequence[jnp.ndarray],
                        biases: Sequence[jnp.ndarray],
                        relu_flags: Sequence[bool] = (False, True, False, True, False),
                        interpret: bool = None) -> jnp.ndarray:
    """Apply the folded corrector to (B, H, W, C_in) f-output grids.

    Returns (B, H, W, n_classes) logits. Use
    ``fold_corrector_params(variables['params']['corrector'],
    variables['batch_stats']['corrector'])`` to produce the inputs.
    """
    return _fused_corrector_call(x, None, kernels, biases, relu_flags,
                                 interpret)


@functools.partial(jax.jit, static_argnames=("relu_flags", "interpret"))
def fused_hex_corrector_labels(x: jnp.ndarray, fg: jnp.ndarray,
                               kernels: Sequence[jnp.ndarray],
                               biases: Sequence[jnp.ndarray],
                               relu_flags: Sequence[bool] = (False, True, False, True, False),
                               interpret: bool = None) -> jnp.ndarray:
    """Corrector + argmax + background masking in one kernel pass.

    Args:
      x: (B, H, W, C_in) f-output grids.
      fg: (B, H, W) foreground mask (nonzero = in-tissue spot).

    Returns:
      (B, H, W) int32 label grids: 0 background, 1..C foreground -- the
      serving path's final artifact, produced without writing logits to HBM.
    """
    return _fused_corrector_call(x, fg, kernels, biases, relu_flags,
                                 interpret)
