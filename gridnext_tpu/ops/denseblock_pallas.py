"""Fused DenseNet-BC inference: each dense block as one VMEM-resident kernel.

Each block's growing concat buffer lives in VMEM scratch across all its
layers: one HBM read of the block input, one HBM write of the
(C_in + L*growth) output, nothing in between.

MEASURED RESULT (v5e, DenseNet-121, B=624 @128px): 0.96x vs the flax/XLA
path, with 100% argmax agreement. I.e. XLA's own lowering already achieves
what explicit VMEM residency buys -- strong evidence that DenseNet-121
throughput on TPU is bound by the architecture's shape (growth_rate=32
against 128 MXU lanes), not by HBM traffic between layers. Kept as an
alternative inference backend and as the measured datapoint behind that
conclusion (docs/roadmap.md).

Per layer (pre-activation DenseNet-BC, densenet.py:21-44 semantics with
eval-mode BN folded to per-channel affines):

    t = relu(buf * a1 + b1)            # full padded width; pads are zeros
    u = relu((t @ W1) * a2 + b2)       # 1x1 bottleneck -> 128, one matmul
    w = sum_{9 taps} shift(u) @ W2tap  # 3x3 conv as shifted-slice matmuls
    buf[..., c:c+growth] = w           # append in place

Layer params are stacked and zero-padded to the block's final width, so the
full-width affine+matmul is exact without per-layer slicing (zero weights
annihilate the not-yet-written tail). Inference-only (train uses the flax
path). Returns the full concatenated block output.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bn_affine(bn_params, bn_stats, eps=1e-5):
    a = np.asarray(bn_params["scale"]) / np.sqrt(np.asarray(bn_stats["var"]) + eps)
    b = np.asarray(bn_params["bias"]) - np.asarray(bn_stats["mean"]) * a
    return a, b


def fold_dense_block_params(block_layers: Sequence[dict],
                            block_stats: Sequence[dict],
                            c_in0: int, growth: int = 32):
    """Stack+pad one block's _DenseLayer params for the kernel.

    ``block_layers/stats``: the per-layer param/batch_stats dicts
    (BatchNorm_0, Conv_0 (1x1), BatchNorm_1, Conv_1 (3x3)) in layer order.

    Returns dict of arrays: A1, B1 (L, Cmax), W1 (L, Cmax, Cb), A2, B2
    (L, Cb), W2 (L, 9, Cb, growth), with Cmax = c_in0 + L*growth.
    """
    n_layers = len(block_layers)
    c_max = c_in0 + n_layers * growth
    cb = np.asarray(block_layers[0]["Conv_0"]["kernel"]).shape[-1]

    A1 = np.zeros((n_layers, c_max), np.float32)
    B1 = np.zeros((n_layers, c_max), np.float32)
    W1 = np.zeros((n_layers, c_max, cb), np.float32)
    A2 = np.zeros((n_layers, cb), np.float32)
    B2 = np.zeros((n_layers, cb), np.float32)
    W2 = np.zeros((n_layers, 9, cb, growth), np.float32)

    for l, (p, s) in enumerate(zip(block_layers, block_stats)):
        c_in = c_in0 + l * growth
        a1, b1 = _bn_affine(p["BatchNorm_0"], s["BatchNorm_0"])
        A1[l, :c_in] = a1
        B1[l, :c_in] = b1
        W1[l, :c_in] = np.asarray(p["Conv_0"]["kernel"])[0, 0]  # (1,1,Cin,Cb)
        a2, b2 = _bn_affine(p["BatchNorm_1"], s["BatchNorm_1"])
        A2[l] = a2
        B2[l] = b2
        W2[l] = np.asarray(p["Conv_1"]["kernel"]).reshape(9, cb, growth)
    return {"A1": A1, "B1": B1, "W1": W1, "A2": A2, "B2": B2, "W2": W2,
            "c_in0": c_in0, "growth": growth}


def _block_kernel(x_ref, a1_ref, b1_ref, w1_ref, a2_ref, b2_ref, w2_ref,
                  out_ref, buf, vpad, *, h, w, c_in0, growth, n_layers, cb):
    tb = x_ref.shape[0]
    c_max = c_in0 + n_layers * growth

    buf[...] = jnp.zeros_like(buf)
    buf[:, :, :, :c_in0] = x_ref[...].astype(buf.dtype)

    for l in range(n_layers):
        c_in = c_in0 + l * growth
        # 1) full-width folded-BN affine + relu (tail is zeros by padding)
        t = jnp.maximum(buf[...] * a1_ref[l] + b1_ref[l], 0.0)
        # 2) 1x1 bottleneck to cb channels, BN affine + relu
        u = jnp.dot(t.reshape(tb * h * w, c_max), w1_ref[l],
                    preferred_element_type=jnp.float32)
        u = jnp.maximum(u * a2_ref[l] + b2_ref[l], 0.0)
        # 3) 3x3 conv as 9 shifted-slice matmuls over a zero-padded copy
        vpad[...] = jnp.zeros_like(vpad)
        vpad[:, 1:h + 1, 1:w + 1, :] = u.reshape(tb, h, w, cb).astype(vpad.dtype)
        acc = jnp.zeros((tb * h * w, growth), jnp.float32)
        for ti, (dr, dc) in enumerate([(dr, dc) for dr in (-1, 0, 1)
                                       for dc in (-1, 0, 1)]):
            tap = vpad[:, 1 + dr:1 + dr + h, 1 + dc:1 + dc + w, :]
            acc = acc + jnp.dot(tap.reshape(tb * h * w, cb), w2_ref[l, ti],
                                preferred_element_type=jnp.float32)
        buf[:, :, :, c_in:c_in + growth] = acc.reshape(tb, h, w, growth) \
            .astype(buf.dtype)

    out_ref[...] = buf[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("c_in0", "growth", "batch_tile",
                                             "interpret"))
def fused_dense_block(x: jnp.ndarray, A1, B1, W1, A2, B2, W2, *,
                      c_in0: int, growth: int = 32, batch_tile: int = 8,
                      interpret: bool = None) -> jnp.ndarray:
    """Run one dense block on (B, H, W, c_in0) -> (B, H, W, c_in0+L*growth).

    Use :func:`fold_dense_block_params` to produce the stacked arrays.
    ``batch_tile`` must divide B; pick it so the VMEM concat buffer
    (batch_tile * H * W * c_max) fits comfortably.
    """
    if interpret is None:
        from gridnext_tpu.ops.pallas_support import default_interpret
        interpret = default_interpret()
    b, h, w, _ = x.shape
    n_layers, c_max = A1.shape
    cb = A2.shape[1]
    pad_b = (-b) % batch_tile
    if pad_b:  # pad the batch to a tile multiple, slice the result back
        x = jnp.concatenate(
            [x, jnp.zeros((pad_b,) + x.shape[1:], x.dtype)], axis=0)
        b = b + pad_b

    kernel = functools.partial(_block_kernel, h=h, w=w, c_in0=c_in0,
                               growth=growth, n_layers=n_layers, cb=cb)

    dtype = jnp.bfloat16
    args = [x.astype(dtype)] + [jnp.asarray(a, jnp.float32)
                                for a in (A1, B1)] + \
        [jnp.asarray(W1, dtype)] + [jnp.asarray(a, jnp.float32)
                                    for a in (A2, B2)] + [jnp.asarray(W2, dtype)]

    in_specs = [pl.BlockSpec((batch_tile, h, w, c_in0), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6

    out = pl.pallas_call(
        kernel,
        grid=(b // batch_tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((batch_tile, h, w, c_max),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_max), dtype),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, h, w, c_max), dtype),
            pltpu.VMEM((batch_tile, h + 2, w + 2, cb), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out[:b - pad_b] if pad_b else out


# ---------------------------------------------------------------------------
# Whole-net fused inference (stem/transitions/head in XLA, blocks in Pallas)
# ---------------------------------------------------------------------------

def build_densenet_fused_infer(variables: dict, block_config=(6, 12, 24, 16),
                               num_init_features: int = 64, growth: int = 32,
                               compression: float = 0.5,
                               batch_tiles=(8, 8, 32, 64),
                               interpret: bool = False):
    """Compile-ready fused inference fn for a (non-small-inputs) DenseNet.

    Takes the flax DenseNet variables (models/densenet.py naming) and returns
    ``infer(x_bchw_last) -> logits`` with all dense blocks fused. Inference
    semantics only (eval-mode BN).
    """
    params = variables["params"]
    stats = variables["batch_stats"]

    # --- stem ---------------------------------------------------------------
    conv0 = jnp.asarray(params["conv0"]["kernel"], jnp.bfloat16)
    a0, b0 = _bn_affine(params["BatchNorm_0"], stats["BatchNorm_0"])
    a0 = jnp.asarray(a0, jnp.float32)
    b0 = jnp.asarray(b0, jnp.float32)

    # --- blocks + transitions -----------------------------------------------
    layer_idx = 0
    trans_idx = 0
    num_features = num_init_features
    blocks = []
    transitions = []
    for bi, n_layers in enumerate(block_config):
        lp = [params[f"_DenseLayer_{layer_idx + j}"] for j in range(n_layers)]
        ls = [stats[f"_DenseLayer_{layer_idx + j}"] for j in range(n_layers)]
        layer_idx += n_layers
        folded = fold_dense_block_params(lp, ls, num_features, growth)
        blocks.append({k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
                       for k, v in folded.items()})
        num_features += n_layers * growth
        if bi != len(block_config) - 1:
            tp = params[f"_Transition_{trans_idx}"]
            ts = stats[f"_Transition_{trans_idx}"]
            trans_idx += 1
            ta, tb_ = _bn_affine(tp["BatchNorm_0"], ts["BatchNorm_0"])
            num_features = int(num_features * compression)
            transitions.append((jnp.asarray(ta, jnp.float32),
                                jnp.asarray(tb_, jnp.float32),
                                jnp.asarray(tp["Conv_0"]["kernel"][0, 0],
                                            jnp.bfloat16)))

    af, bf = _bn_affine(params["BatchNorm_1"], stats["BatchNorm_1"])
    af = jnp.asarray(af, jnp.float32)
    bf = jnp.asarray(bf, jnp.float32)
    cls_k = jnp.asarray(params["classifier"]["kernel"], jnp.float32)
    cls_b = jnp.asarray(params["classifier"]["bias"], jnp.float32)

    def infer(x):
        x = x.astype(jnp.bfloat16)
        x = jax.lax.conv_general_dilated(
            x, conv0, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jnp.maximum(x.astype(jnp.float32) * a0 + b0, 0.0)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
        x = x.astype(jnp.bfloat16)

        for bi, blk in enumerate(blocks):
            x = fused_dense_block(
                x, blk["A1"], blk["B1"], blk["W1"], blk["A2"], blk["B2"],
                blk["W2"], c_in0=blk["c_in0"], growth=blk["growth"],
                batch_tile=batch_tiles[bi], interpret=interpret)
            if bi < len(transitions):
                ta, tb_, tw = transitions[bi]
                t = jnp.maximum(x.astype(jnp.float32) * ta + tb_, 0.0)
                t = jnp.einsum("bhwc,cd->bhwd", t.astype(jnp.bfloat16), tw,
                               preferred_element_type=jnp.float32)
                # 2x2 avg pool stride 2, VALID: odd spatial dims floor like
                # torch AvgPool2d / nn.avg_pool (drop the trailing row/col
                # before the pooling reshape)
                b_, hh, ww, cc = t.shape
                t = t[:, :hh - hh % 2, :ww - ww % 2]
                t = t.reshape(b_, hh // 2, 2, ww // 2, 2, cc).mean((2, 4))
                x = t.astype(jnp.bfloat16)

        x = jnp.maximum(x.astype(jnp.float32) * af + bf, 0.0)
        x = x.mean(axis=(1, 2))
        return x @ cls_k + cls_b

    return infer
