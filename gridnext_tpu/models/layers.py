"""Shared flax layers: hex convolution module and init helpers."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from gridnext_tpu.ops.hexconv import hex_conv, num_taps


class HexConv(nn.Module):
    """Hexagonal convolution layer over odd-right grids.

    Drop-in analog of ``hexagdly.Conv2d(in, out, kernel_size=radius)`` used by
    the reference correctors (gridnet_models.py:130-147), but operating
    natively on Visium odd-right layout and NHWC tensors. ``radius=1`` is the
    7-cell stencil; weights are per-tap full matrices (T, C_in, C_out).

    Init: xavier-uniform over the full (7*C_in, C_out) tap fan, zero bias --
    the same FAMILY as the reference's ``init_weights`` but NOT its exact
    distribution: init_weights type-checks ``type(m) == nn.Conv2d`` so it
    never touches hexagdly layers at all (those keep torch's default
    kaiming sub-kernel init), and hexagdly's column-parity sub-kernels have
    different fans than one 7-tap stencil. Fresh-training dynamics may
    therefore differ slightly from the reference; converted checkpoints are
    exact (compat.hexagdly_ref).

    Dtype convention (same as flax.linen.Dense): parameters live in
    ``param_dtype`` (float32 master weights regardless of activation dtype);
    ``dtype`` is the compute dtype, inputs and params are promoted to it for
    the tap einsum. Feeding bf16 activations no longer creates bf16
    *parameters* (which would starve optimizer updates below the bf16 ulp
    and produce mixed-dtype checkpoints).
    """

    features: int
    radius: int = 1
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32
    precision: object = None

    @nn.compact
    def __call__(self, x):
        t = num_taps(self.radius)
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.xavier_uniform(in_axis=(0, 1), out_axis=2),
            (t, c_in, self.features), self.param_dtype)
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        return hex_conv(x, kernel, bias, radius=self.radius, precision=self.precision)
