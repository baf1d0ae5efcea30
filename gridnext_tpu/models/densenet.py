"""DenseNet-BC spot classifier (image patches), flax/NHWC.

Functional parity with the reference's torchvision-derived implementation
(densenet.py:78-159): same block structure, bottleneck widths, compression,
stem variants (``small_inputs``), and a ``classify=False`` mode returning the
penultimate pooled features (used for f_dim feature-level fusion). The
``efficient`` flag maps to ``jax.checkpoint`` rematerialization of the
bottleneck (densenet.py:37-40's torch checkpoint analog).

Tutorial config (DenseNet-121): ``growth_rate=32, block_config=(6,12,24,16),
num_init_features=64, bn_size=4, small_inputs=False``
(Tutorial_visium_image.ipynb cell 8).

Layout: NHWC (TPU native). Weights convert from torch checkpoints via
``gridnext_tpu.compat.torch_convert``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


def _bn(train: bool, dtype=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype)


def _conv_init(key, shape, dtype=jnp.float32):
    """Torch-reference init: normal * sqrt(2 / (out_ch * kh * kw)).

    (densenet.py:141-144 computes n from param.size(0,2,3) = out,kh,kw.)
    """
    import jax

    kh, kw, _, out = shape
    n = out * kh * kw
    return jax.random.normal(key, shape, dtype) * jnp.sqrt(2.0 / n)


class _DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    drop_rate: float
    efficient: bool
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bottleneck(mdl, h):
            # lifted-transform signature: module first (nn.remat treats the
            # first argument as the module scope)
            h = _bn(train, mdl.dtype)(h)
            h = nn.relu(h)
            return nn.Conv(mdl.bn_size * mdl.growth_rate, (1, 1),
                           use_bias=False, kernel_init=_conv_init,
                           dtype=mdl.dtype)(h)

        # remat only outside initialization (param creation inside the
        # checkpoint trace fails; memory saving only matters under grad)
        if self.efficient and not self.is_initializing():
            h = nn.remat(bottleneck, prevent_cse=False)(self, x)
        else:
            h = bottleneck(self, x)
        h = _bn(train, self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.growth_rate, (3, 3), padding=1, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype)(h)
        if self.drop_rate > 0:
            h = nn.Dropout(self.drop_rate, deterministic=not train)(h)
        return h


class _Transition(nn.Module):
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[1] < 2 or x.shape[2] < 2:  # trace-time: shapes are static
            raise ValueError(
                f"input patches too small: spatial dims are {x.shape[1:3]} "
                "at a transition's 2x2 pool (would collapse to zero and "
                "produce NaNs); densenet121 needs >= 32px patches")
        x = _bn(train, self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    """DenseNet-BC over NHWC image patches.

    ``__call__(x, train)`` with x (B, H, W, 3) returns (B, n_classes) logits,
    or (B, num_features) pooled features when ``classify=False``.
    """

    growth_rate: int = 12
    block_config: Sequence[int] = (16, 16, 16)
    compression: float = 0.5
    num_init_features: int = 24
    bn_size: int = 4
    drop_rate: float = 0.0
    num_classes: int = 10
    small_inputs: bool = True
    efficient: bool = False
    classify: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype (e.g. bf16); params stay f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert 0 < self.compression <= 1
        if self.dtype is not None:
            x = x.astype(self.dtype)

        if self.small_inputs:
            x = nn.Conv(self.num_init_features, (3, 3), strides=1, padding=1,
                        use_bias=False, kernel_init=_conv_init, name="conv0",
                        dtype=self.dtype)(x)
        else:
            x = nn.Conv(self.num_init_features, (7, 7), strides=2, padding=3,
                        use_bias=False, kernel_init=_conv_init, name="conv0",
                        dtype=self.dtype)(x)
            x = _bn(train, self.dtype)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            # Dense block: concatenate each layer's growth_rate new features.
            for _ in range(num_layers):
                new = _DenseLayer(self.growth_rate, self.bn_size,
                                  self.drop_rate, self.efficient,
                                  self.dtype)(x, train)
                x = jnp.concatenate([x, new], axis=-1)
            num_features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                num_features = int(num_features * self.compression)
                x = _Transition(num_features, self.dtype)(x, train)

        x = _bn(train, self.dtype)(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(-3, -2))  # adaptive avg pool to (1,1), flattened
        x = x.astype(jnp.float32)
        if self.classify:
            x = nn.Dense(self.num_classes, name="classifier")(x)
        return x


def densenet121(num_classes: int, **kw) -> DenseNet:
    """The tutorial/densenet_ba44 configuration."""
    return DenseNet(growth_rate=32, block_config=(6, 12, 24, 16),
                    num_init_features=64, bn_size=4, drop_rate=0,
                    num_classes=num_classes, small_inputs=False, **kw)
