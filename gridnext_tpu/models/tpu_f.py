"""TpuPatchClassifier: an MXU-shaped spot classifier f for new training.

DenseNet-121 (the reference's image f, densenet.py:78-159) is
architecture-bound on TPU: every dense-layer 3x3 conv writes only
growth_rate=32 output channels against the 128-wide MXU, wasting 3/4 of the
output lanes. Measured on one v5e at 128px patches (bf16, chunk sweep
312/624/1248/2496 flat within 3%): ~30 TF/s, ~19% MFU, ~63 us/patch.
A fused Pallas dense block (ops/denseblock_pallas.py) measured 0.96x XLA and
int8 dot_general measured *below* bf16 (95.8 TOP/s vs 110.9 TF/s at 4096^3),
so neither kernel fusion nor quantization moves it -- see docs/roadmap.md.

This module is the TPU-native alternative for users training a NEW image f
(not a checkpoint-parity DenseNet replacement): a pre-activation-style
residual ConvNet whose every conv has 128-multiple output channels, so each
MXU tile is fully populated.

ROUND-3 architecture sweep (v5e, bf16, 128px patches, f-only, chunk 624,
lax.scan-chained with on-device inputs; MFU vs 161 TF/s peak):

  | stages / stem / norm                         | us/patch | GF | TF/s | MFU |
  |----------------------------------------------|----|------|-------|-----|
  | (128,2),(256,2),(512,2) stem8  layer (r2 def)| 10.2 | 0.79 |  77.9 | 48% |
  | same, rmsnorm                                |  8.5 | 0.79 |  93.0 | 58% |
  | same, no norm (bound)                        |  7.8 | 0.79 | 101.4 | 63% |
  | (256,2),(512,2) stem16 rms  <- NEW DEFAULT   |  6.1 | 0.51 |  82.5 | 51% |
  | (256,3),(512,3) stem16 rms                   |  7.8 | 0.74 |  94.5 | 59% |
  | (256,2),(512,2) stem8 layer                  | 17.7 | 2.22 | 125.7 | 78% |

Conclusions: (a) LayerNorm cost ~17% of runtime -- RMSNorm recovers most of
it, hence norm='rms' default; (b) MFU rises with arithmetic intensity (78%
at 256-wide/16x16 spatial), but us/patch is what serves -- the default
picks the fastest per-patch config at comparable capacity (~12.5M params);
(c) patch extraction is a separate ~9 ms/slide (in-situ) pipeline stage.
The previous default remains constructible (stages=((128,2),(256,2),
(512,2)), stem_patch=8, norm='layer') for checkpoints trained on it.

Same f interface as densenet121: ``__call__(x, train)`` over (B, P, P, 3)
in [0, 1] (or normalized) floats -> (B, n_classes) logits; ``classify=False``
returns pooled features for GridNetHexMM-style fusion (densenet.py:157-158
semantics). LayerNorm instead of BatchNorm: no running-stats collection, so
f behaves identically under the gridwise trainer's forced eval mode
(training.py:126) and in spotwise training.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class TpuPatchClassifier(nn.Module):
    """Residual ConvNet with 128-multiple channels everywhere.

    Structure: patchify stem (stem_patch x stem_patch non-overlapping conv to
    ``stages[0][0]`` channels) -> per stage: optional 2x2/2 downsample conv to
    the stage width, then ``depth`` pre-norm residual blocks of two 3x3 convs
    -> global average pool -> linear head.
    """

    n_classes: int = 7
    stages: Sequence[Tuple[int, int]] = ((256, 2), (512, 2))
    stem_patch: int = 16
    classify: bool = True
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    norm: str = "rms"  # 'layer' | 'rms' | 'none' (see module docstring sweep)

    def _norm(self, dtype):
        if self.norm == "layer":
            return nn.LayerNorm(dtype=dtype)
        if self.norm == "rms":
            return nn.RMSNorm(dtype=dtype)
        if self.norm == "none":
            return lambda x: x
        raise ValueError(f"unknown norm {self.norm!r}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        dtype = self.dtype or jnp.float32
        # trace-time guard (shapes are static). Enforce the REAL bound up
        # front: the SAME-padded stage downsamples can never reach size 0
        # (only the VALID stem can), so a late zero-dim check would let
        # patches in the [stem, stem*2^(n-1)) range silently train on a
        # degenerate 1x1 feature map where every 3x3 conv sees one pixel.
        min_px = self.stem_patch * 2 ** (len(self.stages) - 1)
        if x.shape[-3] < min_px or x.shape[-2] < min_px:
            raise ValueError(
                f"input patches {x.shape[-3:-1]} too small for "
                f"stem_patch={self.stem_patch} with {len(self.stages)} "
                f"stages: every stage needs a non-degenerate spatial "
                f"extent -- use patches of at least {min_px}px")
        x = x.astype(dtype)
        x = nn.Conv(self.stages[0][0], (self.stem_patch, self.stem_patch),
                    strides=(self.stem_patch, self.stem_patch),
                    padding="VALID", dtype=dtype, name="stem")(x)
        x = self._norm(dtype)(x)
        for width, depth in self.stages:
            if x.shape[-1] != width:
                x = nn.Conv(width, (2, 2), strides=(2, 2), dtype=dtype)(x)
            for _ in range(depth):
                h = nn.Conv(width, (3, 3), dtype=dtype)(x)
                h = nn.relu(self._norm(dtype)(h))
                h = nn.Conv(width, (3, 3), dtype=dtype)(h)
                x = nn.relu(self._norm(dtype)(x + h))
        x = x.mean(axis=(1, 2))  # global average pool -> (B, width)
        if not self.classify:
            return x
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.n_classes, dtype=dtype, name="head")(x)


def tpu_f_arch_meta(f: TpuPatchClassifier) -> dict:
    """Architecture fields for model.json: everything needed to reconstruct
    this exact f at register time even after the class defaults change
    (they did once already -- see the sweep table above)."""
    return {"stages": [list(s) for s in f.stages],
            "stem_patch": int(f.stem_patch), "norm": f.norm}


def tpu_f_arch_kwargs(meta: Optional[dict]) -> dict:
    """model.json ``tpu_f`` dict -> TpuPatchClassifier constructor kwargs.

    ``None``/missing means a checkpoint from before the field existed --
    those were all trained on the ORIGINAL default shape, so that shape
    (not the current class defaults, which have since changed) is what
    loads their params: stages ((128,2),(256,2),(512,2)), stem 8, LayerNorm.
    """
    if not meta:
        return {"stages": ((128, 2), (256, 2), (512, 2)),
                "stem_patch": 8, "norm": "layer"}
    return {"stages": tuple((int(w), int(d)) for w, d in meta["stages"]),
            "stem_patch": int(meta["stem_patch"]),
            "norm": str(meta["norm"])}
