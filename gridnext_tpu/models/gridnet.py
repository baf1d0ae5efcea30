"""GridNet family: spot classifier f composed with grid corrector g.

TPU-first re-design of the reference's gridnet_models.py:

* Tensors are channels-last. 1-D spot features arrive as (B, H, W, F); image
  grids as (B, H, W, P, P, 3). Outputs are (B, H, W, n_classes).
* Hex correctors operate natively on Visium odd-right layout (see
  ops.hexconv) -- the reference's rot90/flip round-trip into hexagdly's
  odd-down addressing (gridnet_models.py:173-187) does not exist here, so
  there is no separate ``GridNetHexOddr``: :class:`GridNetHex` *is* the
  odd-right model.
* ``patch_chunk`` is the analog of the reference's ``atonce_patch_limit``
  (gridnet_models.py:85-104): f is applied over the flattened spot axis in
  fixed-size chunks under ``nn.scan`` + ``nn.remat``, trading recompute for
  activation memory exactly like the torch gradient-checkpoint path. With
  ``patch_chunk=None`` f runs as one big batched call (best MXU utilization).
* f always runs with ``train=False`` inside GridNet: the reference forces
  ``patch_classifier.eval()`` during gridwise training (training.py:126), so
  BatchNorm uses running stats and dropout is off even when f's *weights*
  are being fine-tuned through a second optimizer. Gradients still flow.

The ``foreground_classifier``/``bg_const`` machinery of the reference is
dead code (all patches go through f; background is masked at loss time --
SURVEY.md section 8) and is intentionally not reproduced.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from gridnext_tpu.models.layers import HexConv

_xavier = nn.initializers.xavier_uniform()
_conv_kw = dict(kernel_init=_xavier, bias_init=nn.initializers.zeros)


class _CartesianCorrector(nn.Module):
    """3/5/5/3 Conv2d stack of the square-lattice GridNet (gridnet_models.py:51-66)."""

    n_classes: int
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h):
            if self.use_bn:
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5)(h)
            return h

        x = nn.Conv(self.n_classes, (3, 3), padding=1, **_conv_kw)(x)
        x = nn.relu(bn(x))
        x = nn.Conv(self.n_classes, (5, 5), padding=2, **_conv_kw)(x)
        x = nn.relu(bn(x))
        x = nn.Conv(self.n_classes, (5, 5), padding=2, **_conv_kw)(x)
        x = nn.relu(bn(x))
        return nn.Conv(self.n_classes, (3, 3), padding=1, **_conv_kw)(x)


class _HexCorrector(nn.Module):
    """Five radius-1 hex convs: f_dim->32->32 [BN,ReLU] ->32->32 [BN,ReLU] ->n_classes.

    Mirrors gridnet_models.py:128-148 but odd-right native.
    """

    n_classes: int
    use_bn: bool = True
    width: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h):
            if self.use_bn:
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5)(h)
            return h

        x = HexConv(self.width)(x)
        x = HexConv(self.width)(x)
        x = nn.relu(bn(x))
        x = HexConv(self.width)(x)
        x = HexConv(self.width)(x)
        x = nn.relu(bn(x))
        return HexConv(self.n_classes)(x)


def apply_f_chunked(f: nn.Module, flat: jnp.ndarray, chunk: Optional[int]):
    """Apply spot classifier ``f`` over a flattened spot batch.

    With ``chunk=None``: one batched call. Otherwise the batch is processed
    in fixed-size chunks under ``nn.scan`` + ``nn.remat`` -- the
    ``atonce_patch_limit`` gradient-checkpoint semantics of the reference
    (gridnet_models.py:85-104) in XLA-friendly form. f always runs in eval
    mode (training.py:126 semantics); gradients still flow to its params.
    """
    if chunk is None:
        return f(flat, train=False)
    n = flat.shape[0]
    pad = (-n) % chunk
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad,) + flat.shape[1:], flat.dtype)], axis=0)
    chunks = flat.reshape((-1, chunk) + flat.shape[1:])

    def body(mdl, carry, xc):
        return carry, mdl(xc, train=False)

    scan = nn.scan(
        nn.remat(body, prevent_cse=False),
        # broadcast every non-mutable collection f carries (params, BN stats,
        # Performer 'favor' projections) across the chunk scan; sown
        # intermediates (e.g. scBERT attention maps) stack along a leading
        # chunk axis instead of being silently dropped
        variable_broadcast=["params", "batch_stats", "favor"],
        variable_axes={"intermediates": 0},
        split_rngs={"params": False, "dropout": False},
        in_axes=0, out_axes=0,
    )
    _, out = scan(f, None, chunks)
    out = out.reshape((-1, out.shape[-1]))
    return out[:n] if pad else out


def _apply_f_grid(f, x, chunk, f_dim=None, what="patch classifier"):
    """(B, H, W, *spot_shape) -> (B, H, W, f_dim): flatten, run f chunked,
    re-grid; shared by the unimodal base and each multimodal branch."""
    b, h, w = x.shape[:3]
    flat = x.reshape((b * h * w,) + x.shape[3:])
    out = apply_f_chunked(f, flat, chunk)
    if f_dim is not None and out.shape[-1] != f_dim:
        raise ValueError(
            f"{what} produced {out.shape[-1]} features, "
            f"but f_dim={f_dim} was declared")
    return out.reshape(b, h, w, out.shape[-1])


class _FGForward:
    """The f -> g forward, stated once for the unimodal and MM bases:
    subclasses provide ``patch_predictions`` and a ``corrector``."""

    def __call__(self, x, train: bool = False):
        ppred = self.patch_predictions(x, train=train)
        return self.corrector(ppred, train=train)


class _GridNetBase(_FGForward, nn.Module):
    """Shared f-application machinery; subclasses define the corrector."""

    patch_classifier: nn.Module
    n_classes: int
    f_dim: Optional[int] = None
    use_bn: bool = True
    patch_chunk: Optional[int] = None

    def patch_predictions(self, x, train: bool = False):
        """(B, H, W, *spot_shape) -> (B, H, W, f_dim) grid of f outputs."""
        return _apply_f_grid(self.patch_classifier, x, self.patch_chunk,
                             self.f_dim)


class GridNetMMBase(_FGForward, nn.Module):
    """Multimodal base: separate f per modality, channel-concat fusion.

    Subclasses define the corrector lattice (hex for Visium pseudo-hex,
    Cartesian for HD square bins).
    """

    image_classifier: nn.Module
    count_classifier: nn.Module
    n_classes: int
    image_f_dim: Optional[int] = None
    count_f_dim: Optional[int] = None
    use_bn: bool = True
    patch_chunk: Optional[int] = None
    # per-modality override: transformer count-fs (scBERT over a 16,907-token
    # sequence) need far smaller chunks than a CNN image-f for the same HBM
    # footprint; None = inherit patch_chunk
    count_chunk: Optional[int] = None

    def patch_predictions(self, x, train: bool = False):
        x_image, x_count = x
        cc = self.patch_chunk if self.count_chunk is None else self.count_chunk
        ppg_count = _apply_f_grid(self.count_classifier, x_count,
                                  cc, self.count_f_dim,
                                  what="count classifier")
        ppg_image = _apply_f_grid(self.image_classifier, x_image,
                                  self.patch_chunk, self.image_f_dim,
                                  what="image classifier")
        return jnp.concatenate([ppg_count, ppg_image], axis=-1)


class GridNet(_GridNetBase):
    """Square-lattice (non-Visium) GridNet: Cartesian conv corrector."""

    def setup(self):
        self.corrector = _CartesianCorrector(self.n_classes, self.use_bn)


class GridNetHex(_GridNetBase):
    """Visium GridNet with a hexagonal corrector, odd-right native.

    Supersedes both ``GridNetHex`` and ``GridNetHexOddr`` of the reference:
    inputs are odd-right grids (the only layout this package uses) and the
    hex stencil understands row parity directly.
    """

    def setup(self):
        self.corrector = _HexCorrector(self.n_classes, self.use_bn)


class ConcatGridNet(nn.Module):
    """Feature-concat fusion g (notebooks/register_concat.ipynb cell 4).

    Inputs are pre-computed per-spot feature/logit grids (B, H, W, F_total)
    -- e.g. count-g logits channel-concatenated with image-g logits -- and
    the model is only the corrector: a Cartesian 3/5/5/3 conv stack held at
    the concat width with ReLUs and no BatchNorm (GridNetHexConcat's
    _init_corrector; despite that class's name the notebook uses plain
    nn.Conv2d, not hexagdly). ``patch_predictions`` is the identity.
    """

    n_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = x.shape[-1]
        x = nn.relu(nn.Conv(width, (3, 3), padding=1, **_conv_kw)(x))
        x = nn.relu(nn.Conv(width, (5, 5), padding=2, **_conv_kw)(x))
        x = nn.relu(nn.Conv(width, (5, 5), padding=2, **_conv_kw)(x))
        return nn.Conv(self.n_classes, (3, 3), padding=1, **_conv_kw)(x)

    def patch_predictions(self, x, train: bool = False):
        return x


class GridNetHexMM(GridNetMMBase):
    """Multimodal GridNet: separate f per modality, channel-concat fusion.

    ``__call__((x_image, x_count))`` with x_image (B, H, W, P, P, 3) and
    x_count (B, H, W, F). Per-modality f outputs are concatenated on the
    feature axis -- count first, then image, matching the reference's
    ``torch.cat((ppg_count, ppg_image), dim=1)`` (gridnet_models.py:235) --
    before the shared hex corrector. No mode-switching mutation is needed
    (the reference's ``_set_mode`` hack, gridnet_models.py:212-222).
    """

    def setup(self):
        self.corrector = _HexCorrector(self.n_classes, self.use_bn)


class GridNetMM(GridNetMMBase):
    """Square-lattice multimodal GridNet (Cartesian corrector).

    For HD square bin lattices, where the hex taps' pseudo-hex packing
    assumption does not hold; same concat fusion as :class:`GridNetHexMM`.
    """

    def setup(self):
        self.corrector = _CartesianCorrector(self.n_classes, self.use_bn)
