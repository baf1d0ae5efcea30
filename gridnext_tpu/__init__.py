"""GridNext-TPU: TPU-native framework for supervised registration of spatial
transcriptomics (ST) data.

A ground-up JAX/XLA/Pallas re-design of the capabilities of adaly/gridnext
(reference: /root/reference). The core abstraction is a two-stage model:
a spot classifier ``f`` applied independently to each measurement on a Visium
array (gene-count vector and/or H&E image patch), and a convolutional
correction network ``g`` applied over the whole array's grid of f-outputs.
Visium spots live on a hexagonally-packed 78x64 lattice, so ``g`` uses
hexagonal convolutions -- implemented here natively over the Visium
odd-right layout (no rot90/flip round-trips) as a single fused matmul over
the 7-cell hex stencil, MXU-friendly by construction.

Layering (mirrors SURVEY.md section 7):
  geometry  -- lattice math (pure numpy/jax, no deps)
  io        -- Spaceranger / Loupe / Splotch readers, gene unification (host)
  data      -- array-backed dataset classes (count / image / multimodal / graph)
  ops       -- hex conv, FAVOR+ attention, patch gather (XLA + Pallas)
  models    -- flax modules: DenseNet, count-MLP, GridNet family, scBERT
  train     -- jitted optax train loops, checkpointing, metrics
  parallel  -- jax.sharding mesh helpers (spot/batch-axis SPMD)
  evaluate  -- foreground prediction collection, Loupe export
"""

__version__ = "0.1.0"

from gridnext_tpu import geometry  # noqa: F401
