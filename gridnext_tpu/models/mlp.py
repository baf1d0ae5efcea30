"""Fully-connected spot classifier for count vectors.

Architecture parity with the count tutorial's f-network
(Tutorial_visium_count.ipynb cell 12):

  Linear(in, 500) -> Linear(500, 100) -> BN -> ReLU ->
  Linear(100, 100) -> Linear(100, 50) -> BN -> ReLU -> Linear(50, n_classes)

(The back-to-back linear pairs without intervening nonlinearity are kept for
checkpoint-compat; fold them offline if you want the flops back.)
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn


class CountMLP(nn.Module):
    """Spot classifier ``f`` over 1-D expression (or PC) vectors.

    Args:
      n_classes: output dimension.
      hidden: widths of the four hidden linear layers.
      batch_norm: apply BatchNorm after the 2nd and 4th linear layer
        (matching the tutorial topology).
    """

    n_classes: int
    hidden: Sequence[int] = (500, 100, 100, 50)
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        h1, h2, h3, h4 = self.hidden
        x = nn.Dense(h1)(x)
        x = nn.Dense(h2)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
        x = nn.relu(x)
        x = nn.Dense(h3)(x)
        x = nn.Dense(h4)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
        x = nn.relu(x)
        return nn.Dense(self.n_classes)(x)
