"""PyTorch-checkpoint converters and the hexagdly-semantics oracle.

Torch itself is only required inside the functions that take a state_dict
(tensors are converted via ``.detach().cpu().numpy()``); importing this
package is torch-free.
"""

from gridnext_tpu.compat.torch_convert import (  # noqa: F401
    count_mlp_from_torch,
    densenet_from_torch,
    gridnet_from_torch,
    gridnethex_from_torch,
    gridnethexmm_from_torch,
    hex_kernel_from_hexagdly,
)
from gridnext_tpu.compat.scbert_convert import (  # noqa: F401
    performer_lm_from_torch,
    scbert_from_torch,
)
