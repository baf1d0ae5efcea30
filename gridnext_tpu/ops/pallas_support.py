"""Shared Pallas backend plumbing.

Every Pallas kernel in this package auto-selects interpreter fallback with
the SAME heuristic: Mosaic kernels compile on TPU backends only, so fall
back to the interpreter EVERYWHERE else (cpu test meshes, gpu, any future
backend). One helper so the kernels can never diverge on a non-cpu,
non-tpu platform.
"""

from __future__ import annotations

import jax


def default_interpret() -> bool:
    """True when the default backend cannot compile Mosaic TPU kernels."""
    return jax.devices()[0].platform != "tpu"
