"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the environment before jax is imported anywhere (multi-chip sharding
tests rely on xla_force_host_platform_device_count; bench/__graft_entry__ use
the real TPU instead).
"""

import os
import sys

# Force CPU (the ambient environment may pin JAX_PLATFORMS=axon/tpu).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Repo root on sys.path so `import gridnext_tpu` works without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize (TPU tunnel) calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, which overrides the env var -- override it
# back before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
