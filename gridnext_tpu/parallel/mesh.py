"""Device-mesh / sharding helpers: the distributed tier of the framework.

The reference is single-process, single-device (SURVEY.md section 2.3); this
module is the TPU-native replacement: single-controller JAX over a
``jax.sharding.Mesh``, with sharding-annotated inputs letting XLA's SPMD
partitioner insert the collectives (psum for gradient reduction, halo
collective-permutes for spatially-sharded hex convolution).

Axes:
  * ``data`` -- batch of Visium arrays (pure DP; gradients all-reduce).
  * ``spot`` -- the grid row axis (H). f applies per-spot so this is
    embarrassingly parallel; the hex corrector's shifted-slice taps induce
    halo exchanges that XLA lowers to neighbor ``ppermute`` over ICI.

For the model sizes of this domain (DenseNet-121 / Performer-200d), TP/PP
are unnecessary -- the weights replicate; scaling is over spots and arrays.

Sequence parallelism (scBERT's 16,907-gene token axis) also needs no
dedicated machinery: shard the token axis of the input
(``NamedSharding(mesh, P("data", "seq"))``) and the XLA SPMD partitioner
inserts the collectives -- the FAVOR+ einsums contract over tokens, so the
context sum and key-sum reduce with psums, splitting the transcendental
feature-map cost (the measured serving bottleneck) across chips. Certified
numerically in tests/test_parallel.py::test_scbert_sequence_parallel_*.
"""

from __future__ import annotations

import warnings
from typing import Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Optional[Mapping[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh; default 1-D ``data`` over all devices.

    ``mesh_shape`` e.g. {'data': 4, 'spot': 2}; axis sizes must multiply to
    the device count used.
    """
    if devices is None:
        devices = jax.devices()
    if mesh_shape is None:
        mesh_shape = {"data": len(devices)}
    names = tuple(mesh_shape.keys())
    sizes = tuple(mesh_shape.values())
    n = int(np.prod(sizes))
    if len(devices) < n:
        raise ValueError(
            f"mesh shape {dict(mesh_shape)} needs {n} devices but only "
            f"{len(devices)} visible "
            f"({[d.platform for d in devices[:4]]}...); for CPU testing set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N")
    dev_array = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(dev_array, names)


def default_mesh_shape(n_devices: int) -> dict:
    """data x spot factorization: prefer 2-way spot sharding when possible."""
    if n_devices % 2 == 0 and n_devices > 1:
        return {"data": n_devices // 2, "spot": 2}
    return {"data": n_devices, "spot": 1}


def shard_grid_batch(tree, mesh: Mesh, data_axis: str = "data",
                     spot_axis: Optional[str] = "spot"):
    """Place a batch of grids: batch dim over ``data``, H dim over ``spot``.

    Works on (B, H, ...) arrays and pytrees thereof; 1-D label/batch arrays
    shard on batch only. A grid H that the ``spot`` axis does not divide
    (e.g. an odd-H ``--grid-dims auto`` HD lattice on a spot=2 mesh) falls
    back to data-only sharding for that array with a warning -- XLA would
    otherwise reject the placement with an opaque partitioning error deep
    inside the training loop. A batch dim the ``data`` axis does not divide
    is a configuration error and raises with the numbers spelled out.
    """
    spot = spot_axis if spot_axis in mesh.axis_names else None
    data_n = mesh.shape[data_axis]
    spot_n = mesh.shape[spot] if spot is not None else 1

    def place(x):
        if x.shape[0] % data_n:
            raise ValueError(
                f"batch dim {x.shape[0]} is not divisible by mesh axis "
                f"'{data_axis}'={data_n}; pick a batch size that is a "
                f"multiple of the data-parallel degree")
        if x.ndim >= 2 and spot is not None:
            if x.shape[1] % spot_n == 0:
                spec = P(data_axis, spot)
            else:
                warnings.warn(
                    f"grid H={x.shape[1]} is not divisible by mesh axis "
                    f"'{spot}'={spot_n}; sharding this array over "
                    f"'{data_axis}' only (H replicates)", stacklevel=3)
                spec = P(data_axis)
        else:
            spec = P(data_axis)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def shard_spot_batch(tree, mesh: Mesh):
    """Place spot-level batches: the item axis (dim 0) shards over EVERY mesh
    axis. Spots/patches are embarrassingly parallel, so a {'data': 4,
    'spot': 2} mesh simply acts as 8-way DP for spotwise training -- the
    layout behind ``train_spotwise(mesh=...)``."""
    spec = P(tuple(mesh.axis_names))
    n_dev = mesh.size

    def place(x):
        if x.shape[0] % n_dev:
            raise ValueError(
                f"spot-batch dim {x.shape[0]} is not divisible by the "
                f"mesh's {n_dev} devices; pick a batch size that is a "
                f"multiple of the device count")
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def shard_token_batch(tree, mesh: Mesh, data_axis: str = "data",
                      token_axis: str = "seq"):
    """Place (B, N, ...) token batches: batch over ``data``, tokens over
    ``token_axis`` -- the sequence-parallel layout for scBERT's 16,907-gene
    axis (the SPMD partitioner lowers the FAVOR+ contractions over the
    sharded axis to psums; see module docstring)."""
    token = token_axis if token_axis in mesh.axis_names else None
    token_n = mesh.shape[token] if token is not None else 1

    def place(x):
        if x.ndim >= 2 and token is not None and x.shape[1] % token_n == 0:
            spec = P(data_axis, token)
        else:
            if x.ndim >= 2 and token is not None:
                warnings.warn(
                    f"token dim {x.shape[1]} is not divisible by mesh axis "
                    f"'{token}'={token_n}; sharding this array over "
                    f"'{data_axis}' only (tokens replicate)", stacklevel=3)
            spec = P(data_axis)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
