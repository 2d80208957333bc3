"""Mesh construction and sharding rules.

The framework runs one jit-compiled SPMD program over a
``jax.sharding.Mesh`` — the TPU-native replacement for the reference's
pmap+all_gather data parallelism (clipa_jax/main.py:240). Two mesh axes:

  * ``data`` — batch dimension; spans ICI (and DCN across hosts, where XLA's
    hierarchical collectives keep the all-reduce phases local to ICI).
  * ``fsdp`` — optional parameter sharding axis for bigG-scale models; params
    are sharded along their largest dimension and all-gathered by XLA just
    before use (GSPMD handles the collective placement).

Batches are sharded over ('data', 'fsdp') jointly, so with fsdp > 1 the
batch still spans every chip.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXES = ("data", "fsdp")


def create_mesh(fsdp: int = 1, devices: Optional[Sequence] = None,
                allow_split_physical_axes: bool = True) -> Mesh:
    """Builds a (data, fsdp) mesh over all (or given) devices.

    Uses ``mesh_utils.create_device_mesh`` so the data axis rides the torus
    topology (nearest-neighbor ICI links for the gradient all-reduce).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % fsdp:
        raise ValueError(f"fsdp={fsdp} does not divide device count {n}")
    shape = (n // fsdp, fsdp)
    if n == 1:
        mesh_devices = np.array(devices).reshape(shape)
    else:
        from jax.experimental import mesh_utils
        try:
            mesh_devices = mesh_utils.create_device_mesh(
                shape, devices=devices,
                allow_split_physical_axes=allow_split_physical_axes)
        except (ValueError, NotImplementedError):
            mesh_devices = np.array(devices).reshape(shape)
    return Mesh(mesh_devices, axis_names=("data", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-step batches: dim 0 split over every chip."""
    return NamedSharding(mesh, P(BATCH_AXES))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_shardings(params: Any, mesh: Mesh,
                   min_size_to_shard: int = 2 ** 18) -> Any:
    """Per-parameter NamedShardings: largest divisible axis over 'fsdp'.

    Small parameters (norms, biases, cls, temperature) stay replicated —
    sharding them buys nothing and costs collective launches.
    """
    fsdp_size = mesh.shape["fsdp"]

    def rule(x):
        if fsdp_size == 1 or x.size < min_size_to_shard:
            return NamedSharding(mesh, P())
        # Prefer the last dim (keeps the contraction dim intact for matmul
        # partitioning), else any dim divisible by the axis size.
        dims = sorted(range(x.ndim), key=lambda d: (x.shape[d] % fsdp_size == 0,
                                                    x.shape[d]), reverse=True)
        for d in dims:
            if x.shape[d] % fsdp_size == 0 and x.shape[d] >= fsdp_size:
                spec = [None] * x.ndim
                spec[d] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def local_batch_to_global(local_arrays: Any, mesh: Mesh) -> Any:
    """Assembles per-host numpy batches into globally-sharded jax.Arrays.

    Each host contributes its local shard of the global batch; this is the
    host->device boundary (replaces the reference's device_put_sharded path,
    clipa_jax/datasets/input_pipeline.py:205-238).
    """
    sharding = batch_sharding(mesh)

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, local_arrays)
