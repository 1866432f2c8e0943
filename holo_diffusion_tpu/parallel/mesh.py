"""Device mesh + batch sharding.

TPU-native replacement of the reference's NCCL DDP (experiment.py:165-260,
training_loop.py:536-543): a 1-axis `data` mesh where each device trains on
its own scene (voxel_batch_size=1/device mirrors holo_diffusion_model.py:326);
gradients are `psum`ed inside the single jit'd SPMD program over ICI.

Scale-out knobs beyond parity (SURVEY.md §2.9): the mesh helper accepts extra
axes for future tensor-sharding of >=128^3 grids; round-1 ships DP.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a pytree with leading device axis onto the mesh.

    Single-process: leaves carry the GLOBAL (n_dev, ...) axis — plain
    device_put. Multi-process: each host passes only its LOCAL slice
    (n_local_dev, ...) (from `device_batched_loader(process_index=...)`) and
    the global jax.Array is assembled from per-process shards — the TPU
    analog of DDP's per-rank loaders (reference experiment.py:249-260)."""
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
