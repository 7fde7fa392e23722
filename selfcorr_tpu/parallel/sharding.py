"""Data-parallel sharding over a 1-D `data` device mesh.

Replaces the reference's torch DDP/NCCL stack (train.py:29-38,
trainer.py:66-78, dataloader.py:57-64) with jax.sharding: the global batch is
sharded over the `data` axis, parameters are replicated, and XLA inserts the
gradient all-reduce and the cross-device BatchNorm reduction (SyncBN
equivalent) automatically. Multi-host pods use the same code path — ICI
within a slice, DCN across — with zero custom communication code.

The batch-layout contract [video-major, frame-minor] x num_shards
(loss_utils.py:326-345) is preserved per shard: the loader emits
(shards x videos x frames) so each device's sub-batch pairs frames of its own
videos, matching the reference's per-GPU semantics.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def shard_batch(mesh: Mesh, batch):
    """Put a host batch (leading axis divisible by mesh size) on the mesh."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
