"""Data-parallel sharding over a 1-D `data` device mesh.

Replaces the reference's torch DDP/NCCL stack (train.py:29-38,
trainer.py:66-78, dataloader.py:57-64) with jax.sharding: the global batch is
sharded over the `data` axis, parameters are replicated, and XLA inserts the
gradient all-reduce and the cross-device BatchNorm reduction (SyncBN
equivalent) automatically.

Multi-host pods run the SAME jitted step — the differences are confined to
this module and the loader:
  * `init_distributed` stands in for `torch.distributed.init_process_group`
    (reference train.py:29-38): no-arg on TPU pods (cluster auto-detection),
    explicit (coordinator, n, rank) elsewhere.
  * each process decodes only the global-batch rows its local devices own
    (`process_row_range` — the DistributedSampler equivalent,
    dataloader.py:57-64) and `shard_batch` assembles the global array from
    the per-process slices; no host ever materializes the full global batch.
  * gradient/BN collectives ride ICI within a slice and DCN across slices,
    emitted by XLA from the same `shard_map` program.

The batch-layout contract [video-major, frame-minor] x num_shards
(loss_utils.py:326-345) is preserved per shard: the loader emits
(shards x videos x frames) so each device's sub-batch pairs frames of its own
videos, matching the reference's per-GPU semantics.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-controller init; must run before any other jax call.

    On TPU pods call with all-None (jax auto-detects the cluster); on
    CPU/GPU clusters pass the coordinator address + process count + rank,
    mirroring the reference's env://-initialized NCCL process group
    (train.py:29-38)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if num_devices is not None:
        if jax.process_count() > 1 and num_devices != len(devices):
            # a partial mesh would break the equal-rows-per-process layout
            # shard_batch assumes; pods always use every chip anyway
            raise ValueError(
                f"multi-host runs must use all {len(devices)} devices "
                f"(got num_devices={num_devices})")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def process_row_range(mesh: Mesh, global_rows: int) -> tuple[int, int]:
    """Global batch-row interval [start, stop) owned by THIS process's
    devices under P('data') — the rows its loader must decode (the
    DistributedSampler equivalent, reference dataloader.py:57-64)."""
    sharding = NamedSharding(mesh, P("data"))
    me = jax.process_index()
    spans = [idx[0] for d, idx in
             sharding.devices_indices_map((global_rows,)).items()
             if d.process_index == me]
    starts = sorted((s.start or 0) for s in spans)
    stops = sorted((global_rows if s.stop is None else s.stop) for s in spans)
    lo, hi = starts[0], stops[-1]
    if stops[:-1] != starts[1:]:  # non-contiguous would desync the loader
        raise ValueError(f"process rows not contiguous: {spans}")
    return lo, hi


def shard_batch(mesh: Mesh, batch):
    """Put a host batch on the mesh, sharded over `data` along axis 0.

    Single process: `batch` is the full global batch (leading axis divisible
    by mesh size). Multi-process: `batch` holds only this process's rows
    (see process_row_range) and the global array is assembled from the
    per-process slices — the multi-host analog of DDP's per-rank batches."""
    sharding = NamedSharding(mesh, P("data"))
    nproc = jax.process_count()

    def put(x):
        if nproc == 1:
            return jax.device_put(x, sharding)
        x = np.asarray(x)
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate host values across every device of the mesh (params /
    optimizer state; every process passes the same value)."""
    sharding = NamedSharding(mesh, P())
    nproc = jax.process_count()

    def put(x):
        if nproc == 1:
            return jax.device_put(x, sharding)
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x, x.shape)

    return jax.tree_util.tree_map(put, tree)


def local_rows(x):
    """THIS process's rows of a P('data') axis-0-sharded global array,
    concatenated in global row order — the output-side counterpart of
    process_row_range (rows [lo, hi) in the same order the local loader
    decoded them). Fully-addressable arrays pass through np.asarray."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        # replicated outputs (every shard covers the full array, e.g. faces)
        # -> one shard IS the value; row-sharded -> dedup + order by start
        by_start = {}
        for s in x.addressable_shards:
            by_start[s.index[0].start or 0] = s
        shards = [by_start[k] for k in sorted(by_start)]
        if len(shards) == 1:
            return np.asarray(shards[0].data)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(x)


def local_value(x):
    """Host value of a possibly non-fully-addressable (multi-host) array.

    Replicated outputs (losses, metrics, state) carry the full value in
    every local shard, so the first addressable shard IS the value; plain
    arrays pass through np.asarray."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return np.asarray(x.addressable_shards[0].data)
    return np.asarray(x)
