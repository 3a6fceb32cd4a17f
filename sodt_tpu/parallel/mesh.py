"""Device mesh + sharding helpers: the TPU-native distributed substrate.

Replaces the reference's torch.distributed/NCCL stack (SURVEY.md §2.5, §5.8
— DDP wrap Train.py:265-266, DataParallel Train.py:203-204, both SyncBN
paths, DistributedSampler) with the JAX SPMD model:

  * one `Mesh` over all chips with a single "data" axis,
  * batches sharded `P("data")`, parameters/optimizer state replicated `P()`,
  * `jit` compiles the train step once; XLA inserts the gradient
    all-reduces (and the BN-stat reductions) over ICI automatically — there
    is no DDP wrapper, no world_size loss rescaling (Train.py:439-440), and
    no rank-0 broadcast choreography (Train.py:342-347).

Multi-host: call `jax.distributed.initialize()` before building the mesh;
each host feeds its addressable shard via
`jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch dict onto the mesh, sharded along the batch dim."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree (params / state) across the mesh."""
    sh = replicate_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate_from_local(tree, mesh: Mesh):
    """Replicated GLOBAL arrays from identical per-process host data.

    Single process: plain `replicate_tree`. Multi-host: every process
    passes the SAME full value (e.g. the device tile bank or an epoch
    index schedule built from a shared seed) and the global array is
    assembled without communication — each host's copy IS the replica."""
    if jax.process_count() == 1:
        return replicate_tree(tree, mesh)
    sh = replicate_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), tree)


def host_shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Multi-host feed path: each process passes its process-LOCAL batch
    shard and the global sharded array is assembled without any gather
    (`jax.make_array_from_process_local_data`). On a single process this
    is equivalent to `shard_batch`; under `jax.distributed.initialize()`
    each host only materializes its own slice of the global batch."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), batch)
