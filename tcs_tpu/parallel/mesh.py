"""Device mesh and data-parallel sharding helpers.

The reference's entire distributed story is torch-DDP data parallelism over
NCCL (``train_stereo.py:275-292``, ``core/stereo_datasets.py:722-729``). The
TPU-native equivalent here is a 1-axis ``jax.sharding.Mesh`` over all chips:

- parameters are replicated, the batch is sharded on the ``data`` axis;
- the gradient all-reduce is inserted by XLA's sharding propagation when the
  jitted train step consumes a sharded batch with replicated params (riding
  ICI within a slice, DCN across hosts) — no hand-written collectives;
- multi-host setup goes through :func:`initialize_distributed`
  (``jax.distributed.initialize``), the moral equivalent of
  ``dist.init_process_group`` + torch.distributed.launch;
- DDP's per-rank RNG seeding (reference :292) maps to
  ``jax.random.fold_in(key, process_index)`` (see :func:`process_rng_key`).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init. No-op when running single-process (the common case on
    a single chip or a single host with all devices local)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def create_mesh(devices=None) -> Mesh:
    """1-axis data-parallel mesh over all (global) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh):
    """Shard every array in the batch pytree along its leading axis.

    For multi-host runs where each process holds only its local shard, use
    :func:`global_batch_from_local` instead.
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def global_batch_from_local(local_batch, mesh: Mesh):
    """Build a global sharded array from per-process local data
    (``jax.make_array_from_process_local_data``), replacing the reference's
    ``DistributedSampler`` semantics: each process loads only its own rows."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )


def process_rng_key(key: jax.Array) -> jax.Array:
    """Fold the process index into an RNG key (reference per-rank seed :292)."""
    return jax.random.fold_in(key, jax.process_index())
