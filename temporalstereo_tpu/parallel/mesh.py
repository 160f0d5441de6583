"""Device mesh + data-parallel sharding.

TPU-native replacement for the reference's distributed stack (SURVEY §2.10,
§5.8): PyTorch-Lightning DDP + NCCL all-reduce + SyncBatchNorm
(dist_train.py:81-100).  Here:

  * a 1-D ``Mesh`` over all devices with axis 'data' (extensible to more axes)
  * the batch is sharded over 'data' via NamedSharding; parameters/optimizer
    state are replicated
  * gradient all-reduce and batch-norm statistic reduction emerge from XLA's
    SPMD partitioner (global means over the sharded batch) — there is no
    hand-written collective, and the collectives ride ICI
  * multi-host: each process feeds its local shard via
    ``jax.make_array_from_process_local_data``; ``jax.distributed.initialize``
    is the NCCL-init equivalent (see training/trainer.py)
"""
from __future__ import annotations

from collections import deque
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# batch entries laid out [T, B, ...] (time-major) vs [B, ...]
TIME_MAJOR_KEYS = ("left", "right", "disp_gt", "disp_gt_right", "T_cam",
                   "inv_T")


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def make_data_mesh(global_batch: int,
                   devices: Optional[Sequence[jax.Device]] = None,
                   axis_name: str = "data",
                   max_devices: int = -1) -> Mesh:
    """Mesh over the largest device count that divides the global batch
    (keeps per-replica batches integral).  ``max_devices`` > 0 caps the data
    axis (cfg TPU.MESH.DATA)."""
    devices = list(devices) if devices is not None else jax.devices()
    if max_devices > 0:
        devices = devices[:max_devices]
    n = len(devices)
    while n > 1 and global_batch % n != 0:
        n -= 1
    return Mesh(np.array(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, key: str) -> NamedSharding:
    axis = mesh.axis_names[0]
    if key in TIME_MAJOR_KEYS:
        return NamedSharding(mesh, P(None, axis))
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place a host-global numpy batch onto the mesh with B sharded."""
    out = {}
    for k, v in batch.items():
        out[k] = jax.device_put(jnp.asarray(v), batch_sharding(mesh, k))
    return out


def shard_batch_multihost(mesh: Mesh, local_batch: Dict[str, np.ndarray]
                          ) -> Dict[str, Any]:
    """Assemble a global sharded batch from per-process local shards
    (multi-host input pipeline; each host loads only its slice)."""
    out = {}
    for k, v in local_batch.items():
        sharding = batch_sharding(mesh, k)
        out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out


def _batch_shardings(mesh: Mesh, batch_tree) -> Any:
    return {k: batch_sharding(mesh, k) for k in batch_tree}


def prefetch_to_device(iterator, mesh: Mesh, size: int = 2,
                       multihost: bool = False):
    """Double-buffered async host->device transfer: keep ``size`` batches
    already placed on the mesh while the current step runs, so the H2D DMA
    overlaps compute instead of sitting on the critical path (the round-3
    ``Trainer._shard``-in-loop did a synchronous placement per step).

    ``jax.device_put`` only ENQUEUES the transfer (JAX dispatch is async),
    so issuing it a batch ahead is all the double-buffering TPUs need.

    Yields (device_batch, host_batch) — the host batch stays available for
    image logging / bookkeeping without a device round-trip.
    """
    put = shard_batch_multihost if multihost else shard_batch
    buf = deque()
    it = iter(iterator)

    def enqueue() -> bool:
        try:
            host = next(it)
        except StopIteration:
            return False
        buf.append((put(mesh, host), host))
        return True

    for _ in range(max(1, size)):
        if not enqueue():
            break
    while buf:
        item = buf.popleft()
        enqueue()
        yield item


def make_sharded_train_step(train_step, mesh: Mesh, donate: bool = True):
    """jit the train step with EXPLICIT shardings: train state replicated
    across the mesh, batch sharded over the data axis, outputs (new state,
    metric scalars) replicated.  Nothing is left to implicit propagation —
    the layout contract holds on any mesh/host topology.

    The batch pytree's key set is only known at call time, so the jitted
    function is cached per key set (shapes may still vary freely under one
    jit — XLA recompiles per shape as usual)."""
    rep = replicate(mesh)
    cache: Dict[frozenset, Any] = {}

    def step(state, batch):
        keys = frozenset(batch)
        jitted = cache.get(keys)
        if jitted is None:
            batch_shardings = {k: batch_sharding(mesh, k) for k in batch}
            jitted = jax.jit(
                train_step,
                in_shardings=(rep, batch_shardings),
                out_shardings=(rep, rep),
                donate_argnums=(0,) if donate else (),
            )
            cache[keys] = jitted
        return jitted(state, batch)

    return step


def make_sharded_eval_step(eval_step, mesh: Mesh):
    """jit the eval step: variables replicated, batch data-sharded, metric
    scalars replicated."""
    rep = replicate(mesh)
    cache: Dict[frozenset, Any] = {}

    def step(variables, batch):
        keys = frozenset(batch)
        jitted = cache.get(keys)
        if jitted is None:
            batch_shardings = {k: batch_sharding(mesh, k) for k in batch}
            jitted = jax.jit(eval_step,
                             in_shardings=(rep, batch_shardings),
                             out_shardings=rep)
            cache[keys] = jitted
        return jitted(variables, batch)

    return step
