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
                   axis_name: str = "data") -> Mesh:
    """Mesh over the largest device count that divides the global batch
    (keeps per-replica batches integral)."""
    devices = list(devices) if devices is not None else jax.devices()
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


def make_sharded_train_step(train_step, mesh: Mesh, donate: bool = True):
    """jit the train step with state replicated and batch data-sharded."""
    rep = replicate(mesh)

    def shardings_for_batch(batch):
        return {k: batch_sharding(mesh, k) for k in batch}

    jitted = jax.jit(
        train_step,
        donate_argnums=(0,) if donate else (),
    )

    def step(state, batch):
        return jitted(state, batch)

    return step


def make_sharded_eval_step(eval_step, mesh: Mesh):
    jitted = jax.jit(eval_step)

    def step(variables, batch):
        return jitted(variables, batch)

    return step
