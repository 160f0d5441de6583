"""Checkpoint save/restore (orbax) + weights-only warm start.

Re-design of the reference checkpointing (SURVEY §5.4): Lightning
ModelCheckpoint every N steps/epochs with keep-all (dist_train.py:59-66),
full-trainer resume (RESUME_FROM_CHECKPOINT, :88) vs weights-only
``load_state_dict(strict=False)`` warm start (:70-73) — the strict=False
matters because temporal fine-tunes load single-frame checkpoints whose
param tree is a subset.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState


def _to_host(tree):
    """Materialize a (replicated) state pytree to host numpy — process-LOCAL:
    a fully-replicated global array is read from its local shard, never via a
    collective.  This is what makes process-0-gated checkpointing safe under
    multi-host: orbax's sharded-jax.Array path calls process_allgather (a
    collective), which deadlocks when only rank 0 saves (the reference's
    Lightning rank_zero_only contract, dist_train.py:81-100)."""
    import numpy as np

    def conv(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if x.is_fully_replicated:
                return np.asarray(x.addressable_data(0))
            raise ValueError(
                "checkpoint state must be replicated in multi-host runs "
                f"(got sharding {x.sharding})")
        return np.asarray(x)

    return jax.tree.map(conv, tree)


class CheckpointManager:
    def __init__(self, directory: str, keep: int = -1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        # Each process gets a SINGLE-process-scoped orbax manager (no
        # cross-process barriers): payloads are host numpy (_to_host), rank 0
        # is the only writer (Trainer gates save on is_main), and restore is
        # a plain file read every process can do from a shared path.
        mp_opts = None
        if jax.process_count() > 1:
            pid = jax.process_index()
            mp_opts = ocp.options.MultiprocessingOptions(
                primary_host=pid, active_processes={pid},
                barrier_sync_key_prefix=f"proc{pid}")
        # create=False with active_processes (orbax forbids the combo);
        # the directory is created above.  Only pass multiprocessing_options
        # when overriding — None is not a valid value for it.
        kw = {}
        if mp_opts is not None:
            kw = {"multiprocessing_options": mp_opts, "create": False}
        options = ocp.CheckpointManagerOptions(
            max_to_keep=None if keep is None or keep < 0 else keep,
            create=kw.pop("create", True), **kw)
        self.mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState,
             extra: Optional[Dict[str, Any]] = None,
             hparams: Optional[Dict[str, Any]] = None) -> None:
        """``hparams``: the resolved config dict, persisted per checkpoint as
        ``hparams-<step>.json`` — the reference stores the full cfg in every
        ckpt via save_hyperparameters (TemporalStereo.py:31), so a restored
        checkpoint can reconstruct its model config."""
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if state.swa_params is not None:
            payload["swa_params"] = state.swa_params
            payload["swa_count"] = state.swa_count
        if extra:
            payload["extra"] = extra
        payload = _to_host(payload)
        self.mgr.save(step, args=ocp.args.StandardSave(payload))
        self.mgr.wait_until_finished()
        if hparams is not None:
            import json

            path = os.path.join(self.directory, f"hparams-{step}.json")
            with open(path, "w") as f:
                json.dump(hparams, f, indent=1, default=str)

    def load_hparams(self, step: Optional[int] = None
                     ) -> Optional[Dict[str, Any]]:
        """The config dict saved with a checkpoint (latest step by default),
        or None if the checkpoint predates hparams persistence."""
        import json

        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        path = os.path.join(self.directory, f"hparams-{step}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None
                ) -> TrainState:
        """Full-trainer resume (params + optimizer + step)."""
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if state.swa_params is not None:
            template["swa_params"] = state.swa_params
            template["swa_count"] = state.swa_count
        # host-numpy template: restore is a plain per-process file read (the
        # sharded-template path would engage orbax multihost logic); the
        # jitted steps re-place the leaves per their explicit shardings
        restored = self.mgr.restore(
            step, args=ocp.args.StandardRestore(_to_host(template)))
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
            swa_params=restored.get("swa_params", state.swa_params),
            swa_count=restored.get("swa_count", state.swa_count),
        )


def save_weights(path: str, params, batch_stats=None) -> None:
    """Standalone weights file (msgpack via flax serialization)."""
    from flax import serialization

    payload = {"params": params}
    if batch_stats is not None:
        payload["batch_stats"] = batch_stats
    payload = _to_host(payload)  # collective-free under multi-host
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_weights(path: str) -> Dict[str, Any]:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


TORCH_EXTENSIONS = (".ckpt", ".pth", ".pt")


def load_any_weights(variables: Dict[str, Any], path: str):
    """Warm-start ``variables`` from EITHER a native msgpack weights file or
    a reference torch/Lightning checkpoint (full-model state_dict mapped via
    utils.torch_import.import_reference_checkpoint).

    Returns (new_variables, n_matched) — the single entry point the Trainer
    and inference CLIs use, so users switching from the reference can pass
    their trained ``.ckpt`` files anywhere a checkpoint is accepted."""
    if path.endswith(TORCH_EXTENSIONS):
        from ..utils.torch_import import load_reference_checkpoint

        return load_reference_checkpoint(variables, path)
    if os.path.isdir(path):
        # an orbax checkpoint directory written by CheckpointManager — the
        # framework's own training output warm-starts the next stage
        mgr = CheckpointManager(path)
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint steps in {path}")
        restored = mgr.mgr.restore(step)
        weights = {"params": restored["params"],
                   "batch_stats": restored.get("batch_stats", {})}
        params, stats, n = warm_start(variables["params"],
                                      variables.get("batch_stats", {}),
                                      weights, strict=False)
        return {"params": params, "batch_stats": stats}, n
    weights = load_weights(path)
    params, stats, n = warm_start(variables["params"],
                                  variables.get("batch_stats", {}),
                                  weights, strict=False)
    return {"params": params, "batch_stats": stats}, n


def warm_start(params, batch_stats, weights: Dict[str, Any],
               strict: bool = False):
    """Merge loaded weights into a fresh variable tree, keeping fresh values
    where names/shapes don't match (the reference's strict=False semantics,
    dist_train.py:70-73)."""
    import numpy as np

    loaded_p = weights.get("params", {})
    loaded_b = weights.get("batch_stats", {})

    matched = [0]

    def merge(fresh, loaded):
        if not isinstance(fresh, dict):
            return fresh
        out = {}
        for k, v in fresh.items():
            if k in loaded:
                lv = loaded[k]
                if isinstance(v, dict):
                    out[k] = merge(v, lv)
                elif hasattr(lv, "shape") and tuple(lv.shape) == tuple(v.shape):
                    out[k] = jax.numpy.asarray(lv, dtype=v.dtype)
                    matched[0] += 1
                elif strict:
                    raise ValueError(
                        f"shape mismatch for {k}: {getattr(lv, 'shape', None)}"
                        f" vs {v.shape}")
                else:
                    out[k] = v
            elif strict:
                raise KeyError(f"missing key {k} in loaded weights")
            else:
                out[k] = v
        return out

    new_params = merge(jax.tree.map(lambda x: x, params), loaded_p)
    new_stats = merge(jax.tree.map(lambda x: x, batch_stats), loaded_b)
    return new_params, new_stats, matched[0]
