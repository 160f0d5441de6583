"""Train state + SWA (stochastic weight averaging).

SWA mirrors the reference's Lightning StochasticWeightAveraging callback
(dist_train.py:12,68: averaging from 80% of training).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # SWA accumulators (None when disabled)
    swa_params: Optional[Any] = None
    swa_count: Optional[jnp.ndarray] = None

    @classmethod
    def create(cls, params, batch_stats, tx, with_swa: bool = False):
        opt_state = tx.init(params)
        swa_params = jax.tree.map(jnp.zeros_like, params) if with_swa else None
        swa_count = jnp.zeros((), jnp.int32) if with_swa else None
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=opt_state, tx=tx,
                   swa_params=swa_params, swa_count=swa_count)

    def apply_gradients(self, grads, new_batch_stats=None,
                        swa_active: Optional[jnp.ndarray] = None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        kwargs = dict(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
        )
        if self.swa_params is not None and swa_active is not None:
            # running average of params while swa_active
            cnt = self.swa_count + swa_active.astype(jnp.int32)
            safe = jnp.maximum(cnt, 1)

            def avg(sw, p):
                upd = sw + (p - sw) / safe.astype(p.dtype)
                return jnp.where(swa_active, upd, sw)

            kwargs["swa_params"] = jax.tree.map(avg, self.swa_params,
                                                new_params)
            kwargs["swa_count"] = cnt
        return self.replace(**kwargs)

    def swa_model_params(self):
        """Final SWA-averaged params (falls back to current params when SWA
        never activated)."""
        if self.swa_params is None:
            return self.params
        use = self.swa_count > 0
        return jax.tree.map(
            lambda sw, p: jnp.where(use, sw, p), self.swa_params, self.params)
