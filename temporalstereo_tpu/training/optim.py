"""Optimizers and LR schedules (optax).

Re-design of reference ``configure_optimizers``
(projects/TemporalStereo/TemporalStereo.py:72-125): Adam / RMSProp / AdamW
with StepLR / MultiStepLR / ExponentialLR epoch schedules, plus the trainer's
global-norm gradient clip (dist_train.py:96, GRADIENT_CLIP_VAL=0.1).
"""
from __future__ import annotations

from typing import Callable

import optax

from ..config import ConfigNode


def build_schedule(cfg: ConfigNode, base_lr: float,
                   steps_per_epoch: int) -> Callable:
    """Epoch-milestone schedules mapped onto step counts."""
    kind = cfg.SCHEDULER.get("TYPE", "None")
    if kind is None or kind == "None":
        return optax.constant_schedule(base_lr)
    if kind == "StepLR":
        size = cfg.SCHEDULER.STEP_LR.STEP_SIZE * steps_per_epoch
        gamma = cfg.SCHEDULER.STEP_LR.GAMMA

        def sched(step):
            return base_lr * gamma ** (step // size)
        return sched
    if kind == "MultiStepLR":
        milestones = [m * steps_per_epoch
                      for m in cfg.SCHEDULER.MULTI_STEP_LR.MILESTONES]
        gamma = cfg.SCHEDULER.MULTI_STEP_LR.GAMMA
        return optax.piecewise_constant_schedule(
            base_lr, {m: gamma for m in milestones})
    if kind == "ExponentialLR":
        gamma = cfg.SCHEDULER.EXPONENTIAL_LR.GAMMA
        return optax.exponential_decay(
            base_lr, transition_steps=steps_per_epoch, decay_rate=gamma,
            staircase=True)
    raise NotImplementedError(f"scheduler {kind} not supported")


def build_optimizer(cfg: ConfigNode, steps_per_epoch: int
                    ) -> optax.GradientTransformation:
    kind = cfg.OPTIMIZER.TYPE
    if kind == "Adam":
        node = cfg.OPTIMIZER.ADAM
        sched = build_schedule(cfg, node.LR, steps_per_epoch)
        tx = optax.adam(sched, *node.get("BETAS", (0.9, 0.999)))
    elif kind == "RMSProp":
        node = cfg.OPTIMIZER.RMSPROP
        sched = build_schedule(cfg, node.LR, steps_per_epoch)
        # torch RMSprop defaults: alpha=0.99, eps=1e-8, no momentum
        tx = optax.rmsprop(sched, decay=0.99, eps=1e-8)
    elif kind == "AdamW":
        node = cfg.OPTIMIZER.ADAMW
        sched = build_schedule(cfg, node.LR, steps_per_epoch)
        tx = optax.adamw(sched, *node.get("BETAS", (0.9, 0.999)),
                         weight_decay=node.get("WEIGHT_DECAY", 1e-4))
    else:
        raise NotImplementedError(f"optimizer {kind} not supported")

    clip = cfg.TRAINER.get("GRADIENT_CLIP_VAL", 0.0)
    if clip and clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx
