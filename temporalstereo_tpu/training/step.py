"""Train / eval step functions.

Loss assembly mirrors the reference ``training_step``
(projects/TemporalStereo/TemporalStereo.py:130-168): multi-scale smooth-L1 on
the disparity pyramid + Wasserstein distribution loss on (cost, offset,
sample) triples; total = sum of every entry whose key contains 'loss'.

Under ``jit`` with the batch sharded over the mesh's data axis, the scalar
losses are global means — XLA inserts the cross-replica reductions, which IS
the reference's DDP gradient all-reduce (SURVEY §2.10) with zero extra code.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ConfigNode
from ..data.evaluation import calc_error, do_occlusion_evaluation
from ..losses import DispSmoothL1Loss, WassersteinDistanceLoss
from ..models.stereo import TemporalStereoNet
from ..models.temporal import multi_frame_forward
from .state import TrainState


def build_losses(cfg: ConfigNode):
    l1 = DispSmoothL1Loss.from_config(cfg.MODEL.LOSSES.SMOOTH_L1_LOSS)
    wars = WassersteinDistanceLoss.from_config(
        cfg.MODEL.LOSSES.WARSSERSTEIN_DISTANCE_LOSS)
    return l1, wars


def compute_losses(outputs: Dict[str, Any], disp_gt: jnp.ndarray,
                   l1_loss: DispSmoothL1Loss,
                   wars_loss: WassersteinDistanceLoss
                   ) -> Dict[str, jnp.ndarray]:
    losses = dict(l1_loss(outputs["disps"], disp_gt))
    losses.update(wars_loss(outputs["costs"], outputs["offsets"],
                            outputs["disp_samples"], disp_gt))
    losses["loss"] = sum(v for k, v in losses.items() if "loss" in k)
    return losses


def make_train_step(model: TemporalStereoNet, cfg: ConfigNode,
                    swa_start_step: int = -1):
    """Returns train_step(state, batch) -> (state, metrics).

    batch: time-major pytree (see models/temporal.py) with 'disp_gt'
    [T, B, H, W, 1].
    """
    l1_loss, wars_loss = build_losses(cfg)
    previous_with_gradient = cfg.MODEL.get("PREVIOUS_WITH_GRADIENT", False)
    remat = cfg.TPU.get("REMAT", False)

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, new_vars, _ = multi_frame_forward(
            model, variables, batch, train=True,
            previous_with_gradient=previous_with_gradient,
            mutable=("batch_stats",), remat=remat)
        if previous_with_gradient:
            # BPTT objective: EVERY frame contributes smooth-L1 +
            # Wasserstein, keyed '{frame_idx}_...' (reference training_step
            # loops frame_idxs, TemporalStereo.py:135-150); multi_frame_
            # forward returns the per-frame outputs list in this mode
            t = len(outputs)
            losses = {}
            for i, outs in enumerate(outputs):
                frame_idx = i - (t - 1)
                per = compute_losses(outs, batch["disp_gt"][i],
                                     l1_loss, wars_loss)
                per.pop("loss")
                losses.update({f"{frame_idx}_{k}": v
                               for k, v in per.items()})
            losses["loss"] = sum(v for k, v in losses.items()
                                 if "loss" in k)
        else:
            losses = compute_losses(outputs, batch["disp_gt"][-1],
                                    l1_loss, wars_loss)
        return losses["loss"], (losses, new_vars["batch_stats"])

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch)
        swa_active = (jnp.asarray(swa_start_step >= 0)
                      & (state.step >= swa_start_step))
        state = state.apply_gradients(grads, new_batch_stats=new_stats,
                                      swa_active=swa_active)
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax_global_norm(grads)
        return state, metrics

    return train_step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_eval_step(model: TemporalStereoNet, cfg: ConfigNode):
    """Returns eval_step(variables, batch) -> metrics dict.

    Mirrors validation_step (:170-193): all disparity outputs already at full
    resolution; EPE + outlier metrics per EVAL_DISPARITY_IDS.
    """
    lb = cfg.VAL.get("LOWERBOUND", 0)
    ub = cfg.VAL.get("UPPERBOUND", 192)
    eval_ids = list(cfg.VAL.get("EVAL_DISPARITY_IDS", [0]))
    do_occ = cfg.VAL.get("DO_OCCLUSION_EVALUATION", False)

    def eval_step(variables, batch) -> Dict[str, jnp.ndarray]:
        from ..ops.interpolate import resize_bilinear

        outputs, _, _ = multi_frame_forward(model, variables, batch,
                                            train=False)
        gt = batch["disp_gt"][-1]
        gt_right = batch.get("disp_gt_right")
        # Per-SAMPLE metrics, averaged over real (non-wrap-padded) samples:
        # epoch means then become exact and invariant to host count / batch
        # regrouping (multi-host shard padding, data/loader.py).  'weight' is
        # the GLOBAL countable-sample count (batch arrays are global inside
        # jit) — the trainer's epoch weighting term.
        pad_mask = batch.get("pad_mask")
        pm = (pad_mask.astype(gt.dtype) if pad_mask is not None
              else jnp.ones((gt.shape[0],), gt.dtype))
        # samples with zero valid gt pixels carry no information — exclude
        # them from the sample mean like the pixel-pooled protocol would
        valid_px = jnp.sum((gt > lb) & (gt < ub), axis=(1, 2, 3))
        sw = pm * (valid_px > 0).astype(gt.dtype)
        total_w = jnp.maximum(jnp.sum(sw), 1.0)

        def sample_mean(per_sample: jnp.ndarray) -> jnp.ndarray:
            return jnp.sum(per_sample * sw) / total_w

        metrics = {"weight": jnp.sum(sw)}
        # evaluate at the GT's NATIVE resolution: predictions are resized
        # with width-ratio value scaling (reference validation_step :183)
        gh, gw = gt.shape[1:3]
        disps = [resize_bilinear(d * (gw / d.shape[2]), (gh, gw))
                 if d.shape[1:3] != (gh, gw) else d
                 for d in outputs["disps"]]
        for i in eval_ids:
            if i >= len(disps):
                continue
            err = jax.vmap(lambda e, g: calc_error(e, g, lb=lb, ub=ub)
                           )(disps[i], gt)
            for k, v in err.items():
                metrics[f"metric_disparity_{i}/all_{k}"] = sample_mean(v)
            if do_occ and gt_right is not None:
                # occ/noc split via LR-consistency (reference
                # TemporalStereo.py:477-484 -> eval.py:45-106).  Each split
                # gets its OWN sample weight gated on that split's valid-
                # pixel count: a sample with zero occluded (or zero non-
                # occluded) pixels must not contribute a spurious 0 to the
                # mean.  The split weights are exported under 'weight:<key>'
                # and the trainer pools each metric by its own weight, so
                # epoch means match the per-split protocol exactly.
                occ = jax.vmap(
                    lambda e, g, gr: do_occlusion_evaluation(
                        e[None], g[None], gr[None], lb, ub,
                        return_counts=True)
                )(disps[i], gt, gt_right[-1])
                counts = {s: occ.pop(f"{s}_count") for s in ("occ", "noc")}
                split_w = {s: pm * (c > 0).astype(gt.dtype)
                           for s, c in counts.items()}
                for k, v in occ.items():
                    sw_k = split_w[k.split("_", 1)[0]]
                    key = f"metric_disparity_{i}/{k}"
                    metrics[key] = (jnp.sum(v * sw_k)
                                    / jnp.maximum(jnp.sum(sw_k), 1.0))
                    metrics[f"weight:{key}"] = jnp.sum(sw_k)
        return metrics

    return eval_step
