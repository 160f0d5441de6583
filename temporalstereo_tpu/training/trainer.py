"""Training driver: the reference's Lightning Trainer orchestration,
TPU-native.

Re-design of ``projects/TemporalStereo/dist_train.py`` (:50-116) +
``TemporalStereo.py`` train/val loops (:130-214):
  * seeding (seed_everything(43), dist_train.py:15)
  * code backup into the experiment dir (backup_code, :32-48)
  * epoch loop with validation every N epochs, checkpoint cadence,
    SWA from 80% of training, metric tables at epoch end
  * multi-host: jax.distributed.initialize + per-host data shards; process-0
    gates logging/checkpointing (rank_zero_only equivalents)
"""
from __future__ import annotations

import os
import shutil
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigNode
from ..data import build_dataloader
from ..models import build_model
from ..parallel import (
    make_data_mesh,
    make_mesh,
    make_sharded_eval_step,
    make_sharded_train_step,
    prefetch_to_device,
    shard_batch,
    shard_batch_multihost,
)
from ..utils.logging import FileWriter, MetricLogger, format_error_table
from .checkpoint import (CheckpointManager, load_any_weights, load_weights,
                         warm_start)
from .optim import build_optimizer
from .state import TrainState
from .step import make_eval_step, make_train_step


def _bn_update_apply(model, params, stats, batch):
    """One train-mode forward (no grads) updating only batch_stats."""
    from ..models.temporal import multi_frame_forward

    variables = {"params": params, "batch_stats": stats}
    outputs, new_vars, prev = multi_frame_forward(
        model, variables, batch, train=True, mutable=("batch_stats",))
    return outputs, prev, new_vars["batch_stats"]


def backup_code(src_root: str, dst_dir: str) -> None:
    """Snapshot the source tree into the experiment dir
    (reference dist_train.py:32-48)."""
    os.makedirs(dst_dir, exist_ok=True)
    pkg = os.path.join(src_root, "temporalstereo_tpu")
    if os.path.isdir(pkg):
        shutil.copytree(pkg, os.path.join(dst_dir, "temporalstereo_tpu"),
                        dirs_exist_ok=True,
                        ignore=shutil.ignore_patterns("__pycache__"))


class Trainer:
    def __init__(self, cfg: ConfigNode, multihost: bool = False):
        self.cfg = cfg
        if multihost:
            jax.distributed.initialize()
        self.is_main = jax.process_index() == 0
        # global batch = per-host batch x hosts; mesh over the largest device
        # count dividing it (per-replica batches stay integral); TPU.MESH.*
        # control the axis name and an optional device cap
        global_batch = cfg.DATA.TRAIN.BATCH_SIZE * jax.process_count()
        mesh_cfg = cfg.TPU.get("MESH", None)
        axis = tuple(mesh_cfg.get("AXIS_NAMES", ("data",)))[0] \
            if mesh_cfg else "data"
        self.mesh = make_data_mesh(
            global_batch, axis_name=axis,
            max_devices=mesh_cfg.get("DATA", -1) if mesh_cfg else -1)

        exp_dir = os.path.join(cfg.LOG_DIR, cfg.TRAINER.NAME,
                               cfg.TRAINER.VERSION)
        self.exp_dir = exp_dir
        self.writer = FileWriter(exp_dir, self.is_main)
        self.metrics = MetricLogger(os.path.join(exp_dir, "tb"), self.is_main)
        if self.is_main:
            backup_code(os.getcwd(), os.path.join(exp_dir, "code"))

        np.random.seed(cfg.get("SEED", 43))

        self.model = build_model(cfg)
        self.train_loader = build_dataloader(
            cfg.DATA.TRAIN, "train",
            num_shards=jax.process_count(), shard_index=jax.process_index())
        self.val_loader = build_dataloader(
            cfg.DATA.VAL, "val",
            num_shards=jax.process_count(), shard_index=jax.process_index())

        steps_per_epoch = max(len(self.train_loader), 1)
        self.steps_per_epoch = steps_per_epoch
        self.tx = build_optimizer(cfg, steps_per_epoch)

        max_epochs = cfg.TRAINER.MAX_EPOCHS
        total_steps = steps_per_epoch * max_epochs
        swa_cfg = cfg.TRAINER.get("SWA", None)
        swa_enabled = bool(swa_cfg and swa_cfg.get("ENABLED", False))
        swa_start = (int(total_steps * swa_cfg.get("START_FRACTION", 0.8))
                     if swa_enabled else -1)

        self.state = self._init_state(swa_enabled)
        self.ckpt = CheckpointManager(
            os.path.join(exp_dir, "checkpoints"),
            keep=cfg.CHECKPOINT.get("KEEP", -1))

        self.train_step = make_sharded_train_step(
            make_train_step(self.model, cfg, swa_start_step=swa_start),
            self.mesh, donate=cfg.TPU.get("DONATE", True))
        self.eval_step = make_sharded_eval_step(
            make_eval_step(self.model, cfg), self.mesh)

        self._maybe_restore()

    # ------------------------------------------------------------------ --
    def _init_state(self, with_swa: bool) -> TrainState:
        cfg = self.cfg
        # Parameter shapes depend only on channel widths, never on the input
        # resolution, so initialize at the smallest stride-32-compatible size
        # instead of full TRAIN resolution — avoids a whole extra model
        # compile before step 1 (the first train step compiles the real size).
        left = jnp.zeros((1, 64, 96, 3), jnp.float32)
        variables = jax.jit(
            lambda r: self.model.init({"params": r}, left, left, None, False)
        )(jax.random.PRNGKey(cfg.get("SEED", 43)))
        variables = self._maybe_load_pretrained_backbone(variables)
        return TrainState.create(variables["params"],
                                 variables.get("batch_stats", {}),
                                 self.tx, with_swa=with_swa)

    def _maybe_load_pretrained_backbone(self, variables):
        """MODEL.BACKBONE.PRETRAINED: path to a timm/torch EfficientNetV2
        state dict (.pth) or a converted .msgpack — ImageNet warm start of
        the trunk (reference backbone/TemporalStereo.py:60 pretrained=True)."""
        path = self.cfg.MODEL.BACKBONE.get("PRETRAINED", "")
        if not path:
            return variables
        if not os.path.exists(path):
            self.writer.stdout(f"WARNING: MODEL.BACKBONE.PRETRAINED={path} "
                               "not found; backbone trains from scratch")
            return variables
        if path.endswith((".pth", ".pt")):
            from ..utils.torch_import import warm_start_backbone

            variables, n = warm_start_backbone(
                variables, path, self.model.backbone_cfg.get("groups"))
        else:
            weights = load_weights(path)
            params, stats, n = warm_start(variables["params"],
                                          variables.get("batch_stats", {}),
                                          weights, strict=False)
            variables = {"params": params, "batch_stats": stats}
        self.writer.stdout(f"backbone warm start: {n} tensors from {path}")
        return variables

    def _maybe_restore(self) -> None:
        cfg = self.cfg
        resume = cfg.TRAINER.get("RESUME_FROM_CHECKPOINT", "")
        load = cfg.TRAINER.get("LOAD_FROM_CHECKPOINT", "")
        if resume:
            mgr = CheckpointManager(resume)
            self.state = mgr.restore(self.state)
            self.writer.stdout(f"resumed from {resume} "
                               f"@ step {int(self.state.step)}")
        elif load:
            if not os.path.exists(load):
                self.writer.stdout(f"WARNING: warm-start checkpoint {load} "
                                   "not found; training from scratch")
                return
            # msgpack weights OR a reference torch/Lightning .ckpt
            variables, n = load_any_weights(
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats}, load)
            self.state = self.state.replace(
                params=variables["params"],
                batch_stats=variables["batch_stats"])
            self.writer.stdout(f"warm-started {n} tensors from {load}")

    # ------------------------------------------------------------------ --
    def fit(self) -> None:
        cfg = self.cfg
        max_epochs = cfg.TRAINER.MAX_EPOCHS
        fast_dev = cfg.TRAINER.get("FAST_DEV_RUN", False)
        self.writer.set_num_total_steps(self.steps_per_epoch * max_epochs)
        self.writer.set_start_time(time.time())

        for epoch in range(max_epochs):
            self._train_epoch(epoch, fast_dev)
            if (epoch + 1) % cfg.TRAINER.CHECK_VAL_EVERY_N_EPOCHS == 0:
                self.validate(epoch)
            if (epoch + 1) % max(cfg.CHECKPOINT.EVERY_N_EPOCHS, 1) == 0:
                if self.is_main:
                    self.ckpt.save(int(self.state.step), self.state,
                                   hparams=cfg.to_dict())
            if fast_dev:
                break
        self._finalize_swa()
        if self.is_main:
            self.ckpt.save(int(self.state.step), self.state,
                           hparams=cfg.to_dict())
            # standalone weights for LOAD_FROM_CHECKPOINT warm starts (the
            # reference's strict=False two-stage recipe, dist_train.py:70-75)
            from .checkpoint import save_weights

            save_weights(os.path.join(self.exp_dir, "weights_final.msgpack"),
                         self.state.params, self.state.batch_stats)

    def _finalize_swa(self) -> None:
        """Swap in the SWA-averaged weights at the end of fit and re-estimate
        BN statistics with forward passes over the train data — the
        reference's Lightning StochasticWeightAveraging epilogue
        (dist_train.py:68; torch.optim.swa_utils.update_bn semantics)."""
        if self.state.swa_params is None or int(self.state.swa_count) == 0:
            return
        self.state = self.state.replace(params=self.state.swa_model_params())
        # re-estimate batch_stats under the averaged weights
        max_batches = min(self.steps_per_epoch,
                          int(self.cfg.TRAINER.SWA.get("BN_UPDATE_STEPS", 50)))
        if max_batches <= 0:
            return
        stats = self.state.batch_stats

        @jax.jit
        def bn_pass(params, stats, batch):
            _, _, updates = _bn_update_apply(self.model, params, stats, batch)
            return updates

        for i, (sharded, _) in enumerate(self._prefetch(self.train_loader)):
            if i >= max_batches:
                break
            stats = bn_pass(self.state.params, stats, sharded)
        self.state = self.state.replace(batch_stats=stats)
        self.writer.stdout(
            f"SWA: swapped in averaged weights "
            f"({int(self.state.swa_count)} snapshots), BN re-estimated over "
            f"{max_batches} batches")

    def _shard(self, batch):
        """Place a loader batch on the mesh.  Single-process: the batch is
        already global.  Multi-host: each process loaded only its shard
        (loader num_shards=process_count), so assemble the global array from
        per-process locals — the reference's DDP per-rank feed
        (dist_train.py:81-100)."""
        if jax.process_count() > 1:
            return shard_batch_multihost(self.mesh, batch)
        return shard_batch(self.mesh, batch)

    def _prefetch(self, loader):
        """Iterate (device_batch, host_batch) with async H2D double-buffering
        so the transfer overlaps the running step (TPU.HOST_PREFETCH)."""
        size = self.cfg.TPU.get("HOST_PREFETCH", 2)
        if size <= 0:
            return ((self._shard(b), b) for b in loader)
        return prefetch_to_device(loader, self.mesh, size=size,
                                  multihost=jax.process_count() > 1)

    def _train_epoch(self, epoch: int, fast_dev: bool = False) -> None:
        cfg = self.cfg
        every_n_steps = max(cfg.CHECKPOINT.get("EVERY_N_TRAIN_STEPS", 0), 0)
        vis_every = max(cfg.TRAINER.get("VIS_EVERY_N_TRAIN_STEPS", 2000), 0)
        for batch_idx, (sharded, batch) in enumerate(
                self._prefetch(self.train_loader)):
            t0 = time.time()
            self.state, metrics = self.train_step(self.state, sharded)
            step = int(self.state.step)

            if step % cfg.TRAINER.FLUSH_LOGS_EVERY_N_STEPS == 0:
                loss = float(metrics["loss"])
                self.writer.log_time(step, epoch, batch_idx,
                                     cfg.DATA.TRAIN.BATCH_SIZE,
                                     time.time() - t0, loss)
            if step % cfg.TRAINER.LOG_EVERY_N_STEPS == 0:
                self.metrics.log_scalars(step, jax.device_get(metrics),
                                         prefix="train/")
            if vis_every and step % vis_every == 0:
                # train-batch image dumps (reference logs `train_` images
                # every 2000 steps, TemporalStereo.py:164-166)
                self._log_images(
                    {"params": self.state.params,
                     "batch_stats": self.state.batch_stats},
                    batch, epoch, prefix="train_")
            if every_n_steps and step % every_n_steps == 0 and self.is_main:
                self.ckpt.save(step, self.state, hparams=cfg.to_dict())
            if fast_dev and batch_idx >= 1:
                break

    def validate(self, epoch: int) -> Dict[str, float]:
        return self._run_eval(self.val_loader, epoch, tag="Validation",
                              prefix="val/")

    def test(self, epoch: Optional[int] = None) -> Dict[str, float]:
        """Post-fit pass on the DATA.TEST split (the reference's
        trainer.test after fit, dist_train.py:107-114)."""
        test_loader = build_dataloader(
            self.cfg.DATA.TEST, "test",
            num_shards=jax.process_count(), shard_index=jax.process_index())
        if epoch is None:
            epoch = self.cfg.TRAINER.MAX_EPOCHS
        return self._run_eval(test_loader, epoch, tag="Test", prefix="test/")

    def _run_eval(self, loader, epoch: int, tag: str, prefix: str
                  ) -> Dict[str, float]:
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        # Weighted epoch means: per-batch metrics are global means over the
        # sharded batch (XLA reduces across all devices/hosts inside jit).
        # The weight is the eval step's global REAL-sample count — wrap-padded
        # duplicates (multi-host shard padding) are masked out of both the
        # per-batch means and the epoch weighting, so epoch tables are exact
        # regardless of host count (torch DistributedSampler counts the
        # duplicates; that is the bug, not the bar).
        sums = defaultdict(float)
        totals = defaultdict(float)
        vis_interval = max(self.cfg.VAL.get("VIS_INTERVAL", 8), 1)
        vis_batch = epoch % max(len(loader) // vis_interval, 1)
        for batch_idx, (sharded, batch) in enumerate(self._prefetch(loader)):
            metrics = self.eval_step(variables, sharded)
            metrics = jax.device_get(metrics)
            weight = float(metrics.pop(
                "weight", batch["left"].shape[1] * jax.process_count()))
            # per-key weights ('weight:<key>'): metrics pooled over a
            # sub-population (occ/noc splits) carry their own sample count
            keyed_w = {k[len("weight:"):]: float(metrics.pop(k))
                       for k in list(metrics) if k.startswith("weight:")}
            for k, v in metrics.items():
                w = keyed_w.get(k, weight)
                sums[k] += float(v) * w
                totals[k] += w
            if batch_idx == vis_batch:
                self._log_images(variables, batch, epoch)
            if self.cfg.TRAINER.get("FAST_DEV_RUN", False) and batch_idx >= 1:
                break
        means = {k: v / max(totals[k], 1) for k, v in sums.items()}
        self.writer.stdout("\n" + "*" * 40 +
                           f"  {tag} on Epoch: {epoch}  " + "*" * 40)
        self.writer.stdout(format_error_table(means))
        self.metrics.log_scalars(int(self.state.step), means, prefix=prefix)
        return means

    def _log_images(self, variables, batch, epoch: int,
                    prefix: str = "val/") -> None:
        """TensorBoard image dumps during validation: input, gt, predicted
        disparity + error colorbar per scale, local map, search-range
        low/high/validity maps (the reference's log_image,
        TemporalStereo.py:488-622)."""
        if not self.is_main:
            return
        if self.cfg.VAL.get("VIS_BATCH_INDEX", 4) <= 0:
            return  # dumps disabled — skip the (eager) extra forward too
        try:
            import numpy as np

            from ..data.transforms import denormalize
            from ..models.temporal import multi_frame_forward
            from ..ops.interpolate import resize_bilinear as _resize
            from ..visualization import (disp_err_to_colorbar, disp_to_color)

            jbatch = jax.tree.map(jnp.asarray, batch)
            outputs, _, _ = multi_frame_forward(self.model, variables, jbatch,
                                                train=False)
            step = int(self.state.step)
            batch_size = batch["left"].shape[1]
            full_h, full_w = batch["left"].shape[2:4]
            max_disp_cfg = self.cfg.get("MAX_DISP", 192)
            # dump up to VIS_BATCH_INDEX samples (reference writes a maximum
            # of four images per key, log_image :502)
            n_vis = min(self.cfg.VAL.get("VIS_BATCH_INDEX", 4), batch_size)
            for bs in range(n_vis):
                left = denormalize(batch["left"][-1][bs])
                self.metrics.log_image(step, f"{prefix}color_0_l/{bs}", left)
                # gt is at NATIVE resolution in eval batches; error maps
                # compare predictions resized to it (reference :183)
                gt = batch["disp_gt"][-1][bs, :, :, 0]
                gh, gw = gt.shape
                max_disp = float(gt.max()) if gt.max() > 0 else None
                if max_disp:
                    self.metrics.log_image(step, f"{prefix}disparity_gt/{bs}",
                                           disp_to_color(gt, max_disp))
                for i, d in enumerate(outputs["disps"]):
                    disp = np.asarray(d[bs, :, :, 0])
                    self.metrics.log_image(step, f"{prefix}disparity_{i}/{bs}",
                                           disp_to_color(disp, max_disp))
                    if max_disp:
                        if disp.shape != (gh, gw):
                            disp_g = np.asarray(_resize(
                                d * (gw / d.shape[2]),
                                (gh, gw))[bs, :, :, 0])
                        else:
                            disp_g = disp
                        err = disp_err_to_colorbar(disp_g, gt, with_bar=True)
                        self.metrics.log_image(
                            step, f"{prefix}disp_errorbar_{i}/{bs}", err)
                # local-map hypotheses, stacked vertically at full res
                # (reference :543-557)
                lm = outputs.get("local_map")
                if lm is not None:
                    mh, mw = lm.shape[1:3]
                    lm_full = np.asarray(_resize(
                        lm * (full_w / mw), (full_h, full_w))[bs])
                    stacked = lm_full.transpose(2, 0, 1).reshape(
                        -1, full_w)
                    self.metrics.log_image(step, f"{prefix}local_map/{bs}",
                                           disp_to_color(stacked, max_disp))
                # search-range low/high + validity mask per level
                # (reference :566-612)
                for i, sr in enumerate(outputs.get("search_ranges", [])):
                    h, w = sr["low"].shape[1:3]
                    lvl = int(np.log2(max(full_w // w, 1)))
                    # resized to the GT grid so the validity comparison is
                    # at native resolution
                    low = np.asarray(_resize(sr["low"] * (gw / w),
                                             (gh, gw))[bs, :, :, 0])
                    high = np.asarray(_resize(sr["high"] * (gw / w),
                                              (gh, gw))[bs, :, :, 0])
                    self.metrics.log_image(
                        step, f"{prefix}low_disparity_{lvl}/{bs}",
                        disp_to_color(low, max_disp))
                    self.metrics.log_image(
                        step, f"{prefix}high_disparity_{lvl}/{bs}",
                        disp_to_color(high, max_disp))
                    if max_disp:
                        mask = (gt > 0) & (gt < max_disp_cfg)
                        valid = mask & (low <= gt) & (high >= gt)
                        valid = valid | (~mask)
                        self.metrics.log_image(
                            step, f"{prefix}search_range_valid_{lvl}/{bs}",
                            np.repeat(valid[..., None].astype(np.float32),
                                      3, axis=-1))
        except Exception as e:  # visualization must never kill training
            self.writer.stdout(f"WARNING: image logging failed: {e}")
