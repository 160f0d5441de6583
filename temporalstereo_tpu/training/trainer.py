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
    shard_batch,
)
from ..utils.logging import FileWriter, MetricLogger, format_error_table
from .checkpoint import CheckpointManager, load_weights, warm_start
from .optim import build_optimizer
from .state import TrainState
from .step import make_eval_step, make_train_step


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
        # count dividing it (per-replica batches stay integral)
        global_batch = cfg.DATA.TRAIN.BATCH_SIZE * jax.process_count()
        self.mesh = make_data_mesh(global_batch)

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
        node = cfg.DATA.TRAIN
        h, w = node.HEIGHT, node.WIDTH
        left = jnp.zeros((1, h, w, 3), jnp.float32)
        variables = jax.jit(
            lambda r: self.model.init({"params": r}, left, left, None, False)
        )(jax.random.PRNGKey(cfg.get("SEED", 43)))
        return TrainState.create(variables["params"],
                                 variables.get("batch_stats", {}),
                                 self.tx, with_swa=with_swa)

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
            weights = load_weights(load)
            params, stats, n = warm_start(self.state.params,
                                          self.state.batch_stats, weights,
                                          strict=False)
            self.state = self.state.replace(params=params, batch_stats=stats)
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
                    self.ckpt.save(int(self.state.step), self.state)
            if fast_dev:
                break
        if self.is_main:
            self.ckpt.save(int(self.state.step), self.state)

    def _train_epoch(self, epoch: int, fast_dev: bool = False) -> None:
        cfg = self.cfg
        every_n_steps = max(cfg.CHECKPOINT.get("EVERY_N_TRAIN_STEPS", 0), 0)
        for batch_idx, batch in enumerate(self.train_loader):
            t0 = time.time()
            sharded = shard_batch(self.mesh, batch)
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
            if every_n_steps and step % every_n_steps == 0 and self.is_main:
                self.ckpt.save(step, self.state)
            if fast_dev and batch_idx >= 1:
                break

    def validate(self, epoch: int) -> Dict[str, float]:
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        sums = defaultdict(float)
        count = 0
        vis_interval = max(self.cfg.VAL.get("VIS_INTERVAL", 8), 1)
        vis_batch = epoch % max(len(self.val_loader) // vis_interval, 1)
        for batch_idx, batch in enumerate(self.val_loader):
            sharded = shard_batch(self.mesh, batch)
            metrics = self.eval_step(variables, sharded)
            metrics = jax.device_get(metrics)
            for k, v in metrics.items():
                sums[k] += float(v)
            count += 1
            if batch_idx == vis_batch:
                self._log_images(variables, batch, epoch)
            if self.cfg.TRAINER.get("FAST_DEV_RUN", False) and batch_idx >= 1:
                break
        means = {k: v / max(count, 1) for k, v in sums.items()}
        self.writer.stdout("\n" + "*" * 40 +
                           f"  Validation on Epoch: {epoch}  " + "*" * 40)
        self.writer.stdout(format_error_table(means))
        self.metrics.log_scalars(int(self.state.step), means, prefix="val/")
        return means

    def _log_images(self, variables, batch, epoch: int) -> None:
        """TensorBoard image dumps during validation: input, gt, predicted
        disparity + error colorbar per scale, search-range maps (the
        reference's log_image, TemporalStereo.py:488-622)."""
        if not self.is_main:
            return
        try:
            import numpy as np

            from ..data.transforms import denormalize
            from ..models.temporal import multi_frame_forward
            from ..visualization import (disp_err_to_colorbar, disp_to_color)

            jbatch = jax.tree.map(jnp.asarray, batch)
            outputs, _, _ = multi_frame_forward(self.model, variables, jbatch,
                                                train=False)
            step = int(self.state.step)
            left = denormalize(batch["left"][-1][0])
            self.metrics.log_image(step, "val/color_0_l", left)
            gt = batch["disp_gt"][-1][0, :, :, 0]
            max_disp = float(gt.max()) if gt.max() > 0 else None
            if max_disp:
                self.metrics.log_image(step, "val/disparity_gt",
                                       disp_to_color(gt, max_disp))
            for i, d in enumerate(outputs["disps"]):
                disp = np.asarray(d[0, :, :, 0])
                self.metrics.log_image(step, f"val/disparity_{i}",
                                       disp_to_color(disp, max_disp))
                if max_disp:
                    err = disp_err_to_colorbar(disp, gt, with_bar=True)
                    self.metrics.log_image(step, f"val/disp_errorbar_{i}",
                                           err)
            for i, sr in enumerate(outputs.get("search_ranges", [])):
                low = np.asarray(sr["low"][0, :, :, 0])
                self.metrics.log_image(step, f"val/search_low_{i}",
                                       disp_to_color(low, max_disp))
        except Exception as e:  # visualization must never kill training
            self.writer.stdout(f"WARNING: image logging failed: {e}")
