"""Experiment logging: rank-zero file/stdout writer with throughput + ETA.

Re-design of reference ``projects/TemporalStereo/logger.py`` (Logger,
FileWriter.log_time :68-77, collect_env_info :12).  TensorBoard event writing
is used when tensorboard is importable (it is baked into the image via
torch); falls back to JSONL metric logs otherwise.
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional

import numpy as np


def collect_env_info() -> str:
    import jax

    lines = [
        f"python: {sys.version.split()[0]}",
        f"jax: {jax.__version__}",
        f"backend: {jax.default_backend()}",
        f"devices: {jax.device_count()} x {jax.devices()[0].device_kind}",
        f"processes: {jax.process_count()}",
    ]
    return "\n".join(lines)


def format_error_table(means: Dict[str, float]) -> str:
    """Group ``metric_disparity_{i}/{region}_{metric}`` keys into aligned
    per-map/per-region rows (the reference's pandas-DataFrame epoch summary,
    ``TemporalStereo.py:216-248 process_error_dict``).  Keys that don't match
    the metric naming scheme are listed verbatim below the table."""
    rows: Dict[str, Dict[str, float]] = {}
    extras = {}
    for k, v in means.items():
        if "/" in k and k.startswith("metric_"):
            map_name, rest = k.split("/", 1)
            region, _, metric = rest.partition("_")
            rows.setdefault(f"{map_name[len('metric_'):]}/{region}",
                            {})[metric or region] = v
        else:
            extras[k] = v
    lines = []
    if rows:
        cols = sorted({c for r in rows.values() for c in r})
        head = f"{'':28s}" + "".join(f"{c:>12s}" for c in cols)
        lines.append(head)
        for name in sorted(rows):
            cells = "".join(
                f"{rows[name][c]:12.4f}" if c in rows[name] else f"{'-':>12s}"
                for c in cols)
            lines.append(f"{name:28s}" + cells)
    for k in sorted(extras):
        lines.append(f"  {k}: {extras[k]:.4f}")
    return "\n".join(lines)


class FileWriter:
    """Rank-zero text log with examples/s + ETA (reference logger.py:36-77)."""

    def __init__(self, log_dir: str, is_main: bool = True):
        self.is_main = is_main
        self.log_dir = log_dir
        self.num_total_steps: Optional[int] = None
        self.start_time = time.time()
        if is_main:
            os.makedirs(log_dir, exist_ok=True)
            self.fp = open(os.path.join(log_dir, "log.txt"), "a")
            self.stdout(collect_env_info())
        else:
            self.fp = None

    def set_num_total_steps(self, n: int) -> None:
        self.num_total_steps = n

    def set_start_time(self, t: float) -> None:
        self.start_time = t

    def stdout(self, msg: str) -> None:
        if not self.is_main:
            return
        print(msg, flush=True)
        if self.fp:
            self.fp.write(msg + "\n")
            self.fp.flush()

    def log_time(self, step: int, epoch: int, batch_idx: int,
                 batch_size: int, duration: float, loss: float) -> None:
        if not self.is_main:
            return
        eps = batch_size / max(duration, 1e-9)
        msg = (f"epoch {epoch:3d} | step {step:7d} | batch {batch_idx:5d} "
               f"| examples/s: {eps:8.2f} | loss: {float(loss):.5f}")
        if self.num_total_steps:
            elapsed = time.time() - self.start_time
            done = max(step, 1)
            eta = elapsed / done * max(self.num_total_steps - done, 0)
            msg += f" | ETA: {eta / 3600:.2f}h"
        self.stdout(msg)


class MetricLogger:
    """Scalar metric sink: tensorboard events + JSONL fallback."""

    def __init__(self, log_dir: str, is_main: bool = True):
        self.is_main = is_main
        self.tb = None
        self.jsonl = None
        if not is_main:
            return
        os.makedirs(log_dir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(log_dir)
        except Exception:
            pass
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def log_scalars(self, step: int, scalars: Dict[str, float],
                    prefix: str = "") -> None:
        if not self.is_main:
            return
        record = {"step": int(step)}
        for k, v in scalars.items():
            name = prefix + k
            val = float(np.asarray(v))
            record[name] = val
            if self.tb is not None:
                self.tb.add_scalar(name, val, step)
        if self.jsonl is not None:
            self.jsonl.write(json.dumps(record) + "\n")
            self.jsonl.flush()

    def log_image(self, step: int, name: str, image: np.ndarray) -> None:
        """image: [H, W, 3] float in [0,1]."""
        if not self.is_main or self.tb is None:
            return
        self.tb.add_image(name, np.transpose(image, (2, 0, 1)), step)

    def close(self) -> None:
        if self.tb is not None:
            self.tb.close()
        if self.jsonl is not None:
            self.jsonl.close()
