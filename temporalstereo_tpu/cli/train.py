"""Training entry point.

Usage (mirrors reference dist_train.py:50-116):
  python -m temporalstereo_tpu.cli.train --config-file configs/sceneflow.yaml \
      [--multihost] [KEY VALUE ...]
"""
from __future__ import annotations

import argparse

import jax


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="TemporalStereo-TPU training")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize()")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return parser


def main() -> None:
    args = get_parser().parse_args()
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ..config import get_cfg
    from ..training.trainer import Trainer

    cfg = get_cfg(args.config_file, args.opts)
    trainer = Trainer(cfg, multihost=args.multihost)
    trainer.fit()
    trainer.test()  # post-fit pass on DATA.TEST (ref dist_train.py:107-114)
    trainer.metrics.close()


if __name__ == "__main__":
    main()
