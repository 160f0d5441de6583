#!/usr/bin/env bash
# Temporal KITTI fine-tune (11-frame windows)
cd "$(dirname "$0")/.."
python -m temporalstereo_tpu.cli.train --config-file configs/kitti2015-multi.yaml "$@"
