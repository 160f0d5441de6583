#!/usr/bin/env bash
# KITTI-2015 submission PNGs (reference submit.sh equivalent)
cd "$(dirname "$0")/.."
python -m temporalstereo_tpu.cli.kitti_submission --config-file configs/kitti2015-multi.yaml "$@"
