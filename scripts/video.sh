#!/usr/bin/env bash
# Streaming video inference (reference video.sh equivalent)
cd "$(dirname "$0")/.."
python -m temporalstereo_tpu.cli.video_inference --config-file configs/kitti2015-multi.yaml "$@"
