#!/usr/bin/env bash
# Qualitative demo panels (reference demo.sh equivalent)
cd "$(dirname "$0")/.."
python -m temporalstereo_tpu.cli.demo --config-file configs/sceneflow.yaml "$@"
