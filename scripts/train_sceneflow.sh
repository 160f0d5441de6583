#!/usr/bin/env bash
# Single-frame SceneFlow pretraining (reference train.sh equivalent)
cd "$(dirname "$0")/.."
python -m temporalstereo_tpu.cli.train --config-file configs/sceneflow.yaml "$@"
