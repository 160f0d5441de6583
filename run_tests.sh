#!/usr/bin/env bash
# Run the test suite on a virtual 8-device CPU mesh.
#
# PYTHONPATH is cleared to disable the axon TPU sitecustomize hook
# (/root/.axon_site): tests must not claim the real TPU chip, and multi-chip
# sharding logic is validated on XLA's host platform instead
# (xla_force_host_platform_device_count=8, set in tests/conftest.py).
set -e
cd "$(dirname "$0")"
PYTHONPATH="." PALLAS_AXON_POOL_IPS="" JAX_PLATFORMS=cpu \
    exec python -m pytest tests/ -q "$@"
