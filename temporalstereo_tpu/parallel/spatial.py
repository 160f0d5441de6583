"""Spatial (width-axis) model sharding for high-resolution inference.

A TPU-first capability beyond the reference (SURVEY §2.10 lists only DDP):
the dense per-frame compute is sharded along the image W axis over a 2-D
``(data, spatial)`` mesh.  Nothing in the model changes — XLA's SPMD
partitioner inserts the halo exchanges for convolutions and the collectives
for the one-hot shift/interpolation matmuls automatically, so a frame too
large for one chip's HBM (or one chip's latency budget) splits across the
mesh while batch parallelism rides the ``data`` axis.

Verified numerically against the unsharded forward in
tests/test_parallel.py::test_spatial_sharded_forward_matches.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_2d_mesh(data: int, spatial: int,
                 devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh over (data, spatial); data x spatial must not exceed the device
    count."""
    devices = list(devices) if devices is not None else jax.devices()
    n = data * spatial
    assert len(devices) >= n, (len(devices), data, spatial)
    return Mesh(np.array(devices[:n]).reshape(data, spatial),
                ("data", "spatial"))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] images: batch over 'data', width over 'spatial'."""
    return NamedSharding(mesh, P("data", None, "spatial", None))


def make_spatial_forward(model, variables, mesh: Mesh):
    """jit the single-frame forward with images W-sharded and parameters
    replicated.  Returns fn(left, right) -> full-res disparity."""
    rep = NamedSharding(mesh, P())
    img = image_sharding(mesh)
    variables = jax.device_put(variables, rep)

    @jax.jit
    def fwd(left, right):
        outputs, _ = model.apply(variables, left, right, None, False)
        return outputs["disps"][0]

    def run(left, right):
        return fwd(jax.device_put(left, img), jax.device_put(right, img))

    return run
