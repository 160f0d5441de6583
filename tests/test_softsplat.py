"""Tests for the TPU-native softmax splatting op.

The einsum (MXU) formulation must agree with the scatter-add oracle, and both
must reproduce the reference CUDA kernel's semantics (softsplat.py:8-53,
334-359): bilinear scatter-add of exp(metric)-weighted values, normalized.
"""
import numpy as np
import jax
import jax.numpy as jnp

from temporalstereo_tpu.ops import softsplat, summation_splat
from temporalstereo_tpu.ops.softsplat import (
    summation_splat_einsum,
    summation_splat_scatter,
)


def _numpy_summation_splat(values, flow):
    b, h, w, c = values.shape
    out = np.zeros_like(values)
    for bi in range(b):
        for y in range(h):
            for x in range(w):
                tx = x + flow[bi, y, x, 0]
                ty = y + flow[bi, y, x, 1]
                x0, y0 = int(np.floor(tx)), int(np.floor(ty))
                fx, fy = tx - x0, ty - y0
                for dx, dy, wgt in ((0, 0, (1 - fx) * (1 - fy)),
                                    (1, 0, fx * (1 - fy)),
                                    (0, 1, (1 - fx) * fy),
                                    (1, 1, fx * fy)):
                    xi, yi = x0 + dx, y0 + dy
                    if 0 <= xi < w and 0 <= yi < h:
                        out[bi, yi, xi] += values[bi, y, x] * wgt
    return out


def test_einsum_matches_scatter_and_numpy(rng):
    values = rng.randn(2, 7, 9, 3).astype(np.float32)
    flow = rng.uniform(-3, 3, size=(2, 7, 9, 2)).astype(np.float32)
    ref = _numpy_summation_splat(values, flow)
    es = np.asarray(summation_splat_einsum(jnp.asarray(values),
                                           jnp.asarray(flow), row_block=3))
    sc = np.asarray(summation_splat_scatter(jnp.asarray(values),
                                            jnp.asarray(flow)))
    np.testing.assert_allclose(es, ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(sc, ref, rtol=1e-4, atol=1e-4)


def test_integer_flow_moves_pixels_exactly(rng):
    values = rng.randn(1, 4, 5, 2).astype(np.float32)
    flow = np.zeros((1, 4, 5, 2), np.float32)
    flow[..., 0] = 2.0  # move right by 2
    out = np.asarray(summation_splat(jnp.asarray(values), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, :, 2:], values[0, :, :3], atol=1e-5)
    np.testing.assert_allclose(out[0, :, :2], 0.0, atol=1e-6)


def test_softmax_mode_normalization(rng):
    """Where splats do not overlap and land on integer pixels, softmax mode
    must return the input values unchanged (weights cancel)."""
    values = rng.randn(1, 4, 6, 3).astype(np.float32)
    metric = rng.randn(1, 4, 6, 1).astype(np.float32)
    flow = np.zeros((1, 4, 6, 2), np.float32)
    out = np.asarray(softsplat(jnp.asarray(values), jnp.asarray(flow),
                               jnp.asarray(metric), mode="softmax"))
    np.testing.assert_allclose(out, values, rtol=1e-4, atol=1e-4)


def test_softmax_mode_occlusion_weighting():
    """Two sources landing on the same target: the one with the larger metric
    must dominate as the metric gap grows (the occlusion-resolution property
    the reference uses for disparity warping)."""
    values = np.zeros((1, 1, 4, 1), np.float32)
    values[0, 0, 0, 0] = 1.0   # source A
    values[0, 0, 1, 0] = 5.0   # source B
    flow = np.zeros((1, 1, 4, 2), np.float32)
    flow[0, 0, 0, 0] = 2.0     # A -> x=2
    flow[0, 0, 1, 0] = 1.0     # B -> x=2
    metric = np.zeros((1, 1, 4, 1), np.float32)
    metric[0, 0, 1, 0] = 10.0  # B much more important
    out = np.asarray(softsplat(jnp.asarray(values), jnp.asarray(flow),
                               jnp.asarray(metric), mode="softmax"))
    assert abs(out[0, 0, 2, 0] - 5.0) < 1e-3


def test_splat_gradients_flow_and_match_between_methods(rng):
    values = rng.randn(1, 5, 6, 2).astype(np.float32)
    flow = rng.uniform(-1.5, 1.5, size=(1, 5, 6, 2)).astype(np.float32)

    def loss_fn(method):
        def f(v, fl):
            return jnp.sum(summation_splat(v, fl, method=method) ** 2)
        return f

    for arg in (0, 1):
        g_e = jax.grad(loss_fn("einsum"), argnums=arg)(
            jnp.asarray(values), jnp.asarray(flow))
        g_s = jax.grad(loss_fn("scatter"), argnums=arg)(
            jnp.asarray(values), jnp.asarray(flow))
        np.testing.assert_allclose(np.asarray(g_e), np.asarray(g_s),
                                   rtol=1e-4, atol=1e-4)
    # gradient w.r.t. flow is nonzero (the CUDA kernel's updateGradFlow path)
    gf = jax.grad(loss_fn("einsum"), argnums=1)(
        jnp.asarray(values), jnp.asarray(flow))
    assert float(jnp.abs(gf).max()) > 0
