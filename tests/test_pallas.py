"""Pallas kernel parity tests (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_shift_1d_pallas_matches_xla(rng, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    from temporalstereo_tpu.ops.pallas.shift import shift_1d_pallas
    from temporalstereo_tpu.ops.warp import shift_1d

    b, d, h, w, c = 1, 3, 4, 32, 16
    img = jnp.asarray(rng.rand(b, 1, h, w, c), jnp.float32)
    shift = jnp.asarray(rng.uniform(-10, 10, (b, d, h, w)), jnp.float32)

    ref = shift_1d(img, shift)
    with pltpu.force_tpu_interpret_mode():
        out = shift_1d_pallas(img, shift)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_shift_1d_pallas_gradients(rng):
    """custom_vjp backward equals autodiff of the XLA formulation."""
    from jax.experimental.pallas import tpu as pltpu

    from temporalstereo_tpu.ops.pallas.shift import shift_1d_pallas
    from temporalstereo_tpu.ops.warp import shift_1d

    b, d, h, w, c = 1, 2, 3, 16, 8
    img = jnp.asarray(rng.rand(b, 1, h, w, c), jnp.float32)
    shift = jnp.asarray(rng.uniform(-4, 4, (b, d, h, w)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        g_img_p, g_shift_p = jax.grad(
            lambda i, s: jnp.sum(shift_1d_pallas(i, s) ** 2),
            argnums=(0, 1))(img, shift)
    g_img_x, g_shift_x = jax.grad(
        lambda i, s: jnp.sum(shift_1d(i, s) ** 2), argnums=(0, 1))(img, shift)
    np.testing.assert_allclose(np.asarray(g_img_p), np.asarray(g_img_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_shift_p), np.asarray(g_shift_x),
                               rtol=1e-4, atol=1e-4)


def test_splat_pallas_matches_scatter(rng):
    from jax.experimental.pallas import tpu as pltpu

    from temporalstereo_tpu.ops.pallas.splat import summation_splat_pallas
    from temporalstereo_tpu.ops.softsplat import summation_splat_scatter

    b, h, w, c = 2, 6, 16, 8
    vals = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    flow = jnp.asarray(rng.uniform(-5, 5, (b, h, w, 2)), jnp.float32)

    ref = summation_splat_scatter(vals, flow)
    with pltpu.force_tpu_interpret_mode():
        out = summation_splat_pallas(vals, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_splat_pallas_softmax_mode(rng):
    """Full softsplat (softmax importance) through the pallas kernel."""
    from jax.experimental.pallas import tpu as pltpu

    from temporalstereo_tpu.ops.softsplat import softsplat

    b, h, w, c = 1, 5, 12, 4
    vals = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    flow = jnp.asarray(rng.uniform(-3, 3, (b, h, w, 2)), jnp.float32)
    metric = jnp.asarray(rng.randn(b, h, w, 1), jnp.float32)

    ref = softsplat(vals, flow, metric, mode="softmax", method="scatter")
    with pltpu.force_tpu_interpret_mode():
        out = softsplat(vals, flow, metric, mode="softmax", method="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=2e-4)


def test_splat_pallas_gradients(rng):
    """custom_vjp backward equals autodiff of the scatter oracle (which the
    reference CUDA updateGradInput/updateGradFlow kernels implement)."""
    from jax.experimental.pallas import tpu as pltpu

    from temporalstereo_tpu.ops.pallas.splat import summation_splat_pallas
    from temporalstereo_tpu.ops.softsplat import summation_splat_scatter

    b, h, w, c = 1, 4, 10, 3
    vals = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    flow = jnp.asarray(rng.uniform(-2, 2, (b, h, w, 2)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        gv_p, gf_p = jax.grad(
            lambda v, f: jnp.sum(summation_splat_pallas(v, f) ** 2),
            argnums=(0, 1))(vals, flow)
    gv_x, gf_x = jax.grad(
        lambda v, f: jnp.sum(summation_splat_scatter(v, f) ** 2),
        argnums=(0, 1))(vals, flow)
    np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_x), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_x), rtol=1e-4,
                               atol=1e-4)


def test_fused_cost_base_pallas_matches_xla(rng):
    """Fused warp+concat+corr0 kernel equals the XLA block_cost base."""
    from jax.experimental.pallas import tpu as pltpu

    from temporalstereo_tpu.ops.cost import groupwise_correlation
    from temporalstereo_tpu.ops.pallas.cost import fused_cost_base_pallas
    from temporalstereo_tpu.ops.warp import shift_1d

    b, d, h, w, c = 2, 3, 4, 24, 16
    ref = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    tgt = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    disp = jnp.asarray(rng.uniform(0, 12, (b, d, h, w)), jnp.float32)

    refb = jnp.broadcast_to(ref[:, None], (b, d, h, w, c))
    warped = shift_1d(tgt[:, None], -disp, padding_mode="zeros")
    expected = jnp.concatenate(
        [refb, warped, groupwise_correlation(refb, warped)], axis=-1)

    with pltpu.force_tpu_interpret_mode():
        out = fused_cost_base_pallas(ref, tgt, disp)
    assert out.shape == (b, d, h, w, 2 * c + c // 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-4, atol=1e-4)


def test_fused_cost_base_pallas_gradients(rng):
    """custom_vjp backward equals autodiff of the XLA formulation."""
    from jax.experimental.pallas import tpu as pltpu

    from temporalstereo_tpu.ops.cost import groupwise_correlation
    from temporalstereo_tpu.ops.pallas.cost import fused_cost_base_pallas
    from temporalstereo_tpu.ops.warp import shift_1d

    b, d, h, w, c = 1, 2, 2, 16, 8
    ref = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    tgt = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    disp = jnp.asarray(rng.uniform(0, 6, (b, d, h, w)), jnp.float32)

    def xla(r, t, s):
        rb = jnp.broadcast_to(r[:, None], (b, d, h, w, c))
        wp = shift_1d(t[:, None], -s, padding_mode="zeros")
        full = jnp.concatenate(
            [rb, wp, groupwise_correlation(rb, wp)], axis=-1)
        return jnp.sum(full ** 2)

    with pltpu.force_tpu_interpret_mode():
        grads_p = jax.grad(
            lambda r, t, s: jnp.sum(fused_cost_base_pallas(r, t, s) ** 2),
            argnums=(0, 1, 2))(ref, tgt, disp)
    grads_x = jax.grad(xla, argnums=(0, 1, 2))(ref, tgt, disp)
    for gp, gx in zip(grads_p, grads_x):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-4)


def test_block_cost_pallas_path_matches_default(rng, monkeypatch):
    """TPU.USE_PALLAS block_cost path equals the default XLA lowering."""
    from jax.experimental.pallas import tpu as pltpu

    from temporalstereo_tpu.ops import cost as cost_mod

    b, d, h, w, c = 1, 3, 8, 24, 16
    ref = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    tgt = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    disp = jnp.asarray(rng.uniform(0, 12, (b, d, h, w)), jnp.float32)

    expected = cost_mod.block_cost(ref, tgt, disp, 3)
    cost_mod.configure_pallas(True)
    try:
        with pltpu.force_tpu_interpret_mode():
            out = cost_mod.block_cost(ref, tgt, disp, 3)
    finally:
        cost_mod.configure_pallas(False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-4, atol=1e-4)
