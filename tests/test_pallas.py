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
