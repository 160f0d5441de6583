"""Softmax splatting (forward warping) — TPU-native.

Re-design of the reference CuPy CUDA kernels
``architecture/modeling/layers/softsplat.py``:
  * forward bilinear scatter-add with atomicAdd over 4 neighbours (:8-53)
  * input gradient (gather, :55-106) and flow gradient (:108-177)
  * the summation/average/linear/softmax importance modes (:334-359)

TPU has no fast atomic scatter, so the kernel is reformulated as a dense
contraction: per-source bilinear weights become two *one-hot* weight tensors
(rows / columns of the target), and the splat is a blocked einsum that runs on
the MXU.  The formulation is closed under `jax.grad`: the one-hot indicators
carry no gradient (exactly like the CUDA kernel, whose flow gradient only
differentiates the bilinear weights), while the weights are linear in the
fractional offsets — so autodiff reproduces the hand-written CUDA gradients
and the result is bitwise deterministic (no atomics).

A simple scatter-add variant is kept as a correctness oracle / CPU path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _target_coords(flow: jnp.ndarray):
    # f32 coordinate math regardless of flow dtype: bf16 integers > 256
    # step by 2, which would mis-round target cells at W > 256 (same fix as
    # ops.warp.shift_1d)
    b, h, w, _ = flow.shape
    f = flow.astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2) + f[..., 0]
    ys = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1) + f[..., 1]
    return xs, ys


def summation_splat_einsum(values: jnp.ndarray, flow: jnp.ndarray,
                           row_block: int = 8) -> jnp.ndarray:
    """Bilinear forward-splat via blocked one-hot matmuls (MXU path).

    values: [B, H, W, C]; flow: [B, H, W, 2] (x, y) in pixels.
    Returns [B, H, W, C] with each source value scatter-added to its 4
    bilinear neighbours at (x + flow_x, y + flow_y).
    """
    b, h, w, c = values.shape
    xs, ys = _target_coords(flow)

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # One-hot column weights Wx[b,h,w,ox]: each source hits columns x0, x0+1.
    ox = jax.lax.broadcasted_iota(jnp.int32, (b, h, w, w), 3)
    wx = (jnp.where(ox == x0i[..., None], (1.0 - fx)[..., None], 0.0)
          + jnp.where(ox == x0i[..., None] + 1, fx[..., None], 0.0))
    wx = wx.astype(values.dtype)

    out_blocks = []
    n_blocks = -(-h // row_block)
    for blk in range(n_blocks):
        lo = blk * row_block
        r = min(row_block, h - lo)
        oy = (jax.lax.broadcasted_iota(jnp.int32, (b, h, w, r), 3) + lo)
        wy = (jnp.where(oy == y0i[..., None], (1.0 - fy)[..., None], 0.0)
              + jnp.where(oy == y0i[..., None] + 1, fy[..., None], 0.0))
        wy = wy.astype(values.dtype)
        # weight rows into the block, then contract all sources on the MXU
        m = jnp.einsum("bhwr,bhwc->bhwrc", wy, values)
        out_blocks.append(jnp.einsum("bhwo,bhwrc->broc", wx, m))
    return jnp.concatenate(out_blocks, axis=1)


def summation_splat_scatter(values: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Scatter-add reference implementation (jnp ``.at[].add``)."""
    b, h, w, c = values.shape
    xs, ys = _target_coords(flow)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0

    out = jnp.zeros((b, h * w, c), values.dtype)
    for dx, dy, wgt in ((0, 0, (1 - fx) * (1 - fy)), (1, 0, fx * (1 - fy)),
                        (0, 1, (1 - fx) * fy), (1, 1, fx * fy)):
        xi = x0.astype(jnp.int32) + dx
        yi = y0.astype(jnp.int32) + dy
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.where(valid, yi * w + xi, 0).reshape(b, -1)
        contrib = (values * (wgt.astype(values.dtype)
                             * valid.astype(values.dtype))[..., None])
        out = out.at[jnp.arange(b)[:, None], idx].add(contrib.reshape(b, -1, c))
    return out.reshape(b, h, w, c)


def summation_splat(values: jnp.ndarray, flow: jnp.ndarray,
                    method: str = "einsum") -> jnp.ndarray:
    if method == "einsum":
        return summation_splat_einsum(values, flow)
    if method == "scatter":
        return summation_splat_scatter(values, flow)
    if method == "pallas":
        from .pallas.splat import summation_splat_pallas

        return summation_splat_pallas(values, flow)
    raise ValueError(f"unknown splat method {method!r}")


def softsplat(inputs: jnp.ndarray, flow: jnp.ndarray,
              metric: jnp.ndarray | None, mode: str = "softmax",
              method: str = "einsum", eps: float = 1e-22) -> jnp.ndarray:
    """Importance-weighted forward warp.

    Reference: FunctionSoftsplat (softsplat.py:334-359).
    inputs [B,H,W,C]; flow [B,H,W,2]; metric [B,H,W,1] (softmax/linear modes).
    """
    assert mode in ("summation", "average", "linear", "softmax"), mode
    b, h, w, _ = inputs.shape
    if mode == "average":
        vals = jnp.concatenate(
            [inputs, jnp.ones((b, h, w, 1), inputs.dtype)], axis=-1)
    elif mode == "linear":
        assert metric is not None and metric.shape[-1] == 1
        vals = jnp.concatenate([inputs * metric, metric], axis=-1)
    elif mode == "softmax":
        assert metric is not None and metric.shape[-1] == 1
        emetric = jnp.exp(metric)
        vals = jnp.concatenate([inputs * emetric, emetric], axis=-1)
    else:
        vals = inputs

    out = summation_splat(vals, flow, method=method)
    if mode == "summation":
        return out
    norm = out[..., -1:]
    return out[..., :-1] / (norm + eps)
