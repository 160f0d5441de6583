"""Pallas TPU kernel: bilinear forward splat (the softsplat hot op).

TPU-native counterpart of the reference's ONLY native component — the CuPy
CUDA scatter-add kernels of ``architecture/modeling/layers/softsplat.py``
(:8-53 forward, :55-106 input grad, :108-177 flow grad).  TPU has no fast
atomic scatter, so instead of 4-neighbour atomicAdd the kernel contracts
per-source-row one-hot row/column indicator matrices on the MXU:

  out[c, y, x] = sum_{h,w} (wy[w, y] * v[c, w]) @ wx[w, x]   per source row h

where wx/wy are the 2-tap bilinear weights as one-hot matrices over target
columns/rows.  Deterministic by construction (fixed reduction order — the
CUDA kernel's atomicAdd is not), and each of the 4 taps is bounds-checked
independently, exactly like the CUDA kernel's per-neighbour guards.

Mosaic notes: inputs arrive transposed ([B, C, W, H] / [B, 2, W, H]) so a
per-source-row read ``ref[0, ci, :, i]`` is a [W, 1] *column* (W in
sublanes) — no in-kernel transposes or shape casts, everything is 2D
iota/compare/select plus dot_general, which the vector-layout pass lowers.

Autodiff: custom_vjp differentiating the mathematically identical XLA
formulation (ops.softsplat.summation_splat_einsum), whose autodiff
reproduces the hand-written CUDA input/flow gradients.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(v_ref, flow_ref, out_ref, acc_ref):
    _, c, h, w = v_ref.shape

    # transposed one-hots so everything builds from [1, w] ROW vectors
    # (lane dim = w; dynamic per-source-row reads slice the sublane dim)
    col_t = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)    # [x_out, w_src]
    row_t = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)    # [y_out, w_src]
    xw = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(jnp.float32)

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, _):
        # source row i: every pixel w scatters to rows y0/y0+1, cols x0/x0+1
        flx = flow_ref[0, 0, pl.ds(i, 1), :].astype(jnp.float32)   # [1, w]
        fly = flow_ref[0, 1, pl.ds(i, 1), :].astype(jnp.float32)
        xs = xw + flx
        ys = i.astype(jnp.float32) + fly
        x0 = jnp.floor(xs)
        y0 = jnp.floor(ys)
        fx = xs - x0                                          # [1, w]
        fy = ys - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        wx_t = (jnp.where(col_t == x0i, 1.0 - fx, 0.0)
                + jnp.where(col_t == x0i + 1, fx, 0.0))       # [x_out, w_src]
        wy_t = (jnp.where(row_t == y0i, 1.0 - fy, 0.0)
                + jnp.where(row_t == y0i + 1, fy, 0.0))       # [y_out, w_src]
        for ci in range(c):
            vc = v_ref[0, ci, pl.ds(i, 1), :].astype(jnp.float32)  # [1, w]
            acc_ref[ci] += jax.lax.dot_general(
                wy_t * vc, wx_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # [y_out, x_out]
        return ()

    jax.lax.fori_loop(0, h, body, ())
    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


@jax.custom_vjp
def summation_splat_pallas(values: jnp.ndarray, flow: jnp.ndarray
                           ) -> jnp.ndarray:
    """values: [B, H, W, C]; flow: [B, H, W, 2] (x, y) in pixels.
    Same contract as ops.softsplat.summation_splat_einsum."""
    return _forward(values, flow)


def _forward(values, flow):
    b, h, w, c = values.shape
    v_t = values.transpose(0, 3, 1, 2)                        # [B, C, H, W]
    f_t = flow.transpose(0, 3, 1, 2)                          # [B, 2, H, W]
    out = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), values.dtype),
        scratch_shapes=[pltpu.VMEM((c, h, w), jnp.float32)],
    )(v_t, f_t)
    return out.transpose(0, 2, 3, 1)                          # [B, H, W, C]


def _fwd(values, flow):
    return _forward(values, flow), (values, flow)


def _bwd(res, g):
    from ..softsplat import summation_splat_einsum

    values, flow = res
    _, vjp = jax.vjp(summation_splat_einsum, values, flow)
    return vjp(g)


summation_splat_pallas.defvjp(_fwd, _bwd)
