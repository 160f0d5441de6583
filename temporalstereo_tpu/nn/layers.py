"""Conv / norm / activation building blocks (flax.linen, NHWC & NDHWC).

TPU-native re-design of the reference conv wrappers
(architecture/modeling/layers/basic_layers.py): ``Conv{2,3}d`` /
``ConvTranspose{2,3}d`` with fused ``norm=`` / ``activation=`` kwargs,
``get_norm`` (:10-39) and ``get_activation`` (:42-73).

Design notes
* All tensors are channels-last: images [B, H, W, C], volumes [B, D, H, W, C].
* Every 3D conv in the model is factorized as (1,k,k) or (k,1,1)
  (module.py:124-144 DepthwiseConv3D) — we lower those to 2D convs over
  reshaped tensors ([B*D, H, W, C] for spatial, [B, D, H*W, C] for depth),
  which hit XLA's well-tuned 2D conv paths instead of generic 3D convs.
* BatchNorm under ``jit`` with a sharded batch axis computes *global* batch
  statistics automatically (XLA inserts the cross-replica reductions), which
  reproduces the reference's SyncBatchNorm (dist_train.py:94) for free.
* Transposed convs reproduce torch's ConvTranspose semantics
  (kernel flip + lhs dilation + edge padding k-1-p and output_padding).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Activation = Union[str, Tuple, list, None]

# Folded-BN fast path (utils/fold_bn.fold_batch_norms rewrites BN subtrees:
# scale/stats neutralized, shift moved into bias): at eval these BNs are
# exactly `x + bias`, and _BNShift emits only that add — deleting the
# sub/rsqrt/mul/mul chain and its stat-tensor prefetches per BN.  Activation
# is coupled to the VARIABLES: fold_batch_norms writes a 'folded_bn' marker
# collection and Norm checks `self.has_variable('folded_bn', 'marker')` at
# its own scope, so unfolded variables (or a second model instance) can
# never silently skip BN normalization (advisor r4 finding — no process
# globals involved).


class _BNShift(nn.Module):
    """Eval-time stand-in for a folded BatchNorm: reads the (rewritten) BN
    bias from the SAME param path and adds it — nothing else."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return x + bias.astype(x.dtype)


def get_activation(activation: Activation) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation factory (reference get_activation, basic_layers.py:42-73)."""
    if activation is None:
        return lambda x: x
    if isinstance(activation, (tuple, list)):
        name, *args = activation
    else:
        name, args = activation, []
    name = name.lower()
    table = {
        "relu": jax.nn.relu,
        "silu": jax.nn.silu,
        "swish": jax.nn.silu,
        "elu": jax.nn.elu,
        "selu": jax.nn.selu,
        "gelu": jax.nn.gelu,
        "hardswish": jax.nn.hard_swish,
        "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
    }
    if name == "leakyrelu":
        slope = args[0] if args else 0.01
        return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)
    if name not in table:
        raise ValueError(f"unsupported activation {activation!r}")
    return table[name]


def msra_init(dtype=jnp.float32):
    """Kaiming-style init used by the aggregation stages' weight_init
    (coarse.py:52-67): normal(0, sqrt(2 / (prod(kernel) * out_channels)))."""

    def init(key, shape, dtype=dtype):
        fan = math.prod(shape[:-2]) * shape[-1]
        std = math.sqrt(2.0 / fan)
        return jax.random.normal(key, shape, dtype) * std

    return init


class Norm(nn.Module):
    """Pluggable normalization (reference get_norm, basic_layers.py:10-39).

    kind: 'BN'|'BN3d'|'SyncBN'|'FrozenBN' (batch norm — under pjit the batch
    statistics are global, i.e. SyncBN), 'GN' (group norm), 'IN' (instance
    norm), 'LN' (layer norm) or None.
    """
    kind: Optional[str] = "BN"
    momentum: float = 0.9
    epsilon: float = 1e-5
    group_size: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kind = self.kind
        if kind is None or kind == "None":
            return x
        if kind in ("BN", "BN1d", "BN3d", "SyncBN", "nnSyncBN", "naiveSyncBN",
                    "FrozenBN") and not train \
                and self.has_variable("folded_bn", "marker"):
            return _BNShift(name="BatchNorm_0", dtype=self.dtype)(x)
        if kind in ("BN", "BN1d", "BN3d", "SyncBN", "nnSyncBN", "naiveSyncBN"):
            # use_fast_variance=False: the one-pass E[x^2]-E[x]^2 form loses
            # ~3 digits to cancellation on conv activations, and the temporal
            # chain's sort/top-k discontinuities amplify that into percent-
            # level train-mode divergence from the reference (measured r3,
            # tests/test_refshim_train.py); the two-pass variance is exact
            # and costs a negligible second reduction
            return nn.BatchNorm(
                use_running_average=not train, momentum=self.momentum,
                epsilon=self.epsilon, dtype=self.dtype,
                use_fast_variance=False, axis_name=None)(x)
        if kind == "FrozenBN":
            return nn.BatchNorm(
                use_running_average=True, momentum=self.momentum,
                epsilon=self.epsilon, dtype=self.dtype)(x)
        if kind == "GN":
            groups = max(1, x.shape[-1] // self.group_size)
            return nn.GroupNorm(num_groups=groups, epsilon=self.epsilon,
                                dtype=self.dtype)(x)
        if kind == "IN":
            reduction = tuple(range(1, x.ndim - 1))
            return _instance_norm(x, reduction, self.epsilon)
        if kind == "LN":
            return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype)(x)
        raise ValueError(f"unsupported norm {kind!r}")


def _instance_norm(x, axes, eps):
    mean = x.mean(axes, keepdims=True)
    var = x.var(axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _triple(v):
    return (v, v, v) if isinstance(v, int) else tuple(v)


class Conv2d(nn.Module):
    """2D conv + optional norm + activation (reference Conv2d wrapper)."""
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    norm: Optional[str] = None
    activation: Activation = None
    kernel_init: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        d = _pair(self.dilation)
        x = nn.Conv(
            self.features, k, strides=s,
            padding=((p[0], p[0]), (p[1], p[1])),
            kernel_dilation=d, use_bias=self.use_bias,
            kernel_init=self.kernel_init or nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"),
            dtype=self.dtype)(x)
        x = Norm(kind=self.norm, dtype=self.dtype)(x, train=train)
        return get_activation(self.activation)(x)


class ConvTranspose2d(nn.Module):
    """Torch-semantics ConvTranspose2d + norm + activation."""
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 2
    padding: Union[int, Tuple[int, int]] = 1
    output_padding: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    norm: Optional[str] = None
    activation: Activation = None
    kernel_init: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        op = _pair(self.output_padding)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init or nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"),
            (*k, in_ch, self.features))
        # torch transposed conv == flipped-kernel conv with lhs dilation
        flipped = jnp.flip(kernel, axis=(0, 1))
        pads = tuple((kk - 1 - pp, kk - 1 - pp + oo)
                     for kk, pp, oo in zip(k, p, op))
        y = jax.lax.conv_general_dilated(
            x, flipped.astype(x.dtype), window_strides=(1, 1), padding=pads,
            lhs_dilation=s, rhs_dilation=(1, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        y = Norm(kind=self.norm, dtype=self.dtype)(y, train=train)
        return get_activation(self.activation)(y)


def _fold_depth(x):
    """[B, D, H, W, C] -> ([B*D, H, W, C], (B, D))."""
    b, d, h, w, c = x.shape
    return x.reshape(b * d, h, w, c), (b, d)


def _unfold_depth(x, bd):
    b, d = bd
    return x.reshape(b, d, *x.shape[1:])


class Conv3d(nn.Module):
    """3D conv + norm + activation over NDHWC.

    Kernels must be separable — (1,k,k), (k,1,1) or (1,1,1) — which covers
    every 3D conv in the reference (module.py:124-144, 368-378, 408).
    Spatial kernels run as 2D convs on [B*D, H, W, C]; depth kernels as 2D
    convs on [B, D, H*W, C].
    """
    features: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    stride: Union[int, Tuple[int, int, int]] = 1
    padding: Union[int, Tuple[int, int, int]] = 0
    dilation: Union[int, Tuple[int, int, int]] = 1
    use_bias: bool = True
    norm: Optional[str] = None
    activation: Activation = None
    kernel_init: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = _triple(self.kernel_size)
        s = _triple(self.stride)
        p = _triple(self.padding)
        d = _triple(self.dilation)
        init = self.kernel_init or nn.initializers.variance_scaling(
            2.0, "fan_out", "truncated_normal")

        if k[0] == 1 and s[0] == 1 and p[0] == 0:
            # (1, kh, kw): pure spatial conv, fold D into batch
            xf, bd = _fold_depth(x)
            y = nn.Conv(self.features, (k[1], k[2]), strides=(s[1], s[2]),
                        padding=((p[1], p[1]), (p[2], p[2])),
                        kernel_dilation=(d[1], d[2]), use_bias=self.use_bias,
                        kernel_init=init, dtype=self.dtype)(xf)
            y = _unfold_depth(y, bd)
        elif k[1] == 1 and k[2] == 1 and s[1] == 1 and s[2] == 1 \
                and p[1] == 0 and p[2] == 0:
            # (kd, 1, 1): conv over the D axis, fold H*W
            b, dd, h, w, c = x.shape
            xf = x.reshape(b, dd, h * w, c)
            y = nn.Conv(self.features, (k[0], 1), strides=(s[0], 1),
                        padding=((p[0], p[0]), (0, 0)),
                        kernel_dilation=(d[0], 1), use_bias=self.use_bias,
                        kernel_init=init, dtype=self.dtype)(xf)
            y = y.reshape(b, y.shape[1], h, w, self.features)
        else:
            # general (non-separable) 3D conv — e.g. the SPP3D fuse's full
            # 3x3x3 (SPP3D.py:33); flax nn.Conv handles N-D kernels on
            # NDHWC directly
            y = nn.Conv(self.features, k, strides=s,
                        padding=tuple((pi, pi) for pi in p),
                        kernel_dilation=d, use_bias=self.use_bias,
                        kernel_init=init, dtype=self.dtype)(x)

        y = Norm(kind=self.norm, dtype=self.dtype)(y, train=train)
        return get_activation(self.activation)(y)


class ConvTranspose3d(nn.Module):
    """Separable 3D transposed conv over NDHWC (torch semantics)."""
    features: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    stride: Union[int, Tuple[int, int, int]] = 2
    padding: Union[int, Tuple[int, int, int]] = 1
    output_padding: Union[int, Tuple[int, int, int]] = 1
    use_bias: bool = True
    norm: Optional[str] = None
    activation: Activation = None
    kernel_init: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = _triple(self.kernel_size)
        s = _triple(self.stride)
        p = _triple(self.padding)
        op = _triple(self.output_padding)

        if k[0] == 1 and s[0] == 1 and p[0] == 0 and op[0] == 0:
            xf, bd = _fold_depth(x)
            y = ConvTranspose2d(
                self.features, (k[1], k[2]), (s[1], s[2]), (p[1], p[2]),
                (op[1], op[2]), use_bias=self.use_bias, norm=None,
                activation=None, kernel_init=self.kernel_init,
                dtype=self.dtype)(xf)
            y = _unfold_depth(y, bd)
        elif k[1] == 1 and k[2] == 1 and s[1] == 1 and s[2] == 1 \
                and p[1] == 0 and p[2] == 0 and op[1] == 0 and op[2] == 0:
            b, dd, h, w, c = x.shape
            xf = x.reshape(b, dd, h * w, c)
            y = ConvTranspose2d(
                self.features, (k[0], 1), (s[0], 1), (p[0], 0), (op[0], 0),
                use_bias=self.use_bias, norm=None, activation=None,
                kernel_init=self.kernel_init, dtype=self.dtype)(xf)
            y = y.reshape(b, y.shape[1], h, w, self.features)
        else:
            raise NotImplementedError(
                f"non-separable transposed 3D conv {k}/{s}/{p}/{op}")

        y = Norm(kind=self.norm, dtype=self.dtype)(y, train=train)
        return get_activation(self.activation)(y)


class ConvGRU(nn.Module):
    """Convolutional GRU cell (reference conv_gru.py:1-29; gated by the
    unused MODEL.BACKBONE.USE_GRU flag — kept for API parity)."""
    hidden: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        hx = jnp.concatenate([h, x], axis=-1)
        pad = self.kernel_size // 2
        z = jax.nn.sigmoid(Conv2d(self.hidden, self.kernel_size, 1, pad,
                                  name="convz")(hx))
        r = jax.nn.sigmoid(Conv2d(self.hidden, self.kernel_size, 1, pad,
                                  name="convr")(hx))
        q = jnp.tanh(Conv2d(self.hidden, self.kernel_size, 1, pad,
                            name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q
