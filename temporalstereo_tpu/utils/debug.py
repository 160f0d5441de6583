"""Numerical debugging & profiling hooks.

TPU-native equivalents of the reference's always-on
``torch.autograd.set_detect_anomaly(True)`` (dist_train.py:18,95 — a training
speed tax we keep *opt-in*) and its absent profiler (SURVEY §5.1):

  * ``check_finite(tree, name)`` — checkify-free jnp.isfinite assertion
    usable inside jit via jax.debug / error value return
  * ``nan_guard(fn)`` — wrap a step function with jax.experimental.checkify
    to raise on any NaN/inf produced anywhere inside
  * ``trace(path)`` — jax.profiler trace context for TPU timeline captures
"""
from __future__ import annotations

import contextlib
from typing import Any, Callable

import jax
import jax.numpy as jnp


def check_finite(tree: Any, name: str = "tree") -> jnp.ndarray:
    """Scalar bool: all leaves finite. Usable inside jit."""
    leaves = jax.tree.leaves(tree)
    ok = jnp.asarray(True)
    for leaf in leaves:
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            ok = ok & jnp.isfinite(leaf).all()
    return ok


def assert_finite(tree: Any, name: str = "tree") -> None:
    """Host-side check (eager): raises on NaN/inf."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating):
            if not bool(jnp.isfinite(arr).all()):
                raise FloatingPointError(
                    f"non-finite values in {name}{jax.tree_util.keystr(path)}")


def nan_guard(fn: Callable) -> Callable:
    """Wrap a jittable function with checkify NaN/div-by-zero checks.

    The wrapped function raises on the host when any check fails — the
    TPU-native analogue of detect_anomaly, but opt-in (the reference pays
    this cost on every training step)."""
    from jax.experimental import checkify

    checked = checkify.checkify(
        fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a TPU timeline viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
