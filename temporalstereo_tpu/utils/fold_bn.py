"""Fold eval-mode BatchNorm into the preceding conv's weights.

The round-3 profile (docs/PERF.md) shows the temporal step is op-count/DMA
bound: hundreds of small BN scale/shift HLOs and their per-tensor weight
prefetches ride the critical path.  For inference graphs the BN affine is a
constant linear map, so it folds into the conv exactly:

    BN(conv(x))  =  (x*W + b - mean) * gamma/sqrt(var+eps) + beta
                 =  x*(W*s) + (beta + (b - mean)*s),   s = gamma/sqrt(var+eps)

``fold_batch_norms`` walks the variables pytree and, wherever a conv kernel
and a BatchNorm live in the same wrapper module (nn/layers.py Conv*/
ConvTranspose* and backbone Conv2dDW — the only BN consumers), rewrites:

    kernel' = kernel * s          (output-channel axis = last)
    bn.bias' = beta + (conv_bias - mean) * s ;  conv_bias' = 0
    bn.scale' = 1, mean' = 0, var' = 1 - eps

The folded variables are EXACT under the normal eval path (BN then computes
x*rsqrt(1)*1 + bias' = x + bias'), so they are safe anywhere.  The returned
variables additionally carry a ``folded_bn`` marker collection (one leaf per
folded Norm wrapper): ``nn.layers.Norm`` checks for its marker at apply time
and collapses that BN to a single add (``_BNShift``), deleting the
sub/rsqrt/mul chain and its stat-tensor prefetches from the graph.  The fast
path is thereby coupled to the folded variables THEMSELVES — unfolded
variables (or a second model instance) can never silently skip BN
normalization (advisor r4 finding).

EVAL ONLY: folded batch_stats are no longer meaningful for training.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Tuple

import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5  # nn/layers.py Norm.epsilon == flax nn.BatchNorm default

# containers that hold the conv kernel for each wrapper layout
_KERNEL_CONTAINERS = ("Conv_0", "ConvTranspose2d_0")


def _find_kernel(node: Dict) -> Dict:
    """Return the dict holding {'kernel'[, 'bias']} for this wrapper node,
    or None."""
    for key in _KERNEL_CONTAINERS:
        child = node.get(key)
        if isinstance(child, dict) and "kernel" in child:
            return child
    if "kernel" in node:  # ConvTranspose2d declares params at its own level
        return node
    return None


def _find_bn(pnode: Dict, snode: Dict):
    """Return (params_bn, stats_bn, relpath) for a sibling BatchNorm, or
    None.  Layouts: Norm_0/BatchNorm_0 (nn/layers.py wrappers) or a direct
    BatchNorm_0 (backbone Conv2dDW)."""
    norm = pnode.get("Norm_0")
    snorm = snode.get("Norm_0") if isinstance(snode, dict) else None
    if isinstance(norm, dict) and isinstance(snorm, dict) \
            and "BatchNorm_0" in norm and "BatchNorm_0" in snorm:
        return (norm["BatchNorm_0"], snorm["BatchNorm_0"],
                ("Norm_0", "BatchNorm_0"))
    if "BatchNorm_0" in pnode and isinstance(snode, dict) \
            and "BatchNorm_0" in snode:
        return pnode["BatchNorm_0"], snode["BatchNorm_0"], ("BatchNorm_0",)
    return None


def fold_batch_norms(variables: Dict[str, Any], eps: float = BN_EPS
                     ) -> Tuple[Dict[str, Any], List[Tuple[str, ...]]]:
    """Return (folded_variables, folded_bn_paths).

    ``folded_bn_paths`` are the full param-tree paths of each folded
    BatchNorm subtree (ending in 'BatchNorm_0'), for inspection/tests.
    ``folded_variables`` carries a ``folded_bn`` marker collection that
    activates the single-add fast path in ``nn.layers.Norm`` — pass the
    whole dict to ``model.apply`` and the fast path engages exactly for
    these folded BNs, nothing else.
    """
    # mutable deep copies of the dict SPINE (leaves are shared; the fold
    # replaces leaves, never mutates them)
    params = _to_mutable(variables["params"])
    stats = _to_mutable(variables.get("batch_stats", {}))
    folded: List[Tuple[str, ...]] = []
    markers: List[Tuple[str, ...]] = []  # Norm-module scopes (fast path)

    def walk(pnode: Dict, snode: Dict, path: Tuple[str, ...]) -> None:
        if not isinstance(pnode, dict):
            return
        kern = _find_kernel(pnode)
        bn = _find_bn(pnode, snode if isinstance(snode, dict) else {})
        if kern is not None and bn is not None:
            bn_p, bn_s, rel = bn
            scale = np.asarray(bn_p["scale"], np.float64)
            beta = np.asarray(bn_p["bias"], np.float64)
            mean = np.asarray(bn_s["mean"], np.float64)
            var = np.asarray(bn_s["var"], np.float64)
            s = scale / np.sqrt(var + eps)

            kernel = np.asarray(kern["kernel"], np.float64)
            kern["kernel"] = jnp.asarray(kernel * s, jnp.float32)
            shift = beta - mean * s
            if "bias" in kern:
                shift = shift + np.asarray(kern["bias"], np.float64) * s
                kern["bias"] = jnp.zeros_like(jnp.asarray(kern["bias"]))
            bn_p["bias"] = jnp.asarray(shift, jnp.float32)
            bn_p["scale"] = jnp.ones_like(jnp.asarray(bn_p["scale"]))
            bn_s["mean"] = jnp.zeros_like(jnp.asarray(bn_s["mean"]))
            bn_s["var"] = jnp.full_like(jnp.asarray(bn_s["var"]), 1.0 - eps)
            folded.append(path + rel)
            # drop a marker at the scope whose has_variable('folded_bn',
            # 'marker') check engages the single-add fast path for THIS
            # variable dict: the Norm wrapper (nn/layers.py) or the
            # direct-BN wrapper (backbone Conv2dDW)
            if rel == ("Norm_0", "BatchNorm_0"):
                markers.append(path + ("Norm_0",))
            elif rel == ("BatchNorm_0",):
                markers.append(path)
        for k, v in pnode.items():
            if isinstance(v, dict):
                walk(v, snode.get(k, {}) if isinstance(snode, dict) else {},
                     path + (k,))

    walk(params, stats, ())
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    if markers:
        marker_tree: Dict[str, Any] = {}
        for scope in markers:
            node = marker_tree
            for k in scope:
                node = node.setdefault(k, {})
            node["marker"] = np.ones((), np.bool_)
        out["folded_bn"] = marker_tree
    return out, folded


def _to_mutable(tree):
    if isinstance(tree, dict) or type(tree).__name__ == "FrozenDict":
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree
