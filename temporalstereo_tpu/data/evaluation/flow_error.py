"""Optical-flow evaluation metrics.

Re-design of reference ``data/evaluation/flow_pixel_error.py`` (:9-96) and
``flow_eval.py`` (:6-37): flow EPE + outlier percentages over valid-mask.
Layout: flow [B, H, W, 2].
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp


def calc_flow_error(est_flow: jnp.ndarray, gt_flow: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    lb: float = 0.0, ub: float = 400.0,
                    sparse: bool = False) -> Dict[str, jnp.ndarray]:
    """Reference flow_calc_error semantics (flow_pixel_error.py:9-96):
    valid = finite gt, |gt| magnitude in (lb, ub), and — when ``sparse`` —
    not the all-zero fill value; ``mask`` intersects an extra caller mask."""
    assert est_flow.shape == gt_flow.shape
    err = jnp.sqrt(jnp.sum((est_flow - gt_flow) ** 2, axis=-1))   # [B, H, W]
    mag = jnp.sqrt(jnp.sum(gt_flow ** 2, axis=-1))
    valid = ~(jnp.isnan(gt_flow[..., 0]) | jnp.isnan(gt_flow[..., 1]))
    if sparse:
        eps = 1e-12
        valid = valid & ~((jnp.abs(gt_flow[..., 0]) < eps)
                          & (jnp.abs(gt_flow[..., 1]) < eps))
    valid = valid & (mag > lb) & (mag < ub)
    maskf = valid.astype(err.dtype)
    if mask is not None:
        maskf = maskf * mask.reshape(err.shape).astype(err.dtype)
    err = jnp.nan_to_num(err) * maskf
    total = jnp.maximum(maskf.sum(), 1.0)

    out = {"epe": (err * maskf).sum() / total}
    for px in (1, 2, 3, 5):
        out[f"{px}px"] = ((err > px) * maskf).sum() / total * 100.0
    # KITTI Fl metric: err > 3px AND err > 5% of magnitude
    fl = ((err > 3.0) & (err > 0.05 * mag)) * maskf
    out["Fl"] = fl.sum() / total * 100.0
    return out


def do_flow_evaluation(est_flow: jnp.ndarray, gt_flow: jnp.ndarray,
                       mask: Optional[jnp.ndarray] = None,
                       lb: float = 0.0, ub: float = 400.0,
                       sparse: bool = False) -> Dict[str, jnp.ndarray]:
    """Reference do_flow_evaluation (flow_eval.py:6-37)."""
    if est_flow is None or gt_flow is None:
        return {}
    return calc_flow_error(est_flow, gt_flow, mask, lb=lb, ub=ub,
                           sparse=sparse)
