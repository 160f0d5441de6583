"""Disparity evaluation metrics (KITTI protocol).

TPU-native re-design of reference ``architecture/data/evaluation/``:
calc_error (pixel_error.py:6-72), do_evaluation (eval.py:9-42) and
do_occlusion_evaluation (eval.py:45-106).  All jnp, jittable, device-resident
(the reference pulls every map to CPU per step, eval.py:31-35 — a transfer we
avoid).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from ...ops.warp import inverse_warp


def calc_error(est_disp: jnp.ndarray, gt_disp: jnp.ndarray,
               lb: Optional[float] = None, ub: Optional[float] = None,
               return_count: bool = False) -> Dict[str, jnp.ndarray]:
    """EPE + {1,2,3,5}px outlier percentages over the (lb, ub) gt mask.

    est/gt: any same-shape layout. Returns scalars; percentages in [0, 100].
    ``return_count`` adds the valid-pixel count under 'count' (callers use
    it to weight sample means the way pixel pooling would).
    """
    assert est_disp.shape == gt_disp.shape, (est_disp.shape, gt_disp.shape)
    mask = jnp.ones_like(gt_disp, dtype=bool)
    if lb is not None:
        mask = mask & (gt_disp > lb)
    if ub is not None:
        mask = mask & (gt_disp < ub)
    maskf = mask.astype(est_disp.dtype)
    total = maskf.sum()
    safe_total = jnp.maximum(total, 1.0)

    abs_err = jnp.abs(gt_disp - est_disp) * maskf
    out = {}
    for px in (1, 2, 3, 5):
        frac = ((abs_err > px) & mask).sum() / safe_total
        out[f"{px}px"] = jnp.where(total >= 1.0, frac * 100.0, 0.0)
    epe = abs_err.sum() / safe_total
    out["epe"] = jnp.where(total >= 1.0, epe, 0.0)
    if return_count:
        out["count"] = total
    return out


def do_evaluation(est_disp: jnp.ndarray, gt_disp: jnp.ndarray,
                  lb: float, ub: float) -> Dict[str, jnp.ndarray]:
    """Reference do_evaluation (eval.py:9-42)."""
    if est_disp is None or gt_disp is None:
        return {}
    return calc_error(est_disp, gt_disp, lb=lb, ub=ub)


def do_occlusion_evaluation(est_disp: jnp.ndarray, ref_gt_disp: jnp.ndarray,
                            target_gt_disp: jnp.ndarray, lb: float, ub: float,
                            return_counts: bool = False
                            ) -> Dict[str, jnp.ndarray]:
    """Occluded / non-occluded split via LR-consistency warp of the right gt
    (reference eval.py:45-106). Layout: [B, H, W, 1].

    ``return_counts`` adds 'occ_count' / 'noc_count' (valid pixels per
    split) so callers can weight per-sample means by split population — a
    sample with zero occluded pixels must not contribute a spurious 0."""
    if est_disp is None or ref_gt_disp is None or target_gt_disp is None:
        return {}
    warp_ref = inverse_warp(target_gt_disp, -ref_gt_disp, mode="disparity")
    theta, eps = 1.0, 1e-6
    occlusion = ((jnp.abs(warp_ref - ref_gt_disp) > theta)
                 | (jnp.abs(warp_ref) < eps)).astype(ref_gt_disp.dtype)
    occlusion = jnp.clip(occlusion, 0.0, 1.0)

    out = {}
    occ = calc_error(est_disp * occlusion, ref_gt_disp * occlusion, lb, ub,
                     return_count=return_counts)
    for k, v in occ.items():
        out["occ_" + k] = v
    noc_mask = 1.0 - occlusion
    noc = calc_error(est_disp * noc_mask, ref_gt_disp * noc_mask, lb, ub,
                     return_count=return_counts)
    for k, v in noc.items():
        out["noc_" + k] = v
    return out
