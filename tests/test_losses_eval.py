"""Tests: losses vs torch semantics; evaluation metrics golden values."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from temporalstereo_tpu.data.evaluation import calc_error, do_occlusion_evaluation
from temporalstereo_tpu.losses import DispSmoothL1Loss, WassersteinDistanceLoss


def test_smooth_l1_matches_torch_same_scale(rng):
    est = rng.uniform(0, 30, size=(2, 8, 10, 1)).astype(np.float32)
    gt = rng.uniform(0, 30, size=(2, 8, 10, 1)).astype(np.float32)
    gt[0, :2] = 0.0  # invalid
    loss = DispSmoothL1Loss(max_disp=32)
    ours = float(loss.loss_per_level(jnp.asarray(est), jnp.asarray(gt)))
    m = torch.from_numpy((gt > 0) & (gt < 32))
    theirs = F.smooth_l1_loss(torch.from_numpy(est)[m],
                              torch.from_numpy(gt)[m]).item()
    assert abs(ours - theirs) < 1e-5


def test_smooth_l1_multiscale_dense_rescale(rng):
    est = rng.uniform(1, 20, size=(1, 4, 6, 1)).astype(np.float32)
    gt = rng.uniform(1, 20, size=(1, 8, 12, 1)).astype(np.float32)
    loss = DispSmoothL1Loss(max_disp=192, sparse=False)
    ours = float(loss.loss_per_level(jnp.asarray(est), jnp.asarray(gt)))
    scale = 12 / 6
    sg = F.adaptive_avg_pool2d(torch.from_numpy(gt).permute(0, 3, 1, 2) / scale,
                               (4, 6))
    m = (sg > 0) & (sg < 192 / scale)
    theirs = F.smooth_l1_loss(torch.from_numpy(est).permute(0, 3, 1, 2)[m],
                              sg[m]).item()
    assert abs(ours - theirs) < 1e-5


def test_wasserstein_matches_torch(rng):
    b, h, w, d = 1, 6, 8, 5
    cost = rng.randn(b, h, w, d).astype(np.float32)
    off = rng.uniform(-1, 1, size=(b, h, w, d)).astype(np.float32)
    sample = rng.uniform(0, 20, size=(b, h, w, d)).astype(np.float32)
    gt = rng.uniform(1, 20, size=(b, h, w, 1)).astype(np.float32)

    loss = WassersteinDistanceLoss(max_disp=192)
    ours = float(loss.loss_per_level(jnp.asarray(cost), jnp.asarray(off),
                                     jnp.asarray(sample), jnp.asarray(gt)))

    tc = torch.from_numpy(cost).permute(0, 3, 1, 2)
    to = torch.from_numpy(off).permute(0, 3, 1, 2)
    ts = torch.from_numpy(sample).permute(0, 3, 1, 2)
    tg = torch.from_numpy(gt).permute(0, 3, 1, 2)
    prob = torch.softmax(tc, dim=1)
    mask = ((tg > 0) & (tg < 192)).float()
    theirs = ((prob + 0.25) * torch.abs(to + ts - tg) * mask).sum(1).mean()
    assert abs(ours - theirs.item()) < 1e-5


def test_loss_dicts_and_weights(rng):
    est = [jnp.asarray(rng.uniform(1, 10, size=(1, 4, 4, 1)).astype(np.float32))
           for _ in range(3)]
    gt = jnp.asarray(rng.uniform(1, 10, size=(1, 4, 4, 1)).astype(np.float32))
    loss = DispSmoothL1Loss(max_disp=192, weights=[1.0, 0.7, 0.5],
                            global_weight=2.0)
    d = loss(est, gt)
    assert set(d) == {"l1_loss_lvl0", "l1_loss_lvl1", "l1_loss_lvl2"}
    single = DispSmoothL1Loss(max_disp=192)
    base = float(single.loss_per_level(est[1], gt))
    assert abs(float(d["l1_loss_lvl1"]) - 0.7 * 2.0 * base) < 1e-6


def test_calc_error_golden():
    gt = np.array([[1.0, 2.0, 3.0, 4.0]], np.float32)
    est = np.array([[1.0, 3.5, 3.0, 10.0]], np.float32)  # errors 0,1.5,0,6
    d = calc_error(jnp.asarray(est), jnp.asarray(gt), lb=0, ub=192)
    assert abs(float(d["epe"]) - (0 + 1.5 + 0 + 6) / 4) < 1e-5
    assert abs(float(d["1px"]) - 50.0) < 1e-4   # 1.5 and 6 exceed 1px
    assert abs(float(d["3px"]) - 25.0) < 1e-4   # only 6 exceeds 3px
    assert abs(float(d["5px"]) - 25.0) < 1e-4


def test_calc_error_respects_bounds():
    gt = np.array([[0.0, 5.0, 250.0]], np.float32)
    est = np.array([[9.0, 5.0, 9.0]], np.float32)
    d = calc_error(jnp.asarray(est), jnp.asarray(gt), lb=0, ub=192)
    assert float(d["epe"]) == 0.0  # only gt=5 valid and it's exact


def test_occlusion_evaluation_runs(rng):
    gt_l = rng.uniform(1, 10, size=(1, 8, 12, 1)).astype(np.float32)
    gt_r = rng.uniform(1, 10, size=(1, 8, 12, 1)).astype(np.float32)
    est = gt_l + 0.5
    d = do_occlusion_evaluation(jnp.asarray(est), jnp.asarray(gt_l),
                                jnp.asarray(gt_r), 0, 192)
    assert "occ_epe" in d and "noc_epe" in d
