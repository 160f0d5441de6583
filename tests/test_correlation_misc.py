"""Tests: patch correlation, RAFT corr blocks, prediction registry,
benchmark harness, debug utils, config system."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from temporalstereo_tpu.config import get_cfg, get_default_config
from temporalstereo_tpu.ops.correlation import (
    CorrBlock,
    FlowCorrBlock,
    correlation1d,
    correlation2d,
)


def test_correlation2d_golden(rng):
    """Displacement (0,0) equals channel-mean of fm1*fm2; shifted taps match
    manual computation."""
    fm1 = rng.randn(1, 6, 8, 4).astype(np.float32)
    fm2 = rng.randn(1, 6, 8, 4).astype(np.float32)
    out = np.asarray(correlation2d(jnp.asarray(fm1), jnp.asarray(fm2),
                                   patch_size=3))
    assert out.shape == (1, 6, 8, 9)
    center = (fm1 * fm2).mean(-1)
    np.testing.assert_allclose(out[..., 4], center, rtol=1e-5, atol=1e-5)
    # tap (dy=0, dx=1): fm2 shifted left by 1 (samples fm2[x+1])
    k = 1 * 3 + 2
    manual = np.zeros((1, 6, 8), np.float32)
    manual[:, :, :-1] = (fm1[:, :, :-1] * fm2[:, :, 1:]).mean(-1)
    np.testing.assert_allclose(out[..., k], manual, rtol=1e-5, atol=1e-5)


def test_correlation1d_shape(rng):
    fm1 = rng.randn(1, 4, 10, 8).astype(np.float32)
    fm2 = rng.randn(1, 4, 10, 8).astype(np.float32)
    out = np.asarray(correlation1d(jnp.asarray(fm1), jnp.asarray(fm2),
                                   patch_size=5))
    assert out.shape == (1, 4, 10, 5)


def test_corrblock_lookup_matches_reference_formula(rng):
    """Level-0 lookup follows the reference's exact grid_sample semantics
    (raft_corr.py:40-46, align_corners=False quirks — see CorrBlock
    docstring): pixel position x*wl/(w-1) - 0.5 and a 0.5 y-tap weight at
    level 0 (pinned against the real reference in
    tests/test_refshim_extras.py; this is the device-free regression)."""
    b, h, w, c = 1, 3, 8, 4
    f1 = rng.randn(b, h, w, c).astype(np.float32)
    f2 = rng.randn(b, h, w, c).astype(np.float32)
    cb = CorrBlock(jnp.asarray(f1), jnp.asarray(f2), num_levels=2, radius=1)
    coords = jnp.asarray(
        np.broadcast_to(np.arange(w, dtype=np.float32), (b, h, w)).copy())
    out = np.asarray(cb(coords))
    assert out.shape == (b, h, w, 2 * 3)

    corr = (np.einsum("bhic,bhjc->bhij", f1, f2)
            / np.sqrt(c)).reshape(b * h * w, w)
    x = np.asarray(coords).reshape(-1)
    pos = x * (w / (w - 1)) - 0.5        # level 0 center tap (delta = 0)
    lo = np.floor(pos)
    frac = pos - lo
    lo_i = np.clip(lo.astype(int), 0, w - 1)
    hi_i = np.clip(lo.astype(int) + 1, 0, w - 1)
    rows = np.arange(b * h * w)
    v_lo = corr[rows, lo_i] * ((lo >= 0) & (lo <= w - 1))
    v_hi = corr[rows, hi_i] * ((lo + 1 >= 0) & (lo + 1 <= w - 1))
    expect = ((1 - frac) * v_lo + frac * v_hi) * 0.5
    np.testing.assert_allclose(out[..., 1].reshape(-1), expect, rtol=1e-4,
                               atol=1e-4)


def test_flow_corrblock_shapes(rng):
    b, h, w, c = 1, 4, 6, 8
    f1 = rng.randn(b, h, w, c).astype(np.float32)
    f2 = rng.randn(b, h, w, c).astype(np.float32)
    fb = FlowCorrBlock(jnp.asarray(f1), jnp.asarray(f2), num_levels=2,
                       radius=2)
    coords = jnp.zeros((b, h, w, 2))
    out = np.asarray(fb(coords))
    assert out.shape == (b, h, w, 2 * 25)


def test_prediction_registry():
    from temporalstereo_tpu.models.prediction import build_prediction

    cfg = get_cfg()
    pred = build_prediction(cfg)
    cost = jnp.asarray(np.random.RandomState(0).randn(1, 2, 3, 5),
                       jnp.float32)
    disp = jnp.broadcast_to(jnp.arange(5.0), (1, 2, 3, 5))
    out = pred(cost, disp)
    assert out.shape == (1, 2, 3, 1)


def test_config_merge_and_freeze(tmp_path):
    cfg = get_default_config()
    y = tmp_path / "o.yaml"
    y.write_text("MODEL:\n  LOCAL_MAP_SIZE: 5\nTRAINER:\n  MAX_EPOCHS: 3\n")
    cfg.merge_from_file(str(y))
    cfg.merge_from_list(["MODEL.USE_PAST_COST", "True"])
    assert cfg.MODEL.LOCAL_MAP_SIZE == 5
    assert cfg.TRAINER.MAX_EPOCHS == 3
    assert cfg.MODEL.USE_PAST_COST is True
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.LOCAL_MAP_SIZE = 7
    d = cfg.to_dict()
    assert d["MODEL"]["LOCAL_MAP_SIZE"] == 5


def test_nan_guard_catches():
    from temporalstereo_tpu.utils.debug import nan_guard

    def bad(x):
        return jnp.log(x)  # NaN for negative input

    guarded = nan_guard(bad)
    guarded(jnp.asarray([1.0, 2.0]))  # fine
    with pytest.raises(Exception):
        guarded(jnp.asarray([-1.0]))


def test_time_test_runs():
    from temporalstereo_tpu.utils.benchmark import time_test

    t = time_test(lambda x: x * 2, jnp.ones((8, 8)), iters=3, warmup=1)
    assert t > 0
