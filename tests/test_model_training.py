"""End-to-end model tests: forward shapes, temporal scan, sharded train step
on the virtual 8-device CPU mesh (the reference has no equivalent — SURVEY §4
calls for a fake-backend test we provide here)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from temporalstereo_tpu.config import get_cfg
from temporalstereo_tpu.models import (
    backbone_memory_shapes,
    build_model,
)
from temporalstereo_tpu.models.temporal import multi_frame_forward
from temporalstereo_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_batch,
)
from temporalstereo_tpu.training import TrainState, build_optimizer, make_train_step

H, W = 32, 64


def tiny_opts(temporal: bool):
    opts = [
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.IN_PLANES", "256",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "MODEL.AGGREGATION.PRECISE.C", "8",
        "TRAINER.PRECISION", "f32",
    ]
    if temporal:
        opts += ["MODEL.WITH_PREVIOUS", "True", "MODEL.USE_PAST_COST", "True",
                 "MODEL.LOCAL_MAP_SIZE", "3",
                 "MODEL.BACKBONE.MEMORY_PERCENT", "0.5"]
    return opts


def make_batch(rng, t, b):
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    T_cam = np.tile(np.eye(4, dtype=np.float32), (t, b, 1, 1))
    # small forward motion between frames
    for i in range(t):
        T_cam[i, :, 2, 3] = -0.1 * i
    inv_T = np.linalg.inv(T_cam)
    return {
        "left": rng.rand(t, b, H, W, 3).astype(np.float32),
        "right": rng.rand(t, b, H, W, 3).astype(np.float32),
        "disp_gt": rng.uniform(1, 30, size=(t, b, H, W, 1)).astype(np.float32),
        "T_cam": T_cam,
        "inv_T": inv_T,
        "K": np.tile(K, (b, 1, 1)),
        "baseline": np.full((b,), 0.54, np.float32),
    }


@pytest.fixture(scope="module")
def temporal_model():
    cfg = get_cfg(opts=tiny_opts(temporal=True))
    model = build_model(cfg, dtype=None)
    rng = jax.random.PRNGKey(0)
    batch = make_batch(np.random.RandomState(0), 2, 1)
    variables = model.init({"params": rng},
                           jnp.asarray(batch["left"][0]),
                           jnp.asarray(batch["right"][0]), None, False)
    return cfg, model, variables


def test_multi_frame_forward_temporal(temporal_model):
    cfg, model, variables = temporal_model
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.RandomState(1), 3, 1))
    outputs, _, prev = multi_frame_forward(model, variables, batch)
    assert len(outputs["disps"]) == 4
    for d in outputs["disps"]:
        assert d.shape == (1, H, W, 1)
        assert np.isfinite(np.asarray(d)).all()
    assert bool(prev.has_memory)
    assert bool(prev.cost_memory.valid)


def test_train_step_updates_params(temporal_model):
    cfg, model, variables = temporal_model
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx, with_swa=False)
    step = make_train_step(model, cfg)
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.RandomState(2), 2, 1))
    new_state, metrics = jax.jit(step)(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    # params changed somewhere
    diff = sum(float(jnp.abs(a - b).max())
               for a, b in zip(jax.tree.leaves(state.params),
                               jax.tree.leaves(new_state.params)))
    assert diff > 1e-6
    assert int(new_state.step) == 1


def test_sharded_train_step_8_devices(temporal_model):
    cfg, model, variables = temporal_model
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(jax.devices()[:8])
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    step = make_sharded_train_step(make_train_step(model, cfg), mesh,
                                   donate=False)
    batch = shard_batch(mesh, make_batch(np.random.RandomState(3), 2, 8))
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_bn_stats_update_only_from_final_frame(temporal_model):
    """The BN-across-scan contract (SURVEY §7 hard-part 4): in train mode the
    scanned past frames run with running statistics (reference
    eval()+no_grad, TemporalStereo.py:268-274) and batch_stats update ONCE,
    from the final frame only.  Pinned at the stem BN, whose batch statistics
    depend only on the frame's images."""
    cfg, model, variables = temporal_model
    batch = jax.tree.map(jnp.asarray,
                         make_batch(np.random.RandomState(7), 3, 1))

    _, new_vars, _ = multi_frame_forward(model, variables, batch, train=True,
                                         mutable=("batch_stats",))

    def stem_stats(stats):
        return stats["backbone"]["conv_stem"]["Norm_0"]["BatchNorm_0"]

    actual = stem_stats(new_vars["batch_stats"])

    # expected: one train-mode update from the FINAL frame's images alone
    _, updates = model.apply(variables, batch["left"][-1], batch["right"][-1],
                             None, True, mutable=["batch_stats"])
    expected = stem_stats(updates["batch_stats"])
    np.testing.assert_allclose(np.asarray(actual["mean"]),
                               np.asarray(expected["mean"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(actual["var"]),
                               np.asarray(expected["var"]), rtol=1e-5)

    # counterexample: an update from frame 0's (different) images must differ
    _, upd0 = model.apply(variables, batch["left"][0], batch["right"][0],
                          None, True, mutable=["batch_stats"])
    wrong = stem_stats(upd0["batch_stats"])
    assert np.abs(np.asarray(actual["mean"])
                  - np.asarray(wrong["mean"])).max() > 1e-7


def test_remat_train_step_matches(temporal_model):
    """TPU.REMAT wraps the scan body / per-frame forward in jax.checkpoint;
    loss and gradients must be unchanged."""
    cfg, model, variables = temporal_model
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx, with_swa=False)
    batch = jax.tree.map(jnp.asarray,
                         make_batch(np.random.RandomState(8), 3, 1))

    cfg_remat = get_cfg(opts=tiny_opts(temporal=True) + ["TPU.REMAT", "True"])
    step_plain = make_train_step(model, cfg)
    step_remat = make_train_step(model, cfg_remat)
    _, m_plain = jax.jit(step_plain)(state, batch)
    _, m_remat = jax.jit(step_remat)(state, batch)
    np.testing.assert_allclose(float(m_plain["loss"]),
                               float(m_remat["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_plain["grad_norm"]),
                               float(m_remat["grad_norm"]), rtol=1e-4)


def test_single_frame_model_matches_direct_apply(rng):
    cfg = get_cfg(opts=tiny_opts(temporal=False))
    model = build_model(cfg, dtype=None)
    key = jax.random.PRNGKey(0)
    batch = make_batch(np.random.RandomState(5), 1, 1)
    left = jnp.asarray(batch["left"][0])
    right = jnp.asarray(batch["right"][0])
    variables = model.init({"params": key}, left, right, None, False)
    out_direct, _ = model.apply(variables, left, right, None, False)
    out_mf, _, _ = multi_frame_forward(
        model, variables, jax.tree.map(jnp.asarray, batch))
    np.testing.assert_allclose(np.asarray(out_direct["disps"][0]),
                               np.asarray(out_mf["disps"][0]), atol=1e-6)
