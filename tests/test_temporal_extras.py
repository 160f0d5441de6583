"""Extra temporal-path tests: gradient-through-time mode, SWA, streaming."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from temporalstereo_tpu.config import get_cfg
from temporalstereo_tpu.models import (
    backbone_memory_shapes,
    build_model,
    init_prev_info,
)
from temporalstereo_tpu.models.temporal import (
    chained_poses,
    multi_frame_forward,
    streaming_step,
)
from temporalstereo_tpu.training import TrainState, build_optimizer, make_train_step

from tests.test_model_training import H, W, make_batch, tiny_opts


@pytest.fixture(scope="module")
def temporal_setup():
    opts = tiny_opts(temporal=True)
    cfg = get_cfg(opts=opts)
    model = build_model(cfg, dtype=None)
    batch = make_batch(np.random.RandomState(0), 2, 1)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(batch["left"][0]),
                           jnp.asarray(batch["right"][0]), None, False)
    return cfg, model, variables


def test_chained_poses():
    t = np.tile(np.eye(4, dtype=np.float32), (3, 2, 1, 1))
    t[1, :, 0, 3] = 1.0
    t[2, :, 0, 3] = 3.0
    rel = np.asarray(chained_poses(jnp.asarray(t),
                                   jnp.asarray(np.linalg.inv(t))))
    np.testing.assert_allclose(
        rel[0], np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)), atol=1e-6)
    np.testing.assert_allclose(rel[1][:, 0, 3], 1.0, atol=1e-5)
    np.testing.assert_allclose(rel[2][:, 0, 3], 2.0, atol=1e-5)


def test_previous_with_gradient_unrolled(temporal_setup):
    cfg, model, variables = temporal_setup
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.RandomState(1), 2, 1))
    outs, _, prev = multi_frame_forward(model, variables, batch, train=False,
                                        previous_with_gradient=True)
    # BPTT mode returns EVERY frame's outputs (the reference sums losses over
    # all frame_idxs, TemporalStereo.py:135-150)
    assert isinstance(outs, list) and len(outs) == 2
    assert all(len(o["disps"]) == 4 for o in outs)
    assert bool(prev.has_memory)

    # gradients flow through past frames in this mode
    def loss(params):
        o, _, _ = multi_frame_forward(
            model, {**variables, "params": params}, batch, train=False,
            previous_with_gradient=True)
        return sum(jnp.mean(f["disps"][0] ** 2) for f in o)

    g = jax.grad(loss)(variables["params"])
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_streaming_step_carries_state(temporal_setup):
    cfg, model, variables = temporal_setup
    batch = make_batch(np.random.RandomState(2), 1, 1)
    mem_shapes = backbone_memory_shapes(model.backbone_cfg, (H, W))
    prev = init_prev_info(model, 1, (H, W), mem_shapes, topk=2)
    K = jnp.asarray(batch["K"])
    baseline = jnp.asarray(batch["baseline"])
    T = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (1, 1, 1)))
    left = jnp.asarray(batch["left"][0])
    right = jnp.asarray(batch["right"][0])
    out1, prev = streaming_step(model, variables, left, right, prev, K,
                                baseline, T)
    assert not bool(prev.local_map_valid)  # first frame: no warp yet
    out2, prev = streaming_step(model, variables, left, right, prev, K,
                                baseline, T)
    assert bool(prev.local_map_valid)
    assert np.isfinite(np.asarray(out2["disps"][0])).all()


def test_swa_accumulation(temporal_setup):
    cfg, model, variables = temporal_setup
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx, with_swa=True)
    step = jax.jit(make_train_step(model, cfg, swa_start_step=1))
    batch = jax.tree.map(jnp.asarray, make_batch(np.random.RandomState(3), 2, 1))
    state, _ = step(state, batch)   # step 1: swa not yet active (step>=1 after)
    state, _ = step(state, batch)
    state, _ = step(state, batch)
    assert int(state.swa_count) >= 1
    swa = state.swa_model_params()
    # averaged params are finite and close to current params
    for a, b in zip(jax.tree.leaves(swa), jax.tree.leaves(state.params)):
        assert np.isfinite(np.asarray(a)).all()


def test_eval_step_occlusion_metrics(temporal_setup):
    """DO_OCCLUSION_EVALUATION + disp_gt_right yields occ_/noc_ splits
    (reference TemporalStereo.py:477-484)."""
    from temporalstereo_tpu.config import get_cfg as _get_cfg
    from temporalstereo_tpu.training.step import make_eval_step
    from tests.test_model_training import H as _H, W as _W

    _, model, variables = temporal_setup
    cfg = _get_cfg(opts=tiny_opts(temporal=True)
                   + ["VAL.DO_OCCLUSION_EVALUATION", "True",
                      "VAL.EVAL_DISPARITY_IDS", "[0]"])
    rng = np.random.RandomState(1)
    batch = make_batch(rng, 2, 1)
    batch["disp_gt_right"] = rng.uniform(
        1, 30, size=(2, 1, _H, _W, 1)).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    eval_step = make_eval_step(model, cfg)
    metrics = eval_step(variables, batch)
    assert "metric_disparity_0/all_epe" in metrics
    assert "metric_disparity_0/occ_epe" in metrics
    assert "metric_disparity_0/noc_epe" in metrics
    for v in metrics.values():
        assert np.isfinite(float(v))


def test_eval_step_occlusion_per_split_weights(temporal_setup):
    """A sample with valid gt but ZERO occluded pixels must not contribute
    a spurious 0 to occ_* means: each split is pooled by its own per-sample
    weight, exported as 'weight:<key>' (advisor r4, step.py occ/noc fix)."""
    from temporalstereo_tpu.config import get_cfg as _get_cfg
    from temporalstereo_tpu.training.step import make_eval_step
    from tests.test_model_training import H as _H, W as _W

    _, model, variables = temporal_setup
    cfg = _get_cfg(opts=tiny_opts(temporal=True)
                   + ["VAL.DO_OCCLUSION_EVALUATION", "True",
                      "VAL.EVAL_DISPARITY_IDS", "[0]"])
    rng = np.random.RandomState(2)
    batch = make_batch(rng, 2, 2)  # t=2, b=2
    # sample 0: random gt/right-gt -> both splits populated
    gt = rng.uniform(1, 30, size=(2, 2, _H, _W, 1)).astype(np.float32)
    gt_r = rng.uniform(1, 30, size=(2, 2, _H, _W, 1)).astype(np.float32)
    # sample 1: perfectly LR-consistent constant disparity on an interior
    # band, invalid (0) elsewhere -> valid pixels exist, occluded valid
    # pixels do NOT (the inconsistent region has gt=0 = invalid)
    gt[:, 1] = 0.0
    gt[:, 1, :, 8:_W - 8] = 5.0
    gt_r[:, 1] = 5.0
    batch["disp_gt"] = gt
    batch["disp_gt_right"] = gt_r
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    eval_step = make_eval_step(model, cfg)
    metrics = {k: float(v) for k, v in eval_step(variables, jb).items()}
    kw = "weight:metric_disparity_0/occ_epe"
    assert kw in metrics and metrics[kw] == 1.0  # only sample 0 counts
    assert metrics["weight:metric_disparity_0/noc_epe"] == 2.0

    # occ mean must equal sample 0 evaluated ALONE
    solo = {k: v[:, :1] if k not in ("K", "baseline") else v[:1]
            for k, v in batch.items()}
    solo["K"] = batch["K"][:1]
    solo["baseline"] = batch["baseline"][:1]
    m0 = {k: float(v) for k, v in eval_step(
        variables, {k: jnp.asarray(v) for k, v in solo.items()}).items()}
    assert np.isclose(metrics["metric_disparity_0/occ_epe"],
                      m0["metric_disparity_0/occ_epe"], rtol=1e-5)
