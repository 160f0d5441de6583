"""End-to-end Trainer test on a synthetic dataset (fast_dev_run).

Covers: full config -> model -> data -> sharded train step -> validation ->
checkpoint save/restore -> weights-only warm start (the reference's
strict=False semantics, dist_train.py:70-73).
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax

from temporalstereo_tpu.config import get_cfg
from temporalstereo_tpu.data.formats import write_pfm
from temporalstereo_tpu.training.checkpoint import (
    load_weights,
    save_weights,
    warm_start,
)


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sf")
    h, w = 64, 96
    rng = np.random.RandomState(0)
    items = []
    for idx in range(4):
        item = {}
        for fi in [-1, 0]:
            lp, rp, dp = (f"L_{idx}_{fi}.png", f"R_{idx}_{fi}.png",
                          f"D_{idx}_{fi}.pfm")
            for pth in (lp, rp):
                Image.fromarray((rng.rand(h, w, 3) * 255).astype(
                    np.uint8)).save(root / pth)
            write_pfm(str(root / dp),
                      rng.uniform(1, 20, (h, w)).astype(np.float32))
            item[str(fi)] = {"left_image_path": lp, "right_image_path": rp,
                             "left_disp_path": dp}
        items.append(item)
    (root / "ann.json").write_text(json.dumps(items))
    return str(root)


def _cfg(root, tmpdir, temporal=False):
    opts = [
        "LOG_DIR", str(tmpdir),
        "TRAINER.MAX_EPOCHS", "1",
        "TRAINER.FAST_DEV_RUN", "True",
        "TRAINER.PRECISION", "f32",
        "TRAINER.SWA.ENABLED", "False",
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "VAL.EVAL_DISPARITY_IDS", "[0]",
    ]
    for phase in ("TRAIN", "VAL", "TEST"):
        opts += [
            f"DATA.{phase}.DATA_ROOT", root,
            f"DATA.{phase}.ANNFILE", os.path.join(root, "ann.json"),
            f"DATA.{phase}.TYPE", "SceneFlow",
            f"DATA.{phase}.HEIGHT", "32",
            f"DATA.{phase}.WIDTH", "64",
            f"DATA.{phase}.BATCH_SIZE", "2",
            f"DATA.{phase}.NUM_WORKERS", "2",
            f"DATA.{phase}.FRAME_IDXS", "[-1, 0]" if temporal else "[0]",
        ]
    if temporal:
        opts += ["MODEL.WITH_PREVIOUS", "True", "MODEL.USE_PAST_COST", "True",
                 "MODEL.LOCAL_MAP_SIZE", "3",
                 "MODEL.BACKBONE.MEMORY_PERCENT", "0.5",
                 "FRAME_IDXS", "[-1, 0]"]
    return get_cfg(opts=opts)


def test_trainer_fast_dev_run(fake_root, tmp_path):
    from temporalstereo_tpu.training.trainer import Trainer

    cfg = _cfg(fake_root, tmp_path)
    trainer = Trainer(cfg)
    trainer.fit()
    assert int(trainer.state.step) >= 1
    metrics = trainer.validate(0)
    assert any("epe" in k for k in metrics)
    # post-fit test pass on DATA.TEST (reference dist_train.py:107-114)
    tmetrics = trainer.test()
    assert any("epe" in k for k in tmetrics)
    # checkpoint roundtrip
    latest = trainer.ckpt.latest_step()
    assert latest is not None
    restored = trainer.ckpt.restore(trainer.state.replace(
        step=trainer.state.step * 0))
    assert int(restored.step) == int(trainer.state.step)
    # hparams persisted with the checkpoint (reference save_hyperparameters,
    # TemporalStereo.py:31): the restored dict reconstructs the model config
    hp = trainer.ckpt.load_hparams()
    assert hp is not None
    assert hp["MODEL"]["BACKBONE"]["VARIANT"] == "tiny"
    assert hp["MODEL"]["AGGREGATION"]["COARSE"]["C"] == 8
    assert hp["DATA"]["TRAIN"]["HEIGHT"] == 32
    trainer.metrics.close()


def test_load_any_weights_accepts_orbax_dir_and_final_msgpack(fake_root,
                                                              tmp_path):
    """A finished run warm-starts the next stage from EITHER its orbax
    checkpoint directory or the weights_final.msgpack the Trainer writes at
    the end of fit — the two-stage recipe's LOAD_FROM_CHECKPOINT path."""
    from temporalstereo_tpu.training.checkpoint import load_any_weights
    from temporalstereo_tpu.training.trainer import Trainer

    cfg = _cfg(fake_root, tmp_path)
    trainer = Trainer(cfg)
    trainer.fit()
    exp_dir = trainer.exp_dir
    trainer.metrics.close()

    msgpack_path = os.path.join(exp_dir, "weights_final.msgpack")
    assert os.path.exists(msgpack_path)

    fresh = {"params": jax.tree.map(lambda x: x * 0, trainer.state.params),
             "batch_stats": jax.tree.map(lambda x: x * 0,
                                         trainer.state.batch_stats)}
    total = (len(jax.tree.leaves(fresh["params"]))
             + len(jax.tree.leaves(fresh["batch_stats"])))

    loaded, n = load_any_weights(fresh, msgpack_path)
    assert n == total
    loaded_dir, n_dir = load_any_weights(
        fresh, os.path.join(exp_dir, "checkpoints"))
    assert n_dir == total
    a = jax.tree.leaves(loaded["params"])[0]
    b = jax.tree.leaves(loaded_dir["params"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_trainer_train_image_dumps(fake_root, tmp_path):
    """`train_` image dumps every N train steps (reference logs train images
    every 2000 steps, TemporalStereo.py:164-166)."""
    from temporalstereo_tpu.training.trainer import Trainer

    cfg = _cfg(fake_root, tmp_path)
    cfg.defrost()
    cfg.TRAINER.VIS_EVERY_N_TRAIN_STEPS = 1
    cfg.freeze()
    trainer = Trainer(cfg)
    dumped = []
    trainer.metrics.log_image = (
        lambda step, name, image: dumped.append(name))
    trainer._train_epoch(0, fast_dev=True)
    train_tags = [n for n in dumped if n.startswith("train_")]
    assert train_tags, f"no train_ image dumps recorded ({dumped[:5]}...)"
    assert any("disparity" in n for n in train_tags)
    trainer.metrics.close()


def test_swa_finalize_swaps_weights_and_bn(fake_root, tmp_path):
    """fit() must end by swapping in the SWA average and re-estimating BN
    stats (the reference's Lightning SWA epilogue, dist_train.py:68)."""
    import jax
    import jax.numpy as jnp

    from temporalstereo_tpu.training.trainer import Trainer

    opts_cfg = get_cfg(opts=[
        "LOG_DIR", str(tmp_path / "swa"),
        "TRAINER.MAX_EPOCHS", "1",
        "TRAINER.FAST_DEV_RUN", "True",
        "TRAINER.PRECISION", "f32",
        "TRAINER.SWA.ENABLED", "True",
        "TRAINER.SWA.START_FRACTION", "0.0",
        "TRAINER.SWA.BN_UPDATE_STEPS", "1",
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "VAL.EVAL_DISPARITY_IDS", "[0]",
        "TRAINER.CHECK_VAL_EVERY_N_EPOCHS", "100",
    ] + sum((["DATA.%s.DATA_ROOT" % ph, fake_root,
              "DATA.%s.ANNFILE" % ph, os.path.join(fake_root, "ann.json"),
              "DATA.%s.TYPE" % ph, "SceneFlow",
              "DATA.%s.HEIGHT" % ph, "32", "DATA.%s.WIDTH" % ph, "64",
              "DATA.%s.BATCH_SIZE" % ph, "2",
              "DATA.%s.NUM_WORKERS" % ph, "2",
              "DATA.%s.FRAME_IDXS" % ph, "[0]"]
             for ph in ("TRAIN", "VAL", "TEST")), []))
    trainer = Trainer(opts_cfg)
    pre_stats = jax.tree.leaves(trainer.state.batch_stats)[0].copy()
    trainer.fit()
    assert int(trainer.state.swa_count) >= 1
    # after finalize, live params ARE the SWA average
    diff = sum(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(trainer.state.params),
        jax.tree.leaves(trainer.state.swa_model_params())))
    assert diff == 0.0
    # BN stats were re-estimated under the averaged weights
    post_stats = jax.tree.leaves(trainer.state.batch_stats)[0]
    assert float(jnp.abs(post_stats - pre_stats).max()) > 0
    trainer.metrics.close()


def test_warm_start_partial(fake_root, tmp_path):
    """Single-frame weights warm-start a temporal model (subset tree)."""
    import jax.numpy as jnp

    from temporalstereo_tpu.models import build_model

    cfg_s = _cfg(fake_root, tmp_path)
    cfg_t = _cfg(fake_root, tmp_path, temporal=True)
    m_s = build_model(cfg_s, dtype=None)
    m_t = build_model(cfg_t, dtype=None)
    left = jnp.zeros((1, 32, 64, 3))
    v_s = m_s.init({"params": jax.random.PRNGKey(0)}, left, left, None, False)
    v_t = m_t.init({"params": jax.random.PRNGKey(1)}, left, left, None, False)

    path = str(tmp_path / "w.msgpack")
    save_weights(path, v_s["params"], v_s["batch_stats"])
    weights = load_weights(path)
    params, stats, n = warm_start(v_t["params"], v_t["batch_stats"], weights,
                                  strict=False)
    assert n > 100  # most tensors matched
    # a matched leaf actually took the loaded value
    lhs = jax.tree.leaves(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in lhs[:5])


def test_format_error_table():
    from temporalstereo_tpu.utils.logging import format_error_table

    means = {
        "metric_disparity_0/all_epe": 1.23,
        "metric_disparity_0/all_3px": 0.05,
        "metric_disparity_0/occ_epe": 2.5,
        "metric_disparity_1/all_epe": 1.5,
        "loss": 0.7,
    }
    out = format_error_table(means)
    lines = out.splitlines()
    # one header + three map/region rows + one extra scalar
    assert len(lines) == 5
    assert "disparity_0/all" in out and "disparity_0/occ" in out
    assert "epe" in lines[0] and "3px" in lines[0]
    row0 = [ln for ln in lines if ln.startswith("disparity_0/all")][0]
    assert "1.2300" in row0 and "0.0500" in row0
    # missing cells render as '-'
    rowocc = [ln for ln in lines if ln.startswith("disparity_0/occ")][0]
    assert "-" in rowocc
    assert "loss: 0.7000" in out
