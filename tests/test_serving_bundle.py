"""AOT serving bundle (serving.py): export -> load -> run with zero compile.

The bundle pickles AOT-compiled executables for every streaming stage graph
(growth g0..g{S} + steady), so a fresh host skips the minutes-long cold
compile (VERDICT r3 next-step #7).  This CI check runs the whole cycle on
CPU and pins the loaded bundle's outputs against the live jitted
streaming_step frame by frame, including across the local-map growth
schedule.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from temporalstereo_tpu.config import get_cfg
from temporalstereo_tpu.models import (backbone_memory_shapes, build_model,
                                       init_prev_info)
from temporalstereo_tpu.models.temporal import streaming_step
from temporalstereo_tpu.serving import (export_streaming_bundle,
                                        load_streaming_bundle)

H, W = 32, 64


@pytest.mark.slow
def test_bundle_roundtrip_matches_live_streaming(tmp_path):
    cfg = get_cfg(opts=[
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "MODEL.AGGREGATION.PRECISE.C", "8",
        "TRAINER.PRECISION", "f32",
        "MODEL.WITH_PREVIOUS", "True",
        "MODEL.USE_PAST_COST", "True",
        "MODEL.LOCAL_MAP_SIZE", "2",
        "MODEL.BACKBONE.MEMORY_PERCENT", "0.5",
    ])
    model = build_model(cfg, dtype=None)
    l0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, l0, l0, None,
                           False)

    path = os.path.join(tmp_path, "bundle.pkl")
    meta = export_streaming_bundle(model, variables, path, b=1, h=H, w=W,
                                   progress=lambda *_: None)
    assert meta["stages"] == ["g0", "g1", "g2", "steady"]
    assert os.path.exists(path)

    bundle = load_streaming_bundle(path, model, variables)

    rng = np.random.RandomState(3)
    K = jnp.asarray(np.array(
        [[[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]], np.float32))
    baseline = jnp.asarray(np.array([0.54], np.float32))
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.02
    T = jnp.asarray(T[None])

    # live reference path: exact-growth jitted streaming
    mem_shapes = backbone_memory_shapes(model.backbone_cfg, (H, W))
    prev = init_prev_info(model, 1, (H, W), mem_shapes,
                          model.precise_cfg.get("topk", 2), model.dtype,
                          local_map_channels=0)
    for i in range(5):
        l = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
        r = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
        out, prev = streaming_step(model, variables, l, r, prev, K,
                                   baseline, T, warp=i > 0)
        disp_bundle = bundle.step(l, r, K, baseline, T)
        np.testing.assert_allclose(np.asarray(disp_bundle),
                                   np.asarray(out["disps"][0]),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"frame {i}")

    # reset() restarts the growth schedule deterministically
    bundle.reset()
    rng2 = np.random.RandomState(3)
    l = jnp.asarray(rng2.rand(1, H, W, 3), jnp.float32)
    r = jnp.asarray(rng2.rand(1, H, W, 3), jnp.float32)
    prev2 = init_prev_info(model, 1, (H, W), mem_shapes,
                           model.precise_cfg.get("topk", 2), model.dtype,
                           local_map_channels=0)
    out2, _ = streaming_step(model, variables, l, r, prev2, K, baseline, T,
                             warp=False)
    np.testing.assert_allclose(np.asarray(bundle.step(l, r, K, baseline, T)),
                               np.asarray(out2["disps"][0]),
                               rtol=1e-4, atol=1e-4)

    # architecture identity: pairing the bundle with a MISMATCHED model
    # fails fast at load (advisor r4 — meta['model_hash'] verification)
    cfg2 = get_cfg(opts=[
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "MODEL.AGGREGATION.PRECISE.C", "8",
        "TRAINER.PRECISION", "f32",
        "MODEL.WITH_PREVIOUS", "False",
    ])
    model2 = build_model(cfg2, dtype=None)
    variables2 = model2.init({"params": jax.random.PRNGKey(0)}, l0, l0,
                             None, False)
    with pytest.raises(ValueError, match="different model"):
        load_streaming_bundle(path, model2, variables2,
                              progress=lambda *_: None)
