"""TEMPORAL parity against the REAL reference code at deployed V2S widths:
the reference's own ``multi_frame_forward``/``forward``/``update_map``
(projects/TemporalStereo/TemporalStereo.py:250-461) run on CPU through
tests/refshim with ``FunctionSoftsplat`` monkeypatched to the torch scatter
oracle (softsplat.py:269-270 raises on CPU), against this framework's
``multi_frame_forward`` / ``streaming_step``.

Scopes:
  * 3-frame chain with backbone channel memories + warped cost memory
    (LOCAL_MAP_SIZE=0 — exact across all frames)
  * steady-state single step with ALL state injected (3-channel local map)
    where grow-then-truncate and the static ring buffer coincide
  * the local-map GROWTH window (reference 1->3 channels,
    TemporalStereo.py:367-372): per-frame deviation of the static
    duplicate-fill is measured against the reference's own growth schedule
    and bounded (VERDICT r2 weak #1 / next #4)
"""
import warnings

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests import refshim  # noqa: E402

if not refshim.reference_available():  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

refshim.install(project=True)
refshim.patch_softsplat_cpu()

with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    import config as ref_project_config  # noqa: E402
    import TemporalStereo as ref_project  # noqa: E402

from temporalstereo_tpu.config import get_cfg  # noqa: E402
from temporalstereo_tpu.models import build_model  # noqa: E402
from temporalstereo_tpu.models.aggregation import CostMemory  # noqa: E402
from temporalstereo_tpu.models.backbone import V2S_GROUPS  # noqa: E402
from temporalstereo_tpu.models.stereo import (  # noqa: E402
    PrevInfo,
    backbone_memory_shapes,
    init_prev_info,
)
from temporalstereo_tpu.models.temporal import (  # noqa: E402
    chained_poses,
    multi_frame_forward,
    streaming_step,
)
from temporalstereo_tpu.training.checkpoint import warm_start  # noqa: E402
from temporalstereo_tpu.utils.torch_import import (  # noqa: E402
    import_reference_checkpoint,
)

H, W = 96, 128  # /32-divisible; 1/16 grid 6x8 (pool3d needs >= 5)


def _real_temporal_model(frame_idxs, local_map_size,
                         use_past_cost=True):
    cfg = ref_project_config._C.clone()
    cfg.merge_from_file(refshim.PROJECT_DIR + "/configs/kitti2015-multi.yaml")
    cfg.merge_from_list([
        "FRAME_IDXS", repr(list(frame_idxs)),
        "MODEL.LOCAL_MAP_SIZE", str(local_map_size),
        "MODEL.USE_PAST_COST", str(use_past_cost),
    ])
    model = ref_project.TemporalStereo(cfg.convert_to_dict())
    model.eval()
    return model


def _randomize_bn(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(
                    m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(
                    m.running_var.shape, generator=g) * 0.5 + 0.75)


def _build_pair(frame_idxs, local_map_size, seed=61,
                use_past_cost=True):
    torch.manual_seed(seed)
    real = _real_temporal_model(frame_idxs, local_map_size, use_past_cost)
    _randomize_bn(real, seed=seed + 1)
    sd = {k: v.numpy() for k, v in real.state_dict().items()}

    cfg = get_cfg(opts=[
        "TRAINER.PRECISION", "f32",
        "MODEL.WITH_PREVIOUS", "True",
        "MODEL.USE_PAST_COST", str(use_past_cost),
        "MODEL.LOCAL_MAP_SIZE", str(local_map_size),
        "MODEL.BACKBONE.MEMORY_PERCENT", "0.5",
    ])
    model = build_model(cfg, dtype=None)
    left = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, left, left,
                           None, False)
    p, s, _ = import_reference_checkpoint(sd, V2S_GROUPS)
    params, stats, n = warm_start(variables["params"],
                                  variables["batch_stats"],
                                  {"params": p, "batch_stats": s},
                                  strict=False)
    total = (len(jax.tree.leaves(variables["params"]))
             + len(jax.tree.leaves(variables["batch_stats"])))
    assert n == total
    return real, model, {"params": params, "batch_stats": stats}


def _geometry(t_frames, b=1):
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = 30.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    Ks = np.tile(K, (b, 1, 1))
    baseline = np.full((b,), 2.0, np.float32)
    poses = []
    for t in range(t_frames):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.03 * t
        T[2, 3] = -0.05 * t
        poses.append(np.tile(T, (b, 1, 1)))
    T_cam = np.stack(poses)
    inv_T = np.stack([np.linalg.inv(p) for p in poses])
    return Ks, baseline, T_cam.astype(np.float32), inv_T.astype(np.float32)


def _real_batch(lefts, rights, frame_idxs, Ks, baseline, T_cam, inv_T):
    batch = {
        ("K", 0): torch.from_numpy(Ks),
        "baseline": torch.from_numpy(baseline),
    }
    for i, t in enumerate(frame_idxs):
        batch[("color_aug", t, "l")] = torch.from_numpy(
            lefts[i].transpose(0, 3, 1, 2)).contiguous()
        batch[("color_aug", t, "r")] = torch.from_numpy(
            rights[i].transpose(0, 3, 1, 2)).contiguous()
        batch[("T", t, "l")] = torch.from_numpy(T_cam[i])
        batch[("inv_T", t, "l")] = torch.from_numpy(inv_T[i])
    return batch


def _real_per_frame(real, batch, frame_idxs):
    """Replicates the reference multi_frame_forward loop (:250-280) but keeps
    every frame's outputs (the loop itself only keeps timestamp 0)."""
    per_frame = []
    outputs = {("prev_info", frame_idxs[0] - 1, "l"): {}}
    with torch.no_grad():
        for t in frame_idxs:
            outs = real.forward(batch, outputs, is_train=False, timestamp=t)
            per_frame.append(outs)
            outputs = {("prev_info", t, "l"): outs[("prev_info", t, "l")]}
    return per_frame


def _rel(a, b):
    return np.abs(a - b).max() / (np.abs(b).mean() + 1e-6)


@pytest.mark.slow
def test_real_temporal_chain_parity():
    """T=3, LOCAL_MAP_SIZE=0 (no growth transient): final-frame disparities
    and carried state match the real reference's multi_frame_forward."""
    frame_idxs = [-2, -1, 0]
    real, model, variables = _build_pair(frame_idxs, local_map_size=0)
    rng = np.random.RandomState(70)
    lefts = rng.rand(3, 1, H, W, 3).astype(np.float32)
    rights = rng.rand(3, 1, H, W, 3).astype(np.float32)
    Ks, baseline, T_cam, inv_T = _geometry(3)

    batch = {
        "left": jnp.asarray(lefts), "right": jnp.asarray(rights),
        "K": jnp.asarray(Ks), "baseline": jnp.asarray(baseline),
        "T_cam": jnp.asarray(T_cam), "inv_T": jnp.asarray(inv_T),
    }
    outputs, _, prev = multi_frame_forward(model, variables, batch,
                                           train=False)

    t_batch = _real_batch(lefts, rights, frame_idxs, Ks, baseline, T_cam,
                          inv_T)
    with torch.no_grad():
        t_out = real.multi_frame_forward(t_batch, is_train=False)

    t_disps = t_out[("disps", 0, "l")]
    assert len(outputs["disps"]) == len(t_disps) == 4
    for i, (f, t) in enumerate(zip(outputs["disps"], t_disps)):
        rel = _rel(np.asarray(f[0, :, :, 0]), t[0, 0].numpy())
        assert rel < 5e-3, f"temporal disparity {i} diverges: rel={rel:.2e}"

    t_prev = t_out[("prev_info", 0, "l")]
    rel = _rel(np.asarray(prev.cost_memory.disp_sample[0]).transpose(2, 0, 1),
               t_prev["cost_memory"]["disp_sample"][0].numpy())
    assert rel < 5e-3, f"cost-memory samples diverge: rel={rel:.2e}"
    rel = _rel(np.asarray(prev.prev_disp[0, :, :, 0]),
               t_prev["prev_disp"][0, 0].numpy())
    assert rel < 5e-3, f"prev_disp diverges: rel={rel:.2e}"


@pytest.mark.slow
def test_real_steady_state_local_map_parity():
    """One step from FULL injected state (27 backbone memories, cost memory,
    3-channel local map): the real update_map's grow-then-truncate and the
    static ring buffer coincide; disparities, warped local map and new
    memories must match."""
    frame_idxs = [-1, 0]
    real, model, variables = _build_pair(frame_idxs, local_map_size=3,
                                         seed=81)
    rng = np.random.RandomState(82)
    left = rng.rand(1, H, W, 3).astype(np.float32)
    right = rng.rand(1, H, W, 3).astype(np.float32)
    Ks, baseline, T_cam, inv_T = _geometry(2)
    T_p2n = np.einsum("bij,bjk->bik", T_cam[1], inv_T[0])

    h8, w8 = H // 8, W // 8
    mem_shapes = backbone_memory_shapes(model.backbone_cfg, (H, W))
    memories = [rng.randn(2, *s).astype(np.float32) * 0.1
                for s in mem_shapes]
    prev_disp = (5.0 + 3.0 * rng.rand(1, H, W, 1)).astype(np.float32)
    mem_ds = (2.0 + 4.0 * rng.rand(1, h8, w8, 2)).astype(np.float32)
    mem_cv = rng.randn(1, h8, w8, 2).astype(np.float32)
    local_map = (2.0 + 6.0 * rng.rand(1, h8, w8, 3)).astype(np.float32)

    prev = PrevInfo(
        memories=tuple(jnp.asarray(m) for m in memories),
        has_memory=jnp.ones((), jnp.bool_),
        cost_memory=CostMemory(jnp.asarray(mem_ds), jnp.asarray(mem_cv),
                               jnp.ones((), jnp.bool_)),
        prev_disp=jnp.asarray(prev_disp),
        local_map=jnp.asarray(local_map),
        local_map_valid=jnp.ones((), jnp.bool_),
    )
    outputs, new_prev = streaming_step(
        model, variables, jnp.asarray(left), jnp.asarray(right), prev,
        jnp.asarray(Ks), jnp.asarray(baseline), jnp.asarray(T_p2n))

    prev_info = {
        "memories": [torch.from_numpy(m.transpose(0, 3, 1, 2)).contiguous()
                     for m in memories],
        "prev_disp": torch.from_numpy(prev_disp.transpose(0, 3, 1, 2))
        .contiguous(),
        "cost_memory": {
            "disp_sample": torch.from_numpy(
                mem_ds.transpose(0, 3, 1, 2)).contiguous(),
            "cost_volume": torch.from_numpy(
                mem_cv.transpose(0, 3, 1, 2)).contiguous(),
        },
        "local_map": torch.from_numpy(
            local_map.transpose(0, 3, 1, 2)).contiguous(),
        "local_map_size": 3,
    }
    batch = _real_batch(left[None], right[None], [0], Ks, baseline,
                        T_cam[1:2], inv_T[1:2])
    batch[("inv_T", -1, "l")] = torch.from_numpy(inv_T[0])
    batch[("T", 0, "l")] = torch.from_numpy(T_cam[1])
    with torch.no_grad():
        t_out = real.forward(batch, {("prev_info", -1, "l"): prev_info},
                             is_train=False, timestamp=0)

    t_disps = t_out[("disps", 0, "l")]
    for i, (f, t) in enumerate(zip(outputs["disps"], t_disps)):
        rel = _rel(np.asarray(f[0, :, :, 0]), t[0, 0].numpy())
        assert rel < 5e-3, f"steady-state disparity {i}: rel={rel:.2e}"

    t_prev = t_out[("prev_info", 0, "l")]
    rel = _rel(np.asarray(outputs["local_map"][0]).transpose(2, 0, 1),
               t_prev["local_map"][0].numpy())
    assert rel < 5e-3, f"warped local map diverges: rel={rel:.2e}"

    assert len(new_prev.memories) == len(t_prev["memories"])
    for i, (f, t) in enumerate(zip(new_prev.memories, t_prev["memories"])):
        rel = _rel(np.asarray(f), t.numpy().transpose(0, 2, 3, 1))
        assert rel < 5e-3, f"backbone memory {i} diverges: rel={rel:.2e}"


@pytest.mark.slow
def test_local_map_growth_exact_parity():
    """T=4 with LOCAL_MAP_SIZE=3 through the ENTIRE growth window: the
    reference grows the map 0 -> 1 -> 2 -> 3 channels
    (TemporalStereo.py:367-372) and this framework now matches it exactly
    with one statically-shaped step per growth stage (the old duplicate-fill
    start deviated up to 83% max-rel at frame 0 — measured r3)."""
    frame_idxs = [-3, -2, -1, 0]
    real, model, variables = _build_pair(frame_idxs, local_map_size=3,
                                         seed=91)
    rng = np.random.RandomState(92)
    lefts = rng.rand(4, 1, H, W, 3).astype(np.float32)
    rights = rng.rand(4, 1, H, W, 3).astype(np.float32)
    Ks, baseline, T_cam, inv_T = _geometry(4)

    t_batch = _real_batch(lefts, rights, frame_idxs, Ks, baseline, T_cam,
                          inv_T)
    per_frame = _real_per_frame(real, t_batch, frame_idxs)

    # flax side, frame by frame (streaming semantics == scan semantics in
    # eval mode)
    t_p2n = np.asarray(chained_poses(jnp.asarray(T_cam),
                                     jnp.asarray(inv_T)))
    mem_shapes = backbone_memory_shapes(model.backbone_cfg, (H, W))
    # growth mode: the local map starts EMPTY (0 channels), one channel is
    # added per warp — the shape-changing steps need the static warp flag
    prev = init_prev_info(model, 1, (H, W), mem_shapes,
                          model.precise_cfg.get("topk", 2), jnp.float32,
                          local_map_channels=0)
    rels = []
    for i in range(4):
        outputs, prev = streaming_step(
            model, variables, jnp.asarray(lefts[i]), jnp.asarray(rights[i]),
            prev, jnp.asarray(Ks), jnp.asarray(baseline),
            jnp.asarray(t_p2n[i]), warp=i > 0)
        assert prev.local_map.shape[-1] == min(i, 3), (
            i, prev.local_map.shape)
        f = np.asarray(outputs["disps"][0][0, :, :, 0])
        t = per_frame[i][("disps", frame_idxs[i], "l")][0][0, 0].numpy()
        rels.append(_rel(f, t))

    print(f"\nlocal-map growth window, per-frame max-rel deviation: "
          f"{['%.3e' % r for r in rels]}")
    for i, r in enumerate(rels):
        assert r < 5e-3, (
            f"growth frame {i} diverges from the reference schedule: "
            f"{r:.3e} (all: {rels})")


@pytest.mark.slow
def test_real_local_map_only_chain_parity():
    """The ABLATION operating point (docs/PERF.md temporal table: local-map
    only, USE_PAST_COST=False) pinned against the real reference: T=5 with
    LOCAL_MAP_SIZE=3 covers the full 0->3 growth window plus one steady
    frame.  The local-map-only configuration REGRESSES accuracy vs
    single-frame in the r4 ablation (EPE 2.21 vs 1.77); this test
    distinguishes 'mechanism needs past-cost' from 'hypothesis-injection
    bug' by proving the injection path (fine.py:89-94 concat of warped map
    hypotheses before the fractional samples, update_map growth
    TemporalStereo.py:367-372) is reference-exact at exactly that
    configuration."""
    frame_idxs = [-4, -3, -2, -1, 0]
    real, model, variables = _build_pair(frame_idxs, local_map_size=3,
                                         seed=101, use_past_cost=False)
    assert model.use_past_cost is False
    rng = np.random.RandomState(102)
    lefts = rng.rand(5, 1, H, W, 3).astype(np.float32)
    rights = rng.rand(5, 1, H, W, 3).astype(np.float32)
    Ks, baseline, T_cam, inv_T = _geometry(5)

    t_batch = _real_batch(lefts, rights, frame_idxs, Ks, baseline, T_cam,
                          inv_T)
    per_frame = _real_per_frame(real, t_batch, frame_idxs)

    t_p2n = np.asarray(chained_poses(jnp.asarray(T_cam), jnp.asarray(inv_T)))
    mem_shapes = backbone_memory_shapes(model.backbone_cfg, (H, W))
    prev = init_prev_info(model, 1, (H, W), mem_shapes,
                          model.precise_cfg.get("topk", 2), jnp.float32,
                          local_map_channels=0)
    rels = []
    for i in range(5):
        outputs, prev = streaming_step(
            model, variables, jnp.asarray(lefts[i]), jnp.asarray(rights[i]),
            prev, jnp.asarray(Ks), jnp.asarray(baseline),
            jnp.asarray(t_p2n[i]), warp=i > 0)
        f = np.asarray(outputs["disps"][0][0, :, :, 0])
        t = per_frame[i][("disps", frame_idxs[i], "l")][0][0, 0].numpy()
        rels.append(_rel(f, t))

    # the carried local map itself must also match at steady state
    t_prev = per_frame[-1][("prev_info", 0, "l")]
    lm_rel = _rel(np.asarray(prev.local_map[0]).transpose(2, 0, 1),
                  t_prev["local_map"][0].numpy())
    print(f"\nlocal-map-only chain: per-frame disp max-rel "
          f"{['%.3e' % r for r in rels]}, local_map rel {lm_rel:.3e}")
    for i, r in enumerate(rels):
        assert r < 5e-3, (
            f"local-map-only frame {i} diverges: {r:.3e} (all: {rels})")
    assert lm_rel < 5e-3, f"carried local map diverges: {lm_rel:.3e}"
