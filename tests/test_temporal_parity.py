"""TEMPORAL numeric parity: the torch mirror of the reference's temporal
machinery (tests/torch_mirror_temporal.py — backbone channel memories,
update_map pose reprojection + softmax splatting, cost-memory fusion,
local-map hypotheses, multi-frame chaining) and this framework produce the
same results under weights shared through the reference checkpoint importer.

Two scopes:
  * full multi-frame chain with cost memory + backbone memories
    (LOCAL_MAP_SIZE=0 — with a local map the first frames intentionally
    diverge: the reference grows the map 1->3 channels while this framework
    keeps static shapes, models/stereo.py docstring)
  * steady-state single step with ALL state injected (memories, cost memory,
    full 3-channel local map) where the reference and static-shape semantics
    coincide exactly
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from temporalstereo_tpu.config import get_cfg  # noqa: E402
from temporalstereo_tpu.models import build_model  # noqa: E402
from temporalstereo_tpu.models.backbone import TINY_GROUPS  # noqa: E402
from temporalstereo_tpu.models.stereo import (  # noqa: E402
    PrevInfo, backbone_memory_shapes, init_prev_info)
from temporalstereo_tpu.models.temporal import (  # noqa: E402
    multi_frame_forward, streaming_step)
from temporalstereo_tpu.models.aggregation import CostMemory  # noqa: E402
from temporalstereo_tpu.training.checkpoint import warm_start  # noqa: E402
from temporalstereo_tpu.utils.torch_import import (  # noqa: E402
    import_reference_checkpoint)

from tests.torch_mirror_temporal import TemporalReferenceModelT  # noqa: E402

H, W = 96, 128  # /32-divisible; 1/16 grid 6x8 (torch pool3d needs >= 5)
T_FRAMES = 3


def _randomize_bn(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(
                    m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(
                    m.running_var.shape, generator=g) * 0.5 + 0.75)


def _geometry(b=1):
    """Small-motion stereo rig: focal 30 px, baseline 2 m -> depths of a few
    metres for disparities in [1, 50], so reprojection flows stay subpixel-
    to-few-pixel and splats land in frame."""
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = 30.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    Ks = np.tile(K, (b, 1, 1))
    baseline = np.full((b,), 2.0, np.float32)
    poses = []
    for t in range(T_FRAMES):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.03 * t
        T[2, 3] = -0.05 * t
        poses.append(np.tile(T, (b, 1, 1)))
    T_cam = np.stack(poses)
    inv_T = np.stack([np.linalg.inv(p) for p in poses])
    return Ks, baseline, T_cam.astype(np.float32), inv_T.astype(np.float32)


def _build_pair(local_map_size, seed=31):
    """Mirror + flax model with shared weights."""
    torch.manual_seed(seed)
    ref = TemporalReferenceModelT(local_map_size=local_map_size).eval()
    _randomize_bn(ref, seed=seed + 1)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    cfg = get_cfg(opts=[
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "MODEL.AGGREGATION.PRECISE.C", "8",
        "TRAINER.PRECISION", "f32",
        "MODEL.WITH_PREVIOUS", "True",
        "MODEL.USE_PAST_COST", "True",
        "MODEL.LOCAL_MAP_SIZE", str(local_map_size),
        "MODEL.BACKBONE.MEMORY_PERCENT", "0.5",
    ])
    model = build_model(cfg, dtype=None)
    left = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, left, left,
                           None, False)
    p, s, _ = import_reference_checkpoint(sd, TINY_GROUPS)
    params, stats, n = warm_start(variables["params"],
                                  variables["batch_stats"],
                                  {"params": p, "batch_stats": s},
                                  strict=False)
    total = len(jax.tree.leaves(variables["params"])) + len(
        jax.tree.leaves(variables["batch_stats"]))
    assert n == total
    return ref, model, {"params": params, "batch_stats": stats}


def _frames(seed=40):
    rng = np.random.RandomState(seed)
    lefts = rng.rand(T_FRAMES, 1, H, W, 3).astype(np.float32)
    rights = rng.rand(T_FRAMES, 1, H, W, 3).astype(np.float32)
    return lefts, rights


def _rel(a, b):
    return np.abs(a - b).max() / (np.abs(b).mean() + 1e-6)


def test_temporal_chain_parity():
    """T=3 frames with backbone channel memories + warped cost memory: the
    final frame's four disparities and the carried state agree."""
    ref, model, variables = _build_pair(local_map_size=0)
    lefts, rights = _frames()
    Ks, baseline, T_cam, inv_T = _geometry()

    batch = {
        "left": jnp.asarray(lefts), "right": jnp.asarray(rights),
        "K": jnp.asarray(Ks), "baseline": jnp.asarray(baseline),
        "T_cam": jnp.asarray(T_cam), "inv_T": jnp.asarray(inv_T),
    }
    outputs, _, prev = multi_frame_forward(model, variables, batch,
                                           train=False)

    t_full, t_prev = ref.multi_frame(
        torch.from_numpy(lefts.transpose(0, 1, 4, 2, 3)),
        torch.from_numpy(rights.transpose(0, 1, 4, 2, 3)),
        torch.from_numpy(Ks), torch.from_numpy(baseline),
        torch.from_numpy(T_cam), torch.from_numpy(inv_T))

    assert len(outputs["disps"]) == len(t_full) == 4
    for i, (f, t) in enumerate(zip(outputs["disps"], t_full)):
        rel = _rel(np.asarray(f[0, :, :, 0]), t[0, 0].numpy())
        assert rel < 5e-3, f"temporal disparity {i} diverges: rel={rel:.2e}"

    # carried state: cost memory + prev_disp written by the final frame
    rel = _rel(np.asarray(prev.cost_memory.disp_sample[0]).transpose(2, 0, 1),
               t_prev["cost_memory"]["disp_sample"][0].numpy())
    assert rel < 5e-3, f"cost-memory samples diverge: rel={rel:.2e}"
    rel = _rel(np.asarray(prev.prev_disp[0, :, :, 0]),
               t_prev["prev_disp"][0, 0].numpy())
    assert rel < 5e-3, f"prev_disp diverges: rel={rel:.2e}"


def test_steady_state_local_map_parity():
    """One streaming step from a FULL injected state (backbone memories,
    cost memory, 3-channel local map): reference grow-then-truncate and this
    framework's ring buffer coincide at steady state, so everything —
    update_local_map splat, local-map hypotheses in fine, memory fusion —
    must agree exactly."""
    ref, model, variables = _build_pair(local_map_size=3, seed=51)
    rng = np.random.RandomState(52)
    left = rng.rand(1, H, W, 3).astype(np.float32)
    right = rng.rand(1, H, W, 3).astype(np.float32)
    Ks, baseline, T_cam, inv_T = _geometry()
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
        "memories": [torch.from_numpy(m.transpose(0, 3, 1, 2))
                     for m in memories],
        "prev_disp": torch.from_numpy(prev_disp.transpose(0, 3, 1, 2)),
        "cost_memory": {
            "disp_sample": torch.from_numpy(mem_ds.transpose(0, 3, 1, 2)),
            "cost_volume": torch.from_numpy(mem_cv.transpose(0, 3, 1, 2)),
        },
        "local_map": torch.from_numpy(local_map.transpose(0, 3, 1, 2)),
    }
    with torch.no_grad():
        t_full, t_prev = ref.forward_frame(
            torch.from_numpy(left.transpose(0, 3, 1, 2)),
            torch.from_numpy(right.transpose(0, 3, 1, 2)),
            prev_info, torch.from_numpy(Ks), torch.from_numpy(baseline),
            torch.from_numpy(T_p2n))

    for i, (f, t) in enumerate(zip(outputs["disps"], t_full)):
        rel = _rel(np.asarray(f[0, :, :, 0]), t[0, 0].numpy())
        assert rel < 5e-3, f"steady-state disparity {i}: rel={rel:.2e}"

    # the warped local map consumed by fine this frame
    rel = _rel(np.asarray(outputs["local_map"][0]).transpose(2, 0, 1),
               t_prev["local_map"][0].numpy())
    assert rel < 5e-3, f"warped local map diverges: rel={rel:.2e}"

    # new backbone memories (splice order + values)
    assert len(new_prev.memories) == len(t_prev["memories"])
    for i, (f, t) in enumerate(zip(new_prev.memories, t_prev["memories"])):
        rel = _rel(np.asarray(f), t.numpy().transpose(0, 2, 3, 1))
        assert rel < 5e-3, f"backbone memory {i} diverges: rel={rel:.2e}"
