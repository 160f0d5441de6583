"""Reverse exporter (utils/torch_export.py): flax variables -> reference
torch state_dict.  Round trip: mirror state_dict -> import -> export must
reproduce EVERY tensor bit-exactly, and the exported dict must strict-load
into the reference module composition."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from temporalstereo_tpu.config import get_cfg  # noqa: E402
from temporalstereo_tpu.models import build_model  # noqa: E402
from temporalstereo_tpu.models.backbone import TINY_GROUPS  # noqa: E402
from temporalstereo_tpu.training.checkpoint import warm_start  # noqa: E402
from temporalstereo_tpu.utils.torch_export import (  # noqa: E402
    export_reference_checkpoint, save_reference_checkpoint)
from temporalstereo_tpu.utils.torch_import import (  # noqa: E402
    import_reference_checkpoint, load_torch_state_dict)

from tests.torch_mirror_agg import ReferenceModelT  # noqa: E402


def _flax_variables_from_mirror(seed=61):
    torch.manual_seed(seed)
    ref = ReferenceModelT()
    g = torch.Generator().manual_seed(seed + 1)
    for m in ref.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(
                    m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(
                    m.running_var.shape, generator=g) * 0.5 + 0.75)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    cfg = get_cfg(opts=[
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "MODEL.AGGREGATION.PRECISE.C", "8",
        "TRAINER.PRECISION", "f32",
    ])
    model = build_model(cfg, dtype=None)
    left = jnp.zeros((1, 32, 64, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda r: model.init({"params": r}, left, left, None, False),
        jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    p, s, _ = import_reference_checkpoint(sd, TINY_GROUPS)
    params, stats, _ = warm_start(variables["params"],
                                  variables["batch_stats"],
                                  {"params": p, "batch_stats": s},
                                  strict=False)
    return ref, sd, {"params": params, "batch_stats": stats}


def test_export_round_trip_bit_exact():
    ref, sd, variables = _flax_variables_from_mirror()
    out = export_reference_checkpoint(variables["params"],
                                      variables["batch_stats"], TINY_GROUPS)
    missing = set(sd) - set(out)
    extra = set(out) - set(sd)
    assert not missing, f"exporter missed {sorted(missing)[:5]}..."
    assert not extra, f"exporter invented {sorted(extra)[:5]}..."
    for k, v in sd.items():
        if "num_batches_tracked" in k:
            continue  # counters are not model state; exported as 0
        np.testing.assert_array_equal(
            out[k], v, err_msg=f"round trip diverges at {k}")


def test_export_strict_loads_and_matches_forward(tmp_path):
    """The saved .ckpt strict-loads into the reference composition and the
    torch forward matches the flax forward — a trained-on-TPU model is
    deployable in the reference stack as-is."""
    ref, sd, variables = _flax_variables_from_mirror(seed=71)
    path = tmp_path / "exported.ckpt"
    n = save_reference_checkpoint(variables, str(path), TINY_GROUPS,
                                  epoch=7)
    assert n > 0

    fresh = ReferenceModelT()
    loaded = load_torch_state_dict(str(path))
    fresh.load_state_dict(
        {k: torch.from_numpy(v) for k, v in loaded.items()}, strict=True)
    fresh.eval()

    cfg = get_cfg(opts=[
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "MODEL.AGGREGATION.PRECISE.C", "8",
        "TRAINER.PRECISION", "f32",
    ])
    model = build_model(cfg, dtype=None)
    h, w = 96, 160
    rng = np.random.RandomState(72)
    left = rng.rand(1, h, w, 3).astype(np.float32)
    right = rng.rand(1, h, w, 3).astype(np.float32)
    outputs, _ = model.apply(variables, jnp.asarray(left),
                             jnp.asarray(right), None, False)
    with torch.no_grad():
        t_disps = fresh(torch.from_numpy(left.transpose(0, 3, 1, 2)),
                        torch.from_numpy(right.transpose(0, 3, 1, 2)))
    f = np.asarray(outputs["disps"][0][0, :, :, 0])
    t = t_disps[0][0, 0].numpy()
    rel = np.abs(f - t).max() / (np.abs(t).mean() + 1e-6)
    assert rel < 2e-3, f"exported-model forward diverges: rel={rel:.2e}"


def test_export_reference_cli(tmp_path):
    """End-to-end CLI drive: msgpack weights -> reference .ckpt that
    strict-loads into the mirror composition."""
    from temporalstereo_tpu.cli import export_reference
    from temporalstereo_tpu.training.checkpoint import save_weights

    _, _, variables = _flax_variables_from_mirror(seed=81)
    wpath = tmp_path / "weights.msgpack"
    save_weights(str(wpath), variables["params"], variables["batch_stats"])
    out = tmp_path / "exported.ckpt"
    export_reference.main([
        "--checkpoint", str(wpath), "--output", str(out),
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "MODEL.AGGREGATION.PRECISE.C", "8",
        "TRAINER.PRECISION", "f32",
    ])
    loaded = load_torch_state_dict(str(out))
    fresh = ReferenceModelT()
    fresh.load_state_dict(
        {k: torch.from_numpy(v) for k, v in loaded.items()}, strict=True)
