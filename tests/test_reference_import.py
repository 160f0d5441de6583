"""Full reference-checkpoint import (utils/torch_import.py:
import_reference_checkpoint): a torch model with the reference's EXACT
module composition (tests/torch_mirror_agg.py) provides the state_dict; the
importer must map EVERY flax leaf — backbone trunk, FPN, all three
aggregation stages, UNet, heads, phi — with correct transposes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from temporalstereo_tpu.config import get_cfg  # noqa: E402
from temporalstereo_tpu.models import build_model  # noqa: E402
from temporalstereo_tpu.models.backbone import TINY_GROUPS  # noqa: E402
from temporalstereo_tpu.training.checkpoint import warm_start  # noqa: E402
from temporalstereo_tpu.utils.torch_import import (  # noqa: E402
    import_reference_checkpoint,
)

from tests.torch_mirror_agg import ReferenceModelT  # noqa: E402


def _randomize_bn(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(
                    m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(
                    m.running_var.shape, generator=g) * 0.5 + 0.75)


def _count_leaves(tree):
    return len(jax.tree.leaves(tree))


def test_full_reference_checkpoint_import():
    torch.manual_seed(7)
    ref = ReferenceModelT()
    _randomize_bn(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    cfg = get_cfg(opts=[
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "MODEL.AGGREGATION.PRECISE.C", "8",
        "TRAINER.PRECISION", "f32",
        "MODEL.WITH_PREVIOUS", "True", "MODEL.USE_PAST_COST", "True",
        "MODEL.LOCAL_MAP_SIZE", "3", "MODEL.BACKBONE.MEMORY_PERCENT", "0.5",
    ])
    model = build_model(cfg, dtype=None)
    left = jnp.zeros((1, 32, 64, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda r: model.init({"params": r}, left, left, None, False),
        jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)

    p, s, n_consumed = import_reference_checkpoint(sd, TINY_GROUPS)
    params, stats, n = warm_start(variables["params"],
                                  variables["batch_stats"],
                                  {"params": p, "batch_stats": s},
                                  strict=False)

    total = _count_leaves(variables["params"]) + _count_leaves(
        variables["batch_stats"])
    assert n == total, (
        f"importer covered {n}/{total} flax leaves — mapping incomplete")
    # every reference tensor was consumed (num_batches_tracked counters
    # have no flax counterpart)
    expected = len([k for k in sd if "num_batches_tracked" not in k])
    assert n_consumed == expected, (n_consumed, expected)

    # spot-check transposes and stat routing
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["conv_stem"]["Conv_0"]["kernel"]),
        sd["backbone.conv_stem.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(params["aggregation"]["fine"]["phi"]),
        sd["aggregation.fine.phi"])
    # UNet deconv4: torch ConvTranspose2d [I, O, kh, kw] -> (kh, kw, I, O)
    np.testing.assert_allclose(
        np.asarray(params["aggregation"]["precise"]["refinement"]["deconv4"]
                   ["kernel"]),
        sd["aggregation.precise.refinement.deconv4.weight"].transpose(
            2, 3, 0, 1))
    # depth-axis (3,1,1) conv of the prediction head
    np.testing.assert_allclose(
        np.asarray(params["aggregation"]["coarse"]["PredictionHeads_0"]
                   ["cost_head_0"]["Conv_0"]["kernel"]),
        sd["aggregation.coarse.pred_heads.cost_head.0.weight"]
        [:, :, :, 0, 0].transpose(2, 1, 0)[:, None])
    # running stats landed in batch_stats
    np.testing.assert_allclose(
        np.asarray(stats["aggregation"]["coarse"]["past_conv"]["Norm_0"]
                   ["BatchNorm_0"]["var"]),
        sd["aggregation.coarse.past_conv.norm.running_var"])


def test_load_any_weights_dispatches_on_torch_ckpt(tmp_path):
    """A reference Lightning .ckpt (state_dict wrapper) loads through the
    same entry point the Trainer/CLIs use."""
    from temporalstereo_tpu.training.checkpoint import load_any_weights

    torch.manual_seed(9)
    ref = ReferenceModelT()
    _randomize_bn(ref, seed=10)
    ckpt = tmp_path / "reference_epoch_032.ckpt"
    torch.save({"state_dict": ref.state_dict(), "epoch": 32}, ckpt)

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

    variables, n = load_any_weights(variables, str(ckpt))
    total = _count_leaves(shapes["params"]) + _count_leaves(
        shapes["batch_stats"])
    assert n == total
    got = np.asarray(variables["params"]["backbone"]["conv_stem"]["Conv_0"]
                     ["kernel"])
    want = ref.state_dict()["backbone.conv_stem.weight"].numpy().transpose(
        2, 3, 1, 0)
    np.testing.assert_allclose(got, want)


def test_full_model_forward_parity():
    """END-TO-END numeric parity: the torch mirror of the reference's full
    forward (tests/torch_mirror_agg.py — backbone, cascade, heads, convex
    upsample, UNet decode) and the flax model produce the same four
    full-resolution disparities under weights shared through the reference
    checkpoint importer.  This is the strongest wiring check available
    without real datasets: any divergence in block_cost, warp, sort/top-k,
    upsampling or stage chaining shows up here."""
    torch.manual_seed(21)
    ref = ReferenceModelT().eval()
    _randomize_bn(ref, seed=22)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    cfg = get_cfg(opts=[
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "MODEL.AGGREGATION.PRECISE.C", "8",
        "TRAINER.PRECISION", "f32",
    ])
    model = build_model(cfg, dtype=None)
    h, w = 96, 160
    left_np = np.random.RandomState(23).rand(1, h, w, 3).astype(np.float32)
    right_np = np.random.RandomState(24).rand(1, h, w, 3).astype(np.float32)
    left, right = jnp.asarray(left_np), jnp.asarray(right_np)

    variables = model.init({"params": jax.random.PRNGKey(0)}, left, right,
                           None, False)
    p, s, _ = import_reference_checkpoint(sd, TINY_GROUPS)
    params, stats, n = warm_start(variables["params"],
                                  variables["batch_stats"],
                                  {"params": p, "batch_stats": s},
                                  strict=False)
    total = _count_leaves(variables["params"]) + _count_leaves(
        variables["batch_stats"])
    assert n == total
    variables = {"params": params, "batch_stats": stats}

    outputs, _ = model.apply(variables, left, right, None, False)

    with torch.no_grad():
        t_disps = ref(torch.from_numpy(left_np.transpose(0, 3, 1, 2)),
                      torch.from_numpy(right_np.transpose(0, 3, 1, 2)))

    assert len(outputs["disps"]) == len(t_disps) == 4
    for i, (f, t) in enumerate(zip(outputs["disps"], t_disps)):
        fv = np.asarray(f[0, :, :, 0])
        tv = t[0, 0].numpy()
        denom = np.abs(tv).mean() + 1e-6
        rel = np.abs(fv - tv).max() / denom
        assert rel < 2e-3, f"disparity {i} diverges: rel={rel:.2e}"
