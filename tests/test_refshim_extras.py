"""Parity of the remaining API-surface components against the REAL
reference code (tests/refshim): RAFT correlation pyramids, SPP3D,
SOFTARGMIN/ARGMIN prediction components, flow metrics, and the
visualization colormaps.

These are exactly the components where mirror-based testing proved weakest:
the real CorrBlock has align_corners=False grid_sample quirks (full-res
normalization at every pyramid level, a level-dependent y-tap weight), the
real FlowCorrBlock "correlation" is a SQUARED DISTANCE with a transposed
lookup window, and the real dif-style fills are value- not
geometry-conditioned — all found only by running the reference's own lines
(round 3).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests import refshim  # noqa: E402

if not refshim.reference_available():  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

refshim.install()

from architecture.modeling.aggregation.utils import (  # noqa: E402
    CorrBlock as RefCorrBlock,
    FlowCorrBlock as RefFlowCorrBlock,
    SPP3D as RefSPP3D,
)
from architecture.modeling.prediction import (  # noqa: E402
    ARGMIN as RefArgmin,
    SOFTARGMIN as RefSoftArgmin,
)
from architecture.data.evaluation import (  # noqa: E402
    flow_calc_error as ref_flow_calc_error,
)
from architecture.utils import (  # noqa: E402
    disp_err_to_color as ref_disp_err_to_color,
    disp_to_color as ref_disp_to_color,
    flow_to_color as ref_flow_to_color,
)

from temporalstereo_tpu.data.evaluation.flow_error import (  # noqa: E402
    calc_flow_error,
)
from temporalstereo_tpu.models.prediction import (  # noqa: E402
    Argmin,
    SoftArgmin,
)
from temporalstereo_tpu.nn.blocks import SPP3D  # noqa: E402
from temporalstereo_tpu.ops.correlation import (  # noqa: E402
    CorrBlock,
    FlowCorrBlock,
)
from temporalstereo_tpu.visualization import (  # noqa: E402
    disp_err_to_color,
    disp_to_color,
    flow_to_color,
)


def nchw(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()


# --------------------------------------------------------------- raft corr
def test_corr_block_matches_reference(rng):
    b, h, w, c = 2, 3, 16, 8
    f1 = rng.randn(b, h, w, c).astype(np.float32)
    f2 = rng.randn(b, h, w, c).astype(np.float32)
    disp = (rng.rand(b, h, w).astype(np.float32) * 4.0)

    ref = RefCorrBlock(nchw(f1), nchw(f2), num_levels=3, radius=2)
    with torch.no_grad():
        t = ref(torch.from_numpy(disp[:, None]).contiguous()).numpy()

    cb = CorrBlock(jnp.asarray(f1), jnp.asarray(f2), num_levels=3, radius=2)
    # reference coords: pixel x-grid minus disparity (raft_corr.py:30)
    coords = (np.arange(w, dtype=np.float32)[None, None, :] - disp)
    got = np.asarray(cb(jnp.asarray(coords)))     # [B, H, W, L*(2r+1)]
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), t, rtol=1e-4,
                               atol=1e-5)


def test_flow_corr_block_matches_reference(rng):
    b, h, w, c = 1, 8, 8, 6
    f1 = rng.randn(b, h, w, c).astype(np.float32)
    f2 = rng.randn(b, h, w, c).astype(np.float32)
    flow = (rng.rand(b, h, w, 2).astype(np.float32) * 2.0 - 1.0)
    # target coords = pixel grid + flow (raft_corr.py init_flow + update)
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    coords = np.stack([gx, gy], -1)[None] + flow

    ref = RefFlowCorrBlock(nchw(f1), nchw(f2), num_levels=3, radius=2)
    with torch.no_grad():
        t = ref(nchw(coords)).numpy()

    fb = FlowCorrBlock(jnp.asarray(f1), jnp.asarray(f2), num_levels=3,
                       radius=2)
    got = np.asarray(fb(jnp.asarray(coords)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), t, rtol=1e-4,
                               atol=1e-4)


# -------------------------------------------------------------------- spp3d
def test_spp3d_matches_reference(rng):
    torch.manual_seed(3)
    c, d, h, w = 12, 6, 18, 20
    ref = RefSPP3D(in_planes=c, strides=(2, 4, 8, 16), norm="BN3d",
                   activation="ReLU").eval()
    g = torch.Generator().manual_seed(4)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(
                    m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(
                    m.running_var.shape, generator=g) * 0.5 + 0.75)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    model = SPP3D(in_planes=c, strides=(2, 4, 8, 16), norm="BN3d",
                  activation="ReLU")
    vol = rng.randn(1, d, h, w, c).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(vol), False)

    def conv3d_w(wt):  # [O, I, kd, kh, kw] -> (kd, kh, kw, I, O)
        return jnp.asarray(wt.transpose(2, 3, 4, 1, 0))

    p = jax.tree.map(lambda x: x, variables["params"])
    s = jax.tree.map(lambda x: x, variables["batch_stats"])

    def put_bn(tree_p, tree_s, prefix):
        bnp = tree_p["Norm_0"]["BatchNorm_0"]
        bns = tree_s["Norm_0"]["BatchNorm_0"]
        bnp["scale"] = jnp.asarray(sd[f"{prefix}.weight"])
        bnp["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        bns["mean"] = jnp.asarray(sd[f"{prefix}.running_mean"])
        bns["var"] = jnp.asarray(sd[f"{prefix}.running_var"])

    for i in range(4):
        p[f"pool_conv_{i}"]["Conv_0"]["kernel"] = conv3d_w(
            sd[f"pools.{i}.weight"])[0]  # 1x1x1 spatial path: (1,1,I,O)
        put_bn(p[f"pool_conv_{i}"], s[f"pool_conv_{i}"], f"pools.{i}.norm")
    p["fuse_0"]["Conv_0"]["kernel"] = conv3d_w(sd["fuse.0.weight"])
    put_bn(p["fuse_0"], s["fuse_0"], "fuse.0.norm")
    p["fuse_1"]["Conv_0"]["kernel"] = conv3d_w(sd["fuse.1.weight"])[0]

    got = np.asarray(model.apply({"params": p, "batch_stats": s},
                                 jnp.asarray(vol), False))
    with torch.no_grad():
        t = ref(torch.from_numpy(
            vol.transpose(0, 4, 1, 2, 3)).contiguous()).numpy()
    np.testing.assert_allclose(got.transpose(0, 4, 1, 2, 3), t, rtol=2e-4,
                               atol=2e-4)


# --------------------------------------------------------------- prediction
def test_soft_argmin_matches_reference(rng):
    b, d, h, w = 2, 7, 5, 9
    cost = rng.randn(b, d, h, w).astype(np.float32)
    sample = (rng.rand(b, d, h, w).astype(np.float32) * 30.0)
    ref = RefSoftArgmin(temperature=2.5, normalize=True)
    with torch.no_grad():
        t = ref(torch.from_numpy(cost), torch.from_numpy(sample)).numpy()
    got = SoftArgmin(temperature=2.5, normalize=True)(
        jnp.asarray(cost.transpose(0, 2, 3, 1)),
        jnp.asarray(sample.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), t,
                               rtol=1e-5, atol=1e-5)

    # un-normalized branch (soft_argmin.py:49-51)
    ref2 = RefSoftArgmin(temperature=1.0, normalize=False)
    with torch.no_grad():
        t2 = ref2(torch.from_numpy(cost), torch.from_numpy(sample)).numpy()
    got2 = SoftArgmin(temperature=1.0, normalize=False)(
        jnp.asarray(cost.transpose(0, 2, 3, 1)),
        jnp.asarray(sample.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got2).transpose(0, 3, 1, 2), t2,
                               rtol=1e-4, atol=1e-4)


def test_argmin_matches_reference(rng):
    b, d, h, w = 2, 7, 5, 9
    cost = rng.randn(b, d, h, w).astype(np.float32)
    sample = (rng.rand(b, d, h, w).astype(np.float32) * 30.0)
    ref = RefArgmin(dim=1)
    with torch.no_grad():
        t = ref(torch.from_numpy(cost), torch.from_numpy(sample)).numpy()
    got = Argmin()(jnp.asarray(cost.transpose(0, 2, 3, 1)),
                   jnp.asarray(sample.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), t)


# ------------------------------------------------------ conv gru / drnet
def _conv2d_w(wt):  # [O, I, kh, kw] -> (kh, kw, I, O)
    return jnp.asarray(wt.transpose(2, 3, 1, 0))


def test_conv_gru_matches_reference(rng):
    from architecture.modeling.layers import ConvGRU as RefConvGRU

    from temporalstereo_tpu.nn.layers import ConvGRU

    torch.manual_seed(5)
    f, hid, h, w = 6, 8, 10, 12
    ref = RefConvGRU(in_planes=f, hidden_planes=hid).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    model = ConvGRU(hidden=hid)
    hx = rng.randn(1, h, w, hid).astype(np.float32)
    xx = rng.randn(1, h, w, f).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(hx),
                           jnp.asarray(xx))
    p = jax.tree.map(lambda v: v, variables["params"])
    for gate in ("convz", "convr", "convq"):
        p[gate]["Conv_0"]["kernel"] = _conv2d_w(sd[f"{gate}.weight"])
        p[gate]["Conv_0"]["bias"] = jnp.asarray(sd[f"{gate}.bias"])

    got = np.asarray(model.apply({"params": p}, jnp.asarray(hx),
                                 jnp.asarray(xx)))
    with torch.no_grad():
        t = ref(torch.from_numpy(hx.transpose(0, 3, 1, 2)).contiguous(),
                torch.from_numpy(xx.transpose(0, 3, 1, 2)).contiguous())
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_stereodrnet_refinement_matches_reference(rng):
    from architecture.modeling.aggregation.TemporalStereo.module import (
        StereoDRNetRefinement as RefDRNet,
    )

    from temporalstereo_tpu.nn.blocks import StereoDRNetRefinement

    torch.manual_seed(6)
    ref = RefDRNet().eval()
    g = torch.Generator().manual_seed(7)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(
                    m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(
                    m.running_var.shape, generator=g) * 0.5 + 0.75)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    model = StereoDRNetRefinement()
    h, w = 24, 32
    disp = (rng.rand(1, h, w, 1).astype(np.float32) * 6.0)
    left = rng.rand(1, h, w, 3).astype(np.float32)
    right = rng.rand(1, h, w, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(disp),
                           jnp.asarray(left), jnp.asarray(right), False)
    p = jax.tree.map(lambda v: v, variables["params"])
    s = jax.tree.map(lambda v: v, variables["batch_stats"])

    def put(conv_tree, stat_tree, prefix, has_norm=True, has_bias=False):
        conv_tree["Conv_0"]["kernel"] = _conv2d_w(sd[f"{prefix}.weight"])
        if has_bias:
            conv_tree["Conv_0"]["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        if has_norm:
            bnp = conv_tree["Norm_0"]["BatchNorm_0"]
            bns = stat_tree["Norm_0"]["BatchNorm_0"]
            bnp["scale"] = jnp.asarray(sd[f"{prefix}.norm.weight"])
            bnp["bias"] = jnp.asarray(sd[f"{prefix}.norm.bias"])
            bns["mean"] = jnp.asarray(sd[f"{prefix}.norm.running_mean"])
            bns["var"] = jnp.asarray(sd[f"{prefix}.norm.running_var"])

    put(p["Conv2d_0"], s["Conv2d_0"], "feat_conv")
    put(p["Conv2d_1"], s["Conv2d_1"], "disp_conv")
    for i in range(6):
        put(p[f"BasicBlock_{i}"]["Conv2d_0"],
            s[f"BasicBlock_{i}"]["Conv2d_0"], f"dilated_block.{i}.conv1")
        put(p[f"BasicBlock_{i}"]["Conv2d_1"],
            s[f"BasicBlock_{i}"]["Conv2d_1"], f"dilated_block.{i}.conv2")
    put(p["Conv2d_2"], s.get("Conv2d_2", {}), "final_conv", has_norm=False,
        has_bias=True)

    got = np.asarray(model.apply(
        {"params": p, "batch_stats": s}, jnp.asarray(disp),
        jnp.asarray(left), jnp.asarray(right), False))
    with torch.no_grad():
        t = ref(torch.from_numpy(disp.transpose(0, 3, 1, 2)).contiguous(),
                torch.from_numpy(left.transpose(0, 3, 1, 2)).contiguous(),
                torch.from_numpy(right.transpose(0, 3, 1, 2)).contiguous())
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), t.numpy(),
                               rtol=5e-4, atol=5e-4)


# ------------------------------------------------------------- flow metrics
def test_flow_calc_error_matches_reference(rng):
    b, h, w = 1, 12, 16
    gt = (rng.rand(b, 2, h, w).astype(np.float32) * 12.0 - 6.0)
    gt[:, :, :3, :3] = 0.0  # sparse fill region
    est = (rng.rand(b, 2, h, w).astype(np.float32) * 12.0 - 6.0)

    for sparse, lb, ub in ((False, 0.0, 400.0), (True, 0.0, 400.0),
                           (False, 2.0, 7.0)):
        ref = ref_flow_calc_error(torch.from_numpy(est),
                                  torch.from_numpy(gt),
                                  lb=lb, ub=ub, sparse=sparse)
        got = calc_flow_error(jnp.asarray(est.transpose(0, 2, 3, 1)),
                              jnp.asarray(gt.transpose(0, 2, 3, 1)),
                              lb=lb, ub=ub, sparse=sparse)
        for k in ("1px", "2px", "3px", "5px", "epe"):
            np.testing.assert_allclose(
                float(got[k]), float(np.asarray(ref[k]).reshape(-1)[0]), rtol=1e-5, atol=1e-5,
                err_msg=f"{k} (sparse={sparse}, lb={lb}, ub={ub})")


# -------------------------------------------------------------- colormaps
def test_disp_to_color_matches_reference(rng):
    disp = (rng.rand(20, 30).astype(np.float64) * 80.0)
    ref = ref_disp_to_color(disp.copy(), max_disp=90.0)
    got = disp_to_color(disp, max_disp=90.0)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_disp_err_to_color_matches_reference(rng):
    gt = (rng.rand(16, 24).astype(np.float64) * 60.0 + 1.0)
    est = gt + rng.randn(16, 24) * 4.0
    ref = ref_disp_err_to_color(est.copy(), gt.copy())
    got = disp_err_to_color(est, gt)
    np.testing.assert_allclose(np.asarray(got, np.float64),
                               np.asarray(ref, np.float64), atol=1e-5)


def test_flow_to_color_matches_reference(rng):
    flow = (rng.rand(14, 18, 2).astype(np.float64) * 10.0 - 5.0)
    ref = ref_flow_to_color(flow.copy())
    got = flow_to_color(flow)
    np.testing.assert_allclose(np.asarray(got, np.float64),
                               np.asarray(ref, np.float64), atol=1e-3)
