"""BN folding (utils/fold_bn): exact eval-graph algebra + fast path.

Three contracts:
  1. folding without the marker collection is EXACT under the normal eval
     path (BN collapses to x + bias because scale/stats are neutralized);
  2. the 'folded_bn' marker collection (carried inside the folded variables
     — no process globals, advisor r4) gives the same outputs while
     emitting strictly fewer jaxpr equations (the whole point — the
     op-count/DMA ceiling of docs/PERF.md);
  3. training and unfolded variables are unaffected: the fast path engages
     ONLY when the marker collection is present in the applied variables.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from temporalstereo_tpu.config import get_cfg
from temporalstereo_tpu.models import build_model
from temporalstereo_tpu.utils.fold_bn import fold_batch_norms

H, W = 32, 64


@pytest.fixture(scope="module")
def tiny_model():
    cfg = get_cfg(opts=[
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "MODEL.AGGREGATION.PRECISE.C", "8",
        "TRAINER.PRECISION", "f32",
    ])
    model = build_model(cfg, dtype=None)
    l0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, l0, l0, None,
                           False)
    # non-trivial batch stats + BN affines so the fold actually moves values
    rng = np.random.RandomState(5)

    def perturb_stats(x):
        if x.ndim == 1:
            return jnp.asarray(rng.randn(*x.shape) * 0.2 + x)
        return x

    def perturb_bn_params(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if k == "BatchNorm_0":
                    out[k] = {
                        "scale": jnp.asarray(
                            1.0 + 0.3 * rng.randn(*np.shape(v["scale"]))),
                        "bias": jnp.asarray(
                            0.2 * rng.randn(*np.shape(v["bias"]))),
                    }
                else:
                    out[k] = perturb_bn_params(v)
            else:
                out[k] = v
        return out

    variables = {
        "params": perturb_bn_params(jax.tree.map(lambda x: x,
                                                 variables["params"])),
        "batch_stats": jax.tree.map(perturb_stats,
                                    variables["batch_stats"]),
    }
    return model, variables


def _forward(model, variables, batch):
    out, _ = model.apply(variables, batch["left"], batch["right"], None,
                         False)
    return out


def test_fold_is_exact_and_fast_path_matches(tiny_model):
    model, variables = tiny_model
    rng = np.random.RandomState(7)
    batch = {
        "left": jnp.asarray(rng.rand(1, H, W, 3), jnp.float32),
        "right": jnp.asarray(rng.rand(1, H, W, 3), jnp.float32),
    }
    ref = _forward(model, variables, batch)

    folded_vars, paths = fold_batch_norms(variables)
    assert len(paths) > 20, f"only {len(paths)} BNs folded"
    assert all(p[-1] == "BatchNorm_0" for p in paths)
    assert "folded_bn" in folded_vars  # the marker collection

    # (1) folded variables WITHOUT the marker collection: the normal BN
    # path runs on the rewritten tensors — exact same math
    no_marker = {k: v for k, v in folded_vars.items() if k != "folded_bn"}
    plain = _forward(model, no_marker, batch)
    np.testing.assert_allclose(np.asarray(plain["disps"][0]),
                               np.asarray(ref["disps"][0]),
                               rtol=1e-3, atol=5e-3)

    # (2) fast path (marker collection present): same outputs, strictly
    # smaller graph.  Fresh lambdas: jax caches jaxprs per function object,
    # which would hide the retrace.
    def make_fwd():
        return lambda vs, l, r: model.apply(vs, l, r, None, False)[0][
            "disps"][0]

    n_eqns_before = len(jax.make_jaxpr(make_fwd())(
        no_marker, batch["left"], batch["right"]).eqns)
    fast = _forward(model, folded_vars, batch)
    n_eqns_after = len(jax.make_jaxpr(make_fwd())(
        folded_vars, batch["left"], batch["right"]).eqns)
    np.testing.assert_allclose(np.asarray(fast["disps"][0]),
                               np.asarray(plain["disps"][0]),
                               rtol=1e-4, atol=1e-4)
    assert n_eqns_after < n_eqns_before, (n_eqns_after, n_eqns_before)


def test_fast_path_requires_marker_collection(tiny_model):
    """UNFOLDED variables can never hit the fast path — the marker lives
    inside the folded variable dict, not in process state (advisor r4)."""
    model, variables = tiny_model
    rng = np.random.RandomState(11)
    batch = {
        "left": jnp.asarray(rng.rand(1, H, W, 3), jnp.float32),
        "right": jnp.asarray(rng.rand(1, H, W, 3), jnp.float32),
    }
    ref = _forward(model, variables, batch)
    folded_vars, _ = fold_batch_norms(variables)
    _ = _forward(model, folded_vars, batch)  # fast path traced for folded
    # same model object, UNFOLDED variables: full BN math, same output
    again = _forward(model, variables, batch)
    np.testing.assert_allclose(np.asarray(again["disps"][0]),
                               np.asarray(ref["disps"][0]), rtol=0, atol=0)


def test_fold_flag_does_not_affect_training(tiny_model):
    model, variables = tiny_model
    rng = np.random.RandomState(9)
    l = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    r = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    (out_ref, _), upd_ref = model.apply(variables, l, r, None, True,
                                        mutable=["batch_stats"])
    folded_vars, paths = fold_batch_norms(variables)
    # train=True with the ORIGINAL variables: identical graph and outputs
    (out2, _), upd2 = model.apply(variables, l, r, None, True,
                                  mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out2["disps"][0]),
                               np.asarray(out_ref["disps"][0]), rtol=1e-6)
