"""Multi-host / mesh sharding contract tests on the virtual 8-device CPU
mesh (the TPU-native analogue of a fake distributed backend, SURVEY §4).

Covers the explicit-layout contract of make_sharded_train_step (state
replicated, batch data-sharded, outputs replicated) and the multi-host input
assembly path (shard_batch_multihost / global arrays built from per-device
local shards — the reference's per-rank DDP feed, dist_train.py:81-100).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from temporalstereo_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    shard_batch_multihost,
)
from temporalstereo_tpu.parallel.mesh import TIME_MAJOR_KEYS


def _batch(b=8, t=2, h=8, w=16):
    rng = np.random.RandomState(0)
    return {
        "left": rng.rand(t, b, h, w, 3).astype(np.float32),
        "disp_gt": rng.rand(t, b, h, w, 1).astype(np.float32),
        "K": rng.rand(b, 3, 3).astype(np.float32),
        "baseline": np.full((b,), 0.54, np.float32),
    }


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh(jax.devices()[:8])


def test_batch_sharding_layout(mesh):
    for k in ("left", "disp_gt"):
        assert k in TIME_MAJOR_KEYS or k == "disp_gt"
        assert batch_sharding(mesh, k).spec == P(None, "data")
    assert batch_sharding(mesh, "K").spec == P("data")
    assert batch_sharding(mesh, "baseline").spec == P("data")


def test_shard_batch_places_on_mesh(mesh):
    batch = _batch()
    sharded = shard_batch(mesh, batch)
    assert sharded["left"].sharding.spec == P(None, "data")
    # each device holds exactly B/8 samples of the batch axis
    shard_shapes = {s.data.shape for s in sharded["left"].addressable_shards}
    assert shard_shapes == {(2, 1, 8, 16, 3)}
    np.testing.assert_array_equal(np.asarray(sharded["left"]), batch["left"])


def test_shard_batch_multihost_matches_single_process(mesh):
    """With process_count()==1 the process-local batch IS the global batch;
    both input paths must produce identical global arrays and layouts."""
    assert jax.process_count() == 1
    batch = _batch()
    a = shard_batch(mesh, batch)
    b = shard_batch_multihost(mesh, batch)
    for k in batch:
        assert a[k].sharding == b[k].sharding
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_global_array_from_per_device_shards(mesh):
    """Assemble the global batch from per-device local slices — the exact
    mechanism jax.make_array_from_process_local_data uses per host."""
    batch = _batch()
    global_left = batch["left"]  # [T, 8, H, W, 3]
    sharding = batch_sharding(mesh, "left")
    pieces = [
        jax.device_put(global_left[:, i:i + 1], d)
        for i, d in enumerate(mesh.devices.flatten())
    ]
    assembled = jax.make_array_from_single_device_arrays(
        global_left.shape, sharding, pieces)
    np.testing.assert_array_equal(np.asarray(assembled), global_left)
    assert assembled.sharding.spec == P(None, "data")


def test_train_step_explicit_shardings(mesh):
    """State in/out replicated, metrics replicated, global loss = mean over
    the full sharded batch."""
    from temporalstereo_tpu.parallel import make_sharded_train_step

    def train_step(state, batch):
        # toy 'model': loss is the global mean over the sharded batch
        loss = jnp.mean(batch["left"]) + jnp.sum(state["w"] ** 2)
        return {"w": state["w"] - 0.1}, {"loss": loss}

    step = make_sharded_train_step(train_step, mesh, donate=False)
    state = {"w": jnp.ones((4,))}
    batch = shard_batch(mesh, _batch())
    new_state, metrics = step(state, batch)
    assert new_state["w"].sharding.is_fully_replicated
    assert metrics["loss"].sharding.is_fully_replicated
    np.testing.assert_allclose(float(metrics["loss"]),
                               np.mean(_batch()["left"]) + 4.0, rtol=1e-6)
    # second call with the same key set reuses the cached jit
    step(new_state, batch)


def test_eval_step_explicit_shardings(mesh):
    from temporalstereo_tpu.parallel import make_sharded_eval_step

    def eval_step(variables, batch):
        return {"epe": jnp.mean(jnp.abs(batch["disp_gt"] - variables["b"]))}

    step = make_sharded_eval_step(eval_step, mesh)
    metrics = step({"b": jnp.zeros(())}, shard_batch(mesh, _batch()))
    assert metrics["epe"].sharding.is_fully_replicated
    np.testing.assert_allclose(float(metrics["epe"]),
                               np.mean(np.abs(_batch()["disp_gt"])),
                               rtol=1e-6)


def test_sharded_loader_equal_batch_counts():
    """Uneven dataset sizes must NOT give hosts different batch counts — a
    one-batch difference desyncs the SPMD collectives (torch
    DistributedSampler pads the same way)."""
    from temporalstereo_tpu.data.loader import DataLoader

    class Toy:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"left": np.full((1, 4, 4, 3), i, np.float32)}

    for n, shards, bs, drop in [(11, 2, 2, True), (11, 2, 2, False),
                                (9, 4, 1, False), (10, 4, 2, True)]:
        counts = []
        seen = set()
        for s in range(shards):
            dl = DataLoader(Toy(n), batch_size=bs, shuffle=False,
                            drop_last=drop, num_workers=1,
                            num_shards=shards, shard_index=s)
            batches = list(dl)
            assert len(batches) == len(dl)
            counts.append(len(batches))
            for b in batches:
                seen.update(int(v) for v in b["left"][0, :, 0, 0, 0])
        assert len(set(counts)) == 1, (n, shards, bs, drop, counts)
        if not drop:
            assert seen == set(range(n))  # padding only repeats, never drops


def test_spatial_sharded_forward_matches():
    """W-axis model sharding over a (data, spatial) mesh: GSPMD inserts the
    conv halo exchanges and shift-matmul collectives; the sharded forward
    must match the unsharded one (parallel/spatial.py)."""
    from temporalstereo_tpu.config import get_cfg
    from temporalstereo_tpu.models import build_model
    from temporalstereo_tpu.parallel.spatial import (
        image_sharding,
        make_2d_mesh,
        make_spatial_forward,
    )

    cfg = get_cfg(opts=[
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "MODEL.AGGREGATION.PRECISE.C", "8",
        "TRAINER.PRECISION", "f32",
    ])
    model = build_model(cfg, dtype=None)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(2, 32, 128, 3), jnp.float32)
    right = jnp.asarray(rng.rand(2, 32, 128, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(
        {"params": r}, left, right, None, False))(jax.random.PRNGKey(0))

    ref, _ = jax.jit(lambda l, r: model.apply(
        variables, l, r, None, False))(left, right)

    mesh = make_2d_mesh(2, 4)
    assert image_sharding(mesh).spec == P("data", None, "spatial", None)
    run = make_spatial_forward(model, variables, mesh)
    out = run(left, right)
    assert "spatial" in str(out.sharding.spec)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref["disps"][0]), atol=1e-4)


def test_prefetch_to_device_yields_all_batches_sharded(mesh):
    """prefetch_to_device: every loader batch arrives exactly once, in
    order, placed with the standard batch shardings, paired with its host
    batch (the trainer's async H2D double-buffering)."""
    from temporalstereo_tpu.parallel import prefetch_to_device

    batches = [_batch() for _ in range(5)]
    for i, b in enumerate(batches):
        b["K"] = b["K"] + i  # make order observable
    out = list(prefetch_to_device(iter(batches), mesh, size=2))
    assert len(out) == len(batches)
    for i, (dev, host) in enumerate(out):
        assert host is batches[i]
        np.testing.assert_array_equal(np.asarray(dev["K"]), host["K"])
        assert dev["left"].sharding == batch_sharding(mesh, "left")
        assert dev["K"].sharding == batch_sharding(mesh, "K")

    # size <= 0 is clamped to at least one in-flight batch
    out2 = list(prefetch_to_device(iter(batches[:2]), mesh, size=0))
    assert len(out2) == 2
