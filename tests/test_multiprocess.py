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


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_multihost_input_pipeline():
    port = _free_port()
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, str(port), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i}: OK" in out
    # both hosts computed the identical global loss
    losses = {ln.split("loss=")[1].strip() for out in outs
              for ln in out.splitlines() if "loss=" in ln}
    assert len(losses) == 1, losses
