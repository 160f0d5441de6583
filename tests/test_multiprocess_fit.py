"""TWO-PROCESS end-to-end ``Trainer.fit`` (VERDICT r4 #6): the whole
Lightning-DDP fit contract (reference dist_train.py:81-100), not one step.

Two OS processes, each a jax "host" with one CPU device, run a short
``Trainer.fit`` (2 epochs, checkpoints + validation every epoch) over an
on-disk SceneFlow-format dataset with an UNEVEN validation shard (3 samples
over 2 hosts -> wrap-pad + de-dup).  Asserts:

  * checkpoints / weights_final.msgpack are written by process 0 ONLY
    (rank-zero gating; each process gets its own LOG_DIR so the writes are
    attributable),
  * both processes report identical validation metrics every time,
  * a second Trainer RESUMES from process-0's checkpoint on both processes
    (restored step count pinned) and trains one more epoch,
  * the 2-process epoch metrics equal a SINGLE-process fit on the assembled
    data (same global batches: per-sample aug seeding + the deterministic
    shared shuffle make the global batch sequence identical).
"""
import json
import os
import re
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest
from PIL import Image

from temporalstereo_tpu.data.formats import write_pfm

# options shared by every run (worker and single-process control)
COMMON_OPTS = [
    "TRAINER.NAME", "TemporalStereo",
    "TRAINER.MAX_EPOCHS", "2",
    "TRAINER.CHECK_VAL_EVERY_N_EPOCHS", "1",
    "CHECKPOINT.EVERY_N_EPOCHS", "1",
    "TRAINER.PRECISION", "f32",
    "TRAINER.SWA.ENABLED", "False",
    "MODEL.BACKBONE.VARIANT", "tiny",
    "MODEL.AGGREGATION.COARSE.C", "8",
    "MODEL.AGGREGATION.FINE.C", "8",
    "MODEL.AGGREGATION.PRECISE.C", "8",
    "VAL.EVAL_DISPARITY_IDS", "[0]",
    "VAL.VIS_BATCH_INDEX", "0",
]


def _data_opts(root, batch_train):
    opts = []
    for phase, ann, bs in (("TRAIN", "ann_train.json", batch_train),
                           ("VAL", "ann_val.json", 1),
                           ("TEST", "ann_val.json", 1)):
        opts += [
            f"DATA.{phase}.DATA_ROOT", root,
            f"DATA.{phase}.ANNFILE", os.path.join(root, ann),
            f"DATA.{phase}.TYPE", "SceneFlow",
            f"DATA.{phase}.HEIGHT", "32",
            f"DATA.{phase}.WIDTH", "64",
            f"DATA.{phase}.BATCH_SIZE", str(bs),
            f"DATA.{phase}.NUM_WORKERS", "1",
            f"DATA.{phase}.PROCESS_WORKERS", "False",
            f"DATA.{phase}.FRAME_IDXS", "[0]",
        ]
    return opts


@pytest.fixture(scope="module")
def fit_dataset(tmp_path_factory):
    """4 train + 3 val single-frame items; images 48x96 so the train-time
    random crop to 32x64 actually exercises augmentation determinism."""
    root = tmp_path_factory.mktemp("fitds")
    h, w = 48, 96
    rng = np.random.RandomState(3)

    def write_item(tag, i):
        lp, rp, dp = f"{tag}L{i}.png", f"{tag}R{i}.png", f"{tag}D{i}.pfm"
        for pth in (lp, rp):
            Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)
                            ).save(root / pth)
        write_pfm(str(root / dp),
                  rng.uniform(1, 20, (h, w)).astype(np.float32))
        return {"0": {"left_image_path": lp, "right_image_path": rp,
                      "left_disp_path": dp}}

    (root / "ann_train.json").write_text(
        json.dumps([write_item("t", i) for i in range(4)]))
    (root / "ann_val.json").write_text(
        json.dumps([write_item("v", i) for i in range(3)]))
    return str(root)


WORKER = textwrap.dedent("""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ.pop("PYTHONPATH", None)
sys.path.insert(0, os.getcwd())
import jax
jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the two workers + the resume leg + later runs
# share identical graphs — without it the repeated CPU compiles dominate
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.getcwd(), ".jax_cache"))
port, pid, root, out = (sys.argv[1], int(sys.argv[2]), sys.argv[3],
                        sys.argv[4])
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)
import json
from temporalstereo_tpu.config import get_cfg
from temporalstereo_tpu.training.trainer import Trainer
from tests.test_multiprocess_fit import COMMON_OPTS, _data_opts

def mkcfg(version, extra=()):
    return get_cfg(opts=[*COMMON_OPTS, *_data_opts(root, 1),
                         "LOG_DIR", os.path.join(out, f"h{pid}"),
                         "TRAINER.VERSION", version, *extra])

def dump(tag, metrics):
    print(tag + " " + json.dumps(
        {k: float(v) for k, v in sorted(metrics.items())}), flush=True)

tr = Trainer(mkcfg("fit"))
assert tr.is_main == (pid == 0)
assert tr.steps_per_epoch == 2, tr.steps_per_epoch
tr.fit()
assert int(tr.state.step) == 4, int(tr.state.step)
dump("VAL0", tr.validate(99))
tr.metrics.close()

# resume from PROCESS 0's checkpoint on BOTH processes, train 1 more epoch
ck = os.path.join(out, "h0", "TemporalStereo", "fit", "checkpoints")
tr2 = Trainer(mkcfg("resume", ["TRAINER.RESUME_FROM_CHECKPOINT", ck,
                               "TRAINER.MAX_EPOCHS", "1"]))
assert int(tr2.state.step) == 4, int(tr2.state.step)
tr2.fit()
assert int(tr2.state.step) == 6, int(tr2.state.step)
dump("VAL1", tr2.validate(100))
tr2.metrics.close()
print(f"proc {pid}: OK", flush=True)
""")


def _collect(out, tag):
    m = re.search(rf"^{tag} (\{{.*\}})$", out, re.M)
    assert m, out[-3000:]
    return json.loads(m.group(1))


def test_two_process_end_to_end_fit_resume_and_rank_zero_gating(
        fit_dataset, tmp_path):
    port_sock = socket.socket()
    port_sock.bind(("localhost", 0))
    port = port_sock.getsockname()[1]
    port_sock.close()
    out = str(tmp_path)

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(port), str(i), fit_dataset,
             out],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=3300)
        except subprocess.TimeoutExpired:
            p.kill()
            o, _ = p.communicate()
        outs.append(o)
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{o[-4000:]}"
        assert f"proc {i}: OK" in o

    # both processes computed identical global epoch metrics, both legs
    vals = [{tag: _collect(o, tag) for tag in ("VAL0", "VAL1")}
            for o in outs]
    assert vals[0] == vals[1], (vals[0], vals[1])

    # rank-zero gating: checkpoints + final weights exist under h0 only
    h0 = os.path.join(out, "h0", "TemporalStereo", "fit")
    h1 = os.path.join(out, "h1", "TemporalStereo", "fit")
    assert os.listdir(os.path.join(h0, "checkpoints"))
    assert os.path.exists(os.path.join(h0, "weights_final.msgpack"))
    assert not os.path.exists(os.path.join(h1, "weights_final.msgpack"))
    assert not (os.path.isdir(os.path.join(h1, "checkpoints"))
                and os.listdir(os.path.join(h1, "checkpoints")))

    # ---- single-process fit on the assembled data must agree ------------
    import jax

    from temporalstereo_tpu.config import get_cfg
    from temporalstereo_tpu.training.trainer import Trainer

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.getcwd(), ".jax_cache"))
    cfg = get_cfg(opts=[*COMMON_OPTS, *_data_opts(fit_dataset, 2),
                        "LOG_DIR", os.path.join(out, "single"),
                        "TRAINER.VERSION", "fit",
                        "TPU.MESH.DATA", "1"])
    tr = Trainer(cfg)
    assert tr.steps_per_epoch == 2
    tr.fit()
    single = {k: float(v) for k, v in sorted(tr.validate(99).items())}
    tr.metrics.close()
    multi = vals[0]["VAL0"]
    assert set(single) == set(multi)
    for k in single:
        assert abs(single[k] - multi[k]) <= 1e-3 * max(1.0, abs(single[k])), \
            (k, single[k], multi[k])
