"""Profile one forward / temporal-streaming step on the real chip and print
the top ops by on-device time (from the XLA profiler trace).

Usage:
  python -m temporalstereo_tpu.cli.profile_step [--temporal] [--train]
         [--height 384] [--width 1248] [--top 40]

The reference has only a wall-clock microbenchmark template
(architecture/utils/time_test_template.py); on TPU the profiler timeline is
the ground truth (SURVEY.md §5.1), so this tool is first-class.
"""
import argparse
import collections
import glob
import re
import shutil
import sys
import tempfile

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def _trace_events(f, args, iters=6):
    """Run jitted f(*args) under the profiler; return op totals/counts and
    the per-iteration dispatch wall time."""
    jax.block_until_ready(f(*args))
    tmp = tempfile.mkdtemp(prefix="ts_profile_")
    try:
        jax.profiler.start_trace(tmp)
        for _ in range(iters):
            jax.block_until_ready(f(*args))
        jax.profiler.stop_trace()

        try:
            from tensorflow.tsl.profiler.protobuf import xplane_pb2
        except ImportError:  # pragma: no cover
            from tensorflow.core.profiler.protobuf import xplane_pb2

        files = glob.glob(f"{tmp}/plugins/profile/*/*.xplane.pb")
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(files[0], "rb").read())
        totals = collections.Counter()
        counts = collections.Counter()
        jit_total = 0.0
        step_marker_total = 0.0
        for p in xs.planes:
            if "TPU" not in p.name:
                continue
            for line in p.lines:
                for ev in line.events:
                    md = p.event_metadata[ev.metadata_id]
                    name = md.name
                    # whole-dispatch rollup events: "jit_<fn>" module events
                    # and bare step numbers ("0".."5") — both measure the
                    # wall of one dispatch. A trace can carry either or both
                    # lines, so track them separately and take the max
                    # rather than double-counting.
                    if name.startswith("jit_"):
                        jit_total += ev.duration_ps / 1e12
                        continue
                    if name.isdigit():
                        step_marker_total += ev.duration_ps / 1e12
                        continue
                    totals[name] += ev.duration_ps / 1e12
                    counts[name] += 1
        return (totals, counts,
                max(jit_total, step_marker_total) / max(iters, 1))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--temporal", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=1248)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--scope-depth", type=int, default=3,
                    help="path depth for the op_name scope aggregation")
    args = ap.parse_args(argv)

    from temporalstereo_tpu.config import get_cfg
    from temporalstereo_tpu.models import (
        backbone_memory_shapes, build_model, init_prev_info)
    from temporalstereo_tpu.models.temporal import streaming_step

    opts = ["TRAINER.PRECISION", "bf16"]
    if args.temporal:
        opts += ["MODEL.WITH_PREVIOUS", "True",
                 "MODEL.USE_PAST_COST", "True",
                 "MODEL.LOCAL_MAP_SIZE", "3",
                 "MODEL.BACKBONE.MEMORY_PERCENT", "0.5"]
    cfg = get_cfg(opts=opts)
    model = build_model(cfg)

    b, h, w = args.batch, args.height, args.width
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    right = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    variables = jax.jit(
        lambda r: model.init({"params": r}, left, right, None, False))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    if args.train:
        from temporalstereo_tpu.training import (
            TrainState, build_optimizer, make_train_step)

        tx = build_optimizer(cfg, steps_per_epoch=1000)
        state = TrainState.create(variables["params"],
                                  variables.get("batch_stats", {}), tx)
        train_step = make_train_step(model, cfg)
        t = 2 if args.temporal else 1
        batch = {
            "left": jnp.asarray(
                rng.rand(t, b, h, w, 3), jnp.float32),
            "right": jnp.asarray(
                rng.rand(t, b, h, w, 3), jnp.float32),
            "disp_gt": jnp.asarray(
                20.0 * rng.rand(t, b, h, w, 1).astype(np.float32)),
            "K": jnp.asarray(np.tile(
                np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]],
                         np.float32), (b, 1, 1))),
            "baseline": jnp.full((b,), 0.54, jnp.float32),
            "T_cam": jnp.asarray(
                np.tile(np.eye(4, dtype=np.float32), (t, b, 1, 1))),
            "inv_T": jnp.asarray(
                np.tile(np.eye(4, dtype=np.float32), (t, b, 1, 1))),
        }

        def step(left, right):
            new_state, metrics = train_step(state, {**batch,
                                                    "left": left,
                                                    "right": right})
            return metrics["loss"], new_state.params
        fn_args = (batch["left"], batch["right"])
    elif args.temporal:
        K = jnp.asarray(np.tile(
            np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]],
                     np.float32), (b, 1, 1)))
        baseline = jnp.full((b,), 0.54, jnp.float32)
        T_np = np.eye(4, dtype=np.float32)
        T_np[0, 3] = 0.02
        T_np[2, 3] = -0.5
        T = jnp.asarray(np.tile(T_np, (b, 1, 1)))
        mem_shapes = backbone_memory_shapes(model.backbone_cfg, (h, w))
        prev = init_prev_info(model, b, (h, w), mem_shapes,
                              model.precise_cfg.get("topk", 2), model.dtype)
        # run one step so the carried state is realistic (has_memory=True)
        prev = jax.jit(lambda l, r, p: streaming_step(
            model, variables, l, r, p, K, baseline, T)[1])(left, right, prev)
        jax.block_until_ready(prev)

        def step(left, right, prev):
            outputs, new_prev = streaming_step(
                model, variables, left, right, prev, K, baseline, T)
            return outputs["disps"][0], new_prev
        fn_args = (left, right, prev)
    else:
        def step(left, right):
            outputs, _ = model.apply(variables, left, right, None, False)
            return outputs["disps"][0]
        fn_args = (left, right)

    jitted = jax.jit(step)
    totals, counts, step_s = _trace_events(jitted, fn_args)
    grand = sum(totals.values())

    # join instruction names with HLO op_name metadata -> model-scope table
    # (reuses the same jitted handle — no second trace/lower)
    hlo_txt = jitted.lower(*fn_args).compile().as_text()
    op_names = {}
    for line in hlo_txt.splitlines():
        line = line.strip()
        if line.startswith("ROOT "):
            line = line[5:]
        if not line.startswith("%"):
            continue
        short = line.split(" = ")[0].lstrip("%")
        m = re.search(r'op_name="([^"]+)"', line)
        if m:
            op_names[short] = m.group(1)

    scopes = collections.Counter()
    for name, tot in totals.items():
        short = name.lstrip("%").split(" ")[0]
        path = op_names.get(short, "<no-metadata>")
        parts = [p for p in path.split("/") if not p.startswith("jit(")]
        scopes["/".join(parts[:args.scope_depth]) or path] += tot
    print(f"\n{'model scope (op_name metadata)':<52} {'total ms':>9} "
          f"{'%':>6}")
    for scope, tot in scopes.most_common(30):
        print(f"{scope[:52]:<52} {1e3 * tot / 6:9.3f} "
              f"{100 * tot / grand:6.1f}")
    if step_s > 0:
        print(f"\nstep wall (whole-dispatch rollup events): "
              f"{1e3 * step_s:.2f} ms")
    print(f"step device time: {1e3 * grand / 6:.2f} ms "
          f"(sum of op events / iters — async copy/slice-starts overlap "
          f"compute, so this over-counts vs wall)")

    cats = collections.Counter()
    for name, tot in totals.items():
        # "%opname.123 = type[...] opcode(..." -> group by opcode
        cat = name.lstrip("%").split(".")[0].split(" ")[0]
        m = name.split(" = ")
        if len(m) == 2:
            rhs = m[1]
            p = rhs.find("(")
            sp = rhs.rfind(" ", 0, p) if p > 0 else -1
            if 0 <= sp < p:
                cat = rhs[sp + 1:p]
        cats[cat] += tot
    print(f"\n{'category':<32} {'total ms':>9} {'%':>6}")
    for cat, tot in cats.most_common(18):
        print(f"{cat:<32} {1e3 * tot / 6:9.3f} {100 * tot / grand:6.1f}")

    print(f"\n{'op':<72} {'total ms':>9} {'count':>6} {'%':>6}")
    for name, tot in totals.most_common(args.top):
        print(f"{name[:72]:<72} {1e3 * tot / 6:9.3f} {counts[name] // 6:6d} "
              f"{100 * tot / grand:6.1f}")


if __name__ == "__main__":
    sys.exit(main())
