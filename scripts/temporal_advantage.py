"""Controlled experiment: does the temporal machinery BEAT single-frame?

The reference exists to improve stereo with temporal state (its only in-repo
accuracy figure is the 11-frame temporal 0.596% 3PE comment,
projects/TemporalStereo/kitti_submission.py:158).  Round 3 proved this
repo's temporal math is numerically identical to the reference's; this
script tests whether it HELPS on held-out data (VERDICT r3 next-step #1):

  * one geometric synthetic-video corpus (static scenes, laterally
    translating rig — cli/sanity_train.py generator) with fresh per-frame
    sensor noise, so temporal aggregation has real signal to exploit;
  * five models at MATCHED step budget / data / seeds / optimizer:
       single     WITH_PREVIOUS=False
       full       past-cost + local-map(3) + memory(0.5)
       past_cost  past-cost only
       local_map  local-map only
       memory     memory splice only
  * held-out streaming eval: EPE / 1px / 3px on the FINAL frame given
    t_eval frames of context, plus the same model run COLD (no context) to
    isolate the value of carried state at identical weights.

Run (TPU):  python scripts/temporal_advantage.py --steps 800
Results appended as JSON to --out (default /root/temporal_advantage.json).
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

import jax  # noqa: E402

if "--cpu" in sys.argv:  # the axon sitecustomize ignores JAX_PLATFORMS
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))

import jax.numpy as jnp  # noqa: E402

CONFIGS = {
    "single": [],
    "full": ["MODEL.WITH_PREVIOUS", "True",
             "MODEL.USE_PAST_COST", "True",
             "MODEL.LOCAL_MAP_SIZE", "3",
             "MODEL.BACKBONE.MEMORY_PERCENT", "0.5"],
    "past_cost": ["MODEL.WITH_PREVIOUS", "True",
                  "MODEL.USE_PAST_COST", "True",
                  "MODEL.LOCAL_MAP_SIZE", "0",
                  "MODEL.BACKBONE.MEMORY_PERCENT", "0.0"],
    "local_map": ["MODEL.WITH_PREVIOUS", "True",
                  "MODEL.USE_PAST_COST", "False",
                  "MODEL.LOCAL_MAP_SIZE", "3",
                  "MODEL.BACKBONE.MEMORY_PERCENT", "0.0"],
    "memory": ["MODEL.WITH_PREVIOUS", "True",
               "MODEL.USE_PAST_COST", "False",
               "MODEL.LOCAL_MAP_SIZE", "0",
               "MODEL.BACKBONE.MEMORY_PERCENT", "0.5"],
}


def add_noise(batch, rng, sigma):
    """Fresh iid sensor noise per frame/view (normalized-image units): the
    single-frame estimator must eat it raw; temporal state can average it."""
    if sigma <= 0:
        return batch
    b = dict(batch)
    for k in ("left", "right"):
        b[k] = (b[k] + rng.randn(*b[k].shape).astype(np.float32) * sigma
                ).astype(np.float32)
    return b


def make_data(args):
    from temporalstereo_tpu.cli.sanity_train import make_synthetic_batch

    rng = np.random.RandomState(7)
    noise_rng = np.random.RandomState(8)
    train_t, train_1 = [], []
    for _ in range(args.num_batches):
        vb = make_synthetic_batch(rng, args.batch, args.height, args.width,
                                  t=args.train_frames, tx=args.tx)
        vb = add_noise(vb, noise_rng, args.noise)
        train_t.append(vb)
        # the SAME final frames (+ their noise) as a single-frame problem:
        # both training sets supervise identical targets
        train_1.append({
            "left": vb["left"][-1:], "right": vb["right"][-1:],
            "disp_gt": vb["disp_gt"][-1:], "T_cam": vb["T_cam"][-1:],
            "inv_T": vb["inv_T"][-1:], "K": vb["K"],
            "baseline": vb["baseline"],
        })

    h_rng = np.random.RandomState(1234)
    h_noise = np.random.RandomState(1235)
    held = []
    for _ in range(args.held_batches):
        vb = make_synthetic_batch(h_rng, args.batch, args.height, args.width,
                                  t=args.eval_frames, tx=args.tx)
        held.append(add_noise(vb, h_noise, args.noise))
    return train_t, train_1, held


def last_frames(vb, k):
    """Truncate a held-out video batch to its last ``k`` frames (same final
    target frame, less temporal context)."""
    return {"left": vb["left"][-k:], "right": vb["right"][-k:],
            "disp_gt": vb["disp_gt"][-k:], "T_cam": vb["T_cam"][-k:],
            "inv_T": vb["inv_T"][-k:], "K": vb["K"],
            "baseline": vb["baseline"]}


def last_frame_only(vb):
    return last_frames(vb, 1)


def run_config(name, opts, train_batches, held_batches, args):
    from temporalstereo_tpu.config import get_cfg
    from temporalstereo_tpu.data.evaluation import calc_error
    from temporalstereo_tpu.models import build_model
    from temporalstereo_tpu.models.temporal import multi_frame_forward
    from temporalstereo_tpu.training import (TrainState, build_optimizer,
                                             make_train_step)

    cfg = get_cfg(opts=["TRAINER.PRECISION", "bf16",
                        "OPTIMIZER.RMSPROP.LR", str(args.lr),
                        "SCHEDULER.TYPE", "None", *opts])
    model = build_model(cfg)
    l0 = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init({"params": r}, l0, l0, None,
                                             False))(jax.random.PRNGKey(0))
    tx = build_optimizer(cfg, steps_per_epoch=10 ** 6)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))

    jbatches = [jax.tree.map(jnp.asarray, b) for b in train_batches]
    t0 = time.time()
    losses = []
    log_every = min(100, max(args.steps // 2, 1))
    for i in range(args.steps):
        state, m = step(state, jbatches[i % len(jbatches)])
        if (i + 1) % log_every == 0:
            losses.append(float(m["loss"]))
            print(f"  [{name}] step {i + 1}/{args.steps}: "
                  f"loss {losses[-1]:.3f} ({time.time() - t0:.0f}s)",
                  flush=True)
    jax.block_until_ready(state.params)
    train_time = time.time() - t0

    @jax.jit
    def eval_batch(params, batch_stats, batch):
        vs = {"params": params, "batch_stats": batch_stats}
        out, _, _ = multi_frame_forward(model, vs, batch, train=False)
        err = calc_error(out["disps"][0], batch["disp_gt"][-1], 0, 192)
        lm = out.get("local_map")
        if lm is not None and lm.shape[-1] > 0:
            # mechanistic probe (r5 regression sweep): BEST-hypothesis error
            # of the carried map — low best-hyp error + high final EPE means
            # the hypotheses are good but the cascade can't exploit them
            # (selection problem); high best-hyp error means the self-fed
            # map itself degrades (feedback problem)
            from temporalstereo_tpu.ops.interpolate import resize_bilinear

            gt = batch["disp_gt"][-1]
            gh, gw = gt.shape[1:3]
            lw = lm.shape[2]
            lm_full = resize_bilinear(lm * (gw / lw), (gh, gw))
            valid = (gt[..., 0] > 0) & (gt[..., 0] < 192)
            best = jnp.min(jnp.abs(lm_full - gt), axis=-1)
            err["best_hyp_epe"] = (jnp.sum(best * valid)
                                   / jnp.maximum(jnp.sum(valid), 1))
        return err

    def eval_on(batches):
        sums, n = {}, 0
        for b in batches:
            err = jax.device_get(eval_batch(
                state.params, state.batch_stats,
                jax.tree.map(jnp.asarray, b)))
            for k, v in err.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / n for k, v in sums.items()}

    res = {"train_time_s": round(train_time, 1), "final_loss": losses[-1],
           "loss_curve": losses}
    # held-out, full temporal context (the streaming protocol)
    res["held_ctx"] = eval_on(held_batches)
    # held-out, COLD: same weights, no context — isolates the carried state
    res["held_cold"] = eval_on([last_frame_only(b) for b in held_batches])
    if args.context_sweep:
        # accuracy vs context length: EPE on the SAME final frames given
        # k frames of streaming context (one compiled graph per k)
        sweep = {}
        t_eval = held_batches[0]["left"].shape[0]
        for k in sorted({1, 3, 5, 7, t_eval}):
            if k > t_eval:
                continue
            sweep[k] = eval_on([last_frames(b, k) for b in held_batches])
            print(f"  [{name}] context {k}: EPE "
                  f"{sweep[k]['epe']:.3f} px", flush=True)
        res["context_sweep"] = {str(k): v for k, v in sweep.items()}
    print(f"  [{name}] ctx EPE {res['held_ctx']['epe']:.3f} px "
          f"3px {res['held_ctx']['3px']:.2f}% | cold EPE "
          f"{res['held_cold']['epe']:.3f} px", flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--num-batches", type=int, default=16)
    ap.add_argument("--held-batches", type=int, default=2)
    ap.add_argument("--train-frames", type=int, default=3)
    ap.add_argument("--eval-frames", type=int, default=9)
    ap.add_argument("--tx", type=float, default=0.05)
    ap.add_argument("--noise", type=float, default=0.15)
    ap.add_argument("--configs", default="single,full,past_cost,local_map,"
                    "memory")
    ap.add_argument("--out", default="/root/temporal_advantage.json")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny-variant smoke run (CPU logic check)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (consumed at import)")
    ap.add_argument("--context-sweep", action="store_true",
                    help="also evaluate EPE vs context length (1..t_eval "
                         "frames) — one compiled graph per length")
    ap.add_argument("--local-map-size", type=int, default=3,
                    help="LOCAL_MAP_SIZE for the map-carrying configs "
                         "(full / local_map) — the r5 regression sweep "
                         "varies it")
    args = ap.parse_args()

    for name in ("full", "local_map"):
        opts = CONFIGS[name]
        opts[opts.index("MODEL.LOCAL_MAP_SIZE") + 1] = str(
            args.local_map_size)

    if args.tiny:
        for extra in ("MODEL.BACKBONE.VARIANT", "tiny",
                      "MODEL.AGGREGATION.COARSE.C", "8",
                      "MODEL.AGGREGATION.FINE.C", "8",
                      "MODEL.AGGREGATION.PRECISE.C", "8"):
            for opts in CONFIGS.values():
                opts.append(extra)

    print("generating data...", flush=True)
    train_t, train_1, held = make_data(args)
    print(f"{len(train_t)} train batches (t={args.train_frames}), "
          f"{len(held)} held-out (t={args.eval_frames}), "
          f"noise {args.noise}", flush=True)

    results = {"args": vars(args)}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
        results["args"] = vars(args)
    for name in args.configs.split(","):
        print(f"=== {name} ===", flush=True)
        tb = train_1 if name == "single" else train_t
        results[name] = run_config(name, CONFIGS[name], tb, held, args)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    print("\n===== TEMPORAL ADVANTAGE (held-out, final frame) =====")
    print(f"{'model':>10} {'EPE(ctx)':>9} {'3px(ctx)':>9} {'EPE(cold)':>10}")
    for name in args.configs.split(","):
        r = results[name]
        print(f"{name:>10} {r['held_ctx']['epe']:9.3f} "
              f"{r['held_ctx']['3px']:8.2f}% {r['held_cold']['epe']:10.3f}")
    print(f"\nresults -> {args.out}")


if __name__ == "__main__":
    main()
