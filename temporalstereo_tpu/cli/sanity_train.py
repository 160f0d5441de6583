"""Synthetic end-to-end training sanity: EPE must drop.

Generates a synthetic stereo problem with *known geometry* — random textured
left images, smooth random disparity fields, right views produced by warping
the left view by the disparity — then trains the full model for a few hundred
steps and reports EPE before/after.  This is the offline stand-in for the
SceneFlow mini-run (BASELINE config 2): it exercises the full train loop
(losses, optimizer, BN, bf16 policy) and demonstrates the estimator actually
learns stereo geometry.

Run: python -m temporalstereo_tpu.cli.sanity_train [--steps 300]
"""
from __future__ import annotations

import argparse
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp  # noqa: E402


def make_synthetic_batch(rng: np.random.RandomState, b: int, h: int, w: int):
    """Left/right pair with ground-truth disparity (right-view warp)."""
    from scipy.ndimage import gaussian_filter

    lefts, rights, disps = [], [], []
    for _ in range(b):
        # textured image: smoothed noise at multiple scales
        img = sum(gaussian_filter(rng.rand(h, w, 3), (s, s, 0)) * g
                  for s, g in ((1, 0.5), (4, 0.3), (16, 0.2)))
        img = (img - img.min()) / (img.max() - img.min() + 1e-9)
        # smooth positive disparity field
        disp = gaussian_filter(rng.rand(h, w), 24)
        disp = 5.0 + (disp - disp.min()) / (disp.max() - disp.min() + 1e-9) * 40.0
        # right view: sample left at x + disp (inverse warp along scanlines)
        xs = np.arange(w)[None, :] + disp
        x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        f = (xs - np.floor(xs))[..., None]
        rows = np.arange(h)[:, None]
        right = img[rows, x0] * (1 - f) + img[rows, x1] * f
        lefts.append(img)
        rights.append(right)
        disps.append(disp)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    norm = lambda x: ((x - mean) / std).astype(np.float32)
    K = np.array([[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1]],
                 np.float32)
    return {
        "left": np.stack([norm(x) for x in lefts])[None],
        "right": np.stack([norm(x) for x in rights])[None],
        "disp_gt": np.stack(disps)[None][..., None].astype(np.float32),
        "T_cam": np.tile(np.eye(4, dtype=np.float32), (1, b, 1, 1)),
        "inv_T": np.tile(np.eye(4, dtype=np.float32), (1, b, 1, 1)),
        "K": np.tile(K, (b, 1, 1)),
        "baseline": np.full((b,), 1.0, np.float32),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--num-batches", type=int, default=8)
    args = p.parse_args()

    from ..config import get_cfg
    from ..data.evaluation import calc_error
    from ..models import build_model
    from ..training import TrainState, build_optimizer, make_train_step

    cfg = get_cfg(opts=["TRAINER.PRECISION", "bf16",
                        "OPTIMIZER.RMSPROP.LR", str(args.lr),
                        "SCHEDULER.TYPE", "None"])
    model = build_model(cfg)

    rng = np.random.RandomState(7)
    batches = [jax.tree.map(jnp.asarray, make_synthetic_batch(
        rng, args.batch, args.height, args.width))
        for _ in range(args.num_batches)]

    variables = jax.jit(lambda r: model.init(
        {"params": r}, batches[0]["left"][0], batches[0]["right"][0],
        None, False))(jax.random.PRNGKey(0))
    tx = build_optimizer(cfg, steps_per_epoch=10 ** 6)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))

    @jax.jit
    def eval_epe(params, batch_stats, batch):
        out, _ = model.apply({"params": params, "batch_stats": batch_stats},
                             batch["left"][0], batch["right"][0], None, False)
        return calc_error(out["disps"][0], batch["disp_gt"][0], 0, 192)["epe"]

    epe0 = float(eval_epe(state.params, state.batch_stats, batches[0]))
    print(f"EPE before training: {epe0:.3f} px", flush=True)

    t0 = time.time()
    for i in range(args.steps):
        state, m = step(state, batches[i % len(batches)])
        if (i + 1) % 50 == 0:
            print(f"step {i + 1}: loss {float(m['loss']):.3f}", flush=True)
    jax.block_until_ready(state.params)
    dt = time.time() - t0
    print(f"{args.steps} steps in {dt:.1f}s "
          f"({args.steps * args.batch / dt:.1f} ex/s)", flush=True)

    epe1 = float(eval_epe(state.params, state.batch_stats, batches[0]))
    # held-out batch (never trained on)
    held = jax.tree.map(jnp.asarray, make_synthetic_batch(
        rng, args.batch, args.height, args.width))
    epe_h = float(eval_epe(state.params, state.batch_stats, held))
    print(f"EPE after training: train-batch {epe1:.3f} px, "
          f"held-out {epe_h:.3f} px (was {epe0:.3f})", flush=True)
    if epe1 < epe0 * 0.5:
        print("SANITY PASS: model learns stereo geometry", flush=True)
    else:
        print("SANITY FAIL: EPE did not improve enough", flush=True)


if __name__ == "__main__":
    main()
