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


def _scanline_warp(img: np.ndarray, shift: np.ndarray) -> np.ndarray:
    """Bilinear sample of ``img`` at ``x + shift`` along scanlines."""
    h, w = shift.shape
    xs = np.arange(w)[None, :] + shift
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    f = xs - np.floor(xs)
    if img.ndim == 3:
        f = f[..., None]
    rows = np.arange(h)[:, None]
    return img[rows, x0] * (1 - f) + img[rows, x1] * f


def make_synthetic_batch(rng: np.random.RandomState, b: int, h: int, w: int,
                         t: int = 1, tx: float = 0.0):
    """Synthetic stereo *video* with known geometry.

    A static textured scene with a smooth disparity field is observed by a
    stereo rig translating laterally by ``tx`` (world units) per frame.  For
    lateral motion the induced optical flow is ``disp * tx / baseline``
    (baseline=1) — the same scanline warp that creates the right view — so
    every frame pair is geometrically consistent with the emitted poses and
    the temporal state machine sees exactly the reprojection structure it is
    built for.  t=1, tx=0 is the single-frame problem.
    """
    from scipy.ndimage import gaussian_filter

    lefts = [[] for _ in range(t)]
    rights = [[] for _ in range(t)]
    disps = [[] for _ in range(t)]
    for _ in range(b):
        # textured scene: smoothed noise at multiple scales
        img = sum(gaussian_filter(rng.rand(h, w, 3), (s, s, 0)) * g
                  for s, g in ((1, 0.5), (4, 0.3), (16, 0.2)))
        img = (img - img.min()) / (img.max() - img.min() + 1e-9)
        # smooth positive disparity field (frame-0 camera)
        disp = gaussian_filter(rng.rand(h, w), 24)
        disp = 5.0 + (disp - disp.min()) / (disp.max() - disp.min() + 1e-9) * 40.0
        for ti in range(t):
            # frames ordered oldest -> newest with the NEWEST at the frame-0
            # camera (training supervises the final frame)
            back = (t - 1 - ti) * tx
            flow = disp * back            # baseline = 1.0
            lefts[ti].append(_scanline_warp(img, flow))
            disp_t = _scanline_warp(disp, flow)
            disps[ti].append(disp_t)
            rights[ti].append(_scanline_warp(img, flow + disp_t))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    norm = lambda x: ((x - mean) / std).astype(np.float32)
    K = np.array([[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1]],
                 np.float32)
    # older frames show content shifted left => older camera at world
    # x = +back*tx; world->cam translation is -C, so T[0,3] = -back*tx.
    # Per-step T_past_to_now then carries +tx, matching content moving
    # right by disp*tx from past to now (flow = disp * tx / baseline).
    T_cam = np.tile(np.eye(4, dtype=np.float32), (t, b, 1, 1))
    for ti in range(t):
        T_cam[ti, :, 0, 3] = -(t - 1 - ti) * tx
    return {
        "left": np.stack([np.stack([norm(x) for x in fr]) for fr in lefts]),
        "right": np.stack([np.stack([norm(x) for x in fr]) for fr in rights]),
        "disp_gt": np.stack([np.stack(fr) for fr in disps])[..., None].astype(
            np.float32),
        "T_cam": T_cam,
        "inv_T": np.linalg.inv(T_cam),
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
    p.add_argument("--temporal", action="store_true",
                   help="train the temporal model on synthetic video "
                        "(memory splice + pose warp + splat + local map)")
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--tx", type=float, default=0.05)
    args = p.parse_args()

    from ..config import get_cfg
    from ..data.evaluation import calc_error
    from ..models import build_model
    from ..training import TrainState, build_optimizer, make_train_step

    opts = ["TRAINER.PRECISION", "bf16",
            "OPTIMIZER.RMSPROP.LR", str(args.lr),
            "SCHEDULER.TYPE", "None"]
    if args.temporal:
        opts += ["MODEL.WITH_PREVIOUS", "True",
                 "MODEL.USE_PAST_COST", "True",
                 "MODEL.LOCAL_MAP_SIZE", "3",
                 "MODEL.BACKBONE.MEMORY_PERCENT", "0.5"]
    cfg = get_cfg(opts=opts)
    model = build_model(cfg)

    t = args.frames if args.temporal else 1
    tx = args.tx if args.temporal else 0.0
    rng = np.random.RandomState(7)
    batches = [jax.tree.map(jnp.asarray, make_synthetic_batch(
        rng, args.batch, args.height, args.width, t=t, tx=tx))
        for _ in range(args.num_batches)]

    variables = jax.jit(lambda r: model.init(
        {"params": r}, batches[0]["left"][0], batches[0]["right"][0],
        None, False))(jax.random.PRNGKey(0))
    tx = build_optimizer(cfg, steps_per_epoch=10 ** 6)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))

    from ..models.temporal import multi_frame_forward

    @jax.jit
    def eval_epe(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        out, _, _ = multi_frame_forward(model, variables, batch, train=False)
        return calc_error(out["disps"][0], batch["disp_gt"][-1], 0, 192)["epe"]

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
