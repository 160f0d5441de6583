"""Streaming stereo-video inference.

Re-design of reference ``projects/TemporalStereo/video_inference.py``
(:229-413): sequential stateful per-frame inference over an image directory,
carrying PrevInfo across frames ("online" mode), with optional GT evaluation
and color-mapped disparity dumps.

Expected data layout (reference :240-251):
  data_root/left/*.png, data_root/right/*.png, data_root/pose_left.txt
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--data-root", required=True)
    p.add_argument("--log-dir", default="./video_out")
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=1248)
    p.add_argument("--baseline", type=float, default=0.54)
    p.add_argument("--focal", type=float, default=721.5377)
    p.add_argument("--pose-format", default="auto",
                   choices=("auto", "matrix", "tartanair"),
                   help="pose_left.txt format: ORB-SLAM3/KITTI matrix rows "
                        "or TartanAir GT quaternions (reference "
                        "video_inference.py:63-98 use_gt dispatch); auto "
                        "sniffs the row width")
    p.add_argument("--fold-bn", action="store_true",
                   help="fold eval-mode BatchNorms into conv weights "
                        "(utils/fold_bn) before compiling — fewer ops / "
                        "weight prefetches per frame")
    p.add_argument("--bf16-params", action="store_true",
                   help="store the loaded weights as bfloat16 "
                        "(serving.cast_params_bf16): halves weight-fetch "
                        "HBM bytes for inference; geometry stays f32")
    p.add_argument("--export-bundle", default="",
                   help="AOT-compile all streaming stage graphs and write a "
                        "serving bundle (serving.py) before running; a fresh "
                        "host then --load-bundle's it with zero compile")
    p.add_argument("--load-bundle", default="",
                   help="run from an AOT serving bundle written by "
                        "--export-bundle (same platform/shape) — skips the "
                        "minutes-long cold compile entirely")
    p.add_argument("--target-fps", type=float, default=0.0,
                   help="pick the serving dispatch chunk size for this fps-"
                        "per-stream target from the measured latency model "
                        "(serving.select_operating_point); warns when the "
                        "stream count cannot reach it on one chip; recorded "
                        "in the bundle meta with --export-bundle")
    p.add_argument("--streams", type=int, default=1,
                   help="concurrent stream count for --target-fps planning")
    p.add_argument("--latency-model", default="tunnel",
                   choices=("tunnel", "direct"),
                   help="measured latency model for --target-fps: this "
                        "sandbox's remote-tunnel chip or a directly-"
                        "attached chip (docs/PERF.md)")
    p.add_argument("--no-exact-growth", action="store_true",
                   help="skip the reference's 1->LOCAL_MAP_SIZE local-map "
                        "growth frames (TemporalStereo.py:367-372) and start "
                        "from a duplicate-filled full map: one compiled step "
                        "instead of one per growth stage (faster cold start, "
                        "small transient deviation on the first frames)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from PIL import Image

    from ..config import get_cfg
    from ..data.formats import (load_disparity, load_image, load_pose_file,
                                load_tartanair_pose_file, sniff_pose_format,
                                write_kitti_disp)
    from ..data.transforms import normalize, resize_image
    from ..models import (backbone_memory_shapes, build_model, init_prev_info)
    from ..models.temporal import streaming_step
    from ..training.checkpoint import load_any_weights
    from ..visualization import disp_to_color

    cfg = get_cfg(args.config_file, args.opts)
    model = build_model(cfg)

    left_dir = os.path.join(args.data_root, "left")
    right_dir = os.path.join(args.data_root, "right")
    names = sorted(os.listdir(left_dir))
    poses_path = os.path.join(args.data_root, "pose_left.txt")
    poses = None
    if os.path.exists(poses_path):
        fmt = args.pose_format
        if fmt == "auto":
            fmt = sniff_pose_format(poses_path)
        poses = (load_tartanair_pose_file(poses_path) if fmt == "tartanair"
                 else load_pose_file(poses_path, invert=True))
        print(f"poses: {len(poses)} frames ({fmt} format)")

    h, w = args.height, args.width
    K = np.array([[args.focal, 0, w / 2], [0, args.focal, h / 2], [0, 0, 1]],
                 np.float32)[None]
    baseline = np.array([args.baseline], np.float32)

    left0 = load_image(os.path.join(left_dir, names[0]))
    sx, sy = w / left0.shape[1], h / left0.shape[0]
    K[:, 0] *= sx
    K[:, 1] *= sy

    # init / load weights
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(
        {"params": r}, dummy, dummy, None, False))(jax.random.PRNGKey(0))
    if args.checkpoint:
        import os as _os

        if not _os.path.exists(args.checkpoint):
            raise SystemExit(
                f"error: checkpoint not found: {args.checkpoint}")
        variables, n = load_any_weights(variables, args.checkpoint)
        print(f"loaded {n} tensors from {args.checkpoint}")
    if args.fold_bn:
        # the folded variables carry the 'folded_bn' marker collection that
        # engages the single-add fast path inside nn.layers.Norm
        from ..utils.fold_bn import fold_batch_norms

        variables, fold_paths = fold_batch_norms(variables)
        print(f"folded {len(fold_paths)} BNs into conv weights")
    if args.bf16_params:
        from ..serving import cast_params_bf16

        variables = cast_params_bf16(variables)
        print("params cast to bf16 storage")

    mem_shapes = backbone_memory_shapes(model.backbone_cfg, (h, w))
    topk = model.precise_cfg.get("topk", 2)
    # exact growth: the local map starts empty and gains one channel per
    # frame (the reference schedule); each growth stage is its own jitted
    # shape, then the steady graph takes over
    exact_growth = model.local_map_size > 0 and not args.no_exact_growth
    prev = (init_prev_info(model, 1, (h, w), mem_shapes, topk,
                           local_map_channels=0 if exact_growth else None)
            if model.with_previous else None)

    from functools import partial

    op_point = None
    if args.target_fps > 0:
        from ..serving import (V5E_DIRECT, V5E_TUNNEL,
                               select_operating_point)

        lm = V5E_DIRECT if args.latency_model == "direct" else V5E_TUNNEL
        op_point = select_operating_point(args.streams, args.target_fps,
                                          latency_model=lm)
        op_point["target_fps"] = args.target_fps
        op_point["streams"] = args.streams
        if op_point["feasible"]:
            print(f"operating point: chunk={op_point['chunk']} -> "
                  f"{op_point['fps_per_stream']} fps/stream predicted "
                  f"({op_point['latency_ms']} ms dispatch latency, "
                  f"model {op_point['model']})")
        else:
            print(f"WARNING: {op_point['note']}")

    bundle = None
    if args.load_bundle:
        from ..serving import load_streaming_bundle

        bundle = load_streaming_bundle(args.load_bundle, model, variables)
        assert (bundle.meta["h"], bundle.meta["w"]) == (h, w), (
            f"bundle compiled for {bundle.meta['h']}x{bundle.meta['w']}, "
            f"requested {h}x{w}")
        print(f"loaded AOT bundle: {len(bundle.meta['stages'])} stage "
              f"graphs, zero compile ({args.load_bundle})")
        if bundle.meta.get("operating_point"):
            bop = bundle.meta["operating_point"]
            print(f"bundle operating point: chunk={bop['chunk']} "
                  f"({bop.get('fps_per_stream')} fps/stream predicted for "
                  f"{bop.get('streams')} stream(s))")
    elif args.export_bundle:
        from ..serving import export_streaming_bundle, load_streaming_bundle

        export_streaming_bundle(model, variables, args.export_bundle,
                                b=1, h=h, w=w, fold_bn=args.fold_bn,
                                operating_point=op_point)
        bundle = load_streaming_bundle(args.export_bundle, model, variables)

    @partial(jax.jit, static_argnames=("warp",))
    def step(l, r, pv, T, warp):
        return streaming_step(model, variables, l, r, pv, jnp.asarray(K),
                              jnp.asarray(baseline), T, warp=warp)

    os.makedirs(args.log_dir, exist_ok=True)
    # optional GT: data_root/disp_gt/<image name stem>.{png,pfm,npy}
    # (reference video_inference.py:289-293)
    gt_dir = os.path.join(args.data_root, "disp_gt")
    errors = []  # (frame index, epe, 3pe%) for frames with GT
    t_prev_inv = None
    for i, name in enumerate(names):
        left = resize_image(load_image(os.path.join(left_dir, name)), (h, w))
        right = resize_image(load_image(os.path.join(right_dir, name)),
                             (h, w))
        l = jnp.asarray(normalize(left))[None]
        r = jnp.asarray(normalize(right))[None]
        if poses is not None and i > 0:
            T_p2n = jnp.asarray(
                (poses[min(i, len(poses) - 1)]
                 @ np.linalg.inv(t_prev_inv))[None])
        else:
            T_p2n = jnp.asarray(np.eye(4, dtype=np.float32)[None])
        if poses is not None:
            t_prev_inv = poses[min(i, len(poses) - 1)]

        t0 = time.time()
        if bundle is not None:
            disp = np.asarray(
                bundle.step(l, r, jnp.asarray(K), jnp.asarray(baseline),
                            T_p2n)[0, :, :, 0])
        else:
            outputs, prev = step(l, r, prev, T_p2n,
                                 warp=(i > 0 and model.with_previous))
            disp = np.asarray(outputs["disps"][0][0, :, :, 0])
        dt = time.time() - t0

        stem = os.path.splitext(name)[0]
        write_kitti_disp(os.path.join(args.log_dir, f"{stem}.png"), disp)
        color = disp_to_color(disp)
        Image.fromarray((color * 255).astype(np.uint8)).save(
            os.path.join(args.log_dir, f"{stem}_color.png"))

        # per-frame EPE / 3PE vs GT at inference resolution (reference
        # video_inference.py:327-340: valid = gt>0 & gt<192, 3PE in percent)
        msg = f"[{i + 1}/{len(names)}] {name}: {dt * 1000:.1f} ms"
        gt_path = _find_gt(gt_dir, stem)
        if gt_path:
            gt = load_disparity(gt_path)
            est = disp
            if gt.shape != est.shape:
                # evaluate at GT resolution: upsample the estimate and scale
                # values by the width ratio (reference visualize, :321-324)
                gh, gw = gt.shape
                est = np.asarray(Image.fromarray(
                    est * (gw / est.shape[1])).resize((gw, gh),
                                                      Image.BILINEAR))
            valid = ((gt > 0) & (gt < 192)).astype(np.float64)
            n = max(valid.sum(), 1.0)
            abs_err = np.abs(gt - est) * valid
            epe = float(abs_err.sum() / n)
            perct = float((abs_err > 3).astype(np.float64).sum() / n * 100)
            errors.append((i, epe, perct))
            msg += f"  EPE {epe:.3f}  3PE {perct:.2f}%"
        print(msg)

    if errors:
        err_path = os.path.join(args.log_dir, "error.txt")
        avg_epe = sum(e for _, e, _ in errors) / len(errors)
        avg_3pe = sum(p for _, _, p in errors) / len(errors)
        with open(err_path, "w") as fp:
            for idx, epe, perct in errors:
                fp.write(f"{idx:04d}: {epe:.4f} {perct:.4f}\n")
            fp.write(f"Sequence average EPE: {avg_epe:.4f}, "
                     f"3PE: {avg_3pe:.4f}\n")
        print(f"Sequence average EPE: {avg_epe:.4f}, 3PE: {avg_3pe:.4f}")
        print(f"wrote {len(errors)} errors to {err_path}")
    print(f"done -> {args.log_dir}")


def _find_gt(gt_dir: str, stem: str) -> str:
    for ext in (".png", ".pfm", ".npy"):
        p = os.path.join(gt_dir, stem + ext)
        if os.path.exists(p):
            return p
    return ""


if __name__ == "__main__":
    main()
