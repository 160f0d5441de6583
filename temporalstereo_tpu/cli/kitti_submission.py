"""KITTI-2015 submission writer.

Re-design of reference ``projects/TemporalStereo/kitti_submission.py``
(:126-261): per test sample, re-run the full temporal window (the reference
recomputes all 11 frames per sample, :147) and write uint16 disparity PNGs
for the KITTI server, with 3PE stats against GT when available.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--output-dir", default="./kitti_submission/disp_0")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from ..config import get_cfg
    from ..data import build_stereo_dataset
    from ..data.evaluation import calc_error
    from ..data.formats import write_kitti_disp
    from ..data.loader import collate
    from ..models import build_model
    from ..models.temporal import multi_frame_forward
    from ..training.checkpoint import load_any_weights

    cfg = get_cfg(args.config_file, args.opts)
    model = build_model(cfg)
    dataset = build_stereo_dataset(cfg.DATA.TEST, "test")

    h, w = cfg.DATA.TEST.HEIGHT, cfg.DATA.TEST.WIDTH
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

    fwd = jax.jit(lambda batch: multi_frame_forward(
        model, variables, batch, train=False)[0]["disps"][0])

    os.makedirs(args.output_dir, exist_ok=True)
    stats3 = []
    for idx in range(len(dataset)):
        batch = collate([dataset[idx]])
        disp = np.asarray(fwd(jax.tree.map(jnp.asarray, batch))[0, :, :, 0])
        item = dataset.data_list[idx]
        name = os.path.basename(item["0"]["left_image_path"])
        write_kitti_disp(os.path.join(args.output_dir, name), disp)

        gt = batch.get("disp_gt")
        if gt is not None and np.abs(gt[-1]).max() > 0:
            gt_map = gt[-1][0, :, :, 0]
            est = disp
            if est.shape != gt_map.shape:
                # evaluate at NATIVE gt resolution (reference protocol,
                # TemporalStereo.py:183): width-ratio value scaling
                from ..data.transforms import resize_disparity

                est = resize_disparity(est, gt_map.shape)
            err = calc_error(jnp.asarray(est),
                             jnp.asarray(gt_map), lb=0, ub=192)
            p3 = float(err["3px"])
            stats3.append(p3)
            print(f"[{idx + 1}/{len(dataset)}] {name}: 3PE={p3:.3f}%")
        else:
            print(f"[{idx + 1}/{len(dataset)}] {name}")
    if stats3:
        print(f"average 3PE: {np.mean(stats3):.4f}%")


if __name__ == "__main__":
    main()
