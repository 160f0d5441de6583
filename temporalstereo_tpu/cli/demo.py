"""Qualitative demo over any configured dataset.

Re-design of reference ``projects/TemporalStereo/demo.py`` (:124-284):
iterate a dataset, run the (temporal) model, save qualitative panels
(input / disparity / error map) and print EPE/3PE when GT exists.
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
    p.add_argument("--output-dir", default="./demo_out")
    p.add_argument("--max-samples", type=int, default=10)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from PIL import Image

    from ..config import get_cfg
    from ..data import build_stereo_dataset
    from ..data.evaluation import calc_error
    from ..data.loader import collate
    from ..data.transforms import denormalize
    from ..models import build_model
    from ..models.temporal import multi_frame_forward
    from ..training.checkpoint import load_any_weights
    from ..visualization import disp_err_to_colorbar, disp_to_color

    cfg = get_cfg(args.config_file, args.opts)
    model = build_model(cfg)
    dataset = build_stereo_dataset(cfg.DATA.VAL, "val")

    h, w = cfg.DATA.VAL.HEIGHT, cfg.DATA.VAL.WIDTH
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
    for idx in range(min(args.max_samples, len(dataset))):
        batch = collate([dataset[idx]])
        disp = np.asarray(fwd(jax.tree.map(jnp.asarray, batch))[0, :, :, 0])

        left = denormalize(batch["left"][-1][0])
        panels = [left, disp_to_color(disp)]
        gt = batch["disp_gt"][-1][0, :, :, 0]
        msg = f"sample {idx}"
        if np.abs(gt).max() > 0:
            est = disp
            if est.shape != gt.shape:
                # NATIVE-resolution evaluation (reference protocol)
                from ..data.transforms import resize_disparity

                est = resize_disparity(est, gt.shape)
            err = calc_error(jnp.asarray(est), jnp.asarray(gt), lb=0, ub=192)
            msg += f" epe={float(err['epe']):.3f} 3px={float(err['3px']):.2f}%"
            errmap = disp_err_to_colorbar(est, gt)[: gt.shape[0]]
            if errmap.shape[1] != left.shape[1]:
                from PIL import Image as _Image

                errmap = np.asarray(_Image.fromarray(
                    (np.clip(errmap, 0, 1) * 255).astype(np.uint8)).resize(
                    (left.shape[1], left.shape[0]))) / 255.0
            panels.append(errmap)
        panel = np.concatenate(panels, axis=0)
        Image.fromarray((np.clip(panel, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(args.output_dir, f"demo_{idx:04d}.png"))
        print(msg)


if __name__ == "__main__":
    main()
