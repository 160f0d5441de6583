"""Convert a checkpoint of this framework into a reference-compatible torch
.ckpt (the inverse of accepting reference checkpoints everywhere): a model
trained here strict-loads into the reference PyTorch TemporalStereo
(projects/TemporalStereo/TemporalStereo.py) for deployment in that stack.

Usage:
  python -m temporalstereo_tpu.cli.export_reference \
      --config-file configs/kitti2015.yaml \
      --checkpoint runs/exp/weights_final.msgpack \
      --output exported_reference.ckpt
"""
import argparse
import sys


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--checkpoint", required=True,
                   help="msgpack weights (or even a reference .ckpt, which "
                        "round-trips through the importer)")
    p.add_argument("--output", required=True, help="output .ckpt path")
    p.add_argument("--force", action="store_true",
                   help="export even when the checkpoint did not cover every "
                        "model tensor (uncovered leaves export as ZEROS)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import get_cfg
    from ..models import build_model
    from ..training.checkpoint import load_any_weights
    from ..utils.torch_export import save_reference_checkpoint

    cfg = get_cfg(args.config_file or None, args.opts)
    model = build_model(cfg, dtype=None)
    # weight shapes are resolution-independent; init at the smallest
    # stride-32-compatible size
    left = jnp.zeros((1, 96, 128, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda r: model.init({"params": r}, left, left, None, False),
        jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    variables, n = load_any_weights(variables, args.checkpoint)
    total = (len(jax.tree.leaves(shapes["params"]))
             + len(jax.tree.leaves(shapes.get("batch_stats", {}))))
    print(f"loaded {n}/{total} tensors from {args.checkpoint}")
    if n != total and not args.force:
        # variables start ZERO-initialized; a config/checkpoint mismatch
        # would silently export corrupt (zero) weights that still strict-load
        # into the reference — refuse unless the user opts in
        raise SystemExit(
            f"error: checkpoint covered only {n}/{total} model tensors "
            f"(config/checkpoint mismatch?); uncovered leaves would export "
            f"as zeros. Pass --force to export anyway.")

    groups = None
    if cfg.MODEL.BACKBONE.VARIANT == "tiny":
        from ..models.backbone import TINY_GROUPS
        groups = TINY_GROUPS
    n_out = save_reference_checkpoint(variables, args.output, groups)
    print(f"wrote {n_out} tensors -> {args.output} "
          f"(reference Lightning state_dict format)")


if __name__ == "__main__":
    sys.exit(main())
