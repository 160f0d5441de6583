"""Host input-pipeline throughput: thread pool vs fork process pool.

Measures the data path ALONE (no TPU, no jax) on the on-disk synthetic
SceneFlow-format corpus used by run_two_stage_recipe.py — PNG decode + PFM
decode + resize/crop/aug + collate — in examples/second, against the device
step rate recorded in docs/PERF.md (17.7 ex/s for stage 1).  This is the
measurement behind VERDICT r3 weak #1 / next-step #2.

Run:  python scripts/bench_loader.py [--data-root /root/recipe_data/stage1]
      [--batch 4] [--height 512] [--width 960] [--epochs 2]
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bench(loader, tag, warm_batches=2):
    n_ex = 0
    t0 = None
    for i, batch in enumerate(loader):
        if i == warm_batches:  # skip pool spin-up / first-touch page cache
            t0 = time.time()
            n_ex = 0
        if t0 is not None:
            n_ex += batch["left"].shape[1]
    dt = time.time() - t0 if t0 else float("nan")
    rate = n_ex / dt if dt and n_ex else float("nan")
    print(f"{tag:>28}: {rate:6.2f} ex/s  ({n_ex} ex in {dt:.2f}s)",
          flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="/root/recipe_data/stage1")
    ap.add_argument("--annfile", default="ann_train.json")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--frame-idxs", default="[0]")
    args = ap.parse_args()

    from temporalstereo_tpu.config import get_cfg
    from temporalstereo_tpu.data.datasets.builder import build_stereo_dataset
    from temporalstereo_tpu.data.loader import DataLoader

    cfg = get_cfg(opts=[
        "DATA.TRAIN.TYPE", "SceneFlow",
        "DATA.TRAIN.DATA_ROOT", args.data_root,
        "DATA.TRAIN.ANNFILE", os.path.join(args.data_root, args.annfile),
        "DATA.TRAIN.HEIGHT", str(args.height),
        "DATA.TRAIN.WIDTH", str(args.width),
        "DATA.TRAIN.BATCH_SIZE", str(args.batch),
        "DATA.TRAIN.FRAME_IDXS", args.frame_idxs,
    ])
    ds = build_stereo_dataset(cfg.DATA.TRAIN, "train")
    print(f"dataset: {len(ds)} samples, crop {args.height}x{args.width}, "
          f"b={args.batch}, workers={args.workers}", flush=True)

    for tag, use_proc in (("thread pool (round 3)", False),
                          ("fork process pool", True)):
        loader = DataLoader(ds, batch_size=args.batch, shuffle=True,
                            drop_last=True, num_workers=args.workers,
                            use_processes=use_proc)
        r1 = bench(loader, f"{tag} epoch 1")
        r2 = bench(loader, f"{tag} epoch 2")
        loader.close()


if __name__ == "__main__":
    main()
