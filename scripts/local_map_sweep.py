"""The local-map-only regression sweep (VERDICT r4 #4).

Round-4 ablation (docs/PERF.md): local-map-ONLY (USE_PAST_COST=False,
LOCAL_MAP_SIZE=3) REGRESSES held-out EPE to 2.21 vs 1.77 single-frame,
while full temporal (past-cost + map) reaches 1.16.  The refshim test
``test_real_local_map_only_chain_parity`` proves the hypothesis-injection
path is reference-exact at that operating point, so the regression is a
property of the MECHANISM, not a porting bug.  This sweep distinguishes
candidate mechanisms at tiny scale (CPU, --tiny):

  conditions (each trains single / local_map / full at matched budget):
    A  tx=0.05, noise=0.15   — the r4 ablation operating point
    B  tx=0.05, noise=0.0    — does sensor noise drive the regression?
    C  tx=0.01, noise=0.15   — near-static rig: warped hypotheses nearly
                                exact; if the regression persists, warp
                                quality is not the mechanism
  probe: eval reports ``best_hyp_epe`` — the BEST hypothesis error of the
  carried map.  Low best-hyp + high final EPE = selection problem (the
  cascade cannot exploit good hypotheses without past-cost's narrowed
  search); high best-hyp = feedback problem (the self-fed map degrades).

Run (CPU, ~1-2 h on the 2-core box):
  python scripts/local_map_sweep.py --out docs/evidence_r5/local_map_sweep
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONDITIONS = [
    ("A_tx05_n15", {"tx": 0.05, "noise": 0.15,
                    "configs": "single,local_map,full"}),
    ("B_tx05_n00", {"tx": 0.05, "noise": 0.0,
                    "configs": "single,local_map"}),
    ("C_tx01_n15", {"tx": 0.01, "noise": 0.15,
                    "configs": "single,local_map"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/evidence_r5/local_map_sweep")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the chip (default: --tiny --cpu)")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for name, cond in CONDITIONS:
        out = os.path.join(args.out, f"{name}.json")
        cmd = [sys.executable, "scripts/temporal_advantage.py",
               "--steps", str(args.steps),
               "--height", str(args.height), "--width", str(args.width),
               "--batch", str(args.batch),
               "--tx", str(cond["tx"]), "--noise", str(cond["noise"]),
               "--configs", cond["configs"], "--out", out]
        env = dict(os.environ)
        if not args.tpu:
            cmd += ["--tiny", "--cpu"]
            # scrub the axon TPU claim: the sweep must never touch the chip
            # (a training recipe may hold it concurrently)
            env.update({"PYTHONPATH": "", "PALLAS_AXON_POOL_IPS": "",
                        "JAX_PLATFORMS": "cpu"})
        print(f"=== {name}: {' '.join(cmd[2:])}", flush=True)
        subprocess.run(cmd, cwd=REPO, check=True, env=env)

    # summary table
    print(f"\n{'cond':>12} {'model':>10} {'EPE(ctx)':>9} {'EPE(cold)':>10} "
          f"{'best_hyp':>9}")
    for name, cond in CONDITIONS:
        with open(os.path.join(args.out, f"{name}.json")) as f:
            res = json.load(f)
        for m in cond["configs"].split(","):
            r = res[m]
            bh = r["held_ctx"].get("best_hyp_epe")
            print(f"{name:>12} {m:>10} {r['held_ctx']['epe']:9.3f} "
                  f"{r['held_cold']['epe']:10.3f} "
                  f"{('%9.3f' % bh) if bh is not None else '        -'}")


if __name__ == "__main__":
    main()
