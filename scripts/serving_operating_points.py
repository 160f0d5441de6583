"""Generate the serving operating-point table from the encoded latency
model (serving.select_operating_point) next to the round-4 measured curve —
the docs/PERF.md "operating-point selection" table (VERDICT r4 #5).

Run:  JAX_PLATFORMS=cpu python scripts/serving_operating_points.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from temporalstereo_tpu.serving import (V5E_DIRECT, V5E_TUNNEL,  # noqa: E402
                                        select_operating_point)

MEASURED = {  # (streams, chunk) -> measured fps/stream (docs/PERF.md)
    (1, 1): 17.8, (1, 2): 30.9, (1, 8): 47.8,
    (2, 1): 15.7, (2, 2): 21.2, (2, 8): 27.8,
    (4, 8): 16.6,
}


def main():
    print("Model fidelity (v5e-tunnel): predicted vs measured fps/stream")
    print("| streams | chunk | predicted | measured |")
    print("|---|---|---|---|")
    for (s, c), fps in sorted(MEASURED.items()):
        pred = V5E_TUNNEL.fps_per_stream(s, c)
        print(f"| {s} | {c} | {pred:.1f} | {fps} |")

    for lm, tag in ((V5E_TUNNEL, "tunnel"), (V5E_DIRECT, "direct-attach")):
        print(f"\nSelected operating points ({tag}):")
        print("| streams | target fps | chunk | predicted fps/stream | "
              "dispatch latency ms | feasible |")
        print("|---|---|---|---|---|---|")
        for streams in (1, 2, 3, 4, 8):
            for target in (24.0, 30.0):
                op = select_operating_point(streams, target,
                                            latency_model=lm)
                print(f"| {streams} | {target:.0f} | {op['chunk']} | "
                      f"{op['fps_per_stream']} | {op['latency_ms']} | "
                      f"{'yes' if op['feasible'] else 'NO — ' + op['note']}"
                      " |")


if __name__ == "__main__":
    main()
