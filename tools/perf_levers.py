"""Perf-lever sweep (VERDICT r3 item #7): ATE vs samples-per-ray and
triplane feature width on the bench config, both encodings.

The round-3 roofline (docs/benchmark.md) put the encode fwd+bwd within
~10% of the measured per-row gather floor — the remaining levers are
algorithmic: fewer samples/ray (rays x samples rows gathered) and a
narrower F. This sweep measures what each setting costs in ATE and buys
in fps, on the real chip, one bench subprocess per point (fresh compile
cache per process, so each point pays its own compile; fps is
steady-state so the comparison is fair).

Usage: python tools/perf_levers.py [--quick]
Writes /tmp/perf_levers.json and prints a markdown table.
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

POINTS = [
    # (label, encoding, nsd, nrd, tp_features)
    ("base-43s-F8", "triplane", 32, 11, "8,8"),
    ("32s-F8", "triplane", 24, 8, "8,8"),
    ("24s-F8", "triplane", 17, 7, "8,8"),
    ("43s-F4", "triplane", 32, 11, "4,4"),
    ("32s-F4", "triplane", 24, 8, "4,4"),
    ("hash-43s", "hash", 32, 11, "8,8"),
    ("hash-32s", "hash", 24, 8, "8,8"),
]


def run_point(label, encoding, nsd, nrd, feats, seeds=1):
    env = dict(os.environ)
    env.update({
        "XRDSLAM_BENCH_ENCODING": encoding,
        "XRDSLAM_BENCH_NSD": str(nsd),
        "XRDSLAM_BENCH_NRD": str(nrd),
        "XRDSLAM_BENCH_TP_FEATURES": feats,
        "XRDSLAM_BENCH_SEEDS": str(seeds),
        "XRDSLAM_BENCH_BOTH": "0",
    })
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=2400, env=env)
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    if not line:
        return {"label": label, "error": r.stderr[-500:]}
    d = json.loads(line[-1])
    return {
        "label": label, "encoding": encoding,
        "samples_per_ray": nsd + nrd, "features": feats,
        "fps": d["value"], "ate_cm": d["extra"]["ate_rmse_cm"],
        "group_ms": d["extra"]["group_ms"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="triplane points only")
    ap.add_argument("--seeds", type=int, default=1)
    args = ap.parse_args()
    points = [p for p in POINTS if not args.quick or p[1] == "triplane"]
    results = []
    for p in points:
        print(f"[levers] {p[0]} ...", file=sys.stderr, flush=True)
        res = run_point(*p, seeds=args.seeds)
        results.append(res)
        print(f"[levers] {json.dumps(res)}", file=sys.stderr, flush=True)
        with open("/tmp/perf_levers.json", "w") as f:
            json.dump(results, f, indent=1)
    print("| point | samples/ray | F | fps | ATE cm |")
    print("|---|---|---|---|---|")
    for r in results:
        if "error" in r:
            print(f"| {r['label']} | - | - | ERROR | - |")
        else:
            print(f"| {r['label']} | {r['samples_per_ray']} | {r['features']} "
                  f"| {r['fps']} | {r['ate_cm']} |")


if __name__ == "__main__":
    main()
