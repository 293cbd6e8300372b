"""Chase the bench ATE seed outlier (VERDICT r3/r4: seed 2 -> 3.28 cm vs
~2.1 cm for seeds 0/1, two rounds running).

Runs the exact bench.py Co-SLAM config for N seeds and records the
PER-FRAME translation error of the estimated trajectory (after the same
Horn alignment eval_ate uses), so one run shows both the 5-seed spread
and WHERE an outlier seed diverges (a single high-motion frame whose
10-iter track under-converges, vs diffuse drift).

Usage: python tools/diag_seed.py [--seeds 5] [--encoding triplane]
Writes /tmp/diag_seed.json and prints a per-seed summary.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def per_frame_err(gt_list, est_list):
    """Aligned per-frame translation error in cm (Horn, same as eval_ate)."""
    from xrdslam_tpu.utils.eval_ate import horn_align

    gt = np.stack([np.asarray(p)[:3, 3] for p in gt_list], 1)
    est = np.stack([np.asarray(p)[:3, 3] for p in est_list], 1)
    rot, trans, s = horn_align(est, gt)
    aligned = s * (rot @ est) + trans
    return np.linalg.norm(aligned - gt, axis=0) * 100.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--encoding", type=str, default="triplane")
    ap.add_argument("--decay", type=float, default=None,
                    help="set XRDSLAM_TRACK_LR_DECAY for this sweep (tests "
                         "the endpoint-jitter hypothesis for the seed-2 "
                         "outlier)")
    ap.add_argument("--out", type=str, default="/tmp/diag_seed.json")
    args = ap.parse_args()
    if args.decay is not None:
        os.environ["XRDSLAM_TRACK_LR_DECAY"] = str(args.decay)

    import bench

    from xrdslam_tpu.common.synthetic import SyntheticDataset

    ds = SyntheticDataset(n_frames=bench.N_FRAMES, height=bench.H,
                          width=bench.W)
    ds.prerender(batch=8, verbose=False)

    out = []
    for s in range(args.seeds):
        import tempfile

        pipe = bench.build_pipeline(args.encoding, ds,
                                    tempfile.mkdtemp(), seed=s)
        pipe.run()
        algo = pipe.algorithm
        errs = per_frame_err(list(np.asarray(ds.poses)),
                             algo.estimate_c2w_list)
        rmse = float(np.sqrt(np.mean(errs ** 2)))
        worst = int(np.argmax(errs))
        print(f"[seed {s}] ATE {rmse:.3f} cm  max {errs.max():.3f} cm "
              f"@frame {worst}  per-frame: "
              + " ".join(f"{e:.1f}" for e in errs), file=sys.stderr)
        out.append({"seed": s, "ate_cm": round(rmse, 3),
                    "max_err_cm": round(float(errs.max()), 3),
                    "worst_frame": worst,
                    "per_frame_cm": [round(float(e), 2) for e in errs]})
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    ates = [o["ate_cm"] for o in out]
    print(json.dumps({"decay": args.decay, "ates": ates,
                      "mean": round(float(np.mean(ates)), 3),
                      "std": round(float(np.std(ates)), 3)}))


if __name__ == "__main__":
    main()
