"""Diagnose NICE-SLAM tracking on the office synthetic: per-frame ATE trace.

Runs the registry nice-slam config through the real pipeline on a
low/mid-res office sequence and prints per-frame translation error of the
estimate vs GT (both relative-pose aligned), to localize where tracking
diverges (round-3 sweep showed ATE 90 cm at 60 frames 600x340).
"""
import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--height", type=int, default=340)
    ap.add_argument("--width", type=int, default=600)
    ap.add_argument("--cache", type=str, default="")
    ap.add_argument("--algo", type=str, default="nice-slam")
    args = ap.parse_args()

    import copy
    import os
    import tempfile

    from xrdslam_tpu.common.synthetic import SyntheticDataset
    from xrdslam_tpu.configs.registry import algorithm_configs

    ds = SyntheticDataset(n_frames=args.frames, height=args.height,
                          width=args.width, scene="office")
    if args.cache and os.path.exists(args.cache):
        ds.load_cache(args.cache)
    else:
        t0 = time.time()
        ds.prerender(batch=8, verbose=True)
        print(f"[diag] rendered in {time.time()-t0:.0f}s", file=sys.stderr)
        if args.cache:
            ds.save_cache(args.cache)

    cfg = copy.deepcopy(algorithm_configs[args.algo]).xrdslam
    cfg.enable_vis = False
    cfg.tracker.render_freq = -1
    cfg.tracker.save_debug_result = False
    cfg.tracker.save_re_render_result = False
    a = cfg.algorithm
    bound = ds.bounds.tolist()
    if args.algo == "nice-slam":
        a.mapping_bound = bound
        a.marching_cubes_bound = bound
        a.max_keyframes = 64
    out_dir = tempfile.mkdtemp(prefix=f"diag_{args.algo}_")
    pipeline = cfg.setup(dataset=ds, out_dir=out_dir, verbose=False)

    t0 = time.time()
    pipeline.run()
    print(f"[diag] slam in {time.time()-t0:.0f}s", file=sys.stderr)

    algo = pipeline.algorithm
    est = [np.asarray(p) for p in algo.estimate_c2w_list]
    gt = [np.asarray(p) for p in ds.poses]
    # relative-pose mode: remap GT the same way the pipeline remapped inputs
    if pipeline._first_pose_old is not None:
        T = pipeline._first_pose_new @ np.linalg.inv(pipeline._first_pose_old)
        gt = [T @ g for g in gt]
    for i, (e, g) in enumerate(zip(est, gt)):
        dt = np.linalg.norm(e[:3, 3] - g[:3, 3]) * 100
        dr = np.degrees(np.arccos(np.clip((np.trace(e[:3, :3].T @ g[:3, :3]) - 1) / 2, -1, 1)))
        print(f"frame {i:3d}  dt {dt:7.2f} cm  dR {dr:6.2f} deg")

    from xrdslam_tpu.utils.eval_ate import evaluate_ate
    ate = evaluate_ate(list(np.asarray(ds.poses)), algo.estimate_c2w_list)
    print(f"ATE rmse {ate['rmse']*100:.2f} cm")


if __name__ == "__main__":
    main()
