"""NICE-SLAM office0-protocol-scale diagnosis (VERDICT r3 item #2).

Runs nice-slam exactly as bench_accuracy does (registry hyperparameters,
synthetic office scene) for N frames, then separates the failure modes the
20.6 cm ATE could hide:

  1. per-frame pose error trajectory (drift vs jumps; printed every frame)
  2. tracking-only ablation: per-frame error with GT-pose mapping disabled
     is not run here, but the per-frame curve + map renders localize it
  3. map quality at GT poses (depth-L1 rendered from the ESTIMATED map at
     the GT camera): bad even at gt pose => the map is junk independent of
     tracking; good => tracking drift is the driver

Usage:  python tools/diag_nice_scale.py [frames] [--no-super]
            [--track-iters N] [--track-sample N] [--track-lr F]
            [--hedge N] [--map-iters N]
Writes /tmp/diag_nice_scale.json with the curves.
"""
import argparse
import copy
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("frames", type=int, nargs="?", default=200)
    ap.add_argument("--no-super", action="store_true")
    ap.add_argument("--track-iters", type=int, default=0)
    ap.add_argument("--track-sample", type=int, default=0)
    ap.add_argument("--track-lr", type=float, default=0.0)
    ap.add_argument("--hedge", type=int, default=-1)
    ap.add_argument("--map-iters", type=int, default=0)
    ap.add_argument("--map-every", type=int, default=0)
    ap.add_argument("--kf-every", type=int, default=0)
    args = ap.parse_args()
    frames = args.frames
    if args.no_super:
        os.environ["XRDSLAM_DISABLE_SUPER"] = "1"

    from xrdslam_tpu.common.synthetic import SyntheticDataset
    from xrdslam_tpu.configs.registry import algorithm_configs
    from xrdslam_tpu.utils.eval_ate import evaluate_ate

    ds = SyntheticDataset(n_frames=frames, height=340, width=600, scene="office")
    cache = f"/tmp/acc_cache_{frames}_600x340.npz"
    if os.path.exists(cache):
        ds.load_cache(cache)
    else:
        ds.prerender(batch=8, verbose=True)
        ds.save_cache(cache)

    cfg = copy.deepcopy(algorithm_configs["nice-slam"]).xrdslam
    cfg.enable_vis = False
    cfg.tracker.render_freq = -1
    cfg.tracker.save_debug_result = False
    cfg.tracker.save_re_render_result = False
    a = cfg.algorithm
    bound = ds.bounds.tolist()
    a.mapping_bound = bound
    a.marching_cubes_bound = bound
    a.max_keyframes = 64
    if args.track_iters:
        a.tracking_n_iters = args.track_iters
    if args.track_sample:
        a.tracking_sample = args.track_sample
    if args.track_lr:
        a.optimizers["tracking_pose"]["optimizer"].lr = args.track_lr
    if args.hedge >= 0:
        a.tracking_Hedge = args.hedge
        a.tracking_Wedge = args.hedge
    if args.map_iters:
        a.mapping_n_iters = args.map_iters
    if args.map_every:
        cfg.tracker.map_every = args.map_every
    if args.kf_every:
        cfg.mapper.keyframe_every = args.kf_every
    print(f"[diag] track iters={a.tracking_n_iters} sample={a.tracking_sample} "
          f"lr={a.optimizers['tracking_pose']['optimizer'].lr} "
          f"hedge={a.tracking_Hedge} map_iters={a.mapping_n_iters}", flush=True)
    out_dir = "/tmp/diag_nice_scale_out"
    pipeline = cfg.setup(dataset=ds, out_dir=out_dir, verbose=True)

    t0 = time.time()
    pipeline.run()
    wall = time.time() - t0
    algo = pipeline.algorithm

    gt = [np.asarray(p) for p in ds.poses]
    est = [np.asarray(p) for p in algo.estimate_c2w_list]

    # per-frame raw translation error (no alignment; first poses coincide)
    per_frame = [float(np.linalg.norm(e[:3, 3] - g[:3, 3]) * 100) for e, g in zip(est, gt)]
    ate = evaluate_ate(gt, est)

    print("\n=== per-frame translation error (cm) ===")
    for i in range(0, len(per_frame), 5):
        print(f"  f{i:4d}: {per_frame[i]:8.2f}")
    print(f"ATE rmse {ate['rmse']*100:.2f} cm   wall {wall:.0f}s")

    # map quality at GT poses: render depth from the estimated map AT the
    # GT camera. If this is bad everywhere, the map is junk regardless of
    # tracking. Sample a few frames across the run.
    from xrdslam_tpu.common import metrics as M

    probes = []
    for i in range(0, frames, max(frames // 8, 1)):
        _, gt_rgb, gt_depth, _ = ds[i]
        color, depth = algo.render_img(gt[i], gt_depth=gt_depth, idx=i)
        mask = gt_depth > 0
        probes.append({
            "frame": i,
            "depth_l1_cm_at_gt_pose": round(M.depth_l1(depth, gt_depth, mask) * 100, 2),
            "psnr_at_gt_pose": round(M.psnr(color, gt_rgb, mask), 2),
            "pose_err_cm": round(per_frame[i], 2),
        })
        print(probes[-1])

    out = {
        "frames": frames,
        "ate_cm": round(ate["rmse"] * 100, 3),
        "wall_s": round(wall, 1),
        "per_frame_err_cm": [round(v, 3) for v in per_frame],
        "probes": probes,
        "kf_count": int(algo.kf_count),
    }
    with open("/tmp/diag_nice_scale.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote /tmp/diag_nice_scale.json")


if __name__ == "__main__":
    main()
