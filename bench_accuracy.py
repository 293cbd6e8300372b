"""Accuracy-parity harness: Co-SLAM on a Replica-office0-class synthetic.

The environment has no network (Replica cannot be downloaded — verified in
round 1), so this is the strongest in-env accuracy protocol: a 6 x 4 x 5 m
textured office scene with an ANALYTIC SDF — exact GT depth, exact GT
poses, and an exact GT mesh — driven through the reference's office0
protocol (co-slam hyperparameters from input_config.py:203-295, 2D metrics
every ``render_freq`` frames at the estimated pose, 3D metrics on the
frustum-culled final mesh vs the culled GT mesh; reference eval surface:
scripts/eval.py:17-90).

Gates (vs BASELINE.md Co-SLAM_X office0: ATE 0.64 cm / PSNR 34.11 /
depth-L1 1.26 cm / Acc 1.33 / Comp 1.65 / Ratio 94.75):
    ATE <= 1.0 cm, PSNR >= 30 dB, depth-L1 <= 1.5 cm,
    Acc <= 1.5 cm, Comp <= 2.0 cm, Comp-ratio >= 92 %.

Usage:
    python bench_accuracy.py                  # 500 frames at 600x340
    python bench_accuracy.py --full           # 2000 frames at 1200x680
    python bench_accuracy.py --frames N --height H --width W
Prints one JSON line with every metric + pass flags; exits 0 always
(gates are reported, not enforced, so partial regressions stay visible).
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

GATES = {
    "ate_cm": ("<=", 1.0),
    "psnr": (">=", 30.0),
    "depth_l1_cm": ("<=", 1.5),
    "accuracy_cm": ("<=", 1.5),
    "completion_cm": ("<=", 2.0),
    "completion_ratio_pct": (">=", 92.0),
}


def build(ds, out_dir: str, render_freq: int, seed: int = 0):
    from xrdslam_tpu.algorithms.coslam import CoSLAMConfig
    from xrdslam_tpu.common.mesher import MesherConfig
    from xrdslam_tpu.engine.optimizers import AdamOptimizerConfig
    from xrdslam_tpu.pipeline.slam import MapperConfig, SLAMPipelineConfig, TrackerConfig
    from xrdslam_tpu.models.joint_encoding import JointEncodingConfig

    bound = ds.bounds.tolist()
    opts = {
        "decoder": {"optimizer": AdamOptimizerConfig(lr=1e-2, weight_decay=1e-6, betas=(0.9, 0.99)), "scheduler": None},
        "embed_fn": {"optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15, betas=(0.9, 0.99)), "scheduler": None},
        "tracking_pose_r": {"optimizer": AdamOptimizerConfig(lr=1e-3), "scheduler": None},
        "tracking_pose_t": {"optimizer": AdamOptimizerConfig(lr=1e-3), "scheduler": None},
        "mapping_pose_r": {"optimizer": AdamOptimizerConfig(lr=1e-3, accum_step=5), "scheduler": None},
        "mapping_pose_t": {"optimizer": AdamOptimizerConfig(lr=1e-3, accum_step=5), "scheduler": None},
    }
    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=5, render_freq=render_freq,
                              save_re_render_result=False, save_debug_result=False),
        mapper=MapperConfig(keyframe_every=5),
        algorithm=CoSLAMConfig(
            seed=seed,
            separate_LR=True, rot_rep="axis_angle",
            tracking_n_iters=10, mapping_n_iters=10, mapping_first_n_iters=200,
            mapping_sample=2048, tracking_sample=1024, min_sample_pixels=100,
            tracking_Wedge=20, tracking_Hedge=20,
            mapping_bound=bound, marching_cubes_bound=bound,
            max_keyframes=len(ds) // 5 + 2,
            ray_batch_size=30000,
            mesher=MesherConfig(resolution=256),
            model=JointEncodingConfig(encoding="triplane"),
            optimizers=opts,
        ),
    )
    return cfg.setup(dataset=ds, out_dir=out_dir, verbose=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--height", type=int, default=340)
    ap.add_argument("--width", type=int, default=600)
    ap.add_argument("--full", action="store_true",
                    help="office0 protocol scale: 2000 frames at 1200x680")
    ap.add_argument("--render-freq", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if args.full:
        args.frames, args.height, args.width = 2000, 680, 1200

    import jax

    from xrdslam_tpu.common import metrics as M
    from xrdslam_tpu.common.synthetic import SyntheticDataset
    from xrdslam_tpu.utils.eval_ate import evaluate_ate
    from xrdslam_tpu.utils.eval_recon import calc_3d_metric
    from xrdslam_tpu.utils.mesh_ops import cull_mesh

    print(f"[acc] device {jax.devices()[0]}, {args.frames} frames "
          f"{args.width}x{args.height}", file=sys.stderr)
    ds = SyntheticDataset(n_frames=args.frames, height=args.height,
                          width=args.width, scene="office")
    t0 = time.time()
    ds.prerender(batch=8, verbose=True)
    print(f"[acc] rendered GT sequence in {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    import tempfile

    out_dir = tempfile.mkdtemp(prefix="bench_acc_")
    pipeline = build(ds, out_dir, args.render_freq, seed=args.seed)
    t0 = time.time()
    pipeline.run()
    slam_s = time.time() - t0
    algo = pipeline.algorithm

    ate = evaluate_ate(list(np.asarray(ds.poses)), algo.estimate_c2w_list)

    # 2D sweep at estimated poses (reference: tracker.py:343-420)
    sums = {"psnr": 0.0, "ssim": 0.0, "depth_l1": 0.0}
    cnt = 0
    for i in range(0, len(ds), args.render_freq):
        _, gt_rgb, gt_depth, _ = ds[i]
        color, depth = algo.render_img(np.asarray(algo.estimate_c2w_list[i]),
                                       gt_depth=gt_depth, idx=i)
        mask = gt_depth > 0
        sums["psnr"] += M.psnr(color, gt_rgb, mask)
        sums["ssim"] += M.ssim(color, gt_rgb)
        sums["depth_l1"] += M.depth_l1(depth, gt_depth, mask) * 100.0
        cnt += 1
    twod = {k: v / cnt for k, v in sums.items()}

    # 3D metrics: culled rec mesh vs culled GT mesh
    t0 = time.time()
    mesh = algo.get_mesh()
    rec = cull_mesh(ds, mesh, estimate_c2w_list=algo.estimate_c2w_list, eval_rec=True)
    gt_mesh = cull_mesh(ds, ds.gt_mesh(voxel=0.02))
    m3 = calc_3d_metric(rec, gt_mesh)
    print(f"[acc] meshing+3D metrics in {time.time()-t0:.0f}s", file=sys.stderr)

    result = {
        "metric": "coslam_accuracy_office_synthetic",
        "frames": args.frames,
        "resolution": f"{args.width}x{args.height}",
        "seed": args.seed,
        "ate_cm": round(ate["rmse"] * 100, 3),
        "psnr": round(twod["psnr"], 2),
        "ssim": round(twod["ssim"], 4),
        "depth_l1_cm": round(twod["depth_l1"], 3),
        "accuracy_cm": round(m3["accuracy_cm"], 3),
        "completion_cm": round(m3["completion_cm"], 3),
        "completion_ratio_pct": round(m3["completion_ratio_pct"], 2),
        "precision_pct": round(m3["precision_pct"], 2),
        "recall_pct": round(m3["recall_pct"], 2),
        "f1_pct": round(m3["f1_pct"], 2),
        "slam_wall_s": round(slam_s, 1),
    }
    gates = {}
    for k, (op, thr) in GATES.items():
        v = result[k]
        gates[k] = bool(v <= thr) if op == "<=" else bool(v >= thr)
    result["gates"] = gates
    result["all_pass"] = all(gates.values())
    print(json.dumps(result))


if __name__ == "__main__":
    main()
