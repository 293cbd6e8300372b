"""Instrumented NICE-SLAM protocol repro (round-5: frame-103 collapse).

The committed 200-frame 600x340 sweep row shows per-frame pose error stable
at ~5 cm through frame 102 and diverging from frame 103 (no motion spike in
the GT trajectory there; 13 non-finite-pose clamps fired). This tool
reproduces the exact bench protocol (registry config + bench_accuracy's
sequence-dynamics overrides) at reduced resolution on CPU and probes, every
`--segment` frames:

  * per-frame translation error of the newest frames
  * finiteness of every model param tree leaf (are the grids being poisoned?)
  * depth-L1 / PSNR rendered from the CURRENT map at the GT pose of the
    newest frame (map-quality decay vs tracking loss separation)
  * cumulative non-finite-pose clamp count

Usage:
    JAX_PLATFORMS=cpu python tools/diag_nice_200.py --frames 200 \
        --height 170 --width 300 --segment 10
Writes /tmp/diag_nice_200.json.
"""
import argparse
import copy
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor JAX_PLATFORMS=cpu even though the axon TPU plugin registers itself
# regardless (same workaround as tests/conftest.py) — this tool must be able
# to run while the real chip is busy with a sweep
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax

    if jax.default_backend() != "cpu":
        jax.config.update("jax_default_device", jax.devices("cpu")[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--height", type=int, default=170)
    ap.add_argument("--width", type=int, default=300)
    ap.add_argument("--segment", type=int, default=10)
    ap.add_argument("--probe-res", type=int, default=4,
                    help="render probe downsample (stride over pixels)")
    ap.add_argument("--track-lr", type=float, default=0.0)
    ap.add_argument("--track-iters", type=int, default=0)
    ap.add_argument("--map-iters", type=int, default=0)
    ap.add_argument("--no-coarse", action="store_true")
    ap.add_argument("--no-pose-opt", action="store_true",
                    help="disable mapping pose optimization (kf_count gate)")
    ap.add_argument("--out", default="/tmp/diag_nice_200.json")
    args = ap.parse_args()

    import jax

    from xrdslam_tpu.common import metrics as M
    from xrdslam_tpu.common.synthetic import SyntheticDataset
    from xrdslam_tpu.configs.registry import algorithm_configs

    ds = SyntheticDataset(n_frames=args.frames, height=args.height,
                          width=args.width, scene="office")
    cache = f"/tmp/acc_cache_{args.frames}_{args.width}x{args.height}.npz"
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
    # bench_accuracy sequence-dynamics overrides (bench_accuracy.py:140-148),
    # edges scaled to this resolution (bench uses 50 at 600 wide)
    a.tracking_n_iters = args.track_iters or 50
    a.tracking_sample = 1024
    a.optimizers["tracking_pose"]["optimizer"].lr = args.track_lr or 3e-3
    a.tracking_Wedge = max(int(50 * args.width / 600), 2)
    a.tracking_Hedge = max(int(50 * args.width / 600), 2)
    a.tracking_lr_decay = float(os.environ.get("XRDSLAM_TRACK_LR_DECAY", "0.05"))
    cfg.tracker.map_every = 2
    cfg.mapper.keyframe_every = 10
    if args.map_iters:
        a.mapping_n_iters = args.map_iters
    if args.no_coarse:
        a.coarse = False
    out_dir = "/tmp/diag_nice_200_out"
    os.makedirs(out_dir, exist_ok=True)
    ckpt = os.path.join(out_dir, "checkpoint.pkl")
    if os.path.exists(ckpt):
        os.remove(ckpt)
    pipeline = cfg.setup(dataset=ds, out_dir=out_dir, verbose=False)
    algo = pipeline.algorithm
    if args.no_pose_opt:
        # kf_count>4 gates optimize_pose in both map paths; force it off by
        # monkey-patching the predicate source (cheap, diagnostic-only)
        algo.config.optimizers["mapping_pose"]["optimizer"].lr = 0.0

    gt = [np.asarray(p) for p in ds.poses]
    probes = []
    t0 = time.time()
    for stop in range(args.segment, args.frames + args.segment, args.segment):
        stop = min(stop, args.frames)
        pipeline.run(resume=stop > args.segment, stop_at=stop if stop < args.frames else None)
        est = [np.asarray(p) for p in algo.estimate_c2w_list]
        errs = [float(np.linalg.norm(e[:3, 3] - g[:3, 3]) * 100)
                for e, g in zip(est, gt)]
        finite = all(bool(np.all(np.isfinite(np.asarray(x))))
                     for x in jax.tree_util.tree_leaves(algo.model_params))
        # map-quality probe: render at the GT pose of the newest frame on a
        # pixel-strided sub-camera (cheap CPU render)
        i = len(est) - 1
        _, gt_rgb, gt_depth, _ = ds[i]
        color, depth = algo.render_img(gt[i], gt_depth=gt_depth, idx=i)
        mask = gt_depth > 0
        dl1 = float(M.depth_l1(depth, gt_depth, mask) * 100)
        ps = float(M.psnr(color, gt_rgb, mask))
        row = {
            "frame": i,
            "err_cm": round(errs[i], 2),
            "max_err_seg_cm": round(max(errs[max(0, i - args.segment + 1):]), 2),
            "depth_l1_at_gt_cm": round(dl1, 2),
            "psnr_at_gt": round(ps, 2),
            "params_finite": finite,
            "clamps": int(getattr(algo, "_clamped_poses", 0)),
            "kf_count": int(algo.kf_count),
            "wall_s": round(time.time() - t0, 1),
        }
        probes.append(row)
        print("[probe]", json.dumps(row), flush=True)
        if stop >= args.frames:
            break

    errs_all = [float(np.linalg.norm(np.asarray(e)[:3, 3] - g[:3, 3]) * 100)
                for e, g in zip(algo.estimate_c2w_list, gt)]
    out = {"frames": args.frames, "height": args.height, "width": args.width,
           "probes": probes, "per_frame_err_cm": [round(v, 2) for v in errs_all]}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
