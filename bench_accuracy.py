"""Accuracy-parity harness: all five BASELINE algorithms on a
Replica-office0-class synthetic.

The environment has no network (Replica cannot be downloaded — verified in
round 1), so this is the strongest in-env accuracy protocol: a 6 x 4 x 5 m
textured office scene with an ANALYTIC SDF — exact GT depth, exact GT
poses, and an exact GT mesh — driven through the reference's office0
protocol (per-algorithm hyperparameters from slam/configs/input_config.py,
2D metrics every ``render_freq`` frames at the estimated pose, 3D metrics
on the frustum-culled final mesh vs the culled GT mesh; reference eval
surface: scripts/eval.py:17-90).

Per-algorithm gates are derived from the corresponding BASELINE.md rows
(office0 per-scene values where published, 8-scene averages otherwise):

    co-slam     ATE<=1.0  PSNR>=30  dL1<=1.5  Acc<=1.5  Comp<=2.0  Ratio>=92
    nice-slam   ATE<=2.1  PSNR>=22  dL1<=3.5  Acc<=2.5  Comp<=4.0  Ratio>=85
    vox-fusion  ATE<=1.0  PSNR>=24  dL1<=1.5  Acc<=1.8  Comp<=3.0  Ratio>=88
    point-slam  ATE<=1.0  PSNR>=28  dL1<=1.0  Acc<=1.8  Comp<=3.5  Ratio>=86
    splaTAM     ATE<=1.0  PSNR>=28  SSIM>=0.90            (no mesh metrics)

NICE-SLAM / Point-SLAM caveat: their reference decoders are pretrained
checkpoints that exist only as LFS stubs in this environment, so the MLP
decoders here start random (grids/points still train through them); their
rows measure the weight-free protocol.

Usage:
    python bench_accuracy.py                     # all five, 500 frames 600x340
    python bench_accuracy.py --algos co-slam,vox-fusion --frames 200
Writes BENCH_ACCURACY.json (one entry per algorithm) and prints it; exits 0
always (gates are reported, not enforced, so partial regressions stay
visible).
"""
from __future__ import annotations

import argparse
import copy
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

ALGOS = ["co-slam", "nice-slam", "vox-fusion", "point-slam", "splaTAM"]

GATES = {
    "co-slam": {
        "ate_cm": ("<=", 1.0), "psnr": (">=", 30.0), "depth_l1_cm": ("<=", 1.5),
        "accuracy_cm": ("<=", 1.5), "completion_cm": ("<=", 2.0),
        "completion_ratio_pct": (">=", 92.0),
    },
    "nice-slam": {
        "ate_cm": ("<=", 2.1), "psnr": (">=", 22.0), "depth_l1_cm": ("<=", 3.5),
        "accuracy_cm": ("<=", 2.5), "completion_cm": ("<=", 4.0),
        "completion_ratio_pct": (">=", 85.0),
    },
    "vox-fusion": {
        "ate_cm": ("<=", 1.0), "psnr": (">=", 24.0), "depth_l1_cm": ("<=", 1.5),
        "accuracy_cm": ("<=", 1.8), "completion_cm": ("<=", 3.0),
        "completion_ratio_pct": (">=", 88.0),
    },
    "point-slam": {
        "ate_cm": ("<=", 1.0), "psnr": (">=", 28.0), "depth_l1_cm": ("<=", 1.0),
        "accuracy_cm": ("<=", 1.8), "completion_cm": ("<=", 3.5),
        "completion_ratio_pct": (">=", 86.0),
    },
    "splaTAM": {
        "ate_cm": ("<=", 1.0), "psnr": (">=", 28.0), "ssim": (">=", 0.90),
    },
}


def build_coslam(ds, out_dir: str, seed: int = 0):
    from xrdslam_tpu.algorithms.coslam import CoSLAMConfig
    from xrdslam_tpu.common.mesher import MesherConfig
    from xrdslam_tpu.engine.optimizers import AdamOptimizerConfig
    from xrdslam_tpu.models.joint_encoding import JointEncodingConfig
    from xrdslam_tpu.pipeline.slam import MapperConfig, SLAMPipelineConfig, TrackerConfig

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
        tracker=TrackerConfig(map_every=5, render_freq=-1,
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


def build_from_registry(name: str, ds, out_dir: str, seed: int = 0):
    """Reference hyperparameters (registry) with scene-data overrides."""
    from xrdslam_tpu.configs.registry import algorithm_configs

    cfg = copy.deepcopy(algorithm_configs[name]).xrdslam
    cfg.enable_vis = False
    cfg.tracker.render_freq = -1
    cfg.tracker.save_debug_result = False
    cfg.tracker.save_re_render_result = False
    a = cfg.algorithm
    if hasattr(a, "seed"):
        a.seed = seed
    bound = ds.bounds.tolist()
    if name == "nice-slam":
        a.mapping_bound = bound
        a.marching_cubes_bound = bound
        a.max_keyframes = 64
        # Sequence-dynamics scaling (round-4 diagnosis, tools/diag_nice_scale):
        # the registry's tracking/mapping schedule is the reference's
        # office0 config for a 2000-frame traversal; this bench covers the
        # same trajectory in `frames` frames, i.e. ~2000/frames x the
        # inter-frame motion. The reference itself retunes these knobs per
        # dataset; without scaling them NICE-SLAM's 10-iter/200-px tracker
        # under-converges every frame and drifts monotonically
        # (measured: ATE 152 cm at 200 frames; with scaling: see
        # BENCH_ACCURACY.json). Edges halve because the bench renders at
        # half the reference resolution.
        motion = max(2000 // max(len(ds), 1), 1)
        if motion >= 4:
            a.tracking_n_iters = 50
            a.tracking_sample = 1024
            a.optimizers["tracking_pose"]["optimizer"].lr = 3e-3
            a.tracking_Wedge = 50
            a.tracking_Hedge = 50
            cfg.tracker.map_every = 2
            cfg.mapper.keyframe_every = 10
            # in-scan tracking lr decay (round-5): constant-lr Adam leaves
            # lr-scale endpoint jitter in the per-frame pose; decaying the
            # second half of the scan cuts the noise floor
            a.tracking_lr_decay = float(os.environ.get(
                "XRDSLAM_TRACK_LR_DECAY", "0.05"))
    elif name == "vox-fusion":
        # Same sequence-dynamics scaling rationale as nice-slam: the
        # registry schedule assumes office0's 2000-frame inter-frame
        # motion. At motion>=4 the 30-iter tracker under-converges
        # (measured: ATE 3.16 cm at 200 frames) and keyframe_every=50
        # leaves only frames/50 keyframes over the whole trajectory where
        # the reference gets 40 — keep the reference's keyframe *density
        # along the trajectory* and scale tracking effort instead.
        motion = max(2000 // max(len(ds), 1), 1)
        if motion >= 4:
            a.tracking_n_iters = 60
            cfg.mapper.keyframe_every = max(50 // motion, 2)
            a.tracking_lr_decay = float(os.environ.get(
                "XRDSLAM_TRACK_LR_DECAY", "0.05"))
    elif name == "point-slam":
        # Same sequence-dynamics scaling rationale as nice-slam/vox-fusion:
        # the registry schedule is the reference office0 2000-frame config.
        # Edges halve for the half-res render (reference edge 100 at 1200
        # wide would mask half of this 600-wide frame), tracking gets more
        # iterations + in-scan lr decay for the 10x inter-frame motion, and
        # keyframes keep their per-trajectory density.
        motion = max(2000 // max(len(ds), 1), 1)
        if motion >= 4:
            a.tracking_Wedge = 50
            a.tracking_Hedge = 50
            a.tracking_n_iters = 60
            a.tracking_lr_decay = float(os.environ.get(
                "XRDSLAM_TRACK_LR_DECAY", "0.05"))
            cfg.mapper.keyframe_every = 10
    elif name == "splaTAM":
        a.max_keyframes = len(ds) // 5 + 8
        # Sequence-dynamics + wall-clock scaling (round-5): the registry
        # schedule (40 track / 60 map iters, map_every=1) is the reference
        # office0 2000-frame config; the mapping program alone costs
        # 11.3 s/frame at this resolution (measured r5 per-op profile,
        # docs/benchmark.md), so 200 frames ~ 40 min — past any sweep
        # budget. Halving mapping iterations keeps every frame mapped and
        # cuts the steady frame to ~6.5 s; tracking (cheap, 12 ms/iter)
        # keeps its 40 iters and gains the lr-decay endpoint control.
        motion = max(2000 // max(len(ds), 1), 1)
        if motion >= 4:
            a.mapping_n_iters = 30
            a.tracking_lr_decay = float(os.environ.get(
                "XRDSLAM_TRACK_LR_DECAY", "0.05"))
    pipeline = cfg.setup(dataset=ds, out_dir=out_dir, verbose=True)
    # record every knob this bench changed vs the reference registry config
    # inside the result row, so a pass is reproducible from the artifact
    # alone (VERDICT r4 weak #5)
    ov = {"motion_factor_vs_2000f": max(2000 // max(len(ds), 1), 1),
          "max_keyframes": getattr(a, "max_keyframes", None)}
    if name == "nice-slam" and max(2000 // max(len(ds), 1), 1) >= 4:
        ov.update(tracking_n_iters=50, tracking_sample=1024,
                  tracking_pose_lr=3e-3, tracking_edge=50, map_every=2,
                  keyframe_every=10, tracking_lr_decay=a.tracking_lr_decay)
    if name == "vox-fusion" and max(2000 // max(len(ds), 1), 1) >= 4:
        ov.update(tracking_n_iters=a.tracking_n_iters,
                  keyframe_every=cfg.mapper.keyframe_every,
                  tracking_lr_decay=a.tracking_lr_decay)
    if name == "point-slam" and max(2000 // max(len(ds), 1), 1) >= 4:
        ov.update(tracking_edge=50, tracking_n_iters=a.tracking_n_iters,
                  keyframe_every=cfg.mapper.keyframe_every,
                  tracking_lr_decay=a.tracking_lr_decay)
    if name == "splaTAM" and max(2000 // max(len(ds), 1), 1) >= 4:
        ov.update(mapping_n_iters=a.mapping_n_iters,
                  tracking_lr_decay=a.tracking_lr_decay)
    pipeline._bench_overrides = ov
    return pipeline


def steady_stats(frame_times):
    """Steady per-frame seconds: drop warmup, reject compile spikes."""
    t = np.asarray(frame_times[15:] if len(frame_times) > 30 else frame_times)
    med = np.median(t)
    keep = t[t < 4 * med]
    return float(np.mean(keep))


def run_algo(name: str, ds, render_freq: int, seed: int,
             out_dir: str = "", resume: bool = False,
             stop_at: int = 0) -> dict:
    import gc
    import tempfile

    import jax

    from xrdslam_tpu.common import metrics as M
    from xrdslam_tpu.utils.eval_ate import evaluate_ate
    from xrdslam_tpu.utils.eval_recon import calc_3d_metric
    from xrdslam_tpu.utils.mesh_ops import cull_mesh

    out_dir = out_dir or tempfile.mkdtemp(prefix=f"bench_acc_{name}_")
    pipeline = (build_coslam(ds, out_dir, seed) if name == "co-slam"
                else build_from_registry(name, ds, out_dir, seed))
    t0 = time.time()
    pipeline.run(resume=resume, stop_at=stop_at or None)
    slam_s = time.time() - t0
    if stop_at and stop_at < len(ds):
        # segment mode: state checkpointed, metrics deferred to the final
        # segment (run in a fresh process — sidesteps worker-lifetime limits)
        return {"algorithm": name, "partial": True,
                "frames_done": int(stop_at), "wall_s": round(slam_s, 1)}
    algo = pipeline.algorithm

    ate = evaluate_ate(list(np.asarray(ds.poses)), algo.estimate_c2w_list)
    fps = 1.0 / max(steady_stats(pipeline.frame_times), 1e-9)

    # 2D sweep at estimated poses (reference: tracker.py:343-420). In
    # relative-pose mode the map lives in the remapped world, where the
    # estimated pose of frame i reproduces image i — directly comparable.
    sums = {"psnr": 0.0, "ssim": 0.0, "depth_l1": 0.0}
    cnt = 0
    for i in range(0, len(ds), render_freq):
        _, gt_rgb, gt_depth, _ = ds[i]
        color, depth = algo.render_img(np.asarray(algo.estimate_c2w_list[i]),
                                       gt_depth=gt_depth, idx=i)
        mask = gt_depth > 0
        sums["psnr"] += M.psnr(color, gt_rgb, mask)
        sums["ssim"] += M.ssim(color, gt_rgb)
        sums["depth_l1"] += M.depth_l1(depth, gt_depth, mask) * 100.0
        cnt += 1
    twod = {k: v / cnt for k, v in sums.items()}

    result = {
        "algorithm": name,
        "seed": seed,
        "protocol_overrides": getattr(pipeline, "_bench_overrides", {}),
        "ate_cm": round(ate["rmse"] * 100, 3),
        "psnr": round(twod["psnr"], 2),
        "ssim": round(twod["ssim"], 4),
        "depth_l1_cm": round(twod["depth_l1"], 3),
        "steady_fps": round(fps, 3),
        # wall fps counts EVERYTHING (compiles, window-variant recompiles,
        # meshing stalls) — at protocol scale those are the run, so report
        # it alongside the compile-spike-rejected steady number
        "wall_fps": round(len(ds) / max(slam_s, 1e-9), 3),
        "slam_wall_s": round(slam_s, 1),
    }

    # 3D metrics: culled rec mesh vs culled GT mesh (algorithms with a mesh)
    mesh = None
    try:
        t0 = time.time()
        mesh = algo.get_mesh()
    except NotImplementedError:
        mesh = None
    if mesh is not None:
        # relative-pose runs build the map in a remapped world; bring the
        # mesh back with the exact (rigid) remap inverse before comparing
        if pipeline._first_pose_old is not None:
            T = pipeline._first_pose_old @ np.linalg.inv(pipeline._first_pose_new)
            mesh = mesh.copy()
            mesh.apply_transform(T)
            est_orig = [T @ np.asarray(p) for p in algo.estimate_c2w_list]
        else:
            est_orig = algo.estimate_c2w_list
        rec = cull_mesh(ds, mesh, estimate_c2w_list=est_orig, eval_rec=True)
        gt_mesh = cull_mesh(ds, ds.gt_mesh(voxel=0.02))
        m3 = calc_3d_metric(rec, gt_mesh)
        print(f"[acc] {name} meshing+3D metrics in {time.time()-t0:.0f}s", file=sys.stderr)
        result.update({
            "accuracy_cm": round(m3["accuracy_cm"], 3),
            "completion_cm": round(m3["completion_cm"], 3),
            "completion_ratio_pct": round(m3["completion_ratio_pct"], 2),
            "precision_pct": round(m3["precision_pct"], 2),
            "recall_pct": round(m3["recall_pct"], 2),
            "f1_pct": round(m3["f1_pct"], 2),
        })

    gates = {}
    for k, (op, thr) in GATES[name].items():
        v = result.get(k)
        gates[k] = (bool(v <= thr) if op == "<=" else bool(v >= thr)) if v is not None else False
    result["gates"] = gates
    result["all_pass"] = all(gates.values())

    del pipeline, algo
    gc.collect()
    return result


def _make_dataset(args):
    from xrdslam_tpu.common.synthetic import SyntheticDataset

    ds = SyntheticDataset(n_frames=args.frames, height=args.height,
                          width=args.width, scene="office")
    if args.cache and os.path.exists(args.cache):
        t0 = time.time()
        ds.load_cache(args.cache)
        print(f"[acc] loaded GT cache in {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    else:
        t0 = time.time()
        ds.prerender(batch=8, verbose=True)
        print(f"[acc] rendered GT sequence in {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
        if args.cache:
            ds.save_cache(args.cache)
    return ds


def _wait_device_ready(max_wait_s: int = 600) -> None:
    """Block until the accelerator accepts work again. A kernel fault in one
    algorithm's subprocess kills the TPU worker; it restarts after a while,
    but subprocesses launched in the gap die at client init (observed: the
    whole round-3 sweep cascading UNAVAILABLE after one crash)."""
    probe = ("import jax, jax.numpy as jnp; "
             "assert int(jnp.asarray(1) + 1) == 2")
    t0 = time.time()
    delay = 5.0
    while True:
        # probe needs its own timeout: when the worker is down, the axon
        # sitecustomize register() blocks interpreter start in a
        # connect-retry sleep, so the probe hangs rather than erroring
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=180)
        except subprocess.TimeoutExpired:
            r = None
        if r is not None and r.returncode == 0:
            return
        if time.time() - t0 > max_wait_s:
            print(f"[acc] device still unavailable after {max_wait_s}s; "
                  "continuing anyway", file=sys.stderr, flush=True)
            return
        print(f"[acc] device unavailable, retrying in {delay:.0f}s",
              file=sys.stderr, flush=True)
        time.sleep(delay)
        delay = min(delay * 2, 60.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--algos", type=str, default=",".join(ALGOS))
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--height", type=int, default=340)
    ap.add_argument("--width", type=int, default=600)
    ap.add_argument("--full", action="store_true",
                    help="office0 protocol scale: 2000 frames at 1200x680")
    ap.add_argument("--render-freq", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="BENCH_ACCURACY.json")
    ap.add_argument("--cache", type=str, default="",
                    help="npz GT-frame cache path (created if missing)")
    ap.add_argument("--single", type=str, default="",
                    help="internal: run ONE algorithm in-process, write JSON to --out")
    ap.add_argument("--render-only", action="store_true",
                    help="internal: render the GT sequence into --cache and exit")
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-algorithm subprocess timeout (s)")
    ap.add_argument("--out-dir", type=str, default="",
                    help="internal: persistent run dir (segmented runs)")
    ap.add_argument("--resume", action="store_true",
                    help="internal: resume from out-dir checkpoint")
    ap.add_argument("--stop-at", type=int, default=0,
                    help="internal: checkpoint+exit after this frame")
    ap.add_argument("--segment", type=int, default=0,
                    help="run algorithms in --segment-algos as N-frame "
                         "checkpointed subprocess segments (TPU-worker "
                         "crash mitigation for heavy long runs)")
    ap.add_argument("--segment-algos", type=str, default="nice-slam")
    ap.add_argument("--merge", action="store_true",
                    help="keep existing --out entries for algorithms not in "
                         "this sweep (incremental sessions)")
    args = ap.parse_args()
    if args.full:
        args.frames, args.height, args.width = 2000, 680, 1200

    if args.render_only:
        _make_dataset(args)
        return

    if args.single:
        # child mode: one algorithm, crash-isolated from the sweep
        import jax

        print(f"[acc] device {jax.devices()[0]}, {args.frames} frames "
              f"{args.width}x{args.height}", file=sys.stderr)
        ds = _make_dataset(args)
        res = run_algo(args.single, ds, args.render_freq, args.seed,
                       out_dir=args.out_dir, resume=args.resume,
                       stop_at=args.stop_at)
        with open(args.out, "w") as f:
            json.dump(res, f)
        print(json.dumps(res))
        return

    # parent: never imports jax (the TPU client must belong to exactly one
    # process at a time). GT render runs in its own subprocess, then one
    # subprocess per algorithm so a TPU-worker crash or OOM in one
    # algorithm cannot take down the sweep.
    cache = args.cache or os.path.join(
        tempfile.gettempdir(), f"acc_cache_{args.frames}_{args.width}x{args.height}.npz")
    if not os.path.exists(cache):
        subprocess.run([sys.executable, os.path.abspath(__file__), "--render-only",
                        "--frames", str(args.frames), "--height", str(args.height),
                        "--width", str(args.width), "--cache", cache], check=True)

    # merge mode: keep entries from an existing out file for algorithms not
    # re-run in this sweep (lets a short session extend prior results
    # instead of clobbering them). Round-2 files were a bare co-slam dict;
    # normalize those into the per-algorithm list format.
    prior = {}
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            old = json.load(f)
        entries = old.get("algorithms", [old] if "ate_cm" in old else [])
        for e in entries:
            e.setdefault("algorithm",
                         "co-slam" if "coslam" in e.get("metric", "") else "?")
            prior[e["algorithm"]] = e

    results = []
    sweep_names = [s.strip() for s in args.algos.split(",") if s.strip()]

    def flush(partial: bool) -> None:
        merged = list(results)
        have = {r.get("algorithm") for r in merged}
        merged += [e for n, e in prior.items() if n not in have]
        out = {
            "metric": "accuracy_office_synthetic_per_algorithm",
            "frames": args.frames,
            "resolution": f"{args.width}x{args.height}",
            "partial": partial,
            "algorithms": merged,
            "n_pass": sum(1 for r in merged if r.get("all_pass")),
            "n_total": len(merged),
        }
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=2)
        os.replace(tmp, args.out)
        if not partial:
            print(json.dumps(out))

    seg_algos = {s.strip() for s in args.segment_algos.split(",") if s.strip()}
    for name in sweep_names:
        print(f"[acc] === {name} ===", file=sys.stderr, flush=True)
        base_cmd = [sys.executable, os.path.abspath(__file__), "--single", name,
                    "--frames", str(args.frames), "--height", str(args.height),
                    "--width", str(args.width), "--render-freq", str(args.render_freq),
                    "--seed", str(args.seed), "--cache", cache]
        out_json = os.path.join(tempfile.gettempdir(), f"acc_{name}_{os.getpid()}.json")

        def run_child(extra_args, timeout):
            _wait_device_ready()
            if os.path.exists(out_json):
                os.remove(out_json)
            # child stderr goes to a file so crash tracebacks land in the
            # JSON error entry (round-3 lesson: "exited 1 without a result"
            # hid a TPU kernel fault the driver never saw)
            err_path = out_json + ".stderr"

            def err_tail(n=15):
                try:
                    with open(err_path, errors="replace") as f:
                        lines = f.readlines()
                    sys.stderr.writelines(lines[-40:])
                    return "".join(lines[-n:])[-4000:]
                except OSError:
                    return ""

            try:
                with open(err_path, "w") as ef:
                    proc = subprocess.run(base_cmd + ["--out", out_json] + extra_args,
                                          timeout=timeout, stderr=ef)
            except subprocess.TimeoutExpired:
                return {"algorithm": name, "all_pass": False,
                        "error": f"timeout after {timeout}s",
                        "stderr_tail": err_tail()}
            if os.path.exists(out_json):
                err_tail(0)
                with open(out_json) as f:
                    return json.load(f)
            return {"algorithm": name, "all_pass": False,
                    "error": f"subprocess exited {proc.returncode} without a result",
                    "stderr_tail": err_tail()}

        if args.segment > 0 and name in seg_algos:
            # checkpointed segments, each in a fresh process: a TPU-worker
            # crash mid-segment loses at most one segment, and the next
            # attempt resumes from the last boundary checkpoint
            run_dir = tempfile.mkdtemp(prefix=f"bench_acc_seg_{name}_")
            boundaries = list(range(args.segment, args.frames, args.segment)) + [args.frames]
            wall = 0.0
            res = None
            b_idx = 0
            retries = 0
            while b_idx < len(boundaries):
                b = boundaries[b_idx]
                seg_args = ["--out-dir", run_dir]
                if b_idx > 0 or retries > 0:
                    seg_args.append("--resume")
                if b < args.frames:
                    seg_args += ["--stop-at", str(b)]
                print(f"[acc] {name} segment -> frame {b} "
                      f"(attempt {retries + 1})", file=sys.stderr, flush=True)
                res = run_child(seg_args, args.timeout)
                if "error" in res:
                    retries += 1
                    if retries > 2:
                        break
                    continue  # resume from last boundary checkpoint
                retries = 0
                wall += res.get("wall_s", res.get("slam_wall_s", 0.0))
                b_idx += 1
            if res is not None and "error" not in res:
                res["slam_wall_s"] = round(wall, 1)
                res["wall_fps"] = round(args.frames / max(wall, 1e-9), 3)
                res["segments"] = len(boundaries)
        else:
            res = run_child([], args.timeout)
        print(f"[acc] {name}: {json.dumps(res)}", file=sys.stderr, flush=True)
        results.append(res)
        flush(partial=True)   # incremental: each finished algorithm lands
    flush(partial=False)


if __name__ == "__main__":
    main()
