"""Benchmark: Co-SLAM tracking+mapping FPS on a Replica-office0-scale scene.

Runs the full SLAM loop (tracking 10x1024-ray iters/frame, mapping
10x(2048 kf + cur) ray iters every 5 frames, per the reference's co-slam
config — input_config.py:203-295) on a synthetic office-scale RGB-D
sequence at Replica downsample_factor=2 resolution (600x340), on the
default JAX device (the real TPU chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
per-program wall times, model-FLOPs utilization, and the hash-encoding
parity path's fps in "extra".

vs_baseline: the reference publishes no FPS (SURVEY.md §6). Baseline is
REF_FPS=5.0 — the original Co-SLAM paper's reported ~5 Hz tracking on an
RTX 3090; XRDSLAM's manager-IPC pipeline is slower than that, so this is a
conservative (reference-favoring) denominator.

Encoding default: 'triplane' (ops/triplane.py — the TPU-native scene
encoding). Set XRDSLAM_BENCH_ENCODING=hash to make the parity path the
headline number instead.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_FPS = 5.0
N_FRAMES = 60
H, W = 340, 600
PEAK_BF16_FLOPS = 197e12  # TPU v5e peak bf16 (fp32 peak is half this)
PEAK_HBM_BYTES = 819e9  # TPU v5e HBM bandwidth


def build_pipeline(encoding: str, ds, out_dir: str, seed: int = 0):
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
        tracker=TrackerConfig(map_every=5, render_freq=-1, save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=5),
        algorithm=CoSLAMConfig(
            separate_LR=True,
            rot_rep="axis_angle",
            # endpoint-jitter control (off by default at this 60-frame
            # protocol's ~33x inter-frame motion — 10 iters may need the
            # full lr throughout; tools/diag_seed.py sweeps this knob)
            tracking_lr_decay=float(os.environ.get(
                "XRDSLAM_TRACK_LR_DECAY", "1.0")),
            tracking_n_iters=10,
            mapping_n_iters=10,
            mapping_first_n_iters=200,
            mapping_sample=2048,
            tracking_sample=1024,
            min_sample_pixels=100,
            tracking_Wedge=20,
            tracking_Hedge=20,
            mapping_bound=bound,
            marching_cubes_bound=bound,
            max_keyframes=max(N_FRAMES // 5 + 2, 8),
            seed=seed,
            mesher=MesherConfig(resolution=128),
            model=JointEncodingConfig(
                encoding=encoding,
                triplane_features=tuple(int(v) for v in os.environ.get(
                    "XRDSLAM_BENCH_TP_FEATURES", "8,8").split(",")),
                triplane_resolutions=tuple(int(v) for v in os.environ.get(
                    "XRDSLAM_BENCH_TP_RES", "128,512").split(",")),
                # samples-per-ray levers (tools/perf_levers.py sweep —
                # roofline says encode cost scales with rays x samples)
                training_n_sample_d=int(os.environ.get("XRDSLAM_BENCH_NSD", "32")),
                training_n_range_d=int(os.environ.get("XRDSLAM_BENCH_NRD", "11"))),
            optimizers=opts,
        ),
    )
    return cfg.setup(dataset=ds, out_dir=out_dir, verbose=False)


def steady_stats(frame_times):
    """Steady-state per-frame seconds: drop warmup (first 15 frames), then
    reject one-time compile spikes (> 4x median) — those are amortized to
    zero on real 2000-frame sequences but dominate a 60-frame bench."""
    t = np.asarray(frame_times[15:])
    med = np.median(t)
    keep = t[t < 4 * med]
    return float(np.mean(keep)), int(len(t) - len(keep))


def superstep_flops(pipeline) -> float:
    """XLA-estimated FLOPs of the steady-state fused group program."""
    algo = pipeline.algorithm
    try:
        fn = next(iter(algo._super_steps.values()))
        import jax

        # lowered cost analysis on the cached executable
        an = fn.lower(
            algo.model_params, algo.model_opt_state, algo.kf_rays,
            algo.kf_pose_t, algo.kf_pose_r,
            np.int32(algo.kf_count),
            np.zeros((5, H, W, 3), np.float32), np.zeros((5, H, W), np.float32),
            np.zeros(3, np.float32), np.zeros(3, np.float32),
            np.zeros(3, np.float32), np.zeros(3, np.float32),
            jax.random.PRNGKey(0), np.int32(0),
        ).compile().cost_analysis()
        return float(an.get("flops", 0.0)), float(an.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def run_one(encoding: str, ds, seed: int = 0) -> dict:
    import tempfile

    from xrdslam_tpu.utils.eval_ate import evaluate_ate

    out_dir = tempfile.mkdtemp(prefix=f"bench_coslam_{encoding}_")
    pipeline = build_pipeline(encoding, ds, out_dir, seed=seed)
    t_start = time.time()
    pipeline.run()
    total = time.time() - t_start
    sec_per_frame, n_spikes = steady_stats(pipeline.frame_times)
    fps = 1.0 / max(sec_per_frame, 1e-9)
    ate = evaluate_ate(list(np.asarray(ds.poses)), pipeline.algorithm.estimate_c2w_list)
    flops_group, bytes_group = superstep_flops(pipeline)
    group_s = sec_per_frame * 5
    mfu = flops_group / group_s / PEAK_BF16_FLOPS if flops_group else None
    hbm = bytes_group / group_s / PEAK_HBM_BYTES if bytes_group else None
    return {
        "fps": round(fps, 3),
        "ate_cm": round(ate["rmse"] * 100, 3),
        "total_s": round(total, 1),
        "group_ms": round(group_s * 1e3, 1),
        "flops_per_group": flops_group,
        "mfu_vs_bf16_peak": round(mfu, 5) if mfu else None,
        "hbm_bw_util": round(hbm, 3) if hbm else None,
        "compile_spikes_dropped": n_spikes,
    }


def _ensure_device(max_wait_s: int = 1800) -> None:
    """Survive a crashed/recovering TPU worker at bench start.

    When the worker is down, the axon plugin's interpreter-start
    registration fails and cannot be redone in this process — so after
    waiting for the device to answer a subprocess probe (each probe needs
    its own timeout: a down worker makes probe interpreters HANG in a
    connect-retry sleep, not error), re-exec the bench in a fresh process.
    Total wait is carried across re-execs via an env var."""
    import subprocess

    try:
        import jax

        jax.devices()
        return
    except Exception as e:
        print(f"[bench] device init failed: {e}", file=sys.stderr, flush=True)
    waited = float(os.environ.get("XRDSLAM_BENCH_WAITED", "0"))
    if waited >= max_wait_s:
        print("[bench] giving up waiting for device", file=sys.stderr, flush=True)
        return
    probe = "import jax, jax.numpy as jnp; assert int(jnp.asarray(1) + 1) == 2"
    t0 = time.time()
    while time.time() - t0 < max_wait_s - waited:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=180)
            if r.returncode == 0:
                break
        except subprocess.TimeoutExpired:
            pass
        print("[bench] device unavailable, retrying in 30s",
              file=sys.stderr, flush=True)
        time.sleep(30)
    os.environ["XRDSLAM_BENCH_WAITED"] = str(waited + time.time() - t0)
    os.execv(sys.executable, [sys.executable] + sys.argv)


def main() -> None:
    _ensure_device()
    import jax

    from xrdslam_tpu.common.synthetic import SyntheticDataset

    print(f"[bench] device: {jax.devices()[0]}", file=sys.stderr)
    ds = SyntheticDataset(n_frames=N_FRAMES, height=H, width=W)
    for i in range(len(ds)):  # pre-render: dataset IO outside the SLAM loop
        ds[i]

    headline = os.environ.get("XRDSLAM_BENCH_ENCODING", "triplane")
    res = run_one(headline, ds)
    print(f"[bench] {headline}: {res['fps']} fps, ATE {res['ate_cm']} cm, "
          f"group {res['group_ms']} ms, MFU {res['mfu_vs_bf16_peak']}", file=sys.stderr)
    extra = {"ate_rmse_cm": res["ate_cm"], "frames": N_FRAMES,
             "hw": str(jax.devices()[0]), "group_ms": res["group_ms"],
             "mfu_vs_bf16_peak": res["mfu_vs_bf16_peak"],
             "hbm_bw_util": res["hbm_bw_util"],
             "total_wall_s": res["total_s"]}
    # noise band: repeat the headline at extra seeds (compile cache is warm
    # after the first run, so each repeat is ~device time) and report the
    # spread — the chip-noise band was 10.5-14.3 fps in round 2 and a
    # single-run number can't distinguish regression from noise.
    n_seeds = int(os.environ.get("XRDSLAM_BENCH_SEEDS", "3"))
    fps_runs, ate_runs = [res["fps"]], [res["ate_cm"]]
    for s in range(1, n_seeds):
        r = run_one(headline, ds, seed=s)
        fps_runs.append(r["fps"])
        ate_runs.append(r["ate_cm"])
        print(f"[bench] {headline} seed {s}: {r['fps']} fps, ATE {r['ate_cm']} cm",
              file=sys.stderr)
    if len(fps_runs) > 1:
        extra["fps_runs"] = fps_runs
        extra["ate_runs"] = ate_runs
        extra["fps_std"] = round(float(np.std(fps_runs)), 3)
        extra["ate_std"] = round(float(np.std(ate_runs)), 3)
        extra["fps_mean"] = round(float(np.mean(fps_runs)), 3)
        extra["ate_mean"] = round(float(np.mean(ate_runs)), 3)
    # the hash parity path adds ~280 s (compile included; the r2 fused
    # programs cut its former ~8 min compile) — emitted by default so both
    # encodings are visible to the driver; XRDSLAM_BENCH_BOTH=0 skips it.
    if os.environ.get("XRDSLAM_BENCH_BOTH", "1") == "1" and headline == "triplane":
        alt = run_one("hash", ds)
        print(f"[bench] hash: {alt['fps']} fps, ATE {alt['ate_cm']} cm", file=sys.stderr)
        extra["hash_fps"] = alt["fps"]
        extra["hash_ate_rmse_cm"] = alt["ate_cm"]
    print(
        json.dumps(
            {
                "metric": "coslam_track_map_fps_replica_office0_scale",
                "encoding": headline,
                "value": res["fps"],
                "unit": "fps",
                "vs_baseline": round(res["fps"] / REF_FPS, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
