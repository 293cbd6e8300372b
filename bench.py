"""Benchmark: Co-SLAM tracking+mapping FPS on a Replica-office0-scale scene.

Runs the full SLAM loop (tracking 10x1024-ray iters/frame, mapping
10x(2048+2048)-ray iters every 5 frames, per the reference's co-slam config
— input_config.py:203-295) on a synthetic office-scale RGB-D sequence at
Replica downsample_factor=2 resolution (600x340), on the default JAX device
(the real TPU chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no FPS (SURVEY.md §6). Baseline is
REF_FPS=5.0 — the original Co-SLAM paper's reported ~5 Hz tracking on an
RTX 3090; XRDSLAM's manager-IPC pipeline is slower than that, so this is a
conservative (reference-favoring) denominator.

Encoding default: 'triplane' (ops/triplane.py — the TPU-native scene
encoding: 2.21 fps / ATE 2.66 cm vs hash-grid parity mode 1.38 fps /
2.62 cm on this bench). Set XRDSLAM_BENCH_ENCODING=hash for the
reference-parity hash-grid path.
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


def main() -> None:
    import jax

    from xrdslam_tpu.algorithms.coslam import CoSLAMConfig
    from xrdslam_tpu.common.synthetic import SyntheticDataset
    from xrdslam_tpu.common.mesher import MesherConfig
    from xrdslam_tpu.engine.optimizers import AdamOptimizerConfig
    from xrdslam_tpu.models.joint_encoding import JointEncodingConfig
    from xrdslam_tpu.pipeline.slam import MapperConfig, SLAMPipelineConfig, TrackerConfig
    from xrdslam_tpu.utils.eval_ate import evaluate_ate

    print(f"[bench] device: {jax.devices()[0]}", file=sys.stderr)
    ds = SyntheticDataset(n_frames=N_FRAMES, height=H, width=W)
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
            mesher=MesherConfig(resolution=128),
            model=JointEncodingConfig(
                encoding=os.environ.get("XRDSLAM_BENCH_ENCODING", "triplane"),
                triplane_features=tuple(int(v) for v in os.environ.get(
                    "XRDSLAM_BENCH_TP_FEATURES", "8,8").split(",")),
                triplane_resolutions=tuple(int(v) for v in os.environ.get(
                    "XRDSLAM_BENCH_TP_RES", "128,512").split(","))),
            optimizers=opts,
        ),
    )
    import tempfile

    # Pre-render the synthetic frames: dataset IO is outside the SLAM loop
    # (the reference reads frames through a DataLoader worker thread).
    for i in range(len(ds)):
        ds[i]

    out_dir = tempfile.mkdtemp(prefix="bench_coslam_")
    pipeline = cfg.setup(dataset=ds, out_dir=out_dir, verbose=False)

    # warmup: first frames trigger compilation of first-map/track/map programs
    t_start = time.time()
    pipeline.run()
    total = time.time() - t_start

    # steady-state fps: drop the first 15 frames (compile of the first-map,
    # per-frame track/map, and fused super-group programs)
    times = pipeline.frame_times[15:]
    fps = 1.0 / max(np.mean(times), 1e-9)
    ate = evaluate_ate(list(np.asarray(ds.poses)), pipeline.algorithm.estimate_c2w_list)
    print(
        f"[bench] total {total:.1f}s, steady fps {fps:.2f}, ATE {ate['rmse']*100:.2f} cm",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "coslam_track_map_fps_replica_office0_scale",
                "encoding": os.environ.get("XRDSLAM_BENCH_ENCODING", "triplane"),
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / REF_FPS, 3),
                "extra": {"ate_rmse_cm": round(ate["rmse"] * 100, 3), "frames": N_FRAMES, "hw": str(jax.devices()[0])},
            }
        )
    )


if __name__ == "__main__":
    main()
