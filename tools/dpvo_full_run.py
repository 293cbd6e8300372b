"""DPVO closed loop: train the update operator in-env, then run the FULL
DPVO pipeline with the trained weights and gate scale-corrected ATE
(VERDICT r3 item #5; reference runs DPVO with pretrained dpvo.pth,
slam/models/vo_net_model.py:39-50, to ATE 0.31 cm — README.md:199; the
pretrained file is an LFS stub in-env, so the operator trains here).

Usage:
    python tools/dpvo_full_run.py [--train-iters 400] [--frames 60]
        [--out pretrained/dpvo_synth.npz] [--skip-train]

Writes the trained weights npz and /tmp/dpvo_full_run.json with the ATE.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-iters", type=int, default=400)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--out", type=str, default="pretrained/dpvo_synth.npz")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse --out weights, only run the pipeline")
    ap.add_argument("--resume", action="store_true",
                    help="continue training from --out instead of fresh init "
                         "(the committed pretrained/dpvo_synth.npz is 400 "
                         "fresh iters at lr 2e-4 + 1600 resumed iters at "
                         "lr 1e-4, seed 1)")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--train-seed", type=int, default=0)
    args = ap.parse_args()

    from xrdslam_tpu.common.synthetic import SyntheticDataset
    from xrdslam_tpu.engine import dpvo_train as T
    from xrdslam_tpu.models.vonet import VONet, VONetConfig
    from xrdslam_tpu.utils.eval_ate import evaluate_ate

    if not args.skip_train:
        # train on a SHORTER sequence than the eval run (not an overfit of
        # the exact eval trajectory; same scene statistics, like the
        # reference training on TartanAir and evaluating on Replica)
        ds_tr = SyntheticDataset(n_frames=16, height=args.height,
                                 width=args.width, scene="office")
        ds_tr.prerender(batch=4, verbose=True)
        if args.resume and os.path.exists(args.out):
            params0 = T.load_params(args.out)
        else:
            params0 = VONet(VONetConfig()).params
        t0 = time.time()
        params, losses = T.train(params0, ds_tr, n_iters=args.train_iters,
                                 m=64, chunk=64, noise_px=3.0, log_every=50,
                                 lr=args.lr, seed=args.train_seed)
        print(f"[dpvo] trained {args.train_iters} iters in {time.time()-t0:.0f}s; "
              f"loss {np.mean(losses[:10]):.4f} -> {np.mean(losses[-10:]):.4f}",
              flush=True)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        T.save_params(args.out, params)
        print(f"[dpvo] saved {args.out} "
              f"({os.path.getsize(args.out)/1e6:.1f} MB)", flush=True)

    # ---- full pipeline run with the trained weights --------------------
    from xrdslam_tpu.algorithms.dpvo import DPVOConfig
    from xrdslam_tpu.pipeline.slam import (MapperConfig, SLAMPipelineConfig,
                                           TrackerConfig)

    ds = SyntheticDataset(n_frames=args.frames, height=args.height,
                          width=args.width, scene="office")
    cache = f"/tmp/dpvo_cache_{args.frames}_{args.width}x{args.height}.npz"
    if os.path.exists(cache):
        ds.load_cache(cache)
    else:
        ds.prerender(batch=4, verbose=True)
        ds.save_cache(cache)

    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=-1, render_freq=-1,
                              save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=10**9),
        algorithm=DPVOConfig(
            patch_per_frame=48,
            patch_lifetime=13,
            init_frame_num=8,
            optimization_window=10,
            removal_window=16,
            keyframe_index=4,
            keyframe_thresh=0.01,
            buffer_size=512,
            mem=24,
            edge_chunk=2048,
            motion_init_thresh=0.0,
            model=VONetConfig(pretrained_path=args.out),
        ),
        enable_vis=False,
    )
    out_dir = "/tmp/dpvo_full_out"
    pipe = cfg.setup(dataset=ds, out_dir=out_dir, verbose=True)
    t0 = time.time()
    pipe.run()
    wall = time.time() - t0
    algo = pipe.algorithm
    gt = [np.asarray(p) for p in ds.poses]
    est = [np.asarray(p) for p in algo.estimate_c2w_list]
    # monocular VO: scale-free — evaluate sim(3)-aligned (reference DPVO
    # eval protocol, scripts/utils/eval_ate.py scale option)
    ate = evaluate_ate(gt, est, correct_scale=True)
    res = {
        "metric": "dpvo_trained_full_run",
        "frames": args.frames,
        "resolution": f"{args.width}x{args.height}",
        "train_iters": 0 if args.skip_train else args.train_iters,
        "ate_cm_scale_corrected": round(ate["rmse"] * 100, 3),
        "scale": round(float(ate["scale"]), 4),
        "wall_s": round(wall, 1),
        "fps": round(args.frames / wall, 2),
    }
    print(json.dumps(res))
    with open("/tmp/dpvo_full_run.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
