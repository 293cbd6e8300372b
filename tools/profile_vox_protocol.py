"""Profile Vox-Fusion per-frame pieces at PROTOCOL scale (600x340,
registry hyperparameters) through the host-level calls, mirroring
tools/profile_splat.py (VERDICT r4 item #2).

Run: python tools/profile_vox_protocol.py
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=600)
    ap.add_argument("--height", type=int, default=340)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    from xrdslam_tpu.common.frame import Frame
    from xrdslam_tpu.common.synthetic import SyntheticDataset
    from xrdslam_tpu.configs.registry import algorithm_configs

    ds = SyntheticDataset(n_frames=args.frames, height=args.height,
                          width=args.width, scene="office")
    ds.prerender(batch=4, verbose=False)
    cfg = algorithm_configs["vox-fusion"].xrdslam.algorithm
    cfg.max_keyframes = 16
    algo = cfg.setup(camera=ds.get_camera())
    print(f"device={jax.devices()[0]} track_iters={cfg.tracking_n_iters} "
          f"map_iters={cfg.mapping_n_iters} window={cfg.mapping_window_size} "
          f"map_sample={cfg.mapping_sample} track_sample={cfg.tracking_sample}",
          file=sys.stderr, flush=True)

    def frame(i, rel=None):
        _, rgb, depth, c2w = ds[i]
        return Frame(fid=i, rgb=rgb, depth=depth,
                     init_pose=rel if rel is not None else c2w,
                     gt_pose=c2w, rot_rep="axis_angle")

    f0 = frame(0)
    t0 = time.time()
    algo.do_mapping(f0)
    print(f"first do_mapping (compile+run): {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    algo.add_keyframe(f0)
    algo.estimate_c2w_list = [f0.get_pose()]

    f1 = frame(1, rel=f0.get_pose())
    t0 = time.time()
    c1 = algo.do_tracking(f1)
    print(f"first do_tracking (compile+run): {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    algo.estimate_c2w_list.append(np.asarray(c1))
    t0 = time.time()
    algo.do_mapping(f1)
    print(f"steady do_mapping #1 (maybe compile): {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)

    for i in range(2, args.frames):
        fi = frame(i, rel=np.asarray(algo.estimate_c2w_list[-1]))
        t0 = time.time()
        ci = algo.do_tracking(fi)
        t_track = time.time() - t0
        algo.estimate_c2w_list.append(np.asarray(ci))
        t0 = time.time()
        algo.do_mapping(fi)
        t_map = time.time() - t0
        print(f"frame {i}: track {t_track:.2f}s  map {t_map:.2f}s",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
