"""``ds-viewer``: offline replay of SLAM outputs.

Counterpart of the reference's offline viewer (reference:
scripts/viewer.py:28-93 + scripts/utils/viz_utils.py). Open3D is not
available here, so the viewer renders with matplotlib: trajectory (est vs
gt) in 3D, per-frame debug panels from ``outputs/imgs``, and an optional
mp4/gif assembled from the panels (ffmpeg if present, else PIL gif).
"""
from __future__ import annotations

import argparse
import glob
import os
import pickle
import shutil
import subprocess
import sys

import numpy as np


def plot_trajectory(out_dir: str, save_path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(os.path.join(out_dir, "eval.tar"), "rb") as f:
        data = pickle.load(f)
    est = np.stack([p[:3, 3] for p in data["estimate_c2w_list"]])
    gt = np.stack([p[:3, 3] for p in data["gt_c2w_list"]])
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.plot(*gt.T, label="ground truth", color="k", lw=1)
    ax.plot(*est.T, label="estimate", color="tab:red", lw=1)
    ax.legend()
    ax.set_title("trajectory")
    fig.savefig(save_path, dpi=120)
    print(f"saved {save_path}")


def make_video(out_dir: str, save_path: str, fps: int = 10) -> None:
    imgs = sorted(glob.glob(os.path.join(out_dir, "imgs", "*.jpg")))
    if not imgs:
        print("no debug images found (run with --xrdslam.tracker.save-debug-result true)")
        return
    if shutil.which("ffmpeg"):
        subprocess.run(
            ["ffmpeg", "-y", "-framerate", str(fps), "-pattern_type", "glob", "-i",
             os.path.join(out_dir, "imgs", "*.jpg"), "-pix_fmt", "yuv420p", save_path],
            check=True, capture_output=True,
        )
    else:
        from PIL import Image

        frames = [Image.open(p) for p in imgs]
        save_path = os.path.splitext(save_path)[0] + ".gif"
        frames[0].save(save_path, save_all=True, append_images=frames[1:], duration=int(1000 / fps), loop=0)
    print(f"saved {save_path}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="ds-viewer")
    p.add_argument("--output", required=True, help="outputs dir of a run")
    p.add_argument("--video", action="store_true", help="assemble debug panels into a video")
    p.add_argument("--fps", type=int, default=10)
    args = p.parse_args(argv)
    plot_trajectory(args.output, os.path.join(args.output, "trajectory.png"))
    if args.video:
        make_video(args.output, os.path.join(args.output, "replay.mp4"), args.fps)


def entrypoint() -> None:
    main(sys.argv[1:])


if __name__ == "__main__":
    entrypoint()
