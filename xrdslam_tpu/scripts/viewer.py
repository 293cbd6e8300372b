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


def replay_mesh(out_dir: str, height: int = 240, width: int = 320,
                every: int = 10) -> None:
    """Mesh replay (reference viewer.py:42-66 shows saved meshes in the
    Open3D window): render depth + lambertian shading of each saved mesh
    snapshot (``mesh/live_*.ply``, falling back to the final mesh) along
    the estimated trajectory with the tile rasterizer, into
    ``mesh_replay/*.jpg``."""
    from ..ops.mesh_raster import render_mesh_depth_np
    from ..utils.io import colorize_depth, read_ply, save_image

    with open(os.path.join(out_dir, "eval.tar"), "rb") as f:
        data = pickle.load(f)
    est = data["estimate_c2w_list"]
    snaps = sorted(glob.glob(os.path.join(out_dir, "mesh", "live_*.ply")))
    final = os.path.join(out_dir, "mesh", "final_mesh_rec.ply")
    if not snaps and os.path.exists(final):
        snaps = [final]
    if not snaps:
        print("no meshes found under mesh/")
        return
    os.makedirs(os.path.join(out_dir, "mesh_replay"), exist_ok=True)
    fov_f = 0.6 * width  # generic viewing intrinsics for the replay
    cx, cy = width / 2 - 0.5, height / 2 - 0.5
    fids = [int(os.path.basename(s)[5:10]) if "live_" in s else len(est) - 1
            for s in snaps]
    si = 0
    md = None
    for i in range(0, len(est), max(every, 1)):
        while si + 1 < len(snaps) and fids[si + 1] <= i:
            si += 1
        mesh = read_ply(snaps[si])
        d = render_mesh_depth_np(mesh, np.asarray(est[i]), fov_f, fov_f,
                                 cx, cy, height, width)
        if md is None and (d > 0).any():
            md = float(d.max())
        save_image(os.path.join(out_dir, "mesh_replay", f"frame_{i:05d}.jpg"),
                   colorize_depth(d, md))
    print(f"saved mesh replay frames to {out_dir}/mesh_replay")


def replay_cloud(out_dir: str) -> None:
    """Cloud replay (reference viewer.py:67-76): scatter snapshots of
    saved point clouds into ``cloud_replay/*.jpg``."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..utils.io import read_ply

    snaps = sorted(glob.glob(os.path.join(out_dir, "cloud", "*.ply")))
    if not snaps:
        print("no clouds found under cloud/")
        return
    os.makedirs(os.path.join(out_dir, "cloud_replay"), exist_ok=True)
    for s in snaps:
        m = read_ply(s)
        pick = np.random.default_rng(0).choice(
            len(m.vertices), min(20000, len(m.vertices)), replace=False)
        v = m.vertices[pick]
        c = m.vertex_colors[pick] if m.vertex_colors is not None else None
        fig = plt.figure(figsize=(5, 4))
        ax = fig.add_subplot(111, projection="3d")
        ax.scatter(*v.T, s=0.5, c=c)
        ax.set_title(os.path.basename(s))
        fig.savefig(os.path.join(out_dir, "cloud_replay",
                                 os.path.basename(s).replace(".ply", ".jpg")),
                    dpi=100)
        plt.close(fig)
    print(f"saved cloud replay frames to {out_dir}/cloud_replay")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="ds-viewer")
    p.add_argument("--output", required=True, help="outputs dir of a run")
    p.add_argument("--video", action="store_true", help="assemble debug panels into a video")
    p.add_argument("--replay-mesh", action="store_true",
                   help="render mesh snapshots along the estimated trajectory")
    p.add_argument("--replay-cloud", action="store_true",
                   help="scatter-plot saved point clouds")
    p.add_argument("--fps", type=int, default=10)
    args = p.parse_args(argv)
    plot_trajectory(args.output, os.path.join(args.output, "trajectory.png"))
    if args.video:
        make_video(args.output, os.path.join(args.output, "replay.mp4"), args.fps)
    if args.replay_mesh:
        replay_mesh(args.output)
    if args.replay_cloud:
        replay_cloud(args.output)


def entrypoint() -> None:
    main(sys.argv[1:])


if __name__ == "__main__":
    entrypoint()
