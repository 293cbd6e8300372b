"""Headless live visualizer: background consumer of tracking output.

Rebuild of the reference's online visualizer (reference:
slam/pipeline/visualizer.py:57-318 — an Open3D window plus a 2x3
matplotlib panel with live PSNR/SSIM/LPIPS/depth-L1, fed fire-and-forget
through ``viz_buffer = mp.Queue(maxsize=10)``). This environment has no
display, so the same stream renders to disk artifacts that update live
during the run:

  * ``live/panel.jpg``      — the reference's 2x3 panel (gt/render/residual
                              for rgb and depth) for the latest frame
  * ``live/metrics.jsonl``  — one line per visualized frame with
                              PSNR/SSIM/MS-SSIM/LPIPS/depth-L1
  * ``live/trajectory.png`` — est-vs-gt trajectory, refreshed periodically
  * ``live/live.html``      — self-refreshing dashboard (panel + latest
                              metrics + trajectory) to watch in a browser
  * ``mesh/live_*.ply`` / ``cloud/live_*.ply`` — snapshots for ds-viewer
                              replay (reference viewer.py:28-93)

Same concurrency contract as the reference: the producer never blocks —
a bounded queue drops updates when the consumer lags (matching the
reference's ``queue.Full: pass``), and the consumer runs on a background
thread off the device path.
"""
from __future__ import annotations

import json
import os
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Optional, Type

import numpy as np

from ..configs.base import InstantiateConfig
from ..utils.io import colorize_depth, save_image

_HTML = """<!DOCTYPE html>
<html><head><meta http-equiv="refresh" content="2">
<title>xrdslam_tpu live</title>
<style>body{{font-family:monospace;background:#111;color:#eee}}
img{{max-width:100%}}table{{border-collapse:collapse}}
td,th{{border:1px solid #444;padding:4px 10px}}</style></head>
<body><h2>frame {frame}</h2>
<table><tr><th>psnr</th><th>ssim</th><th>ms-ssim</th><th>lpips</th>
<th>depth L1 (cm)</th></tr>
<tr><td>{psnr:.2f}</td><td>{ssim:.3f}</td><td>{ms_ssim:.3f}</td>
<td>{lpips}</td><td>{depth_l1:.2f}</td></tr></table>
<p><img src="panel.jpg?t={t}"></p>
<p><img src="trajectory.png?t={t}" width="480"></p>
</body></html>
"""


@dataclass
class VisualizerConfig(InstantiateConfig):
    """reference: slam/pipeline/visualizer.py VisualizerConfig (win size,
    save paths); display-specific fields replaced by artifact cadence."""

    _target: Type = field(default_factory=lambda: HeadlessVisualizer)
    trajectory_every: int = 10  # refresh trajectory.png every N pose msgs
    queue_size: int = 10  # reference viz_buffer maxsize (xrdslam.py:59)


class HeadlessVisualizer:
    def __init__(self, config: VisualizerConfig, out_dir: str) -> None:
        self.config = config
        self.out_dir = out_dir
        self.live_dir = os.path.join(out_dir, "live")
        os.makedirs(self.live_dir, exist_ok=True)
        self._q: "queue.Queue" = queue.Queue(maxsize=config.queue_size)
        self._poses_est = []
        self._poses_gt = []
        self._last = {"frame": -1, "psnr": float("nan"), "ssim": float("nan"),
                      "ms_ssim": float("nan"), "lpips": None,
                      "depth_l1": float("nan")}
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._spin, daemon=True)
        self._thread.start()

    # ------------------------------------------------------- producer API
    def push(self, kind: str, payload) -> None:
        """Non-blocking: drops when the consumer lags (reference
        tracker.py:201-223 except queue.Full: pass)."""
        try:
            self._q.put_nowait((kind, payload))
        except queue.Full:
            pass

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=30)

    # ------------------------------------------------------- consumer
    def _spin(self) -> None:
        while not (self._stop.is_set() and self._q.empty()):
            try:
                kind, payload = self._q.get(timeout=0.2)
            except queue.Empty:
                continue
            try:
                if kind == "img":
                    self._on_img(*payload)
                elif kind == "pose":
                    self._on_pose(*payload)
                elif kind == "mesh":
                    idx, mesh = payload
                    mesh.export(os.path.join(self.out_dir, "mesh",
                                             f"live_{idx:05d}.ply"))
                elif kind == "cloud":
                    idx, pts, cols = payload
                    self._save_cloud(idx, pts, cols)
            except Exception as e:  # visualization must never kill the run
                print(f"[viz] {kind} update failed: {e}", flush=True)

    def _on_img(self, idx, gt_rgb, gt_depth, rgb, depth) -> None:
        from ..common import metrics as M

        mask = gt_depth > 0
        m = {
            "frame": int(idx),
            "psnr": M.psnr(rgb, gt_rgb, mask),
            "ssim": M.ssim(rgb, gt_rgb),
            "ms_ssim": M.ms_ssim(rgb, gt_rgb),
            "lpips": None,
            "depth_l1": M.depth_l1(depth, gt_depth, mask) * 100.0,
        }
        lp = M.lpips(rgb, gt_rgb)
        if np.isfinite(lp):
            m["lpips"] = lp
        with open(os.path.join(self.live_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(m) + "\n")
        self._last = m
        # 2x3 panel (reference visualizer.py:137-199): rgb gt/render/|err|,
        # depth gt/render/|err|
        md = float(np.max(gt_depth)) if mask.any() else 1.0
        rgb_err = np.abs(rgb - gt_rgb).clip(0, 1)
        d_err = np.abs(depth - gt_depth) * mask
        row1 = np.concatenate([gt_rgb, rgb, rgb_err], axis=1)
        row2 = np.concatenate([
            colorize_depth(gt_depth, md), colorize_depth(depth, md),
            colorize_depth(d_err, max(md * 0.2, 1e-6))], axis=1)
        save_image(os.path.join(self.live_dir, "panel.jpg"),
                   np.concatenate([row1, row2], axis=0))
        lp_s = f"{m['lpips']:.3f}" if m["lpips"] is not None else "n/a"
        with open(os.path.join(self.live_dir, "live.html"), "w") as f:
            f.write(_HTML.format(frame=m["frame"], psnr=m["psnr"],
                                 ssim=m["ssim"], ms_ssim=m["ms_ssim"],
                                 lpips=lp_s, depth_l1=m["depth_l1"],
                                 t=int(time.time() * 1000)))

    def _on_pose(self, est, gt) -> None:
        self._poses_est.append(np.asarray(est)[:3, 3])
        self._poses_gt.append(np.asarray(gt)[:3, 3])
        if len(self._poses_est) % max(self.config.trajectory_every, 1) != 0:
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            e = np.stack(self._poses_est)
            g = np.stack(self._poses_gt)
            fig = plt.figure(figsize=(5, 4))
            ax = fig.add_subplot(111, projection="3d")
            ax.plot(*g.T, color="k", lw=1, label="gt")
            ax.plot(*e.T, color="tab:red", lw=1, label="est")
            ax.legend()
            fig.savefig(os.path.join(self.live_dir, "trajectory.png"), dpi=100)
            plt.close(fig)
        except Exception:
            pass

    def _save_cloud(self, idx, pts, cols) -> None:
        from ..utils.io import write_ply

        path = os.path.join(self.out_dir, "cloud", f"live_{idx:05d}.ply")
        write_ply(path, np.asarray(pts),
                  np.zeros((0, 3), np.int64), np.asarray(cols))
