"""Single-process SLAM pipeline: tracker/mapper as alternating device steps.

Replaces the reference's three-process architecture (reference:
slam/pipeline/xrdslam.py:39-95 — BaseManager RPC + mp.Queue + event
handshake) with one host loop driving jitted device programs. The
reference's tracker and mapper already alternate strictly for mapped frames
(tracker.py:152-155 blocks on event_processed), so a single loop preserves
the execution order exactly while removing all serialization: frames are
uploaded once, and each do_tracking/do_mapping is one device program launch.

Tracker semantics preserved (reference: slam/pipeline/tracker.py:52-199):
constant-velocity pose prediction, map_every / keyframe_every gating,
relative-pose mode with init offset, final-frame forcing, eval.tar output.
"""
from __future__ import annotations

import os
import pickle
import time
from dataclasses import dataclass, field
from typing import Optional, Type

import numpy as np

from ..algorithms.base import Algorithm
from ..common.frame import Frame
from ..configs.base import InstantiateConfig
from ..utils.io import colorize_depth, save_image


@dataclass
class TrackerConfig(InstantiateConfig):
    """reference: slam/pipeline/tracker.py:19-31."""

    _target: Type = field(default_factory=lambda: object)
    render_freq: int = 1
    map_every: int = 1
    lazy_start: int = -1
    use_relative_pose: bool = False
    save_debug_result: bool = False
    save_gt_mesh: bool = False
    save_re_render_result: bool = True
    init_pose_offset: float = 0.0
    checkpoint_every: int = -1  # save resumable state every N frames (new vs reference)


@dataclass
class MapperConfig(InstantiateConfig):
    """reference: slam/pipeline/mapper.py."""

    _target: Type = field(default_factory=lambda: object)
    keyframe_every: int = 50


@dataclass
class SLAMPipelineConfig(InstantiateConfig):
    """reference: slam/pipeline/xrdslam.py XRDSLAMConfig."""

    _target: Type = field(default_factory=lambda: SLAMPipeline)
    tracker: TrackerConfig = field(default_factory=TrackerConfig)
    mapper: MapperConfig = field(default_factory=MapperConfig)
    algorithm: InstantiateConfig = field(default_factory=InstantiateConfig)
    enable_vis: bool = False
    # live-visualizer cadence: render/metric panel every render_freq frames
    # (tracker gate), mesh/cloud snapshots every vis_mesh_freq frames
    vis_mesh_freq: int = 50
    # first-class jax.profiler capture: "A-B" records frames [A, B) into
    # <out_dir>/jax_trace (view with TensorBoard/Perfetto); "" disables
    profile_trace_frames: str = ""
    device: str = "tpu"


class SLAMPipeline:
    def __init__(self, config: SLAMPipelineConfig, dataset, out_dir: str = "outputs", verbose: bool = True) -> None:
        self.config = config
        self.dataset = dataset
        self.out_dir = out_dir
        self.verbose = verbose
        self.camera = dataset.get_camera()
        self.algorithm: Algorithm = config.algorithm.setup(camera=self.camera)
        for sub in ("mesh", "cloud", "imgs"):
            os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
        self.frame_times = []
        self.vis = None
        if config.enable_vis:
            from .visualizer import VisualizerConfig

            self.vis = VisualizerConfig().setup(out_dir=out_dir)

    # ------------------------------------------------------------------
    def predict_current_pose(self, frame_id: int, gt_c2w: np.ndarray) -> np.ndarray:
        """Constant-velocity motion model (reference: tracker.py:185-199)."""
        est = self.algorithm.get_estimate_c2w_list()
        if frame_id < 1:
            return gt_c2w
        if frame_id == 1:
            return est[0]
        delta = est[frame_id - 1] @ np.linalg.inv(est[frame_id - 2])
        pred = delta @ est[frame_id - 1]
        if not np.isfinite(pred).all():
            return est[frame_id - 1]
        # re-orthonormalize the rotation (f32 products drift ~1e-3/frame)
        u, _, vt = np.linalg.svd(pred[:3, :3])
        pred[:3, :3] = u @ vt
        return pred

    # ------------------------------------------------------------------
    def _load_frame(self, i: int):
        """(rgb, depth, gt, rgb_dev|None, depth_dev|None), consuming the
        prefetch cache."""
        hit = self._pending.pop(i, None)
        if hit is not None:
            return hit
        _, rgb, depth, gt_c2w = self.dataset[i]
        return rgb, depth, gt_c2w, None, None

    def _prefetch_frame(self, i: int) -> None:
        if i in self._pending or i >= len(self.dataset):
            return
        _, rgb, depth, gt = self.dataset[i]
        # go through Frame's upload path so prefetched frames use the same
        # uint16 transfer (half the tunnel bytes) AND the same quantization
        # as cache-miss frames
        tmp = Frame(fid=i, rgb=rgb, depth=depth)
        self._pending[i] = (rgb, depth, gt, tmp.rgb_jax(), tmp.depth_jax())

    def _gt_transform(self, i: int, gt_c2w: np.ndarray):
        """Relative-pose remap (reference: tracker.py:60-73). Returns
        (gt_for_init, gt_ori)."""
        cfg_t = self.config.tracker
        gt_c2w_ori = gt_c2w.copy()
        if cfg_t.use_relative_pose:
            if i == 0:
                self._first_pose_old = gt_c2w.copy()
                gt_c2w = np.eye(4, dtype=np.float32)
                gt_c2w[:3, 3] += cfg_t.init_pose_offset
                self._first_pose_new = gt_c2w.copy()
            else:
                delta = np.linalg.inv(self._first_pose_old) @ gt_c2w
                gt_c2w = (self._first_pose_new @ delta).astype(np.float32)
        return gt_c2w, gt_c2w_ori

    def run(self, resume: bool = False, stop_at: int | None = None) -> None:
        """Run the SLAM loop. ``stop_at`` ends the run after frame
        ``stop_at - 1`` and saves a resumable checkpoint instead of
        finalizing — together with ``resume`` this lets a long sequence be
        processed as several short-lived processes (each segment re-attaches
        to the TPU client fresh; observed to sidestep TPU-worker crashes on
        very long heavy runs)."""
        cfg_t = self.config.tracker
        cfg_m = self.config.mapper
        algo = self.algorithm
        n = len(self.dataset)
        self._first_pose_old = self._first_pose_new = None
        self._pending = {}
        self._pending_super = None
        self._last_group_done = None
        start = 0
        self._ckpt_path = os.path.join(self.out_dir, "checkpoint.pkl")
        if resume and os.path.exists(self._ckpt_path):
            from ..engine.checkpoint import load_checkpoint

            idx, extra = load_checkpoint(self._ckpt_path, algo, want_extra=True)
            start = idx + 1
            if extra.get("first_pose_old") is not None:
                self._first_pose_old = np.asarray(extra["first_pose_old"])
                self._first_pose_new = np.asarray(extra["first_pose_new"])
            self.frame_times = list(extra.get("frame_times", []))
            print(f"[slam] resumed from {self._ckpt_path} at frame {start}", flush=True)

        # fused group fast path: one device program per map_every frames
        # (track head -> map head -> kf -> track rest; for map_every=1 the
        # "group" is a single fused track+map frame), one pose fetch per
        # group. Usable when the group structure is static and no per-frame
        # host consumer needs intermediate results; warmup frames, the
        # lazy-start region, the final group (forced final-frame mapping),
        # and off-cycle frames fall back to the per-frame path.
        group = cfg_t.map_every
        use_super = (
            group >= 1
            and hasattr(algo, "dispatch_superstep")
            and not (cfg_t.save_debug_result and cfg_t.render_freq > 0)
            and self.vis is None  # live viz needs per-frame results
            and cfg_m.keyframe_every % group == 0
            and os.environ.get("XRDSLAM_DISABLE_SUPER", "0") != "1"  # A/B hatch
        )
        self._dev_pose_hist = []  # last two (t, r) DEVICE pose vectors

        trace_lo = trace_hi = -1
        if self.config.profile_trace_frames:
            lo, _, hi = self.config.profile_trace_frames.partition("-")
            trace_lo, trace_hi = int(lo), int(hi or (int(lo) + 1))
        tracing = False

        end = n if stop_at is None else max(min(int(stop_at), n), start)
        i = start
        while i < end:
            if trace_lo >= 0 and not tracing and i >= trace_lo and i < trace_hi:
                import jax

                jax.profiler.start_trace(os.path.join(self.out_dir, "jax_trace"))
                tracing = True
            if tracing and i >= trace_hi:
                import jax

                jax.profiler.stop_trace()
                tracing = False
                print(f"[slam] jax trace saved to {self.out_dir}/jax_trace", flush=True)
            if (
                use_super
                and i % group == 0
                # >= 2*group (not just >= 2): the first per-frame group
                # compiles the track/map programs, so warmup cost doesn't
                # land mid-run when the tail frames need them again
                and i >= max(2 * group, 2)
                and i > cfg_t.lazy_start + group
                and i + group < n
                and algo.is_initialized()
            ):
                i = self._super_group(i, n, group)
            else:
                self._flush_super()  # per-frame work needs host poses current
                self._dev_pose_hist = []  # re-seed prediction from host poses
                self._frame_step(i, n)
                i += 1
        self._flush_super()
        if tracing:
            import jax

            jax.profiler.stop_trace()
            print(f"[slam] jax trace saved to {self.out_dir}/jax_trace", flush=True)
        if end < n:
            # segment boundary: persist full state (incl. pipeline-owned
            # remap anchors + frame-time history) and skip finalization
            from ..engine.checkpoint import save_checkpoint

            save_checkpoint(self._ckpt_path, algo, i - 1,
                            extra=self._ckpt_extra())
            print(f"[slam] segment checkpoint at frame {i - 1} -> "
                  f"{self._ckpt_path}", flush=True)
            return
        self._finish_run()

    # ------------------------------------------------------------------
    def _super_group(self, i: int, n: int, group: int) -> int:
        """Dispatch frames [i, i+group) as one fused device program, then
        finish (fetch + bookkeep) the PREVIOUS group while this one runs.

        Group-level software pipelining: the constant-velocity seed for
        this group is the previous group's pose output passed as DEVICE
        arrays, so dispatch never synchronizes — the device runs
        back-to-back group programs while the host fetches the lagging
        group's poses, decodes the next group's frames, and uploads them.
        """
        algo = self.algorithm
        cfg_t = self.config.tracker
        cfg_m = self.config.mapper
        t0 = time.time()
        gts = []
        frames = []
        for j in range(i, i + group):
            rgb, depth, gt, rgb_dev, depth_dev = self._load_frame(j)
            gt, gt_ori = self._gt_transform(j, gt)
            gts.append((gt, gt_ori))
            fr = Frame(fid=j, rgb=rgb, depth=depth, rot_rep=algo.config.rot_rep)
            if rgb_dev is not None:
                fr._rgb_dev, fr._depth_dev = rgb_dev, depth_dev
            frames.append(fr)

        do_kf = i % cfg_m.keyframe_every == 0
        if not self._dev_pose_hist:
            est = algo.estimate_c2w_list
            handle = algo.dispatch_superstep(frames, do_kf, est[i - 1], est[i - 2])
        else:
            # group-level software pipelining: seed the constant-velocity
            # model with the previous groups' DEVICE pose outputs (no sync).
            # With group=1 the second dispatch has only one device pose in
            # the history; repeating it degrades prediction to constant
            # position for that single frame (tracking recovers it).
            prev2 = self._dev_pose_hist[-2] if len(self._dev_pose_hist) >= 2 else self._dev_pose_hist[-1]
            handle = algo.dispatch_superstep(
                frames, do_kf, prev_tr=self._dev_pose_hist[-1], prev2_tr=prev2)
        pt, pr = handle[0], handle[1]
        for j in range(pt.shape[0]):
            self._dev_pose_hist.append((pt[j], pr[j]))
        self._dev_pose_hist = self._dev_pose_hist[-2:]
        # overlap the next group's host decode + device upload with the
        # in-flight programs
        for j in range(i + group, min(i + 2 * group, n)):
            self._prefetch_frame(j)
        prev_pending = self._pending_super
        self._pending_super = (i, gts, handle, t0)
        if prev_pending is not None:
            self._finish_group(prev_pending)

        if cfg_t.checkpoint_every > 0 and any(
            (i + j) % cfg_t.checkpoint_every == 0 for j in range(group)
        ):
            from ..engine.checkpoint import save_checkpoint

            self._flush_super()  # checkpoint needs the full est list
            save_checkpoint(self._ckpt_path, algo, i + group - 1,
                            extra=self._ckpt_extra())
        if self.verbose and (i // group) % 4 == 0 and self.frame_times:
            fps = 1.0 / max(np.mean(self.frame_times[-20:]), 1e-9)
            print(f"[slam] frame {i}/{n}  {fps:.2f} fps", flush=True)
        return i + group

    def _finish_group(self, pending) -> None:
        """Fetch one dispatched group's poses and record bookkeeping."""
        from ..engine.profiling import phase_timer

        i, gts, (handle), t0 = pending
        algo = self.algorithm
        with phase_timer("super_group"):
            poses = algo.finish_superstep(handle)
        for j, c2w in enumerate(poses):
            algo.add_framepose(c2w, gts[j][0], gts[j][1])
        group = len(poses)
        # steady-state throughput: time between consecutive group finishes
        now = time.time()
        t_ref = self._last_group_done if self._last_group_done is not None else t0
        dt = max(now - t_ref, 1e-9) / group
        self._last_group_done = now
        self.frame_times.extend([dt] * group)

    def _ckpt_extra(self) -> dict:
        """Pipeline-owned state a cross-process resume needs."""
        return {
            "first_pose_old": self._first_pose_old,
            "first_pose_new": self._first_pose_new,
            "frame_times": list(self.frame_times),
        }

    def _flush_super(self) -> None:
        """Complete any in-flight group (host state catches up to device)."""
        if self._pending_super is not None:
            pending = self._pending_super
            self._pending_super = None
            self._finish_group(pending)

    # ------------------------------------------------------------------
    def _frame_step(self, i: int, n: int) -> None:
        cfg_t = self.config.tracker
        cfg_m = self.config.mapper
        algo = self.algorithm
        rgb, depth, gt_c2w, rgb_dev, depth_dev = self._load_frame(i)
        gt_c2w, gt_c2w_ori = self._gt_transform(i, gt_c2w)

        t0 = time.time()
        init_pose = self.predict_current_pose(i, gt_c2w)
        frame = Frame(fid=i, rgb=rgb, depth=depth, init_pose=init_pose, gt_pose=gt_c2w, rot_rep=algo.config.rot_rep)
        frame.is_final_frame = i == n - 1
        if rgb_dev is not None:
            frame._rgb_dev, frame._depth_dev = rgb_dev, depth_dev

        from ..engine.profiling import phase_timer

        with phase_timer("tracking"):
            handle = algo.dispatch_tracking(frame)
            if handle is NotImplemented:
                candidate = algo.do_tracking(frame)
            else:
                # overlap the next frame's image prefetch with the
                # in-flight track program before fetching the pose
                self._prefetch_frame(i + 1)
                candidate = algo.finish_tracking(handle)
        if candidate is not None and algo.is_initialized():
            frame.set_pose(candidate)
        algo.add_framepose(frame.get_pose(), gt_c2w, gt_c2w_ori)

        # live visualizer stream (reference tracker.py:201-223: 'pose'
        # every frame; 'img'/'mesh'/'cloud' every render_freq / mesh cadence)
        if self.vis is not None:
            self.vis.push("pose", (frame.get_pose(), gt_c2w))
            if (
                algo.is_initialized()
                and cfg_t.render_freq > 0
                and (i % cfg_t.render_freq == 0 or frame.is_final_frame)
            ):
                color, depth_r = algo.render_img(frame.get_pose(), gt_depth=depth, idx=i)
                if color is not None:
                    self.vis.push("img", (i, rgb, depth, color, depth_r))
            vmf = self.config.vis_mesh_freq
            if algo.is_initialized() and vmf > 0 and i > 0 and i % vmf == 0:
                try:
                    mesh = algo.get_mesh()
                    if mesh is not None:
                        self.vis.push("mesh", (i, mesh))
                except NotImplementedError:
                    pass
                try:
                    pc = algo.get_cloud(frame.get_pose(), depth)
                    if pc is not None:
                        self.vis.push("cloud", (i, pc[0], pc[1]))
                except NotImplementedError:
                    pass

        # mapping gate (reference: tracker.py:171-183)
        map_every = 1 if i <= cfg_t.lazy_start else cfg_t.map_every
        if map_every != -1 and (i % map_every == 0 or frame.is_final_frame):
            with phase_timer("mapping"):
                algo.do_mapping(frame)
            algo.update_framepose(i, frame.get_pose())
            if i % cfg_m.keyframe_every == 0:
                algo.add_keyframe(frame)
        # prefetch the next frame's images onto the device while the
        # current frame's (async-dispatched) programs drain (no-op if
        # the two-phase tracking path already prefetched)
        if i + 1 < n:
            self._prefetch_frame(i + 1)
        self.frame_times.append(time.time() - t0)

        if (
            cfg_t.save_debug_result
            and algo.is_initialized()
            and cfg_t.render_freq > 0
            and (i % cfg_t.render_freq == 0 or frame.is_final_frame)
        ):
            self.save_debug_results(i, rgb, depth, frame.get_pose())

        if cfg_t.checkpoint_every > 0 and (i % cfg_t.checkpoint_every == 0 or frame.is_final_frame):
            from ..engine.checkpoint import save_checkpoint

            save_checkpoint(self._ckpt_path, algo, i, extra=self._ckpt_extra())

        if self.verbose and (i % 20 == 0 or frame.is_final_frame):
            fps = 1.0 / max(np.mean(self.frame_times[-20:]), 1e-9)
            print(f"[slam] frame {i}/{n}  {fps:.2f} fps", flush=True)

    # ------------------------------------------------------------------
    def _finish_run(self) -> None:
        if self.vis is not None:
            self.vis.close()
        self.save_eval_tar()
        from ..engine.profiling import timing_summary

        with open(os.path.join(self.out_dir, "timings.json"), "w") as f:
            import json

            json.dump(timing_summary(), f, indent=2)
        if self.config.tracker.save_re_render_result:
            self.save_re_render_frames()
        self.algorithm.finished = True

    # ------------------------------------------------------------------
    def save_debug_results(self, idx: int, gt_rgb, gt_depth, c2w) -> None:
        """2x3 debug panel (reference save_render_imgs, common.py:429-542):
        rgb gt | render | |residual| over depth gt | render | |residual|."""
        color, depth = self.algorithm.render_img(c2w, gt_depth=gt_depth, idx=idx)
        if color is None:
            return
        md = float(np.max(gt_depth)) if gt_depth is not None else None
        rgb_err = np.clip(np.abs(color - gt_rgb), 0, 1)
        d_err = np.abs(depth - gt_depth) * (gt_depth > 0)
        panel = np.concatenate(
            [
                np.concatenate([gt_rgb, color, rgb_err], axis=1),
                np.concatenate([colorize_depth(gt_depth, md), colorize_depth(depth, md),
                                colorize_depth(d_err, max((md or 1.0) * 0.2, 1e-6))], axis=1),
            ],
            axis=0,
        )
        save_image(os.path.join(self.out_dir, "imgs", f"frame_{idx:05d}.jpg"), panel)

    def save_eval_tar(self) -> None:
        """Trajectory archive for ds-eval (reference: tracker.py:269-278)."""
        data = {
            "gt_c2w_list": [np.asarray(p) for p in self.algorithm.gt_c2w_list],
            "gt_c2w_list_ori": [np.asarray(p) for p in self.algorithm.gt_c2w_list_ori],
            "estimate_c2w_list": [np.asarray(p) for p in self.algorithm.estimate_c2w_list],
            "idx": len(self.algorithm.estimate_c2w_list) - 1,
        }
        with open(os.path.join(self.out_dir, "eval.tar"), "wb") as f:
            pickle.dump(data, f)

    def save_final_mesh(self) -> None:
        mesh = self.algorithm.get_mesh()
        if mesh is not None:
            mesh.export(os.path.join(self.out_dir, "mesh", "final_mesh_rec.ply"))

    def save_re_render_frames(self) -> None:
        """Post-run metric sweep (reference: tracker.py:343-420): re-render
        every render_freq-th frame at the ESTIMATED pose, accumulate 2D
        metrics (PSNR/SSIM/LPIPS/depth-L1), write eval_2d.json, export the
        final mesh plus its frustum-culled eval variant."""
        import json

        from ..common import metrics as M

        algo = self.algorithm
        est = algo.estimate_c2w_list
        freq = max(self.config.tracker.render_freq, 1)
        sums = {"psnr": 0.0, "ssim": 0.0, "ms_ssim": 0.0, "lpips": 0.0,
                "depth_l1": 0.0}
        cnt = 0
        for i in range(0, len(est), freq):
            _, gt_rgb, gt_depth, _ = self.dataset[i]
            color, depth = algo.render_img(np.asarray(est[i]), gt_depth=gt_depth, idx=i)
            if color is None:
                break
            mask = gt_depth > 0
            sums["psnr"] += M.psnr(color, gt_rgb, mask)
            sums["ssim"] += M.ssim(color, gt_rgb)
            sums["ms_ssim"] += M.ms_ssim(color, gt_rgb)
            sums["lpips"] += M.lpips(color, gt_rgb)
            sums["depth_l1"] += M.depth_l1(depth, gt_depth, mask) * 100.0
            cnt += 1
            self.save_debug_results(i, gt_rgb, gt_depth, np.asarray(est[i]))
        if cnt > 0:
            avg = {k: v / cnt for k, v in sums.items()}
            if not np.isfinite(avg["lpips"]):
                avg["lpips"] = None
                avg["lpips_unavailable_reason"] = (
                    "ops/lpips.py needs converted AlexNet+lin weights "
                    "($XRDSLAM_LPIPS_WEIGHTS) and the torchmetrics "
                    "fallback needs network; neither is available, so "
                    "LPIPS parity vs the reference's column is "
                    "unmeasurable in this environment")
            avg["frames"] = cnt
            print(
                f"[slam] re-render avg: psnr {avg['psnr']:.2f} dB, "
                f"ssim {avg['ssim']:.3f}, depth_l1 {avg['depth_l1']:.2f} cm",
                flush=True,
            )
            with open(os.path.join(self.out_dir, "eval_2d.json"), "w") as f:
                json.dump(avg, f, indent=2)

        mesh = self.algorithm.get_mesh()
        if mesh is not None:
            mesh.export(os.path.join(self.out_dir, "mesh", "final_mesh.ply"))
            from ..utils.mesh_ops import cull_mesh

            culled = cull_mesh(self.dataset, mesh, estimate_c2w_list=est, eval_rec=True)
            culled.export(os.path.join(self.out_dir, "mesh", "final_mesh_rec.ply"))
