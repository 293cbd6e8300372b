"""Point-SLAM: neural point cloud SLAM with density-driven growth.

TPU-native rebuild of the reference algorithm (reference:
slam/algorithms/point_slam.py:20-435). Structural mapping:

  * Point addition each mapping step (point_slam.py:94-155): sample pixels
    from the current frame, host-query neighbor counts in the spatial hash,
    and append 3 points along each under-covered ray at
    depth -/0/+ radius_add. Features need no growth step — the fixed
    feature tables are pre-initialized and rows activate as points appear.
  * Mapping runs two jitted scan phases (geometry -> color) following the
    PointSLAMScheduler two-phase lrs (schedulers.py:98-112), window frames
    sampled fresh each iteration like NICE-SLAM.
  * Tracking: uncertainty-weighted clamped depth L1 + color over
    dynamic-outlier-masked pixels (conv_onet_pointslam.py:157-178).
  * Mesh: TSDF fusion of rendered keyframe RGB-D (reference
    get_mesh_from_RGBD via Open3D, common.py:622-663) -> ops.tsdf_fusion.

  * Dynamic radii (point_slam.py:339-366): per-frame Sobel color-gradient
    -> per-pixel add/query radii; the r_query map is stored as a 5th
    channel of the keyframe RGBD table so window sampling picks it up for
    free. Point insertion uses per-pixel r_add for both the density test
    and the along-ray spread.
  * mapping_pixels_based_on_color_grad (point_slam.py:42,124-138): extra
    mapping rays at the current frame's top color-gradient pixels
    (host-selected once per mapping call). Default 0, like the reference.

Round-1 simplifications: tracking_sample_with_color_grad off (reference
default), mapping_BA off (reference default mapping_BA=False,
input_config.py:322).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

from ..common.camera import Camera
from ..common.frame import Frame
from ..engine.optimizers import GroupOptimizers
from ..engine.schedulers import PointSLAMSchedulerConfig
from ..models.conv_onet_pointslam import ConvOnet2Config
from ..ops import lie
from ..ops.point_table import PointMap
from ..ops.sampling import camera_ray_dirs, sample_pixels
from .base import Algorithm, AlgorithmConfig


@dataclass
class PointSLAMConfig(AlgorithmConfig):
    """reference: slam/algorithms/point_slam.py:20-59."""

    _target: Type = field(default_factory=lambda: PointSLAM)
    model: ConvOnet2Config = field(default_factory=ConvOnet2Config)
    mapping_sample: int = 5000
    min_sample_pixels: int = 40
    tracking_sample: int = 1500
    ray_batch_size: int = 3000
    tracking_Wedge: int = 100
    tracking_Hedge: int = 100
    mapping_BA: bool = False
    mapping_geo_iter_ratio: float = 0.4
    pixels_adding: int = 6000
    # extra mapping rays at top color-grad pixels (reference :42, default 0)
    mapping_pixels_based_on_color_grad: int = 0
    max_keyframes: int = 64
    mesh_resolution: int = 256
    seed: int = 0
    # max scan iterations per device program in the (host-driven) mapping
    # path: one over-long program (> ~100 s) kills the TPU worker, so long
    # first-mapping optimizations run as several chunked programs with Adam
    # state carried across chunks
    map_chunk_iters: int = 150


class PointSLAM(Algorithm):
    config: PointSLAMConfig

    def __init__(self, config: PointSLAMConfig, camera: Camera) -> None:
        super().__init__(config, camera)
        self.model = config.model.setup(camera=camera, bounding_box=None)
        self._key = jax.random.PRNGKey(config.seed)
        self.model_params = self._replicate_params(self.model.init_params(self._next_key()))
        self.point_map = PointMap(
            max_points=config.model.max_points, cell_size=2.0 * self.model._max_query_radius()
        )
        self.maps = self._replicate_params(self.point_map.device_state())
        self._opt_cfgs = {name: g["optimizer"] for name, g in config.optimizers.items()}
        self._scheds = {name: g.get("scheduler") for name, g in config.optimizers.items()}
        H, W = camera.height, camera.width
        # channels: rgb, depth, dynamic r_query (point_slam.py:79-92)
        self.kf_images = jnp.zeros((config.max_keyframes, H, W, 5), jnp.float32)
        self.kf_pose = jnp.zeros((config.max_keyframes, 7), jnp.float32)  # t + quat
        self.kf_count = 0
        self._dirs = camera_ray_dirs(camera)
        self._dirs_np = np.asarray(self._dirs)
        self.cur_mesh = None
        self._map_variants: Dict[Tuple, Any] = {}
        self._build_jits()

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------
    def cal_dynamic_radius(self, rgb: np.ndarray):
        """Per-pixel add/query radii from Sobel color-gradient magnitude
        (reference point_slam.py:339-366): piecewise-linear map
        [0, 0.01, thresh] -> [r_max, r_max, r_min]. Returns
        (r_add [H,W], r_query [H,W]) or (None, None) when disabled."""
        c = self.config.model
        if not c.use_dynamic_radius:
            return None, None
        gray = rgb @ np.array([0.2125, 0.7154, 0.0721], np.float32)
        kx = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32) / 4.0
        pad = np.pad(gray, 1, mode="edge")
        gx = sum(kx[i, j] * pad[i:i + gray.shape[0], j:j + gray.shape[1]]
                 for i in range(3) for j in range(3))
        gy = sum(kx.T[i, j] * pad[i:i + gray.shape[0], j:j + gray.shape[1]]
                 for i in range(3) for j in range(3))
        mag = np.clip(np.sqrt(gx**2 + gy**2), 0.0,
                      c.pointcloud_color_grad_threshold)
        xs = [0.0, 0.01, c.pointcloud_color_grad_threshold]
        r_add = np.interp(mag, xs, [c.pointcloud_radius_add_max,
                                    c.pointcloud_radius_add_max,
                                    c.pointcloud_radius_add_min])
        ratio = c.pointcloud_radius_query_ratio
        r_query = np.interp(mag, xs, [ratio * c.pointcloud_radius_add_max,
                                      ratio * c.pointcloud_radius_add_max,
                                      ratio * c.pointcloud_radius_add_min])
        return r_add.astype(np.float32), r_query.astype(np.float32)

    def _frame_rgbdr(self, frame: Frame) -> jnp.ndarray:
        """[H, W, 5] rgb + depth + dynamic r_query map for a frame."""
        _, r_query = self.cal_dynamic_radius(frame.rgb)
        if r_query is None:
            r_query = np.full(frame.depth.shape,
                              self.config.model.pointcloud_radius_query,
                              np.float32)
        return jnp.concatenate([
            jnp.asarray(frame.rgb),
            jnp.asarray(frame.depth)[..., None],
            jnp.asarray(r_query)[..., None],
        ], -1)

    def _phase_lr(self, group: str, stage: str) -> float:
        sched = self._scheds.get(group)
        if isinstance(sched, PointSLAMSchedulerConfig):
            return sched.lr_for_stage("geometry" if stage == "geometry" else "color")
        return self._opt_cfgs[group].lr

    # ------------------------------------------------------------------
    def _build_jits(self) -> None:
        cfg = self.config
        model = self.model
        H, W = self.camera.height, self.camera.width

        def track_step(params, maps, rgbdr, pose0, key):
            sched = self._tracking_lr_schedule(self._opt_cfgs["tracking_pose"].lr)
            opt = GroupOptimizers({"tracking_pose": self._opt_cfgs["tracking_pose"]},
                                  schedules={"tracking_pose": sched} if sched else None)
            pv = {"tracking_pose": pose0}
            opt_state = opt.init(pv)

            def body(carry, k):
                pv, opt_state, best = carry
                k1, k2 = jax.random.split(k)
                u, v = sample_pixels(k1, self._round_to_devices(cfg.tracking_sample),
                                     H, W, cfg.tracking_Hedge, cfg.tracking_Wedge)
                ui, vi = self._shard_rays(u.astype(jnp.int32), v.astype(jnp.int32))
                px = rgbdr[vi, ui]
                td = px[:, 3:4]
                ts = px[:, :3]
                rq = px[:, 4]
                d_cam = self._dirs[vi, ui]

                def loss_fn(p):
                    pose = p["tracking_pose"]
                    R = lie.quaternion_to_matrix(pose[3:])
                    rays_d = d_cam @ R.T
                    rays_o = jnp.broadcast_to(pose[:3], rays_d.shape)
                    loss, _ = model.get_loss(params, maps, k2, rays_o, rays_d, ts, td, False, "color", r_query=rq)
                    return loss

                loss, g = jax.value_and_grad(loss_fn)(pv)
                best_loss, bp = best
                better = loss < best_loss
                best = (jnp.where(better, loss, best_loss), jnp.where(better, pv["tracking_pose"], bp))
                g = self._finite_guard(loss, g)
                pv, opt_state = opt.update(g, opt_state, pv)
                return (pv, opt_state, best), loss

            keys = jax.random.split(key, cfg.tracking_n_iters)
            (_, _, best), _ = jax.lax.scan(body, (pv, opt_state, (jnp.asarray(1e10, jnp.float32), pose0)), keys)
            return best[1], best[0]

        self._track_step = jax.jit(track_step)

        def map_step(params, maps, images, poses, grad_uv, n_valid, key,
                     opt_state, *, n_frames, geo_steps, color_steps, n_grad):
            # images/poses padded to the STATIC window size; the
            # slot->frame map (window_slot_frame) spreads slots evenly over
            # the n_valid real frames and pins slot W-1 to the CURRENT
            # frame (the color-grad extra pixels land on it) -> one
            # compiled program for every window length
            # pixs rounded so the concatenated ray batch (n_frames*pixs +
            # n_grad) stays divisible by the dp mesh; n_grad is a config
            # constant the user must pick divisible when devices>1
            #
            # (geo_steps, color_steps) are this CALL's slice of the
            # geometry->color schedule; opt_state (None on the first chunk)
            # carries Adam moments across chunk calls so a long first
            # mapping can run as several sub-watchdog device programs
            # (one >100 s program kills the TPU worker — round-4 diagnosis)
            pixs = self._round_to_devices(
                max(cfg.mapping_sample // n_frames, cfg.min_sample_pixels))
            phases = [("geometry", geo_steps), ("color", color_steps)]
            groups_all = [g for g in ("decoder", "geometry", "color") if g in params and (g != "decoder" or params["decoder"])]
            all_params = {g: params[g] for g in groups_all}
            for stage, steps in phases:
                if steps <= 0:
                    continue
                cfgs = {}
                for g in groups_all:
                    c = self._opt_cfgs[g].copy()
                    c.lr = self._phase_lr(g, stage)
                    cfgs[g] = c
                opt = GroupOptimizers(cfgs)
                if opt_state is None:
                    opt_state = opt.init(all_params)

                def body(carry, k, stage=stage, opt=opt):
                    ap, opt_state = carry
                    k1, k2 = jax.random.split(k)

                    def loss_fn(p):
                        mp = {**params, **p}
                        keys = jax.random.split(k1, n_frames)
                        ros, rds, tss, tds, rqs = [], [], [], [], []
                        for f in range(n_frames):
                            fi = self.window_slot_frame(f, n_valid, n_frames)
                            u, v = sample_pixels(keys[f], pixs, H, W)
                            ui, vi = u.astype(jnp.int32), v.astype(jnp.int32)
                            if n_grad > 0 and f == n_frames - 1:
                                # extra top color-grad pixels on the current
                                # frame (point_slam.py:124-138)
                                ui = jnp.concatenate([ui, grad_uv[:, 0]])
                                vi = jnp.concatenate([vi, grad_uv[:, 1]])
                            m = ui.shape[0]
                            rgbd = images[fi, vi, ui]
                            R = lie.quaternion_to_matrix(poses[fi, 3:])
                            rds.append(self._dirs[vi, ui] @ R.T)
                            ros.append(jnp.broadcast_to(poses[fi, :3], (m, 3)))
                            tss.append(rgbd[:, :3])
                            tds.append(rgbd[:, 3:4])
                            rqs.append(rgbd[:, 4])
                        ro, rd, ts_, td_, rq_ = self._shard_rays(
                            jnp.concatenate(ros), jnp.concatenate(rds),
                            jnp.concatenate(tss), jnp.concatenate(tds),
                            jnp.concatenate(rqs))
                        loss, _ = model.get_loss(
                            mp, maps, k2, ro, rd, ts_, td_, True, stage, r_query=rq_)
                        return loss

                    loss, g = jax.value_and_grad(loss_fn)(ap)
                    g = self._finite_guard(loss, g)
                    ap, opt_state = opt.update(g, opt_state, ap)
                    return (ap, opt_state), loss

                keys = jax.random.split(jax.random.fold_in(key, hash(stage) % 997), steps)
                (all_params, opt_state), _ = jax.lax.scan(body, (all_params, opt_state), keys)
            return {**params, **all_params}, opt_state

        self._map_step_raw = map_step

        # -------- fused group super-step (two programs per group):
        # A: predict + track the head frame (host fetches the pose — the
        #    group's single sync — and runs density-driven point addition,
        #    which stays host-side like the reference's FAISS mutation);
        # B: mapping + trailing-frame tracking scan, one program.
        def predict_q(p1, p2):
            R1 = lie.quaternion_to_matrix(p1[3:])
            R2 = lie.quaternion_to_matrix(p2[3:])
            dR = R1 @ R2.T
            tp = dR @ p1[:3] + (p1[:3] - dR @ p2[:3])
            return jnp.concatenate([tp, lie.matrix_to_quaternion(dR @ R1)])

        def track_head(params, maps, rgbdr, p1, p2, key):
            p0 = predict_q(p1, p2)
            best, _ = track_step(params, maps, rgbdr, p0, key)
            return best

        self._track_head_jit = jax.jit(track_head)

        def map_tail(params, maps, kf_images, kf_pose, rgbdrs, cur_pose,
                     win_slots, n_valid, grad_uv, prev_pose, key, kf_slot, *,
                     group, n_iters, n_grad, do_kf):
            keys = jax.random.split(key, group + 1)
            wn = cfg.mapping_window_size
            cur_img = rgbdrs[0]
            images = jnp.concatenate([kf_images[win_slots], cur_img[None]], 0)
            poses = jnp.concatenate([kf_pose[win_slots], cur_pose[None]], 0)
            is_cur = jnp.arange(wn) >= n_valid - 1
            images = jnp.where(is_cur[:, None, None, None], cur_img[None], images)
            poses = jnp.where(is_cur[:, None], cur_pose[None], poses)
            geo_iters = int(cfg.mapping_geo_iter_ratio * n_iters)
            params, _ = map_step(params, maps, images, poses, grad_uv,
                                 n_valid, keys[group], None, n_frames=wn,
                                 geo_steps=geo_iters,
                                 color_steps=n_iters - geo_iters,
                                 n_grad=n_grad)
            if do_kf:
                kf_images = kf_images.at[kf_slot].set(cur_img)
                kf_pose = kf_pose.at[kf_slot].set(cur_pose)

            def tail_body(carry, xs):
                p1, p2 = carry
                rgbdr_j, key_j = xs
                pj = predict_q(p1, p2)
                bj, _ = track_step(params, maps, rgbdr_j, pj, key_j)
                return (bj, p1), bj

            (_, _), tail = jax.lax.scan(
                tail_body, (cur_pose, prev_pose), (rgbdrs[1:], keys[:group - 1]))
            all_poses = jnp.concatenate([cur_pose[None], tail], 0)
            return params, kf_images, kf_pose, all_poses[:, :3], all_poses[:, 3:]

        self._map_tail_raw = map_tail
        self._fused_variants: Dict[Tuple, Any] = {}

        def render_chunk(params, maps, rays_o, rays_d, td, key):
            # offline render: use the max dynamic query radius everywhere
            # (frames rendered without a stored per-pixel r map)
            rq = jnp.full(rays_o.shape[:1], model._max_query_radius())
            return model.render_rays(params, maps, key, rays_o, rays_d, td, "color", r_query=rq)

        self._render_chunk = jax.jit(render_chunk)

    # ------------------------------------------------------------------
    def add_points_from_frame(self, frame: Frame, n_pixels: int) -> None:
        """Density-driven point addition (point_slam.py:94-155); with
        dynamic radii the density test and along-ray spread use the
        per-pixel r_add (point_slam.py:113-121)."""
        cfg = self.config.model
        rng = np.random.default_rng(int(self._next_key()[0]))
        d = frame.depth
        vs, us = np.nonzero(d > 0)
        if len(vs) == 0:
            return
        pick = rng.integers(0, len(vs), min(n_pixels, len(vs)))
        u, v = us[pick], vs[pick]
        z = d[v, u]
        r_add_map, _ = self.cal_dynamic_radius(frame.rgb)
        r_add = (r_add_map[v, u] if r_add_map is not None
                 else np.full(len(u), cfg.pointcloud_radius_add, np.float32))
        # extra insertion pixels at top color gradients (point_slam.py:124-138)
        n_grad = self.config.mapping_pixels_based_on_color_grad
        if n_grad > 0:
            gu, gv = self._top_grad_pixels(frame.rgb, n_grad)
            gz = d[gv, gu]
            keep = gz > 0
            u = np.concatenate([u, gu[keep]])
            v = np.concatenate([v, gv[keep]])
            z = np.concatenate([z, gz[keep]])
            gr = (r_add_map[gv, gu][keep] if r_add_map is not None
                  else np.full(int(keep.sum()), cfg.pointcloud_radius_add,
                               np.float32))
            r_add = np.concatenate([r_add, gr])
        c2w = frame.get_pose()
        dirs_w = self._dirs_np[v, u] @ c2w[:3, :3].T
        surf = c2w[:3, 3] + dirs_w * z[:, None]
        counts = self.point_map.neighbor_counts(surf, r_add)
        need = counts < cfg.pointcloud_min_nn_num
        if not need.any():
            return
        spread = r_add[need][:, None]
        zs = z[need][:, None] + spread * np.array([-1.0, 0.0, 1.0])[None, :]
        pts = (c2w[:3, 3][None, None] + dirs_w[need][:, None, :] * zs[..., None]).reshape(-1, 3)
        if self.point_map.add_points(pts):
            self.maps = self._replicate_params(self.point_map.device_state())

    def _top_grad_pixels(self, rgb: np.ndarray, n: int):
        """Top-n color-gradient pixels (u, v) (point_slam.py:124-138)."""
        gray = rgb @ np.array([0.2125, 0.7154, 0.0721], np.float32)
        gx = np.abs(np.diff(gray, axis=1, append=gray[:, -1:]))
        gy = np.abs(np.diff(gray, axis=0, append=gray[-1:]))
        mag = (gx + gy).ravel()
        idx = np.argpartition(mag, -n)[-n:]
        v, u = np.unravel_index(idx, gray.shape)
        return u.astype(np.int64), v.astype(np.int64)

    def dispatch_tracking(self, cur_frame: Frame):
        """Two-phase tracking (async dispatch; pipeline overlaps the next
        frame's prefetch with the in-flight program)."""
        if not self.is_initialized():
            return None
        pose0 = jnp.concatenate([jnp.asarray(cur_frame.t), jnp.asarray(cur_frame.r)])
        best, _ = self._track_step(
            self.model_params, self.maps, self._frame_rgbdr(cur_frame), pose0, self._next_key()
        )
        return best

    def finish_tracking(self, handle) -> Optional[np.ndarray]:
        if handle is None:
            return None
        from ..ops import lie_np

        bp = np.asarray(handle)
        return lie_np.pose_vec_to_matrix(bp[:3], bp[3:], rot_rep="quat")

    def do_mapping(self, cur_frame: Frame) -> None:
        cfg = self.config
        first = not self.is_initialized()
        self.add_points_from_frame(cur_frame, cfg.pixels_adding)
        n_iters = cfg.mapping_first_n_iters if first else cfg.mapping_n_iters
        k = cfg.mapping_window_size - 1
        if self.kf_count <= k:
            slots = list(range(self.kf_count))
        else:
            rng = np.random.default_rng(int(self._next_key()[0]))
            slots = sorted(int(s) for s in rng.permutation(self.kf_count - 1)[: k - 1]) + [self.kf_count - 1]
        cur_pose = np.concatenate([cur_frame.t, cur_frame.r]).astype(np.float32)
        cur_img = self._frame_rgbdr(cur_frame)[None]
        if slots:
            idx = jnp.asarray(slots, jnp.int32)
            images = jnp.concatenate([self.kf_images[idx], cur_img], 0)
            poses = jnp.concatenate([self.kf_pose[idx], jnp.asarray(cur_pose)[None]], 0)
        else:
            images, poses = cur_img, jnp.asarray(cur_pose)[None]
        n_grad = cfg.mapping_pixels_based_on_color_grad
        if n_grad > 0:
            gu, gv = self._top_grad_pixels(cur_frame.rgb, n_grad)
            grad_uv = jnp.asarray(np.stack([gu, gv], -1), jnp.int32)
        else:
            grad_uv = jnp.zeros((0, 2), jnp.int32)
        n_valid = len(slots) + 1
        W_static = cfg.mapping_window_size
        images, poses = self.pad_window(images, poses, cur_img, cur_pose, W_static)
        # chunked dispatch: several sub-watchdog programs, Adam state carried
        # across chunks (semantically one n_iters-long optimization)
        geo_total = int(cfg.mapping_geo_iter_ratio * n_iters)
        chunk = max(int(cfg.map_chunk_iters), 1)
        opt_state = None
        a = 0
        while a < n_iters:
            b = min(a + chunk, n_iters)
            geo_steps = max(0, min(geo_total, b) - a)
            color_steps = (b - a) - geo_steps
            sig = (W_static, geo_steps, color_steps, n_grad, opt_state is None)
            if sig not in self._map_variants:
                self._map_variants[sig] = jax.jit(functools.partial(
                    self._map_step_raw, n_frames=W_static,
                    geo_steps=geo_steps, color_steps=color_steps,
                    n_grad=n_grad))
            self.model_params, opt_state = self._map_variants[sig](
                self.model_params, self.maps, images, poses, grad_uv,
                jnp.asarray(n_valid, jnp.int32), self._next_key(), opt_state)
            a = b
        if first:
            self.set_initialized()

    # ------------------------------------------------------------------
    # fused group super-step (pipeline fast path)
    # ------------------------------------------------------------------
    def dispatch_superstep(self, frames: List[Frame], do_kf: bool,
                           prev_c2w: np.ndarray = None, prev2_c2w: np.ndarray = None,
                           prev_tr=None, prev2_tr=None):
        from ..ops import lie_np

        cfg = self.config
        group = len(frames)
        cur = frames[0]
        if prev_tr is not None:
            p1 = jnp.concatenate([prev_tr[0], prev_tr[1]])
            p2 = jnp.concatenate([prev2_tr[0], prev2_tr[1]])
        else:
            t1, q1 = lie_np.matrix_to_pose_vec(np.asarray(prev_c2w, np.float32), rot_rep="quat")
            t2, q2 = lie_np.matrix_to_pose_vec(np.asarray(prev2_c2w, np.float32), rot_rep="quat")
            p1 = jnp.asarray(np.concatenate([t1, q1]), jnp.float32)
            p2 = jnp.asarray(np.concatenate([t2, q2]), jnp.float32)
        rgbdrs = jnp.stack([self._frame_rgbdr(f) for f in frames])
        best = self._track_head_jit(self.model_params, self.maps, rgbdrs[0], p1, p2, self._next_key())
        bp = np.asarray(best)  # the group's single host sync
        cur.t, cur.r = bp[:3].copy(), bp[3:].copy()
        # density-driven growth (host, like the reference FAISS mutation)
        self.add_points_from_frame(cur, cfg.pixels_adding)
        # window: random keyframes + current (do_mapping's selection)
        k = cfg.mapping_window_size - 1
        if self.kf_count <= k:
            slots = list(range(self.kf_count))
        else:
            rng = np.random.default_rng(int(self._next_key()[0]))
            slots = sorted(int(s) for s in rng.permutation(self.kf_count - 1)[: k - 1]) + [self.kf_count - 1]
        n_valid = len(slots) + 1
        wn = cfg.mapping_window_size
        win_slots = jnp.asarray(slots + [0] * (wn - 1 - len(slots)), jnp.int32)
        n_grad = cfg.mapping_pixels_based_on_color_grad
        if n_grad > 0:
            gu, gv = self._top_grad_pixels(cur.rgb, n_grad)
            grad_uv = jnp.asarray(np.stack([gu, gv], -1), jnp.int32)
        else:
            grad_uv = jnp.zeros((0, 2), jnp.int32)
        sig = (group, cfg.mapping_n_iters, n_grad, do_kf)
        if sig not in self._fused_variants:
            self._fused_variants[sig] = jax.jit(functools.partial(
                self._map_tail_raw, group=group, n_iters=cfg.mapping_n_iters,
                n_grad=n_grad, do_kf=do_kf))
        kf_slot = self.kf_count
        if do_kf and kf_slot >= cfg.max_keyframes:
            raise RuntimeError("keyframe capacity exceeded")
        out = self._fused_variants[sig](
            self.model_params, self.maps, self.kf_images, self.kf_pose,
            rgbdrs, jnp.asarray(bp), win_slots, jnp.asarray(n_valid, jnp.int32),
            grad_uv, p1, self._next_key(), jnp.asarray(kf_slot, jnp.int32))
        self.model_params, self.kf_images, self.kf_pose, pt, pq = out
        if do_kf:
            self.kf_count += 1
            self.keyframe_fids.append(cur.fid)
        return (pt, pq)

    def finish_superstep(self, handle) -> List[np.ndarray]:
        from ..ops import lie_np

        pt, pq = jax.device_get(handle)
        return [lie_np.pose_vec_to_matrix(pt[j], pq[j], rot_rep="quat")
                for j in range(pt.shape[0])]

    def add_keyframe(self, keyframe: Frame) -> None:
        if self.kf_count >= self.config.max_keyframes:
            raise RuntimeError("keyframe capacity exceeded")
        slot = self.kf_count
        self.kf_images = self.kf_images.at[slot].set(self._frame_rgbdr(keyframe))
        self.kf_pose = self.kf_pose.at[slot].set(jnp.concatenate([jnp.asarray(keyframe.t), jnp.asarray(keyframe.r)]))
        self.kf_count += 1
        self.keyframe_fids.append(keyframe.fid)

    def render_img(self, c2w: np.ndarray, gt_depth: Optional[np.ndarray] = None, idx: Optional[int] = None):
        cam = self.camera
        c2w = jnp.asarray(c2w, jnp.float32)
        rays_d = self._dirs.reshape(-1, 3) @ c2w[:3, :3].T
        rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
        gt = jnp.zeros((rays_d.shape[0], 1)) if gt_depth is None else jnp.asarray(gt_depth).reshape(-1, 1)
        bs = self.config.ray_batch_size
        dep, col = [], []
        for i in range(0, rays_d.shape[0], bs):
            ro, rd, td = rays_o[i : i + bs], rays_d[i : i + bs], gt[i : i + bs]
            pad = bs - ro.shape[0]
            if pad > 0:
                ro = jnp.pad(ro, ((0, pad), (0, 0)))
                rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
                td = jnp.pad(td, ((0, pad), (0, 0)))
            out = self._render_chunk(self.model_params, self.maps, ro, rd, td, self._next_key())
            take = bs - pad if pad > 0 else bs
            dep.append(np.asarray(out["depth"][:take]))
            col.append(np.asarray(out["rgb"][:take]))
        return (
            np.clip(np.concatenate(col).reshape(cam.height, cam.width, 3), 0, 1),
            np.concatenate(dep).reshape(cam.height, cam.width),
        )

    def get_mesh(self):
        """TSDF-fuse rendered keyframe RGB-D (reference: point_slam.py:426-435
        get_mesh_from_RGBD)."""
        from ..ops.tsdf_fusion import TSDFVolume

        if self.kf_count == 0:
            return None
        pts = self.point_map.pos[: self.point_map.n_points]
        lo, hi = pts.min(0) - 0.2, pts.max(0) + 0.2
        vol = TSDFVolume(np.stack([lo, hi], -1), voxel_size=float((hi - lo).max()) / self.config.mesh_resolution)
        from ..ops import lie_np

        kf_pose_np = np.asarray(self.kf_pose)
        for i in range(self.kf_count):
            c2w = lie_np.pose_vec_to_matrix(kf_pose_np[i, :3], kf_pose_np[i, 3:], rot_rep="quat")
            rgbd = np.asarray(self.kf_images[i])
            color, depth = self.render_img(c2w, gt_depth=rgbd[..., 3])
            depth = np.where(rgbd[..., 3] > 0, depth, 0.0)
            vol.integrate(color, depth, c2w, self.camera)
        self.cur_mesh = vol.extract_mesh()
        return self.cur_mesh
