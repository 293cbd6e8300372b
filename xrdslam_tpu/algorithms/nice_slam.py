"""NICE-SLAM: hierarchical-grid SLAM with staged coarse-to-fine mapping.

TPU-native rebuild of the reference algorithm (reference:
slam/algorithms/nice_slam.py:49-288). Structural mapping:

  * Keyframe images live in a fixed-capacity device table
    ``kf_images [MAX_KF, H, W, 4]`` (rgb+depth); window frames are gathered
    on device. Poses are (t[3], quat[4]) rows.
  * One mapping call = ONE jitted program containing three sequential
    ``lax.scan`` phases (middle → fine → color) whose iteration splits and
    per-group learning rates follow the NiceSLAMScheduler stage ratios
    (reference: schedulers.py:67-85; nice_slam.py:204-232 set_stage).
    Adam moment state carries across phases (equivalent to the reference's
    LambdaLR because Adam moments are lr-independent).
  * Frustum feature selection (conv_onet.py:94-130 param surgery) becomes
    gradient masking: per-grid [X,Y,Z,1] masks computed host-side from the
    current frame and multiplied into grid grads inside the jitted step.
  * The window size (selected keyframes + current frame) is a static jit
    parameter — up to window_size+1 compiled variants, each reused for the
    rest of the run.
  * Keyframe selection 'overlap' reproduces keyframe_selection_overlap
    (common.py:342-426): back-project current depth samples, rank
    keyframes by in-frustum percentage, randomly pick k among visible.
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
from ..common.mesher import MesherConfig
from ..engine.optimizers import AdamOptimizerConfig, GroupOptimizers, OptimizerConfig
from ..engine.schedulers import NiceSLAMSchedulerConfig
from ..models.conv_onet import ConvOnetConfig
from ..ops import lie
from ..ops.sampling import camera_ray_dirs, sample_pixels
from .base import Algorithm, AlgorithmConfig


@dataclass
class NiceSLAMConfig(AlgorithmConfig):
    """reference: slam/algorithms/nice_slam.py:14-46."""

    _target: Type = field(default_factory=lambda: NiceSLAM)
    model: ConvOnetConfig = field(default_factory=ConvOnetConfig)
    mesher: MesherConfig = field(default_factory=MesherConfig)
    mapping_sample: int = 2048
    min_sample_pixels: int = 100
    tracking_sample: int = 1024
    ray_batch_size: int = 3000
    marching_cubes_bound: List[List[float]] = field(default_factory=lambda: [[-3.5, 3], [-3, 3], [-3, 3]])
    mapping_bound: List[List[float]] = field(default_factory=lambda: [[-3.5, 3], [-3, 3], [-3, 3]])
    tracking_Wedge: int = 100
    tracking_Hedge: int = 100
    mapping_middle_iter_ratio: float = 0.4
    mapping_fine_iter_ratio: float = 0.6
    mapping_lr_factor: float = 1.0
    mapping_lr_first_factor: float = 5.0
    mapping_color_refine: bool = True
    max_keyframes: int = 64
    seed: int = 0


class NiceSLAM(Algorithm):
    config: NiceSLAMConfig

    def __init__(self, config: NiceSLAMConfig, camera: Camera) -> None:
        super().__init__(config, camera)
        config.model.coarse = config.coarse
        self.bounding_box = np.asarray(config.mapping_bound, np.float32)
        self.marching_cube_bound = np.asarray(config.marching_cubes_bound, np.float32)
        self.model = config.model.setup(camera=camera, bounding_box=self.bounding_box)
        self.mesher = config.mesher.setup(
            camera=camera, bounding_box=self.model.bounding_box, marching_cubes_bound=self.marching_cube_bound
        )
        self._key = jax.random.PRNGKey(config.seed)
        self.model_params = self._replicate_params(self.model.init_params(self._next_key()))

        self.max_kf = config.max_keyframes
        H, W = camera.height, camera.width
        self.kf_images = jnp.zeros((self.max_kf, H, W, 4), jnp.float32)
        self.kf_pose = jnp.zeros((self.max_kf, 7), jnp.float32)  # t(3) + quat(4)
        # host mirror of kf poses for overlap ranking: reading the device
        # array would synchronize with in-flight fused programs; the mirror
        # may lag by the pipelining depth, fine for a selection heuristic
        self.kf_pose_host = np.zeros((self.max_kf, 7), np.float32)
        self.kf_count = 0
        self._dirs = camera_ray_dirs(camera)
        self.cur_mesh = None
        self._map_variants: Dict[Tuple, Any] = {}
        self._build_jits()

    def _next_key(self) -> jax.Array:
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------
    # per-group stage learning rates
    # ------------------------------------------------------------------
    def _stage_lr(self, group: str, stage: str, lr_factor: float) -> float:
        g = self.config.optimizers.get(group)
        if g is None:
            return 0.0
        sched = g.get("scheduler")
        if isinstance(sched, NiceSLAMSchedulerConfig):
            return lr_factor * sched.lr_for_stage(stage)
        return g["optimizer"].lr

    def _phase_groups(self, stage: str, lr_factor: float, optimize_pose: bool, coarse: bool) -> Dict[str, OptimizerConfig]:
        groups: Dict[str, OptimizerConfig] = {}
        grid_names = ["grid_coarse"] if coarse else [g for g in self.model.grid_shapes if g != "grid_coarse"]
        for g in grid_names:
            base = self.config.optimizers.get(g, {"optimizer": AdamOptimizerConfig()})["optimizer"]
            cfg = base.copy()
            cfg.lr = self._stage_lr(g, stage, lr_factor)
            groups[g] = cfg
        if not coarse and self.model.trainable_decoders:
            base = self.config.optimizers["decoder"]["optimizer"].copy()
            base.lr = self._stage_lr("decoder", stage, lr_factor)
            # without pretrained decoders the occupancy nets must actually
            # train in their own stages, not only in the color stage — but at
            # MLP-safe step size: the reference's decoder color lr (0.005),
            # NOT grid lr x first-frame factor (0.5), which blows the 5-block
            # MLP to inf within a few Adam steps (round-3 NaN diagnosis).
            if not self.model.pretrained_available:
                if base.lr == 0.0:
                    base.lr = self._stage_lr("decoder", "color", 1.0)
                # clip in EVERY stage, not just lr==0 ones: the opt state is
                # shared across the middle/fine/color phases of one map call,
                # and optax.chain length must match it in all of them
                base.max_norm = base.max_norm or 10.0
            groups["decoder"] = base
        if optimize_pose and not coarse:
            base = self.config.optimizers["mapping_pose"]["optimizer"].copy()
            base.lr = self._stage_lr("mapping_pose", stage, lr_factor)
            groups["pose"] = base
        return groups

    # ------------------------------------------------------------------
    def _build_jits(self) -> None:
        cfg = self.config
        model = self.model
        cam = self.camera
        H, W = cam.height, cam.width
        bound = jnp.asarray(model.bounding_box)

        def ray_prefilter_mask(rays_o, rays_d, td):
            """Drop rays exiting the bound before their depth
            (nice_slam.py:180-194)."""
            t = (bound[None] - rays_o[:, :, None]) / rays_d[:, :, None]
            t_exit = jnp.min(jnp.max(t, axis=2), axis=1)
            return (t_exit >= td[:, 0]).astype(jnp.float32)

        def sample_frame_rays(k, images, poses, n_frames, n_valid, pixs, hedge, wedge):
            """Sample pixs rays from each of n_frames STATIC slots; the
            slot->frame map (window_slot_frame) spreads slots evenly over
            the n_valid real frames so padded windows share one compiled
            program. images [n,H,W,4], poses [n,7] -> [n*pixs, ...]."""
            keys = jax.random.split(k, n_frames)
            ros, rds, tss, tds = [], [], [], []
            for f in range(n_frames):
                fi = self.window_slot_frame(f, n_valid, n_frames)
                u, v = sample_pixels(keys[f], pixs, H, W, hedge, wedge)
                ui, vi = u.astype(jnp.int32), v.astype(jnp.int32)
                rgbd = images[fi, vi, ui]
                d_cam = self._dirs[vi, ui]
                R = lie.quaternion_to_matrix(poses[fi, 3:])
                rds.append(d_cam @ R.T)
                ros.append(jnp.broadcast_to(poses[fi, :3], (pixs, 3)))
                tss.append(rgbd[:, :3])
                tds.append(rgbd[:, 3:4])
            return self._shard_rays(
                jnp.concatenate(ros), jnp.concatenate(rds),
                jnp.concatenate(tss), jnp.concatenate(tds))

        # ---------------- tracking -------------------------------------
        def track_step(params, rgb, depth, pose0, key):
            sched = self._tracking_lr_schedule(cfg.optimizers["tracking_pose"]["optimizer"].lr)
            opt = GroupOptimizers({"tracking_pose": cfg.optimizers["tracking_pose"]["optimizer"]},
                                  schedules={"tracking_pose": sched} if sched else None)
            pvars = {"tracking_pose": pose0}
            opt_state = opt.init(pvars)

            def body(carry, k):
                pvars, opt_state, best = carry
                k1, k2 = jax.random.split(k)
                u, v = sample_pixels(k1, self._round_to_devices(cfg.tracking_sample),
                                     H, W, cfg.tracking_Hedge, cfg.tracking_Wedge)
                ui, vi = self._shard_rays(u.astype(jnp.int32), v.astype(jnp.int32))
                td = depth[vi, ui][:, None]
                ts = rgb[vi, ui]
                d_cam = self._dirs[vi, ui]

                def loss_fn(p):
                    pose = p["tracking_pose"]
                    R = lie.quaternion_to_matrix(pose[3:])
                    rays_d = d_cam @ R.T
                    rays_o = jnp.broadcast_to(pose[:3], rays_d.shape)
                    rm = ray_prefilter_mask(rays_o, rays_d, td)
                    loss, _ = model.get_loss(params, k2, rays_o, rays_d, ts, td, rm, False, "color")
                    return loss

                loss, g = jax.value_and_grad(loss_fn)(pvars)
                best_loss, best_pose = best
                better = loss < best_loss
                best = (jnp.where(better, loss, best_loss), jnp.where(better, pvars["tracking_pose"], best_pose))
                g = self._finite_guard(loss, g)
                pvars, opt_state = opt.update(g, opt_state, pvars)
                # keep the 7-vector on the quaternion manifold: Adam at the
                # protocol-scale lr (3e-3 x 50 iters) denormalizes |q| enough
                # to destabilize the loss surface without this projection
                pq = pvars["tracking_pose"]
                qn = jnp.linalg.norm(pq[3:]).clip(1e-8)
                pvars = {"tracking_pose": jnp.concatenate([pq[:3], pq[3:] / qn])}
                return (pvars, opt_state, best), loss

            keys = jax.random.split(key, cfg.tracking_n_iters)
            init = (pvars, opt_state, (jnp.asarray(1e10, jnp.float32), pose0))
            (_, _, best), _ = jax.lax.scan(body, init, keys)
            return best[1], best[0]

        self._track_step = jax.jit(track_step)

        # ---------------- mapping --------------------------------------
        grid_names = [g for g in model.grid_shapes]

        def map_step(params, images, poses, masks, n_valid, key, *, n_frames, n_iters, lr_factor, optimize_pose, coarse):
            pixs = self._round_to_devices(
                max(cfg.mapping_sample // n_frames, cfg.min_sample_pixels))
            all_params: Dict[str, Any] = {g: params[g] for g in grid_names if (g == "grid_coarse") == coarse}
            if not coarse and model.trainable_decoders:
                all_params["decoder"] = params["decoder"]
            if optimize_pose and not coarse:
                all_params["pose"] = poses

            if coarse:
                phases = [("coarse", n_iters)]
            else:
                m_end = int(cfg.mapping_middle_iter_ratio * n_iters)
                f_end = int(cfg.mapping_fine_iter_ratio * n_iters)
                phases = [("middle", m_end), ("fine", f_end - m_end), ("color", n_iters - f_end)]

            opt_state = None
            for stage, steps in phases:
                if steps <= 0:
                    continue
                opt = GroupOptimizers(self._phase_groups(stage, lr_factor, optimize_pose, coarse))
                if opt_state is None:
                    opt_state = opt.init(all_params)

                def body(carry, k, stage=stage, opt=opt):
                    ap, opt_state = carry
                    k1, k2 = jax.random.split(k)

                    def loss_fn(p):
                        pz = p.get("pose", poses)
                        # oldest window frame fixed (base_algorithm.py:195-205)
                        pz = pz.at[0].set(jax.lax.stop_gradient(pz[0]))
                        mp = {**params, **{g: p[g] for g in p if g != "pose"}}
                        ro, rd, ts, td = sample_frame_rays(k1, images, pz, n_frames, n_valid, pixs, 0, 0)
                        rm = ray_prefilter_mask(ro, rd, td)
                        loss, _ = model.get_loss(mp, k2, ro, rd, ts, td, rm, True, stage)
                        return loss

                    loss, g = jax.value_and_grad(loss_fn)(ap)
                    if cfg.model.mapping_frustum_feature_selection and not coarse:
                        for gn in grid_names:
                            if gn in g and gn in masks:
                                g[gn] = g[gn] * masks[gn]
                    g = self._finite_guard(loss, g)
                    ap, opt_state = opt.update(g, opt_state, ap)
                    if "pose" in ap:
                        pz = ap["pose"]
                        qn = jnp.linalg.norm(pz[:, 3:], axis=-1, keepdims=True).clip(1e-8)
                        ap["pose"] = jnp.concatenate([pz[:, :3], pz[:, 3:] / qn], -1)
                    return (ap, opt_state), loss

                keys = jax.random.split(jax.random.fold_in(key, hash(stage) % 1000), steps)
                (all_params, opt_state), _ = jax.lax.scan(body, (all_params, opt_state), keys)

            new_params = {**params, **{g: all_params[g] for g in all_params if g != "pose"}}
            new_poses = all_params.get("pose", poses)
            # belt-and-braces: never let a non-finite optimized pose escape
            # into the keyframe table / pipeline (the guards above should
            # make this a no-op, but a NaN pose cascades into a hard crash
            # at Frame construction ~5 frames later). The clamp count is
            # returned so the host can WARN when it fires — silent clamping
            # would hide optimization regressions (VERDICT r4 item #6).
            bad = jnp.any(~jnp.isfinite(new_poses), axis=-1)
            new_poses = jnp.where(jnp.isfinite(new_poses), new_poses, poses)
            return new_params, new_poses, jnp.sum(bad.astype(jnp.int32))

        self._map_step_raw = map_step

        # -------- fused group super-step: track(head) -> frustum masks ->
        # fine map -> coarse map -> [kf insert] -> track trailing frames,
        # ONE device program per map_every-frame group (Co-SLAM pattern,
        # coslam.py _get_super_step). ---------------------------------------
        def predict_q(p1, p2):
            R1 = lie.quaternion_to_matrix(p1[3:])
            R2 = lie.quaternion_to_matrix(p2[3:])
            dR = R1 @ R2.T
            dt = p1[:3] - dR @ p2[:3]
            Rp = dR @ R1
            tp = dR @ p1[:3] + dt
            return jnp.concatenate([tp, lie.matrix_to_quaternion(Rp)])

        def window_arrays(kf_images, kf_pose, slots, n_valid, cur_img, cur_pose, wn):
            images = jnp.concatenate([kf_images[slots], cur_img[None]], 0)
            poses = jnp.concatenate([kf_pose[slots], cur_pose[None]], 0)
            is_cur = jnp.arange(wn) >= n_valid - 1
            images = jnp.where(is_cur[:, None, None, None], cur_img[None], images)
            poses = jnp.where(is_cur[:, None], cur_pose[None], poses)
            return images, poses

        def fused_step(params, kf_images, kf_pose, rgbs, depths, fine_slots,
                       coarse_slots, n_valid_f, n_valid_c, prev_pose, prev2_pose,
                       key, kf_slot, *, group, n_iters, lr_factor,
                       optimize_pose, do_kf):
            keys = jax.random.split(key, group + 3)
            p0 = predict_q(prev_pose, prev2_pose)
            best, _ = track_step(params, rgbs[0], depths[0], p0, keys[0])
            cur_img = jnp.concatenate([rgbs[0], depths[0][..., None]], -1)
            c2w = lie.pose_vec_to_matrix(best[:3], best[3:], rot_rep="quat")
            masks = (model.frustum_grid_masks_dev(c2w, depths[0])
                     if cfg.model.mapping_frustum_feature_selection else {})
            wn = cfg.mapping_window_size + 1
            images, poses = window_arrays(kf_images, kf_pose, fine_slots,
                                          n_valid_f, cur_img, best, wn)
            params, new_poses, n_clamped = map_step(
                params, images, poses, masks, n_valid_f, keys[group],
                n_frames=wn, n_iters=n_iters, lr_factor=lr_factor,
                optimize_pose=optimize_pose, coarse=False)
            if optimize_pose:
                real = jnp.arange(wn - 1) < n_valid_f - 1
                sl = jnp.where(real, fine_slots, kf_pose.shape[0])
                kf_pose = kf_pose.at[sl].set(new_poses[: wn - 1], mode="drop")
            cur_pose = new_poses[n_valid_f - 1]
            if cfg.coarse:
                wc = cfg.mapping_window_size
                images_c, poses_c = window_arrays(kf_images, kf_pose, coarse_slots,
                                                  n_valid_c, cur_img, cur_pose, wc)
                params, _, ncl_c = map_step(
                    params, images_c, poses_c, {}, n_valid_c, keys[group + 1],
                    n_frames=wc, n_iters=n_iters, lr_factor=lr_factor,
                    optimize_pose=False, coarse=True)
                n_clamped = n_clamped + ncl_c
            if do_kf:
                kf_images = kf_images.at[kf_slot].set(cur_img)
                kf_pose = kf_pose.at[kf_slot].set(cur_pose)

            def tail_body(carry, xs):
                p1, p2 = carry
                rgb_j, depth_j, key_j = xs
                pj = predict_q(p1, p2)
                bj, _ = track_step(params, rgb_j, depth_j, pj, key_j)
                return (bj, p1), bj

            (_, _), tail = jax.lax.scan(
                tail_body, (cur_pose, prev_pose),
                (rgbs[1:], depths[1:], keys[1:group]))
            all_poses = jnp.concatenate([cur_pose[None], tail], 0)
            return (params, kf_images, kf_pose, all_poses[:, :3],
                    all_poses[:, 3:], n_clamped)

        self._fused_raw = fused_step
        self._fused_variants: Dict[Tuple, Any] = {}

        # ---------------- renders / queries ----------------------------
        def render_chunk(params, rays_o, rays_d, target_d, key):
            return model.render_rays(params, key, rays_o, rays_d, target_d, "color")

        def render_chunk_no_depth(params, rays_o, rays_d, key):
            return model.render_rays(params, key, rays_o, rays_d, None, "color")

        self._render_chunk = jax.jit(render_chunk)
        self._render_chunk_no_depth = jax.jit(render_chunk_no_depth)
        self._query_occ = jax.jit(lambda p, pts: model.query_raw(p, pts, "fine")[..., 3])
        self._query_color = jax.jit(lambda p, pts: jnp.clip(model.query_raw(p, pts, "color")[..., :3], 0.0, 1.0))

    def _map_variant(self, n_frames: int, n_iters: int, lr_factor: float, optimize_pose: bool, coarse: bool):
        sig = (n_frames, n_iters, lr_factor, optimize_pose, coarse)
        if sig not in self._map_variants:
            self._map_variants[sig] = jax.jit(
                functools.partial(
                    self._map_step_raw,
                    n_frames=n_frames,
                    n_iters=n_iters,
                    lr_factor=lr_factor,
                    optimize_pose=optimize_pose,
                    coarse=coarse,
                )
            )
        return self._map_variants[sig]

    # ------------------------------------------------------------------
    # host API
    # ------------------------------------------------------------------
    def dispatch_tracking(self, cur_frame: Frame):
        """Two-phase tracking (async dispatch; pipeline overlaps the next
        frame's prefetch with the in-flight program)."""
        if not self.is_initialized():
            return None
        pose0 = jnp.concatenate([jnp.asarray(cur_frame.t), jnp.asarray(cur_frame.r)])
        best_pose, _ = self._track_step(
            self.model_params, cur_frame.rgb_jax(), cur_frame.depth_jax(), pose0, self._next_key()
        )
        return best_pose

    def finish_tracking(self, handle) -> Optional[np.ndarray]:
        if handle is None:
            return None
        from ..ops import lie_np

        bp = np.asarray(handle)
        return lie_np.pose_vec_to_matrix(bp[:3], bp[3:], rot_rep="quat")

    def _select_window(self, cur_depth: np.ndarray, cur_c2w: np.ndarray) -> List[int]:
        """Overlap keyframe selection -> list of kf slots (oldest first)."""
        k = self.config.mapping_window_size - 2
        if self.kf_count <= self.config.mapping_window_size:
            sel = list(range(self.kf_count))
        elif self.config.keyframe_selection_method == "random":
            rng = np.random.default_rng(int(self._next_key()[0]))
            sel = list(rng.permutation(self.kf_count - 1)[:k]) + [self.kf_count - 1]
        else:
            sel = self._overlap_selection(cur_depth, cur_c2w, k) + [self.kf_count - 1]
        return sorted(set(int(s) for s in sel))

    def _overlap_selection(self, depth: np.ndarray, cur_c2w: np.ndarray, k: int, pixs: int = 100, n_samples: int = 16) -> List[int]:
        cam = self.camera
        rng = np.random.default_rng(int(self._next_key()[0]))
        vs, us = np.where(depth > 0)
        if len(vs) == 0:
            return list(rng.permutation(max(self.kf_count - 1, 0))[:k])
        pick = rng.integers(0, len(vs), pixs)
        u, v = us[pick].astype(np.float64), vs[pick].astype(np.float64)
        d = depth[vs[pick], us[pick]].astype(np.float64)
        c2w = np.asarray(cur_c2w, np.float64)
        dirs = np.stack([(u - cam.cx) / cam.fx, -(v - cam.cy) / cam.fy, -np.ones_like(u)], -1)
        t_vals = np.linspace(0.0, 1.0, n_samples)
        z = (0.8 * d)[:, None] * (1 - t_vals)[None] + (d + 0.5)[:, None] * t_vals[None]
        pts = c2w[:3, 3] + (dirs @ c2w[:3, :3].T)[:, None, :] * z[..., None]
        pts = pts.reshape(-1, 3)
        scores = []
        kf_pose_np = self.kf_pose_host
        for i in range(self.kf_count - 1):
            from ..ops import lie_np

            kc2w = np.asarray(lie_np.pose_vec_to_matrix(kf_pose_np[i, :3], kf_pose_np[i, 3:], rot_rep="quat"), np.float64)
            w2c = np.linalg.inv(kc2w)
            pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
            pc[:, 0] *= -1
            zc = pc[:, 2] + 1e-5
            uu = cam.fx * pc[:, 0] / zc + cam.cx
            vv = cam.fy * pc[:, 1] / zc + cam.cy
            edge = 20
            mask = (uu < cam.width - edge) & (uu > edge) & (vv < cam.height - edge) & (vv > edge) & (zc < 0)
            scores.append(mask.mean())
        visible = [i for i, s in enumerate(scores) if s > 0]
        return list(rng.permutation(visible)[:k])

    def do_mapping(self, cur_frame: Frame) -> None:
        cfg = self.config
        first = not self.is_initialized()
        n_iters = cfg.mapping_first_n_iters if first else cfg.mapping_n_iters
        lr_factor = cfg.mapping_lr_first_factor if first else cfg.mapping_lr_factor

        refine = cur_frame.is_final_frame and cfg.mapping_color_refine and not first
        window_size = cfg.mapping_window_size * 2 if refine else cfg.mapping_window_size
        outer_iters = 5 if refine else 1

        cur_pose = np.concatenate([cur_frame.t, cur_frame.r]).astype(np.float32)
        for _ in range(outer_iters):
            slots = self._select_window(cur_frame.depth, cur_frame.get_pose())[-window_size:]
            n_valid = len(slots) + 1
            images, poses = self._gather_window(slots, cur_frame, cur_pose,
                                                pad_to=window_size + 1)
            masks = (
                {k: jnp.asarray(v) for k, v in self.model.frustum_grid_masks(cur_frame.get_pose(), cur_frame.depth).items()}
                if cfg.model.mapping_frustum_feature_selection and not refine
                else {}
            )
            optimize_pose = self.kf_count > 4 and not refine
            fn = self._map_variant(window_size + 1, n_iters, lr_factor, optimize_pose, False)
            self.model_params, new_poses, n_clamped = fn(
                self.model_params, images, poses, masks,
                jnp.asarray(n_valid, jnp.int32), self._next_key())
            self._warn_clamped(n_clamped)
            new_poses = np.asarray(new_poses)
            if optimize_pose:
                for j, s in enumerate(slots):
                    self.kf_pose = self.kf_pose.at[s].set(jnp.asarray(new_poses[j]))
                    self.kf_pose_host[s] = new_poses[j]
                cur_pose = new_poses[n_valid - 1]
                cur_frame.t = cur_pose[:3].copy()
                cur_frame.r = cur_pose[3:].copy()

        if cfg.coarse:
            rng = np.random.default_rng(int(self._next_key()[0]))
            k = cfg.mapping_window_size - 2
            slots = sorted(rng.permutation(max(self.kf_count - 1, 0))[:k]) + ([self.kf_count - 1] if self.kf_count else [])
            slots = [int(s) for s in slots]
            images, poses = self._gather_window(slots, cur_frame, cur_pose,
                                                pad_to=cfg.mapping_window_size)
            fn = self._map_variant(cfg.mapping_window_size, n_iters, lr_factor, False, True)
            self.model_params, _, _ = fn(
                self.model_params, images, poses, {},
                jnp.asarray(len(slots) + 1, jnp.int32), self._next_key())

        if first:
            self.set_initialized()

    def _gather_window(self, slots: List[int], cur_frame: Frame, cur_pose: np.ndarray, pad_to: int = 0):
        cur_img = jnp.concatenate(
            [cur_frame.rgb_jax(), cur_frame.depth_jax()[..., None]], -1
        )[None]
        if slots:
            idx = jnp.asarray(slots, jnp.int32)
            images = jnp.concatenate([self.kf_images[idx], cur_img], 0)
            poses = jnp.concatenate([self.kf_pose[idx], jnp.asarray(cur_pose)[None]], 0)
        else:
            images = cur_img
            poses = jnp.asarray(cur_pose)[None]
        # padded slots are never read: the slot->frame map stays in
        # [0, n_valid)
        return self.pad_window(images, poses, cur_img, cur_pose, pad_to)

    # ------------------------------------------------------------------
    # fused group super-step (pipeline fast path)
    # ------------------------------------------------------------------
    def dispatch_superstep(self, frames: List[Frame], do_kf: bool,
                           prev_c2w: np.ndarray = None, prev2_c2w: np.ndarray = None,
                           prev_tr=None, prev2_tr=None):
        from ..ops import lie_np

        cfg = self.config
        group = len(frames)
        if prev_tr is not None:
            p1 = jnp.concatenate([prev_tr[0], prev_tr[1]])
            p2 = jnp.concatenate([prev2_tr[0], prev2_tr[1]])
        else:
            t1, q1 = lie_np.matrix_to_pose_vec(np.asarray(prev_c2w, np.float32), rot_rep="quat")
            t2, q2 = lie_np.matrix_to_pose_vec(np.asarray(prev2_c2w, np.float32), rot_rep="quat")
            p1 = jnp.asarray(np.concatenate([t1, q1]), jnp.float32)
            p2 = jnp.asarray(np.concatenate([t2, q2]), jnp.float32)
        cur = frames[0]
        est = self.estimate_c2w_list
        guess = np.asarray(est[-1]) if est else np.eye(4, dtype=np.float32)
        wn1 = cfg.mapping_window_size  # fine slot count (window + cur = wn1+1)
        slots = self._select_window(cur.depth, guess)[-wn1:]
        n_valid_f = len(slots) + 1
        fine_slots = jnp.asarray(slots + [0] * (wn1 - len(slots)), jnp.int32)
        # coarse window: random keyframes + newest (do_mapping coarse path)
        rng = np.random.default_rng(int(self._next_key()[0]))
        kc = cfg.mapping_window_size - 2
        cslots = sorted(int(s) for s in rng.permutation(max(self.kf_count - 1, 0))[:kc])
        if self.kf_count:
            cslots += [self.kf_count - 1]
        n_valid_c = len(cslots) + 1
        coarse_slots = jnp.asarray(
            cslots + [0] * (cfg.mapping_window_size - 1 - len(cslots)), jnp.int32)
        optimize_pose = self.kf_count > 4
        sig = (group, cfg.mapping_n_iters, cfg.mapping_lr_factor, optimize_pose, do_kf)
        if sig not in self._fused_variants:
            self._fused_variants[sig] = jax.jit(functools.partial(
                self._fused_raw, group=group, n_iters=cfg.mapping_n_iters,
                lr_factor=cfg.mapping_lr_factor, optimize_pose=optimize_pose,
                do_kf=do_kf))
        kf_slot = self.kf_count
        if do_kf and kf_slot >= self.max_kf:
            raise RuntimeError(f"keyframe capacity {self.max_kf} exceeded; raise max_keyframes")
        rgbs = jnp.stack([f.rgb_jax() for f in frames])
        depths = jnp.stack([f.depth_jax() for f in frames])
        out = self._fused_variants[sig](
            self.model_params, self.kf_images, self.kf_pose, rgbs, depths,
            fine_slots, coarse_slots, jnp.asarray(n_valid_f, jnp.int32),
            jnp.asarray(n_valid_c, jnp.int32), p1, p2, self._next_key(),
            jnp.asarray(kf_slot, jnp.int32))
        (self.model_params, self.kf_images, self.kf_pose, pt, pq,
         n_clamped) = out
        if do_kf:
            self.kf_count += 1
            self.keyframe_fids.append(cur.fid)
        # FIFO: finish order == dispatch order under pipelining
        if not hasattr(self, "_kf_slot_fifo"):
            self._kf_slot_fifo = []
        self._kf_slot_fifo.append(kf_slot if do_kf else None)
        return (pt, pq, n_clamped)

    def _warn_clamped(self, n_clamped) -> None:
        """Surface in-jit non-finite pose clamps (fc3586e guards) — silent
        clamping would hide an optimization regression."""
        n = int(n_clamped)
        if n:
            import sys

            total = getattr(self, "_clamped_poses", 0) + n
            self._clamped_poses = total
            if total <= 50 or total % 50 == 0:
                print(f"[nice-slam] WARNING: clamped {n} non-finite mapped "
                      f"pose(s) back to inputs (total {total})",
                      file=sys.stderr, flush=True)

    def finish_superstep(self, handle) -> List[np.ndarray]:
        from ..ops import lie_np

        pt, pq, n_clamped = jax.device_get(handle)
        self._warn_clamped(n_clamped)
        slot = self._kf_slot_fifo.pop(0)
        if slot is not None:
            self.kf_pose_host[slot] = np.concatenate([pt[0], pq[0]])
        return [lie_np.pose_vec_to_matrix(pt[j], pq[j], rot_rep="quat")
                for j in range(pt.shape[0])]

    def add_keyframe(self, keyframe: Frame) -> None:
        if self.kf_count >= self.max_kf:
            raise RuntimeError(f"keyframe capacity {self.max_kf} exceeded; raise max_keyframes")
        slot = self.kf_count
        rgbd = jnp.concatenate([keyframe.rgb_jax(), keyframe.depth_jax()[..., None]], -1)
        self.kf_images = self.kf_images.at[slot].set(rgbd)
        pose = np.concatenate([keyframe.t, keyframe.r]).astype(np.float32)
        self.kf_pose = self.kf_pose.at[slot].set(jnp.asarray(pose))
        self.kf_pose_host[slot] = pose
        self.kf_count += 1
        self.keyframe_fids.append(keyframe.fid)

    def render_img(self, c2w: np.ndarray, gt_depth: Optional[np.ndarray] = None, idx: Optional[int] = None):
        cam = self.camera
        c2w = jnp.asarray(c2w, jnp.float32)
        rays_d = self._dirs.reshape(-1, 3) @ c2w[:3, :3].T
        rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
        n = rays_d.shape[0]
        bs = self.config.ray_batch_size
        depth_chunks, color_chunks = [], []
        gt = None if gt_depth is None else jnp.asarray(gt_depth).reshape(-1, 1)
        for i in range(0, n, bs):
            ro, rd = rays_o[i : i + bs], rays_d[i : i + bs]
            pad = bs - ro.shape[0]
            if pad > 0:
                ro = jnp.pad(ro, ((0, pad), (0, 0)))
                rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
            if gt is not None:
                td = gt[i : i + bs]
                if pad > 0:
                    td = jnp.pad(td, ((0, pad), (0, 0)))
                out = self._render_chunk(self.model_params, ro, rd, td, self._next_key())
            else:
                out = self._render_chunk_no_depth(self.model_params, ro, rd, self._next_key())
            take = bs - pad if pad > 0 else bs
            depth_chunks.append(np.asarray(out["depth"][:take]))
            color_chunks.append(np.asarray(out["rgb"][:take]))
        depth = np.concatenate(depth_chunks).reshape(cam.height, cam.width)
        color = np.concatenate(color_chunks).reshape(cam.height, cam.width, 3)
        return np.clip(color, 0, 1), depth

    def get_mesh(self):
        from ..ops.frustum import points_in_frustum

        kf_mask_fn = None
        if self.kf_count > 0:
            kf_pose_np = np.asarray(self.kf_pose)
            from ..ops import lie_np

            kf_c2w = [
                lie_np.pose_vec_to_matrix(kf_pose_np[i, :3], kf_pose_np[i, 3:], rot_rep="quat")
                for i in range(self.kf_count)
            ]

            def kf_mask_fn(pts):  # noqa: F811
                return points_in_frustum(pts, kf_c2w, self.camera, near=0.0, far=12.0)

        # NICE-SLAM meshes the occupancy field at level 0.5 via sigmoid(10x)
        # == raw occ level 0 (mesher level_set default 0).
        self.cur_mesh = self.mesher.get_mesh(
            query_fn=lambda pts: np.asarray(self._query_occ(self.model_params, jnp.asarray(pts))),
            color_fn=lambda pts: np.asarray(self._query_color(self.model_params, jnp.asarray(pts))),
            point_mask_fn=kf_mask_fn,
        )
        return self.cur_mesh
