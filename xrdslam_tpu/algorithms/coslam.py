"""Co-SLAM: joint coordinate+parametric encoding SLAM, fully on-device.

TPU-native rebuild of the reference algorithm (reference:
slam/algorithms/coslam.py:41-298). Structural changes vs the reference:

  * The global keyframe ray store becomes a fixed-capacity device table
    ``kf_rays [MAX_KF, R, 7]`` (dirs, rgb, depth) with a host-side count —
    the reference grows a torch tensor per keyframe (coslam.py:127-150),
    which XLA cannot compile; capacity is static here and rows are written
    by a jitted scatter.
  * Keyframe poses are rows of ``[MAX_KF, 3]`` axis-angle/translation
    tables; per-ray poses are gathers, so mapping pose gradients arrive as
    scatter-adds from the gather transpose — the reference's per-Frame
    nn.Parameters (coslam.py:96-112) become two flat arrays.
  * ``do_tracking`` / ``do_mapping`` each compile to ONE device program:
    the 10/200-iteration Adam loops run as ``lax.scan`` bodies
    (reference re-enters Python + manager IPC every iteration,
    base_algorithm.py:255-273).
  * The oldest keyframe's pose is fixed by stop-gradient on row 0
    (reference excludes it from the optimizer, coslam.py:100-109).
  * Ray sampling uses replacement (jax.random.randint) where the reference
    uses random.sample without replacement (coslam.py:147) — statistically
    indistinguishable at 2048 of ~400k rays.
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
from ..engine.optimizers import GroupOptimizers
from ..models.joint_encoding import JointEncodingConfig
from ..ops import lie
from ..ops.sampling import camera_ray_dirs, sample_pixels
from .base import Algorithm, AlgorithmConfig


@dataclass
class CoSLAMConfig(AlgorithmConfig):
    """reference: slam/algorithms/coslam.py:17-38."""

    _target: Type = field(default_factory=lambda: CoSLAM)
    model: JointEncodingConfig = field(default_factory=JointEncodingConfig)
    mesher: MesherConfig = field(default_factory=MesherConfig)
    rays_to_save_ratio: float = 0.05
    tracking_Wedge: int = 20
    tracking_Hedge: int = 20
    mapping_sample: int = 2048
    min_sample_pixels: int = 100
    tracking_sample: int = 1024
    ray_batch_size: int = 3000
    marching_cubes_bound: List[List[float]] = field(default_factory=lambda: [[-3.5, 3], [-3, 3], [-3, 3]])
    mapping_bound: List[List[float]] = field(default_factory=lambda: [[-3.5, 3], [-3, 3], [-3, 3]])
    max_keyframes: int = 512  # static capacity of the keyframe ray table
    seed: int = 0


class CoSLAM(Algorithm):
    def __init__(self, config: CoSLAMConfig, camera: Camera) -> None:
        super().__init__(config, camera)
        self.config: CoSLAMConfig = config
        self.bounding_box = np.asarray(config.mapping_bound, np.float32)
        self.marching_cube_bound = np.asarray(config.marching_cubes_bound, np.float32)
        self.model = config.model.setup(camera=camera, bounding_box=self.bounding_box)
        self.mesher = config.mesher.setup(
            camera=camera, bounding_box=self.bounding_box, marching_cubes_bound=self.marching_cube_bound
        )
        self.bundle_adjust = True

        self.num_rays_to_save = int(camera.width * camera.height * config.rays_to_save_ratio)
        self.max_kf = config.max_keyframes

        self._key = jax.random.PRNGKey(config.seed)
        self.model_params = self._replicate_params(self.model.init_params(self._next_key()))

        opt_cfgs = {name: g["optimizer"] for name, g in config.optimizers.items()}
        self._model_groups = [g for g in ("embed_fn", "embed_fn_color", "decoder") if g in self.model_params]
        self.model_opt = GroupOptimizers({g: opt_cfgs[g] for g in self._model_groups})
        self.model_opt_state = self.model_opt.init({g: self.model_params[g] for g in self._model_groups})
        self._opt_cfgs = opt_cfgs

        # fixed-capacity keyframe store (device)
        self.kf_rays = jnp.zeros((self.max_kf, self.num_rays_to_save, 7), jnp.float32)
        self.kf_pose_t = jnp.zeros((self.max_kf, 3), jnp.float32)
        self.kf_pose_r = jnp.zeros((self.max_kf, 3), jnp.float32)
        self.kf_count = 0

        self._dirs = camera_ray_dirs(camera)  # [H, W, 3] camera-frame dirs
        self.cur_mesh = None
        self._build_jits()

    # ------------------------------------------------------------------
    def _next_key(self) -> jax.Array:
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------
    # jitted device programs
    # ------------------------------------------------------------------
    def _build_jits(self) -> None:
        cfg = self.config
        model = self.model
        cam = self.camera
        H, W = cam.height, cam.width
        R = self.num_rays_to_save
        dirs_flat = self._dirs.reshape(-1, 3)

        # ---------------- tracking -------------------------------------
        def track_step(model_params, rgb, depth, t0, r0, key):
            sch_r = self._tracking_lr_schedule(self._opt_cfgs["tracking_pose_r"].lr)
            sch_t = self._tracking_lr_schedule(self._opt_cfgs["tracking_pose_t"].lr)
            opt = GroupOptimizers(
                {"tracking_pose_r": self._opt_cfgs["tracking_pose_r"], "tracking_pose_t": self._opt_cfgs["tracking_pose_t"]},
                schedules={"tracking_pose_r": sch_r, "tracking_pose_t": sch_t} if sch_r else None,
            )
            pose = {"tracking_pose_r": r0, "tracking_pose_t": t0}
            opt_state = opt.init(pose)
            # tables are frozen during tracking: build the gather-layout
            # copy once, not once per optimization iteration
            packed = model.pack_tables(model_params)

            def body(carry, k):
                pose, opt_state, best = carry
                k1, k2 = jax.random.split(k)
                u, v = sample_pixels(k1, cfg.tracking_sample, H, W, cfg.tracking_Hedge, cfg.tracking_Wedge)
                ui, vi = self._shard_rays(u.astype(jnp.int32), v.astype(jnp.int32))
                td = depth[vi, ui][:, None]
                ts = rgb[vi, ui]
                d_cam = self._dirs[vi, ui]

                def loss_fn(p):
                    Rm = lie.axis_angle_to_matrix(p["tracking_pose_r"])
                    rays_d = d_cam @ Rm.T
                    rays_o = jnp.broadcast_to(p["tracking_pose_t"], rays_d.shape)
                    loss, _ = model.get_loss(
                        model_params, k2, rays_o, rays_d, ts, td, None, False, False, packed=packed)
                    return loss

                loss, g = jax.value_and_grad(loss_fn)(pose)
                best_loss, best_t, best_r = best
                better = loss < best_loss
                best = (
                    jnp.where(better, loss, best_loss),
                    jnp.where(better, pose["tracking_pose_t"], best_t),
                    jnp.where(better, pose["tracking_pose_r"], best_r),
                )
                g = self._finite_guard(loss, g)
                pose, opt_state = opt.update(g, opt_state, pose)
                return (pose, opt_state, best), loss

            init_best = (jnp.asarray(1e10, jnp.float32), t0, r0)
            keys = jax.random.split(key, cfg.tracking_n_iters)
            (pose, _, best), loss_hist = jax.lax.scan(body, (pose, opt_state, init_best), keys)
            best_loss, best_t, best_r = best
            return best_t, best_r, best_loss

        self._track_step = jax.jit(track_step, donate_argnums=())

        # ---------------- mapping --------------------------------------
        def map_step(
            model_params, model_opt_state, kf_rays, kf_pose_t, kf_pose_r, kf_count,
            cur_rgb, cur_depth, cur_t, cur_r, key, n_iters: int, first: bool,
            cur_cap: Optional[int] = None,
        ):
            # static capacity for current-frame pixels. The reference samples
            # max(mapping_sample // kf_count, min_sample_pixels) pixels
            # (coslam.py:171-177) — a SHRINKING count as keyframes accumulate.
            # Rendering a fixed mapping_sample of them and masking wastes
            # ~45% of mapping compute in steady state, so the host picks a
            # power-of-two bucket >= the live count (one recompile per
            # bucket shrink, ~5 over a run).
            if cur_cap is None:
                cur_cap = cfg.mapping_sample
            groups = dict(self._model_groups_cfg())
            if not first:
                groups["mapping_pose_r"] = self._opt_cfgs["mapping_pose_r"]
                groups["mapping_pose_t"] = self._opt_cfgs["mapping_pose_t"]
            opt = GroupOptimizers(groups)

            params: Dict[str, Any] = {g: model_params[g] for g in self._model_groups}
            if not first:
                params["mapping_pose_r"] = {"kf": kf_pose_r, "cur": cur_r}
                params["mapping_pose_t"] = {"kf": kf_pose_t, "cur": cur_t}
            opt_state = dict(model_opt_state)
            if not first:
                opt_state["mapping_pose_r"] = opt.tx["mapping_pose_r"].init(params["mapping_pose_r"])
                opt_state["mapping_pose_t"] = opt.tx["mapping_pose_t"].init(params["mapping_pose_t"])

            kf_rays_flat = kf_rays.reshape(-1, 7)
            n_kf_rays = jnp.maximum(kf_count * R, 1)

            def body(carry, k):
                params, opt_state = carry
                k1, k2, k3 = jax.random.split(k, 3)

                # current-frame pixels (reference: coslam.py:171-177)
                u, v = sample_pixels(k2, cur_cap, H, W)
                ui, vi = self._shard_rays(u.astype(jnp.int32), v.astype(jnp.int32))
                cur_td = cur_depth[vi, ui][:, None]
                cur_ts = cur_rgb[vi, ui]
                cur_dirs = self._dirs[vi, ui]
                if first:
                    cur_n = cur_cap
                else:
                    cur_n = jnp.minimum(
                        jnp.maximum(cfg.mapping_sample // jnp.maximum(kf_count, 1), cfg.min_sample_pixels),
                        cur_cap)
                cur_mask = (jnp.arange(cur_cap) < cur_n).astype(jnp.float32)

                if not first:
                    idx = self._shard_rays(jax.random.randint(k1, (cfg.mapping_sample,), 0, n_kf_rays))
                    rays = kf_rays_flat[idx]
                    fi = idx // R

                def loss_fn(p):
                    mp = {**model_params, **{g: p[g] for g in self._model_groups}}
                    if first:
                        Rm_c = lie.axis_angle_to_matrix(cur_r)
                        t_c = cur_t
                        rays_d = cur_dirs @ Rm_c.T
                        rays_o = jnp.broadcast_to(t_c, rays_d.shape)
                        loss, _ = model.get_loss(mp, k3, rays_o, rays_d, cur_ts, cur_td, cur_mask, True, True)
                        return loss
                    kf_r = p["mapping_pose_r"]["kf"]
                    kf_t = p["mapping_pose_t"]["kf"]
                    # fix the oldest keyframe's pose (reference: coslam.py:100-101)
                    kf_r = kf_r.at[0].set(jax.lax.stop_gradient(kf_r[0]))
                    kf_t = kf_t.at[0].set(jax.lax.stop_gradient(kf_t[0]))
                    Rm = lie.axis_angle_to_matrix(kf_r[fi])  # [N, 3, 3]
                    rays_d_kf = jnp.einsum("nij,nj->ni", Rm, rays[:, :3])
                    rays_o_kf = kf_t[fi]
                    Rm_c = lie.axis_angle_to_matrix(p["mapping_pose_r"]["cur"])
                    rays_d_cur = cur_dirs @ Rm_c.T
                    rays_o_cur = jnp.broadcast_to(p["mapping_pose_t"]["cur"], rays_d_cur.shape)
                    rays_o = jnp.concatenate([rays_o_kf, rays_o_cur], 0)
                    rays_d = jnp.concatenate([rays_d_kf, rays_d_cur], 0)
                    ts = jnp.concatenate([rays[:, 3:6], cur_ts], 0)
                    td = jnp.concatenate([rays[:, 6:7], cur_td], 0)
                    kf_mask = jnp.full((cfg.mapping_sample,), (kf_count > 0).astype(jnp.float32))
                    mask = jnp.concatenate([kf_mask, cur_mask], 0)
                    loss, _ = model.get_loss(mp, k3, rays_o, rays_d, ts, td, mask, True, False)
                    return loss

                loss, g = jax.value_and_grad(loss_fn)(params)
                g = self._finite_guard(loss, g)
                params, opt_state = opt.update(g, opt_state, params)
                return (params, opt_state), loss

            keys = jax.random.split(key, n_iters)
            (params, opt_state), loss_hist = jax.lax.scan(body, (params, opt_state), keys)

            new_model_params = {**model_params, **{g: params[g] for g in self._model_groups}}
            new_model_opt_state = {g: opt_state[g] for g in self._model_groups}
            if first:
                return new_model_params, new_model_opt_state, kf_pose_t, kf_pose_r, cur_t, cur_r, loss_hist
            return (
                new_model_params,
                new_model_opt_state,
                params["mapping_pose_t"]["kf"],
                params["mapping_pose_r"]["kf"],
                params["mapping_pose_t"]["cur"],
                params["mapping_pose_r"]["cur"],
                loss_hist,
            )

        self._map_step_first = jax.jit(functools.partial(map_step, n_iters=cfg.mapping_first_n_iters, first=True))
        self._track_fn = track_step  # unjitted, composed into the super-step
        self._map_fn_raw = functools.partial(map_step, n_iters=cfg.mapping_n_iters, first=False)
        self._map_steps: Dict[int, Any] = {}  # cur_cap -> jitted map step
        self._super_steps: Dict[Tuple[int, bool, int], Any] = {}

        # ---------------- keyframe insertion ---------------------------
        def add_kf(kf_rays, rgb, depth, slot, key):
            """Save R random rays of a frame into table row ``slot``
            (reference: coslam.py:114-141 sample_single_keyframe_rays)."""
            idx = jax.random.randint(key, (R,), 0, H * W)
            d = dirs_flat[idx]
            c = rgb.reshape(-1, 3)[idx]
            z = depth.reshape(-1)[idx][:, None]
            return kf_rays.at[slot].set(jnp.concatenate([d, c, z], -1))

        self._add_kf = jax.jit(add_kf, donate_argnums=(0,))
        self._add_kf_fn = add_kf  # unjitted, composed into the super-step

        # ---------------- rendering ------------------------------------
        def render_chunk(model_params, rays_o, rays_d, target_d, key):
            return model.render_rays(model_params, key, rays_o, rays_d, target_d)

        def render_chunk_no_depth(model_params, rays_o, rays_d):
            return model.render_rays_no_depth(model_params, rays_o, rays_d)

        self._render_chunk = jax.jit(render_chunk)
        self._render_chunk_no_depth = jax.jit(render_chunk_no_depth)

        def query_sdf(model_params, pts):
            return model.query_sdf(model_params, pts)

        def query_color(model_params, pts):
            return model.query_color(model_params, pts)

        self._query_sdf = jax.jit(query_sdf)
        self._query_color = jax.jit(query_color)

    def _model_groups_cfg(self):
        return {g: self._opt_cfgs[g] for g in self._model_groups}

    def _cur_cap(self) -> int:
        """Power-of-two bucket for the live current-frame pixel count."""
        cfg = self.config
        need = max(cfg.mapping_sample // max(self.kf_count, 1), cfg.min_sample_pixels)
        cap = 128
        while cap < need:
            cap *= 2
        return min(cap, cfg.mapping_sample)

    def _get_map_step(self, cur_cap: int):
        if cur_cap not in self._map_steps:
            self._map_steps[cur_cap] = jax.jit(
                functools.partial(self._map_fn_raw, cur_cap=cur_cap))
        return self._map_steps[cur_cap]

    # ------------------------------------------------------------------
    # host API (called by the pipeline)
    # ------------------------------------------------------------------
    def dispatch_tracking(self, cur_frame: Frame):
        if not self.is_initialized():
            return None
        rgb = cur_frame.rgb_jax()
        depth = cur_frame.depth_jax()
        t0 = jnp.asarray(cur_frame.t)
        r0 = jnp.asarray(cur_frame.r)
        best_t, best_r, _ = self._track_step(self.model_params, rgb, depth, t0, r0, self._next_key())
        return (best_t, best_r)

    def finish_tracking(self, handle) -> Optional[np.ndarray]:
        if handle is None:
            return None
        from ..ops import lie_np

        # one round trip for both pose components (axon sync ~30 ms each)
        bt, br = jax.device_get(handle)
        return lie_np.pose_vec_to_matrix(bt, br, rot_rep="axis_angle")

    def do_mapping(self, cur_frame: Frame) -> None:
        first = not self.is_initialized()
        fn = self._map_step_first if first else self._get_map_step(self._cur_cap())
        out = fn(
            self.model_params,
            self.model_opt_state,
            self.kf_rays,
            self.kf_pose_t,
            self.kf_pose_r,
            jnp.asarray(self.kf_count, jnp.int32),
            cur_frame.rgb_jax(),
            cur_frame.depth_jax(),
            jnp.asarray(cur_frame.t),
            jnp.asarray(cur_frame.r),
            self._next_key(),
        )
        self.model_params, self.model_opt_state, self.kf_pose_t, self.kf_pose_r, cur_t, cur_r, _ = out
        cur_frame.t, cur_frame.r = jax.device_get((cur_t, cur_r))
        if first:
            self.set_initialized()

    # ------------------------------------------------------------------
    # fused super-step: one device program per map_every-frame group
    # ------------------------------------------------------------------
    def _get_super_step(self, group: int, do_kf: bool):
        """Compile (once per (group, do_kf)) a program that runs
        track(head) -> map(head) -> [kf insert] -> track(head+1..head+G-1)
        entirely on device. Removes the per-frame dispatch + pose-fetch
        round trips (~30-40 ms each over the remote-device tunnel) that
        dominated the per-frame pipeline; semantics match the reference's
        alternating order exactly (reference: slam/pipeline/tracker.py:
        152-183 + mapper.py:24-46 — the tracker blocks on the mapper for
        mapped frames, so the serialization below is the reference's own).
        Constant-velocity prediction runs on device (tracker.py:185-199).
        """
        cur_cap = self._cur_cap()
        key_ = (group, do_kf, cur_cap)
        if key_ in self._super_steps:
            return self._super_steps[key_]
        track_fn, add_kf_fn = self._track_fn, self._add_kf_fn
        map_fn = functools.partial(self._map_fn_raw, cur_cap=cur_cap)

        def predict(t1, r1, t2, r2):
            # delta = P1 @ inv(P2); pred = delta @ P1 (tracker.py:185-199)
            R1 = lie.axis_angle_to_matrix(r1)
            R2 = lie.axis_angle_to_matrix(r2)
            dR = R1 @ R2.T
            dt = t1 - dR @ t2
            Rp = dR @ R1
            tp = dR @ t1 + dt
            return tp, lie.matrix_to_axis_angle(Rp)

        def super_step(model_params, model_opt_state, kf_rays, kf_pose_t,
                       kf_pose_r, kf_count, rgbs, depths, prev_t, prev_r,
                       prev2_t, prev2_r, key, kf_slot):
            keys = jax.random.split(key, group + 2)
            # head frame: track, map (pose writeback), optional kf insert
            t0p, r0p = predict(prev_t, prev_r, prev2_t, prev2_r)
            bt, br, bl0 = track_fn(model_params, rgbs[0], depths[0], t0p, r0p, keys[0])
            out = map_fn(model_params, model_opt_state, kf_rays, kf_pose_t,
                         kf_pose_r, kf_count, rgbs[0], depths[0], bt, br, keys[group])
            model_params, model_opt_state, kf_pose_t, kf_pose_r, cur_t, cur_r, _ = out
            if do_kf:
                kf_rays = add_kf_fn(kf_rays, rgbs[0], depths[0], kf_slot, keys[group + 1])
                kf_pose_t = kf_pose_t.at[kf_slot].set(cur_t)
                kf_pose_r = kf_pose_r.at[kf_slot].set(cur_r)
            # trailing frames: one scanned tracking body (compiles once,
            # not group-1 times)
            def tail_body(carry, xs):
                (p1t, p1r, p2t, p2r) = carry
                rgb_j, depth_j, key_j = xs
                tp, rp = predict(p1t, p1r, p2t, p2r)
                bt, br, bl = track_fn(model_params, rgb_j, depth_j, tp, rp, key_j)
                return (bt, br, p1t, p1r), (bt, br, bl)

            carry0 = (cur_t, cur_r, prev_t, prev_r)
            _, (tail_t, tail_r, tail_l) = jax.lax.scan(
                tail_body, carry0, (rgbs[1:], depths[1:], keys[1:group]))
            poses_t = jnp.concatenate([cur_t[None], tail_t], 0)
            poses_r = jnp.concatenate([cur_r[None], tail_r], 0)
            losses = jnp.concatenate([bl0[None], tail_l], 0)
            return (model_params, model_opt_state, kf_rays, kf_pose_t, kf_pose_r,
                    poses_t, poses_r, losses)

        fn = jax.jit(super_step)
        self._super_steps[key_] = fn
        return fn

    def dispatch_superstep(self, frames: List[Frame], do_kf: bool,
                           prev_c2w: np.ndarray = None, prev2_c2w: np.ndarray = None,
                           prev_tr=None, prev2_tr=None):
        """Launch the fused group program (async). Requires is_initialized().
        frames[0] is the group head (gets the mapping step).

        The two predecessor poses feed the constant-velocity model. Pass
        either host matrices (``prev_c2w``/``prev2_c2w``) or — for
        group-level software pipelining — ``prev_tr``/``prev2_tr`` device
        ``(t, r)`` vectors straight from the previous group's output, so
        this dispatch does NOT synchronize on the previous group."""
        from ..ops import lie_np

        group = len(frames)
        fn = self._get_super_step(group, do_kf)
        rgbs = jnp.stack([f.rgb_jax() for f in frames])
        depths = jnp.stack([f.depth_jax() for f in frames])
        if prev_tr is not None:
            t1, r1 = prev_tr
            t2, r2 = prev2_tr
        else:
            t1, r1 = lie_np.matrix_to_pose_vec(np.asarray(prev_c2w, np.float32), rot_rep="axis_angle")
            t2, r2 = lie_np.matrix_to_pose_vec(np.asarray(prev2_c2w, np.float32), rot_rep="axis_angle")
        out = fn(
            self.model_params, self.model_opt_state, self.kf_rays,
            self.kf_pose_t, self.kf_pose_r, jnp.asarray(self.kf_count, jnp.int32),
            rgbs, depths, jnp.asarray(t1), jnp.asarray(r1), jnp.asarray(t2),
            jnp.asarray(r2), self._next_key(), jnp.asarray(self.kf_count, jnp.int32),
        )
        (self.model_params, self.model_opt_state, self.kf_rays,
         self.kf_pose_t, self.kf_pose_r, poses_t, poses_r, losses) = out
        if do_kf:
            if self.kf_count >= self.max_kf:
                raise RuntimeError(f"keyframe capacity {self.max_kf} exceeded; raise max_keyframes")
            self.kf_count += 1
            self.keyframe_fids.append(frames[0].fid)
        return (poses_t, poses_r)

    def finish_superstep(self, handle) -> List[np.ndarray]:
        """One pose fetch for the whole group -> list of c2w matrices."""
        from ..ops import lie_np

        pt, pr = jax.device_get(handle)
        return [
            lie_np.pose_vec_to_matrix(pt[j], pr[j], rot_rep="axis_angle")
            for j in range(pt.shape[0])
        ]

    def add_keyframe(self, keyframe: Frame) -> None:
        if self.kf_count >= self.max_kf:
            raise RuntimeError(f"keyframe capacity {self.max_kf} exceeded; raise max_keyframes")
        slot = self.kf_count
        self.kf_rays = self._add_kf(self.kf_rays, keyframe.rgb_jax(), keyframe.depth_jax(), slot, self._next_key())
        self.kf_pose_t = self.kf_pose_t.at[slot].set(jnp.asarray(keyframe.t))
        self.kf_pose_r = self.kf_pose_r.at[slot].set(jnp.asarray(keyframe.r))
        self.kf_count += 1
        self.keyframe_fids.append(keyframe.fid)

    def render_img(self, c2w: np.ndarray, gt_depth: Optional[np.ndarray] = None, idx: Optional[int] = None):
        """Full-image chunked render (reference: coslam.py:245-289)."""
        cam = self.camera
        c2w = jnp.asarray(c2w, jnp.float32)
        rays_d = (self._dirs.reshape(-1, 3) @ c2w[:3, :3].T)
        rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
        n = rays_d.shape[0]
        bs = self.config.ray_batch_size
        depth_chunks, color_chunks = [], []
        gt = None if gt_depth is None else jnp.asarray(gt_depth).reshape(-1, 1)
        for i in range(0, n, bs):
            ro = rays_o[i : i + bs]
            rd = rays_d[i : i + bs]
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
                out = self._render_chunk_no_depth(self.model_params, ro, rd)
            depth_chunks.append(np.asarray(out["depth"][: bs - pad if pad > 0 else bs]))
            color_chunks.append(np.asarray(out["rgb"][: bs - pad if pad > 0 else bs]))
        depth = np.concatenate(depth_chunks).reshape(cam.height, cam.width)
        color = np.concatenate(color_chunks).reshape(cam.height, cam.width, 3)
        return color, depth

    def get_mesh(self):
        from ..ops.frustum import points_in_frustum

        from ..ops import lie_np

        kf_mask_fn = None
        if self.kf_count > 0:
            kf_t = np.asarray(self.kf_pose_t)
            kf_r = np.asarray(self.kf_pose_r)
            kf_c2w = [
                lie_np.pose_vec_to_matrix(kf_t[i], kf_r[i], rot_rep="axis_angle")
                for i in range(self.kf_count)
            ]
            far = self.config.model.cam_far

            def kf_mask_fn(pts):  # noqa: F811
                return points_in_frustum(pts, kf_c2w, self.camera, near=0.0, far=far)

        self.cur_mesh = self.mesher.get_mesh(
            query_fn=lambda pts: np.asarray(self._query_sdf(self.model_params, jnp.asarray(pts))),
            color_fn=(lambda pts: np.asarray(self._query_color(self.model_params, jnp.asarray(pts))))
            if self.config.model.mesh_render_color
            else None,
            point_mask_fn=kf_mask_fn,
        )
        return self.cur_mesh
