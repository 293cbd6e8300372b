"""Vox-Fusion: sparse-voxel SDF SLAM on a fixed-capacity voxel hash.

TPU-native rebuild of the reference algorithm (reference:
slam/algorithms/voxfusion.py:28-278). Structural mapping:

  * Voxel creation per mapping frame back-projects the depth image and
    inserts voxels host-side (reference: voxfusion.py:96-110 via the C++
    octree) into ops.voxel_hash.VoxelHashMap; the device mirror arrays are
    re-uploaded only when something was inserted.
  * Keyframes store full images in a device table (mapping samples fresh
    rays per iteration from each window frame, voxfusion.py:52-92).
  * Tracking/mapping loops are jitted lax.scan programs like the other
    algorithms; window size is a static jit parameter.
  * Mesh extraction renders the SDF on a dense grid restricted to allocated
    voxels (query via hash membership; empty space gets +trunc) and runs
    marching tetrahedra — replacing the per-voxel skimage marching cubes
    loop (voxfusion.py:173-278).
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
from ..models.sparse_voxel import SparseVoxelConfig
from ..ops import lie
from ..ops.sampling import camera_ray_dirs, sample_pixels
from ..ops.voxel_hash import VoxelHashMap
from .base import Algorithm, AlgorithmConfig


@dataclass
class VoxFusionConfig(AlgorithmConfig):
    """reference: slam/algorithms/voxfusion.py:17-27 + input_config.py:160-200."""

    _target: Type = field(default_factory=lambda: VoxFusion)
    model: SparseVoxelConfig = field(default_factory=SparseVoxelConfig)
    mapping_sample: int = 1024
    tracking_sample: int = 1024
    ray_batch_size: int = 3000
    max_keyframes: int = 64
    mesh_resolution: int = 256
    seed: int = 0


class VoxFusion(Algorithm):
    config: VoxFusionConfig

    def __init__(self, config: VoxFusionConfig, camera: Camera) -> None:
        super().__init__(config, camera)
        self.model = config.model.setup(camera=camera, bounding_box=None)
        self.bundle_adjust = True
        self._key = jax.random.PRNGKey(config.seed)
        self.model_params = self.model.init_params(self._next_key())

        self.vox_map = VoxelHashMap(
            max_voxels=config.model.max_voxels,
            max_vertices=config.model.num_embeddings,
            voxel_size=config.model.voxel_size,
        )
        self.maps = self.vox_map.device_state()

        opt_cfgs = {name: g["optimizer"] for name, g in config.optimizers.items()}
        self._opt_cfgs = opt_cfgs
        self.model_opt = GroupOptimizers({"decoder": opt_cfgs["decoder"], "embeddings": opt_cfgs["embeddings"]})
        self.model_opt_state = self.model_opt.init(
            {"decoder": self.model_params["decoder"], "embeddings": self.model_params["embeddings"]}
        )

        H, W = camera.height, camera.width
        self.kf_images = jnp.zeros((config.max_keyframes, H, W, 4), jnp.float32)
        self.kf_pose = jnp.zeros((config.max_keyframes, 6), jnp.float32)  # t(3)+axis-angle(3)
        self.kf_count = 0
        self._dirs = camera_ray_dirs(camera)
        self._dirs_np = np.asarray(self._dirs)
        self.cur_mesh = None
        self._map_variants: Dict[int, Any] = {}
        self._build_jits()

    def _next_key(self) -> jax.Array:
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------
    def _build_jits(self) -> None:
        cfg = self.config
        model = self.model
        H, W = self.camera.height, self.camera.width

        def track_step(params, maps, rgb, depth, t0, r0, key):
            opt = GroupOptimizers(
                {"tracking_pose_r": self._opt_cfgs["tracking_pose"], "tracking_pose_t": self._opt_cfgs["tracking_pose"]}
            )
            pose = {"tracking_pose_r": r0, "tracking_pose_t": t0}
            opt_state = opt.init(pose)

            def body(carry, k):
                pose, opt_state, best = carry
                k1, k2 = jax.random.split(k)
                u, v = sample_pixels(k1, cfg.tracking_sample, H, W)
                ui, vi = u.astype(jnp.int32), v.astype(jnp.int32)
                td = depth[vi, ui][:, None]
                ts = rgb[vi, ui]
                d_cam = self._dirs[vi, ui]

                def loss_fn(p):
                    Rm = lie.axis_angle_to_matrix(p["tracking_pose_r"])
                    rays_d = d_cam @ Rm.T
                    rays_o = jnp.broadcast_to(p["tracking_pose_t"], rays_d.shape)
                    loss, _ = model.get_loss(params, maps, k2, rays_o, rays_d, ts, td)
                    return loss

                loss, g = jax.value_and_grad(loss_fn)(pose)
                best_loss, best_t, best_r = best
                better = loss < best_loss
                best = (
                    jnp.where(better, loss, best_loss),
                    jnp.where(better, pose["tracking_pose_t"], best_t),
                    jnp.where(better, pose["tracking_pose_r"], best_r),
                )
                pose, opt_state = opt.update(g, opt_state, pose)
                return (pose, opt_state, best), loss

            keys = jax.random.split(key, cfg.tracking_n_iters)
            init = (pose, opt_state, (jnp.asarray(1e10, jnp.float32), t0, r0))
            (_, _, best), _ = jax.lax.scan(body, init, keys)
            return best[1], best[2], best[0]

        self._track_step = jax.jit(track_step)

        def map_step(params, model_opt_state, maps, images, poses, n_valid,
                     key, *, n_frames, n_iters, optimize_pose):
            """images/poses are padded to a STATIC n_frames (=window size);
            ray slot f samples frame ((f+1)*n_valid-1)//n_frames, so every window
            length shares one compiled program and pads are never read."""
            groups = {"decoder": self._opt_cfgs["decoder"], "embeddings": self._opt_cfgs["embeddings"]}
            if optimize_pose:
                groups["pose"] = self._opt_cfgs["mapping_pose"]
            opt = GroupOptimizers(groups)
            all_params: Dict[str, Any] = {"decoder": params["decoder"], "embeddings": params["embeddings"]}
            if optimize_pose:
                all_params["pose"] = poses
            opt_state = dict(model_opt_state)
            if optimize_pose:
                opt_state["pose"] = opt.tx["pose"].init(poses)

            def body(carry, k):
                ap, opt_state = carry
                k1, k2 = jax.random.split(k)

                def loss_fn(p):
                    pz = p.get("pose", poses)
                    pz = pz.at[0].set(jax.lax.stop_gradient(pz[0]))
                    mp = {"embeddings": p["embeddings"], "decoder": p["decoder"]}
                    keys = jax.random.split(k1, n_frames)
                    ros, rds, tss, tds = [], [], [], []
                    for f in range(n_frames):
                        fi = self.window_slot_frame(f, n_valid, n_frames)
                        u, v = sample_pixels(keys[f], cfg.mapping_sample, H, W)
                        ui, vi = u.astype(jnp.int32), v.astype(jnp.int32)
                        rgbd = images[fi, vi, ui]
                        Rm = lie.axis_angle_to_matrix(pz[fi, 3:])
                        rds.append(self._dirs[vi, ui] @ Rm.T)
                        ros.append(jnp.broadcast_to(pz[fi, :3], (cfg.mapping_sample, 3)))
                        tss.append(rgbd[:, :3])
                        tds.append(rgbd[:, 3:4])
                    loss, _ = model.get_loss(
                        mp, maps, k2,
                        jnp.concatenate(ros), jnp.concatenate(rds), jnp.concatenate(tss), jnp.concatenate(tds),
                    )
                    return loss

                loss, g = jax.value_and_grad(loss_fn)(ap)
                ap, opt_state = opt.update(g, opt_state, ap)
                return (ap, opt_state), loss

            keys = jax.random.split(key, n_iters)
            (all_params, opt_state), _ = jax.lax.scan(body, (all_params, opt_state), keys)
            new_params = {"decoder": all_params["decoder"], "embeddings": all_params["embeddings"]}
            new_opt_state = {g: opt_state[g] for g in ("decoder", "embeddings")}
            return new_params, new_opt_state, all_params.get("pose", poses)

        self._map_step_raw = map_step

        def render_chunk(params, maps, rays_o, rays_d, key):
            return model.render_rays(params, maps, key, rays_o, rays_d)

        self._render_chunk = jax.jit(render_chunk)

        def query_sdf_grid(params, maps, pts):
            """SDF at world pts; +trunc outside allocated voxels (mesher)."""
            from ..ops.voxel_hash import lookup_voxels

            cc = jnp.floor(pts / cfg.model.voxel_size).astype(jnp.int32)
            vidx = lookup_voxels(maps["hash_keys"], maps["hash_vals"], cc)
            emb = model.interp_embeddings(params, maps, jnp.maximum(vidx, 0), pts)
            rgb, sdf = model.decode(params["decoder"], emb)
            sdf = jnp.where(vidx >= 0, sdf, cfg.model.training_trunc * 2.0)
            return sdf, rgb

        self._query_sdf_grid = jax.jit(query_sdf_grid)

    def _map_variant(self, n_frames: int, n_iters: int, optimize_pose: bool):
        sig = (n_frames, n_iters, optimize_pose)
        if sig not in self._map_variants:
            self._map_variants[sig] = jax.jit(
                functools.partial(self._map_step_raw, n_frames=n_frames, n_iters=n_iters, optimize_pose=optimize_pose)
            )
        return self._map_variants[sig]

    # ------------------------------------------------------------------
    def create_voxels(self, frame: Frame) -> None:
        """Back-project depth, insert voxels (reference: voxfusion.py:96-110)."""
        depth = frame.depth
        valid = depth > 0
        pts_cam = self._dirs_np[valid] * depth[valid][:, None]
        c2w = frame.get_pose()
        pts = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
        if self.vox_map.insert_points(pts):
            self.maps = self.vox_map.device_state()

    def dispatch_tracking(self, cur_frame: Frame):
        """Two-phase tracking (async dispatch; pipeline overlaps the next
        frame's prefetch with the in-flight program)."""
        if not self.is_initialized():
            return None
        best_t, best_r, _ = self._track_step(
            self.model_params, self.maps, cur_frame.rgb_jax(), cur_frame.depth_jax(),
            jnp.asarray(cur_frame.t), jnp.asarray(cur_frame.r), self._next_key(),
        )
        return (best_t, best_r)

    def finish_tracking(self, handle) -> Optional[np.ndarray]:
        if handle is None:
            return None
        from ..ops import lie_np

        bt, br = jax.device_get(handle)
        return lie_np.pose_vec_to_matrix(bt, br, rot_rep="axis_angle")

    def do_mapping(self, cur_frame: Frame) -> None:
        cfg = self.config
        first = not self.is_initialized()
        self.create_voxels(cur_frame)
        n_iters = cfg.mapping_first_n_iters if first else cfg.mapping_n_iters

        # window: random keyframes + current (reference keyframe_selection='random')
        k = cfg.mapping_window_size - 1
        if self.kf_count <= k:
            slots = list(range(self.kf_count))
        else:
            rng = np.random.default_rng(int(self._next_key()[0]))
            slots = sorted(int(s) for s in rng.permutation(self.kf_count - 1)[: k - 1]) + [self.kf_count - 1]
        cur_pose = np.concatenate([cur_frame.t, cur_frame.r]).astype(np.float32)
        cur_img = jnp.concatenate([cur_frame.rgb_jax(), cur_frame.depth_jax()[..., None]], -1)[None]
        if slots:
            idx = jnp.asarray(slots, jnp.int32)
            images = jnp.concatenate([self.kf_images[idx], cur_img], 0)
            poses = jnp.concatenate([self.kf_pose[idx], jnp.asarray(cur_pose)[None]], 0)
        else:
            images, poses = cur_img, jnp.asarray(cur_pose)[None]
        n_valid = len(slots) + 1
        # pad to the STATIC window size so every length shares one program
        W_static = cfg.mapping_window_size
        images, poses = self.pad_window(images, poses, cur_img, cur_pose, W_static)
        optimize_pose = self.bundle_adjust and n_valid > 1
        fn = self._map_variant(W_static, n_iters, optimize_pose)
        model_sub = {"decoder": self.model_params["decoder"], "embeddings": self.model_params["embeddings"]}
        new_sub, self.model_opt_state, new_poses = fn(
            model_sub, self.model_opt_state, self.maps, images, poses,
            jnp.asarray(n_valid, jnp.int32), self._next_key()
        )
        self.model_params.update(new_sub)
        new_poses = np.asarray(new_poses)
        if optimize_pose:
            for j, s in enumerate(slots):
                self.kf_pose = self.kf_pose.at[s].set(jnp.asarray(new_poses[j]))
        cur_frame.t = new_poses[n_valid - 1][:3].copy()
        cur_frame.r = new_poses[n_valid - 1][3:].copy()
        if first:
            self.set_initialized()

    def add_keyframe(self, keyframe: Frame) -> None:
        if self.kf_count >= self.config.max_keyframes:
            raise RuntimeError("keyframe capacity exceeded; raise max_keyframes")
        slot = self.kf_count
        rgbd = jnp.concatenate([keyframe.rgb_jax(), keyframe.depth_jax()[..., None]], -1)
        self.kf_images = self.kf_images.at[slot].set(rgbd)
        self.kf_pose = self.kf_pose.at[slot].set(jnp.concatenate([jnp.asarray(keyframe.t), jnp.asarray(keyframe.r)]))
        self.kf_count += 1
        self.keyframe_fids.append(keyframe.fid)

    def render_img(self, c2w: np.ndarray, gt_depth: Optional[np.ndarray] = None, idx: Optional[int] = None):
        cam = self.camera
        c2w = jnp.asarray(c2w, jnp.float32)
        rays_d = self._dirs.reshape(-1, 3) @ c2w[:3, :3].T
        rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
        n = rays_d.shape[0]
        bs = self.config.ray_batch_size
        dep, col = [], []
        for i in range(0, n, bs):
            ro, rd = rays_o[i : i + bs], rays_d[i : i + bs]
            pad = bs - ro.shape[0]
            if pad > 0:
                ro = jnp.pad(ro, ((0, pad), (0, 0)))
                rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
            out = self._render_chunk(self.model_params, self.maps, ro, rd, self._next_key())
            take = bs - pad if pad > 0 else bs
            dep.append(np.asarray(out["depth"][:take]))
            col.append(np.asarray(out["rgb"][:take]))
        return (
            np.concatenate(col).reshape(cam.height, cam.width, 3),
            np.concatenate(dep).reshape(cam.height, cam.width),
        )

    def get_mesh(self):
        """Dense-grid SDF eval over the voxel bounding region + marching
        tetrahedra (replaces per-voxel skimage MC, voxfusion.py:173-278)."""
        from ..common.mesher import Mesher, MesherConfig

        if self.vox_map.n_voxels == 0:
            return None
        coords = self.vox_map.vox_coords[: self.vox_map.n_voxels]
        vs = self.config.model.voxel_size
        lo = coords.min(0) * vs - vs
        hi = (coords.max(0) + 2) * vs
        bound = np.stack([lo, hi], -1)
        mesher = MesherConfig(resolution=self.config.mesh_resolution, points_batch_size=30000).setup(
            camera=self.camera, bounding_box=bound, marching_cubes_bound=bound
        )

        def query(pts):
            sdf, _ = self._query_sdf_grid(self.model_params, self.maps, jnp.asarray(pts))
            return np.asarray(sdf)

        def color(pts):
            _, rgb = self._query_sdf_grid(self.model_params, self.maps, jnp.asarray(pts))
            return np.asarray(rgb)

        self.cur_mesh = mesher.get_mesh(query, color)
        return self.cur_mesh
