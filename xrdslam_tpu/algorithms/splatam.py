"""SplaTAM: 3D Gaussian splatting SLAM on the Pallas tile rasterizer.

TPU-native rebuild of the reference algorithm (reference:
slam/algorithms/splatam.py:21-126). Structural mapping:

  * Tracking optimizes the current camera pose (quat+t of c2w; the
    rasterizer sees w2c) against full-image sil-masked L1 losses — one
    jitted scan of tracking_n_iters full renders.
  * Mapping picks a RANDOM window frame per iteration (splatam.py:50-66)
    and optimizes all gaussian parameter groups with per-group Adam lrs;
    window selection is the overlap method over keyframes.
  * Gaussian growth from the silhouette/depth-error mask happens before
    each mapping call (model_update, gaussian_splatting.py:84-104);
    PRUNING runs INSIDE the mapping scan at the reference's per-iteration
    schedule (prune_every/start_after/stop_after,
    gaussian_cloud_splatam.py:120-151) by flipping a persistent dead mask
    and freezing dead rows — the functional analogue of the reference's
    row deletion + Adam-state surgery.
  * Gradient-based clone/split densification
    (gaussian_cloud_splatam.py:174-256) runs in-scan when
    ``mapping_use_gaussian_splatting_densification`` is on: screen-space
    gradient norms accumulate per gaussian (via an explicit zero-valued
    duv parameter so d loss/d means2D falls out of the same backward
    pass), and at each densify step small high-gradient gaussians are
    cloned, large ones split into jittered copies, and the tile binning
    is rebuilt on device so new gaussians render immediately.
  * Tile binning runs ON DEVICE inside the per-frame programs
    (ops.gaussian_raster.bin_gaussians_device) — the round-1 host binning
    (fetch projections -> numpy lexsort -> upload) cost ~300 ms/frame on
    the 1-core host and serialized every call.
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
from ..models.gaussian_splatting import GaussianSplattingConfig
from ..ops import lie
from ..ops.gaussian_raster import bin_gaussians_device
from .base import Algorithm, AlgorithmConfig


@dataclass
class SplaTAMConfig(AlgorithmConfig):
    """reference: slam/algorithms/splatam.py:13-18 + input_config.py:377-433."""

    _target: Type = field(default_factory=lambda: SplaTAM)
    model: GaussianSplattingConfig = field(default_factory=GaussianSplattingConfig)
    mapping_sil_thres: float = 0.5
    render_mode: str = "color"
    max_keyframes: int = 512
    # gradient-based clone/split densification during mapping (reference
    # ships this OFF; schedules in model.mapping_densify_dict)
    mapping_use_gaussian_splatting_densification: bool = False
    seed: int = 0


GAUSS_GROUPS = ("means3D", "rgb_colors", "unnorm_rotations", "logit_opacities", "log_scales")


class SplaTAM(Algorithm):
    config: SplaTAMConfig

    def __init__(self, config: SplaTAMConfig, camera: Camera) -> None:
        super().__init__(config, camera)
        self.model = config.model.setup(camera=camera, bounding_box=None)
        self.model.mesh = self.mesh  # tile-row dp sharding (rasterize_dp)
        self.bundle_adjust = False
        self._key = jax.random.PRNGKey(config.seed)
        self.params = self._replicate_params(self.model.init_params(self._next_key()))
        self.dead = self._replicate_params(jnp.zeros((config.model.max_gaussians,), jnp.bool_))
        self._opt_cfgs = {name: g["optimizer"] for name, g in config.optimizers.items()}
        # keyframes: host Frame list (window ranking) + DEVICE image/pose
        # store for the fused per-frame program (rgb as uint16 — the same
        # quantization Frame's upload path uses, so values round-trip
        # exactly; depth stays f32)
        self.kf_frames: List[Frame] = []
        H, W = camera.height, camera.width
        self.kf_rgb_u16 = jnp.zeros((config.max_keyframes, H, W, 3), jnp.uint16)
        self.kf_depth = jnp.zeros((config.max_keyframes, H, W), jnp.float32)
        self.kf_w2c = jnp.zeros((config.max_keyframes, 4, 4), jnp.float32)
        self._count_dev = None  # device gaussian count during fused runs
        self._pending_kf: List[Tuple[int, Frame]] = []
        self.cur_mesh = None
        self._build_jits()

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    @property
    def n_gauss(self) -> int:
        return self.model.n_gauss

    # ------------------------------------------------------------------
    def _build_jits(self) -> None:
        cfg = self.config
        model = self.model
        cam = self.camera
        k_tile = cfg.model.k_per_tile

        def binning(params, dead, count, w2c, max_span: int = 4):
            """On-device tile binning from current params/pose.

            max_span=4 in the optimization loops (the footprint cap only
            truncates transient >64 px gaussians and the span-6 sort costs
            2.25x); 6 — matching the host binner — for the growth mask and
            eval renders where silhouette coverage feeds decisions."""
            u, v, depth, sigma = model.project(params, w2c)
            alive = model.alive_mask(dead, count)
            return bin_gaussians_device(
                u, v, depth, 3.0 * sigma, alive, cam.height, cam.width,
                k_per_tile=k_tile, max_span=max_span)

        self._binning_fn = binning
        self._bin_jit = jax.jit(binning)

        def track_step(params, dead, count, rgb, depth, t0, q0, tiles, mask, key, *, ntx, nty):
            sch_r = self._tracking_lr_schedule(self._opt_cfgs["tracking_pose_r"].lr)
            sch_t = self._tracking_lr_schedule(self._opt_cfgs["tracking_pose_t"].lr)
            opt = GroupOptimizers(
                {"tracking_pose_r": self._opt_cfgs["tracking_pose_r"], "tracking_pose_t": self._opt_cfgs["tracking_pose_t"]},
                schedules={"tracking_pose_r": sch_r, "tracking_pose_t": sch_t} if sch_r else None,
            )
            pose = {"tracking_pose_r": q0, "tracking_pose_t": t0}
            opt_state = opt.init(pose)
            binning_ = (tiles, mask)
            alive = model.alive_mask(dead, count)

            def body(carry, _):
                pose, opt_state, best = carry

                def loss_fn(p):
                    c2w = lie.pose_vec_to_matrix(p["tracking_pose_t"], p["tracking_pose_r"], rot_rep="quat")
                    w2c = lie.pose_inverse(c2w)
                    out = model.render(params, alive, w2c, binning_, ntx, nty)
                    return model.get_loss(out, rgb, depth, is_mapping=False)

                loss, g = jax.value_and_grad(loss_fn)(pose)
                best_loss, bt, bq = best
                better = loss < best_loss
                best = (
                    jnp.where(better, loss, best_loss),
                    jnp.where(better, pose["tracking_pose_t"], bt),
                    jnp.where(better, pose["tracking_pose_r"], bq),
                )
                g = self._finite_guard(loss, g)
                pose, opt_state = opt.update(g, opt_state, pose)
                return (pose, opt_state, best), loss

            init = (pose, opt_state, (jnp.asarray(1e10, jnp.float32), t0, q0))
            (_, _, best), _ = jax.lax.scan(body, init, None, length=cfg.tracking_n_iters)
            return best[1], best[2], best[0]

        self._track_step_raw = track_step
        self._track_variants: Dict[Tuple, Any] = {}

        def map_step(params, dead, count, images, w2cs, tiles, mask, n_valid,
                     key, *, n_iters, ntx, nty, densify: bool):
            opt = GroupOptimizers({g: self._opt_cfgs[g] for g in GAUSS_GROUPS})
            opt_state = opt.init({g: params[g] for g in GAUSS_GROUPS})
            gparams = {g: params[g] for g in GAUSS_GROUPS}
            G = cfg.model.max_gaussians
            ddict = cfg.model.mapping_densify_dict

            def body(carry, inp):
                gp, opt_state, dead, count, accum, denom, tiles, mask = carry
                it, k = inp
                k_fi, k_split = jax.random.split(k)
                # window is padded to a STATIC mapping_window_size (one
                # compiled program for every window length); sampling is
                # bounded by the traced n_valid so pads are never picked
                fi = jax.random.randint(k_fi, (), 0, n_valid)
                img = images[fi]
                w2c = w2cs[fi]
                tile = tiles[fi]
                msk = mask[fi]
                alive = model.alive_mask(dead, count)

                def loss_fn(p):
                    duv = p.get("_duv")
                    out = model.render(p, alive, w2c, (tile, msk), ntx, nty, duv=duv)
                    return model.get_loss(out, img[..., :3], img[..., 3], is_mapping=True)

                diff = dict(gp)
                if densify:
                    diff["_duv"] = jnp.zeros((G, 2), jnp.float32)
                loss, g = jax.value_and_grad(loss_fn)(diff)
                g = self._finite_guard(loss, g)
                upd, opt_state = opt.update({k2: g[k2] for k2 in GAUSS_GROUPS}, opt_state, gp)
                # freeze dead/unallocated rows (the reference deletes them
                # outright; a frozen row in a fixed table is equivalent)
                gp = {k2: jnp.where(alive[:, None] > 0, upd[k2], gp[k2]) for k2 in GAUSS_GROUPS}

                # in-loop prune at the reference schedule
                dead, _ = model.prune_step(gp, dead, count, it)

                if densify:
                    # duv is in PIXELS; the reference's grad_thresh (0.0002,
                    # gaussian_cloud_splatam.py densify defaults) is for
                    # NDC-scale means2D gradients. The pixel->NDC jacobian
                    # is anisotropic: d(px)/d(ndc) = W/2 for u, H/2 for v.
                    ndc = jnp.asarray([0.5 * cam.width, 0.5 * cam.height])
                    gnorm = jnp.linalg.norm(g["_duv"] * ndc, axis=-1)
                    seen = gnorm > 0
                    accum = accum + gnorm
                    denom = denom + seen.astype(jnp.float32)
                    do = ((it >= ddict["start_after"]) & (it <= ddict["stop_after"])
                          & (it % max(ddict["densify_every"], 1) == 0) & (it > 0))

                    def densify_branch(args):
                        gp, dead, count, accum, denom, tiles, mask = args
                        grads = accum / jnp.maximum(denom, 1.0)
                        scale = jnp.exp(gp["log_scales"][:, 0])
                        idx = jnp.arange(G)
                        rows = (idx < count) & ~dead
                        hi = (grads >= ddict["grad_thresh"]) & rows
                        small = scale <= 0.01 * model.scene_radius
                        to_clone = hi & small
                        gp, dead, count = model.append_rows(gp, dead, count, to_clone)
                        to_split = hi & ~small
                        n_split = int(ddict["num_to_split_into"])
                        gp, dead, count = model.append_rows(
                            gp, dead, count, to_split, key=k_split,
                            repeat=n_split, scale_div=0.8 * n_split)
                        dead = dead | to_split
                        # removal pass (gaussian_cloud_splatam.py:231-245)
                        thresh = jnp.where(it == ddict["stop_after"],
                                           ddict["final_removal_opacity_threshold"],
                                           ddict["removal_opacity_threshold"])
                        low = jax.nn.sigmoid(gp["logit_opacities"][:, 0]) < thresh
                        big = scale > cfg.model.prune_big_fraction * model.scene_radius
                        dead = dead | ((low | (big & (it >= ddict["remove_big_after"])))
                                       & (idx < count))
                        accum = jnp.zeros_like(accum)
                        denom = jnp.zeros_like(denom)
                        # rebin every window frame so new gaussians render
                        tiles, mask = jax.vmap(
                            lambda w: self._binning_fn(gp, dead, count, w))(w2cs)
                        return gp, dead, count, accum, denom, tiles, mask

                    gp, dead, count, accum, denom, tiles, mask = jax.lax.cond(
                        do, densify_branch, lambda a: a,
                        (gp, dead, count, accum, denom, tiles, mask))

                return (gp, opt_state, dead, count, accum, denom, tiles, mask), loss

            accum = jnp.zeros((G,), jnp.float32)
            denom = jnp.zeros((G,), jnp.float32)
            keys = jax.random.split(key, n_iters)
            its = jnp.arange(n_iters)
            carry0 = (gparams, opt_state, dead, count, accum, denom, tiles, mask)
            (gparams, _, dead, count, _, _, _, _), losses = jax.lax.scan(body, carry0, (its, keys))
            return gparams, dead, count, losses

        self._map_step_raw = map_step
        self._map_variants: Dict[Tuple, Any] = {}

        def grow_step(params, dead, count, rgb, depth, c2w, *, first: bool,
                      ntx: int, nty: int):
            """Boundary gaussian growth ON DEVICE (model_update,
            gaussian_splatting.py:84-104 / gaussian_cloud_splatam.py:
            258-305): render silhouette+depth, build the non-presence
            mask, back-project masked pixels and scatter-append them —
            no per-frame render fetch / host mask / re-upload."""
            G = cfg.model.max_gaussians
            w2c = lie.pose_inverse(c2w)
            valid = depth > 0
            if first:
                mask = valid
            else:
                tiles, msk = binning(params, dead, count, w2c, max_span=6)
                alive = model.alive_mask(dead, count)
                out = model.render(params, alive, w2c, (tiles, msk), ntx, nty)
                sil = out["sil"]
                rdepth = out["depth"]
                derr = jnp.abs(depth - rdepth) * valid
                med = jnp.nanmedian(jnp.where(derr > 0, derr, jnp.nan))
                med = jnp.where(jnp.isfinite(med), med, 0.0)
                non_presence = (sil < cfg.mapping_sil_thres) | (
                    (rdepth > depth) & (derr > 50.0 * med))
                mask = non_presence & valid
            ys, xs = jnp.meshgrid(
                jnp.arange(cam.height, dtype=jnp.float32),
                jnp.arange(cam.width, dtype=jnp.float32), indexing="ij")
            dirs = jnp.stack([(xs - cam.cx) / cam.fx,
                              -(ys - cam.cy) / cam.fy,
                              -jnp.ones_like(xs)], -1)
            pts = c2w[:3, 3] + (dirs @ c2w[:3, :3].T) * depth[..., None]
            m = mask.reshape(-1)
            pts = pts.reshape(-1, 3)
            cols = rgb.reshape(-1, 3)
            log_s = jnp.log(jnp.maximum(depth.reshape(-1) / model._f, 1e-6))
            dest = count + jnp.cumsum(m.astype(jnp.int32)) - 1
            ok = m & (dest < G)
            dest = jnp.where(ok, dest, G)  # out of bounds -> dropped
            params = dict(params)
            params["means3D"] = params["means3D"].at[dest].set(
                jnp.where(ok[:, None], pts, 0.0), mode="drop")
            params["rgb_colors"] = params["rgb_colors"].at[dest].set(
                jnp.where(ok[:, None], cols, 0.0), mode="drop")
            params["logit_opacities"] = params["logit_opacities"].at[dest].set(
                jnp.zeros((pts.shape[0], 1)), mode="drop")
            params["log_scales"] = params["log_scales"].at[dest].set(
                jnp.where(ok, log_s, 0.0)[:, None], mode="drop")
            dead = dead.at[dest].set(False, mode="drop")
            new_count = jnp.minimum(count + jnp.sum(ok).astype(jnp.int32), G)
            return params, dead, new_count

        self._grow_fn_raw = grow_step
        self._grow_variants: Dict[Tuple, Any] = {}

        def grow_jit(first: bool, ntx: int, nty: int):
            sig = (first, ntx, nty)
            if sig not in self._grow_variants:
                self._grow_variants[sig] = jax.jit(functools.partial(
                    grow_step, first=first, ntx=ntx, nty=nty))
            return self._grow_variants[sig]

        self._grow_jit = grow_jit

        def render_full(params, dead, count, w2c):
            tiles, mask = binning(params, dead, count, w2c, max_span=6)
            alive = model.alive_mask(dead, count)
            ntx = (cam.width + 15) // 16
            nty = (cam.height + 15) // 16
            return model.render(params, alive, w2c, (tiles, mask), ntx, nty)

        self._render = jax.jit(render_full)

        # -------- fused per-frame super-step: predict -> bin -> track ->
        # grow -> window bin -> map -> [kf insert], ONE device program.
        # SplaTAM maps every frame (reference map_every=1), so the per-frame
        # path's 5+ dispatch/fetch round trips (~30 ms each over the tunnel)
        # dominated its 0.86 fps steady state. ------------------------------
        def predict_quat(t1, q1, t2, q2):
            R1 = lie.quaternion_to_matrix(q1)
            R2 = lie.quaternion_to_matrix(q2)
            dR = R1 @ R2.T
            dt = t1 - dR @ t2
            Rp = dR @ R1
            tp = dR @ t1 + dt
            return tp, lie.matrix_to_quaternion(Rp)

        def fused_step(params, dead, count, kf_rgb, kf_depth, kf_w2c,
                       rgb, depth, win_slots, n_valid, t1, q1, t2, q2, key,
                       kf_slot, *, ntx, nty, n_iters, densify, do_kf):
            k1, k2 = jax.random.split(key)
            tp, qp = predict_quat(t1, q1, t2, q2)
            w2c_p = lie.pose_inverse(lie.pose_vec_to_matrix(tp, qp, rot_rep="quat"))
            tiles, mask = binning(params, dead, count, w2c_p)
            bt, bq, _ = track_step(params, dead, count, rgb, depth, tp, qp,
                                   tiles, mask, k1, ntx=ntx, nty=nty)
            c2w = lie.pose_vec_to_matrix(bt, bq, rot_rep="quat")
            w2c_cur = lie.pose_inverse(c2w)
            params, dead, count = grow_step(params, dead, count, rgb, depth,
                                            c2w, first=False, ntx=ntx, nty=nty)
            # window rows: [kf slots..., cur at n_valid-1, cur pads]
            cur_img = jnp.concatenate([rgb, depth[..., None]], -1)
            kf_imgs = jnp.concatenate(
                [kf_rgb[win_slots].astype(jnp.float32) / 65535.0,
                 kf_depth[win_slots][..., None]], -1)
            images = jnp.concatenate([kf_imgs, cur_img[None]], 0)
            w2cs = jnp.concatenate([kf_w2c[win_slots], w2c_cur[None]], 0)
            wn = images.shape[0]
            is_cur = jnp.arange(wn) >= n_valid - 1
            images = jnp.where(is_cur[:, None, None, None], cur_img[None], images)
            w2cs = jnp.where(is_cur[:, None, None], w2c_cur[None], w2cs)
            tiles_w, masks_w = jax.vmap(lambda w: binning(params, dead, count, w))(w2cs)
            gparams, dead, count, _ = map_step(
                params, dead, count, images, w2cs, tiles_w, masks_w, n_valid,
                k2, n_iters=n_iters, ntx=ntx, nty=nty, densify=densify)
            params = {**params, **gparams}
            if do_kf:
                kf_rgb = kf_rgb.at[kf_slot].set(
                    (rgb * 65535.0 + 0.5).astype(jnp.uint16))
                kf_depth = kf_depth.at[kf_slot].set(depth)
                kf_w2c = kf_w2c.at[kf_slot].set(w2c_cur)
            return params, dead, count, kf_rgb, kf_depth, kf_w2c, bt[None], bq[None]

        self._fused_raw = fused_step
        self._fused_variants: Dict[Tuple, Any] = {}

    # ------------------------------------------------------------------
    def dispatch_tracking(self, cur_frame: Frame):
        """Two-phase tracking (async dispatch; pipeline overlaps the next
        frame's prefetch with the in-flight program)."""
        if not self.is_initialized():
            return None
        c2w = cur_frame.get_pose()
        w2c = jnp.asarray(np.linalg.inv(c2w), jnp.float32)
        count = jnp.asarray(self.model.n_gauss, jnp.int32)
        tiles, mask = self._bin_jit(self.params, self.dead, count, w2c)
        t0 = jnp.asarray(cur_frame.t)
        q0 = jnp.asarray(cur_frame.r)
        ntx = (self.camera.width + 15) // 16
        nty = (self.camera.height + 15) // 16
        sig = (ntx, nty)
        if sig not in self._track_variants:
            self._track_variants[sig] = jax.jit(functools.partial(self._track_step_raw, ntx=ntx, nty=nty))
        bt, bq, _ = self._track_variants[sig](
            self.params, self.dead, count, cur_frame.rgb_jax(), cur_frame.depth_jax(),
            t0, q0, tiles, mask, self._next_key(),
        )
        return (bt, bq)

    def finish_tracking(self, handle) -> Optional[np.ndarray]:
        if handle is None:
            return None
        from ..ops import lie_np

        bt_np, bq_np = jax.device_get(handle)
        return lie_np.pose_vec_to_matrix(bt_np, bq_np, rot_rep="quat")

    def do_mapping(self, cur_frame: Frame) -> None:
        cfg = self.config
        first = not self.is_initialized()
        # --- gaussian growth (pre_precessing -> model_update), entirely on
        # device: render+mask+backproject+scatter-append in ONE program ---
        c2w = cur_frame.get_pose()
        if first:
            self.model.scene_radius = float(cur_frame.depth.max() / 3.0)
        ntx = (self.camera.width + 15) // 16
        nty = (self.camera.height + 15) // 16
        count = jnp.asarray(self.model.n_gauss, jnp.int32)
        self.params, self.dead, count = self._grow_jit(first, ntx, nty)(
            self.params, self.dead, count, cur_frame.rgb_jax(),
            cur_frame.depth_jax(), jnp.asarray(c2w, jnp.float32))

        # --- window (overlap selection over keyframes + cur), padded to a
        # STATIC mapping_window_size by repeating the current frame so all
        # window lengths share ONE compiled mapping program. The gaussian
        # count stays a DEVICE scalar throughout (no host sync until the
        # final bookkeeping fetch) ----------------------------------------
        frames = self._select_window(cur_frame)
        n_valid = len(frames)
        frames = frames + [cur_frame] * (cfg.mapping_window_size - n_valid)
        images = jnp.stack(
            [jnp.concatenate([jnp.asarray(f.rgb), jnp.asarray(f.depth)[..., None]], -1) for f in frames]
        )
        w2cs = jnp.stack([jnp.asarray(np.linalg.inv(f.get_pose()), jnp.float32) for f in frames])
        tiles, masks = jax.vmap(lambda w: self._bin_jit(self.params, self.dead, count, w))(w2cs)
        n_iters = cfg.mapping_first_n_iters if first else cfg.mapping_n_iters
        densify = bool(cfg.mapping_use_gaussian_splatting_densification)
        sig = (n_iters, ntx, nty, densify)
        if sig not in self._map_variants:
            self._map_variants[sig] = jax.jit(
                functools.partial(self._map_step_raw,
                                  n_iters=n_iters, ntx=ntx, nty=nty, densify=densify)
            )
        gparams, self.dead, new_count, _ = self._map_variants[sig](
            self.params, self.dead, count, images, w2cs, tiles, masks,
            jnp.asarray(n_valid, jnp.int32), self._next_key()
        )
        self.params.update(gparams)
        self.model.n_gauss = int(jax.device_get(new_count))
        self._count_dev = None
        if first:
            self.set_initialized()

    def _select_window_slots(self, cur_depth: np.ndarray, cur_c2w: np.ndarray) -> List[int]:
        """Overlap keyframe ranking (common.py:342-426) -> kf indices."""
        w = self.config.mapping_window_size
        n_kf = len(self.kf_frames)
        if n_kf <= w - 2:
            return list(range(n_kf))
        rng = np.random.default_rng(int(self._next_key()[0]))
        cam = self.camera
        d = cur_depth
        vs, us = np.nonzero(d > 0)
        pick = rng.integers(0, len(vs), 1600)
        u, v, z = us[pick], vs[pick], d[vs[pick], us[pick]]
        dirs = np.stack([(u - cam.cx) / cam.fx, -(v - cam.cy) / cam.fy, -np.ones_like(u, np.float64)], -1)
        c2w = cur_c2w
        pts = c2w[:3, 3] + (dirs @ c2w[:3, :3].T) * z[:, None]
        scores = []
        for f in self.kf_frames[:-1]:
            w2c = np.linalg.inv(f.get_pose())
            pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
            zc = -pc[:, 2]
            uu = cam.cx + cam.fx * pc[:, 0] / np.maximum(zc, 1e-6)
            vv = cam.cy - cam.fy * pc[:, 1] / np.maximum(zc, 1e-6)
            ok = (zc > 0) & (uu >= 20) & (uu < cam.width - 20) & (vv >= 20) & (vv < cam.height - 20)
            scores.append(ok.mean())
        top = np.argsort(scores)[::-1][: w - 2]
        return sorted(int(t) for t in top) + [n_kf - 1]

    def _select_window(self, cur_frame: Frame) -> List[Frame]:
        slots = self._select_window_slots(cur_frame.depth, cur_frame.get_pose())
        return [self.kf_frames[i] for i in slots] + [cur_frame]

    # ------------------------------------------------------------------
    # fused per-frame super-step (pipeline fast path, map_every=1)
    # ------------------------------------------------------------------
    def dispatch_superstep(self, frames: List[Frame], do_kf: bool,
                           prev_c2w: np.ndarray = None, prev2_c2w: np.ndarray = None,
                           prev_tr=None, prev2_tr=None):
        from ..ops import lie_np

        assert len(frames) == 1, "SplaTAM maps every frame (group size 1)"
        cur = frames[0]
        cfg = self.config
        if prev_tr is not None:
            t1, q1 = prev_tr
            t2, q2 = prev2_tr
        else:
            t1, q1 = lie_np.matrix_to_pose_vec(np.asarray(prev_c2w, np.float32), rot_rep="quat")
            t2, q2 = lie_np.matrix_to_pose_vec(np.asarray(prev2_c2w, np.float32), rot_rep="quat")
            t1, q1, t2, q2 = map(jnp.asarray, (t1, q1, t2, q2))
        # window ranking uses host poses; the newest entries may lag the
        # device by the pipelining depth (<= 2 frames) — acceptable for a
        # selection heuristic, and the newest keyframe is always included.
        est = self.estimate_c2w_list
        guess = np.asarray(est[-1]) if est else (
            self.kf_frames[-1].get_pose() if self.kf_frames else np.eye(4, dtype=np.float32))
        slots = self._select_window_slots(cur.depth, guess)
        n_valid = len(slots) + 1
        wn = cfg.mapping_window_size
        win_slots = jnp.asarray(slots + [0] * (wn - 1 - len(slots)), jnp.int32)
        count = self._count_dev if self._count_dev is not None else jnp.asarray(self.model.n_gauss, jnp.int32)
        ntx = (self.camera.width + 15) // 16
        nty = (self.camera.height + 15) // 16
        densify = bool(cfg.mapping_use_gaussian_splatting_densification)
        sig = (ntx, nty, cfg.mapping_n_iters, densify, do_kf)
        if sig not in self._fused_variants:
            self._fused_variants[sig] = jax.jit(functools.partial(
                self._fused_raw, ntx=ntx, nty=nty, n_iters=cfg.mapping_n_iters,
                densify=densify, do_kf=do_kf))
        kf_slot = len(self.kf_frames)
        out = self._fused_variants[sig](
            self.params, self.dead, count, self.kf_rgb_u16, self.kf_depth,
            self.kf_w2c, cur.rgb_jax(), cur.depth_jax(), win_slots,
            jnp.asarray(n_valid, jnp.int32), t1, q1, t2, q2, self._next_key(),
            jnp.asarray(kf_slot, jnp.int32))
        (self.params, self.dead, self._count_dev, self.kf_rgb_u16,
         self.kf_depth, self.kf_w2c, pt, pq) = out
        if do_kf:
            if kf_slot >= self.config.max_keyframes:
                raise RuntimeError("keyframe capacity exceeded; raise max_keyframes")
            self.kf_frames.append(cur)
            self.keyframe_fids.append(cur.fid)
        # FIFO of in-flight frames: finish order == dispatch order, so the
        # next finish call backfills this frame's host pose if it became a
        # keyframe (the device kf_w2c already has the exact pose)
        self._pending_kf.append((cur if do_kf else None, self._count_dev))
        return (pt, pq)

    def finish_superstep(self, handle) -> List[np.ndarray]:
        from ..ops import lie_np

        fr, count_ref = self._pending_kf.pop(0)
        pt, pq, count = jax.device_get((handle[0], handle[1], count_ref))
        self.model.n_gauss = int(count)
        c2w = lie_np.pose_vec_to_matrix(pt[0], pq[0], rot_rep="quat")
        if fr is not None:
            fr.set_pose(c2w)
        return [c2w]

    def add_keyframe(self, keyframe: Frame) -> None:
        slot = len(self.kf_frames)
        if slot >= self.config.max_keyframes:
            raise RuntimeError("keyframe capacity exceeded; raise max_keyframes")
        self.kf_frames.append(keyframe)
        self.keyframe_fids.append(keyframe.fid)
        c2w = np.asarray(keyframe.get_pose(), np.float64)
        w2c = np.linalg.inv(c2w).astype(np.float32)
        self.kf_rgb_u16 = self.kf_rgb_u16.at[slot].set(
            (keyframe.rgb_jax() * 65535.0 + 0.5).astype(jnp.uint16))
        self.kf_depth = self.kf_depth.at[slot].set(keyframe.depth_jax())
        self.kf_w2c = self.kf_w2c.at[slot].set(jnp.asarray(w2c))

    def render_img(self, c2w: np.ndarray, gt_depth: Optional[np.ndarray] = None, idx: Optional[int] = None):
        w2c = np.linalg.inv(np.asarray(c2w, np.float64)).astype(np.float32)
        count = jnp.asarray(self.model.n_gauss, jnp.int32)
        out = self._render(self.params, self.dead, count, jnp.asarray(w2c))
        rgb = np.clip(np.asarray(out["rgb"]), 0, 1)
        depth = np.asarray(out["depth"])
        if gt_depth is not None:
            valid = gt_depth > 0
            rgb = rgb * valid[..., None]
            depth = depth * valid
        return rgb, depth

    def get_cloud(self, c2w_np: np.ndarray, gt_depth_np: Optional[np.ndarray]):
        """Gaussian centers + colors (reference render_mode 'centers')."""
        n = self.model.n_gauss
        return np.asarray(self.params["means3D"][:n]), np.asarray(self.params["rgb_colors"][:n])
