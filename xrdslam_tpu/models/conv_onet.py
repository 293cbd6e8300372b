"""ConvOnet (NICE-SLAM) scene model: hierarchical dense feature grids + MLPs.

TPU-native rebuild of the reference model (reference:
slam/models/conv_onet.py:18-524 + decoder_nice.py): 3-4 dense feature grids
(coarse 2 m / middle 0.32 / fine 0.16 / color 0.16, C=32) sampled
trilinearly, decoded by 5-block skip MLPs with Gaussian-Fourier position
embeddings, rendered with occupancy alpha compositing
(sigmoid(10·occ), utils.py:189-244).

Key structural choices:
  * Grids are stored channel-last ``[X, Y, Z, C]`` and sampled by
    ops.trilinear.grid_sample_3d (same align-corners/border semantics as
    the reference's F.grid_sample, decoder_nice.py:195-205).
  * Pretrained (frozen) decoders are captured as jit constants; trainable
    decoders live in ``params['decoder']``. When no pretrained checkpoint
    is available, middle/fine decoders are auto-promoted to trainable
    (a frozen random decoder could never learn).
  * The reference's frustum feature *selection* (param surgery,
    conv_onet.py:187-211) is recast as gradient masking: masks are
    computed per mapping call and multiply grid gradients inside the
    jitted step — functionally identical with per-call Adam state.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rendering
from ..ops.trilinear import grid_sample_3d, normalize_3d_coordinate
from .base import Model, ModelConfig


@dataclass
class ConvOnetConfig(ModelConfig):
    """reference: slam/models/conv_onet.py:18-64."""

    _target: Type = field(default_factory=lambda: ConvOnet)
    coarse: bool = False
    occupancy: bool = True
    pretrained_decoders_coarse: Optional[Path] = None
    pretrained_decoders_middle_fine: Optional[Path] = None
    data_dim: int = 3
    model_c_dim: int = 32
    model_hidden_size: int = 32
    model_pos_embedding_method: str = "fourier"
    model_coarse_bound_enlarge: int = 2
    grid_len_coarse: float = 2.0
    grid_len_middle: float = 0.32
    grid_len_fine: float = 0.16
    grid_len_color: float = 0.16
    grid_bound_divisible: float = 0.32
    rendering_n_samples: int = 32
    rendering_n_surface: int = 16
    rendering_n_importance: int = 0
    rendering_lindisp: bool = False
    rendering_perturb: float = 0.0
    points_batch_size: int = 500000
    tracking_w_color_loss: float = 0.5
    mapping_w_color_loss: float = 0.2
    tracking_handle_dynamic: bool = True
    tracking_use_color_in_tracking: bool = True
    mapping_fix_fine: bool = True
    mapping_fix_color: bool = False
    mapping_frustum_feature_selection: bool = True
    # In-env fallback when the reference's pretrained ConvONet decoders
    # (conv_onet.py:293-322 load_pretrain) are unavailable: explicit
    # near-surface occupancy supervision for mapping. The reference's
    # render-only depth L1 relies on the pretrained decoder prior to avoid a
    # degenerate minimum (carve ALL occupancy so rays terminate on the
    # out-of-bound occ=100 wall just behind the true surface; sigmoid(10*occ)
    # then saturates and gradients die). Logits-BCE free-space/occupied
    # targets within +-geo_trunc of the measured depth hold a wall at the
    # surface and keep gradients alive even from the saturated-wrong regime.
    # Applied only when pretrained decoders failed to load ("auto").
    fallback_geo_supervision: str = "auto"  # "auto" | "on" | "off"
    geo_trunc: float = 0.10
    geo_w: float = 1.0


# ---------------------------------------------------------------------------
# 5-block skip MLP with fourier embedding (decoder_nice.py MLP / MLP_no_xyz)
# ---------------------------------------------------------------------------

def _xavier_relu(key, shape):
    gain = float(np.sqrt(2.0))
    fan_in, fan_out = shape[0], shape[1]
    a = gain * np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-a, maxval=a)


def mlp_decoder_init(key, c_dim: int, hidden: int = 32, n_blocks: int = 5, skips=(2,), color: bool = False, emb: int = 93, no_xyz: bool = False):
    keys = iter(jax.random.split(key, 2 * n_blocks + 4))
    params: Dict[str, Any] = {}
    if not no_xyz:
        params["B"] = jax.random.normal(next(keys), (3, emb)) * 25.0
    pts_w, pts_b = [], []
    in0 = c_dim if no_xyz else emb
    cat = c_dim if no_xyz else emb
    for i in range(n_blocks):
        d_in = in0 if i == 0 else (hidden + cat if (i - 1) in skips else hidden)
        pts_w.append(_xavier_relu(next(keys), (d_in, hidden)))
        pts_b.append(jnp.zeros((hidden,)))
    params["pts_w"], params["pts_b"] = pts_w, pts_b
    if not no_xyz and c_dim > 0:
        fc_w, fc_b = [], []
        for i in range(n_blocks):
            fc_w.append(_xavier_relu(next(keys), (c_dim, hidden)))
            fc_b.append(jnp.zeros((hidden,)))
        params["fc_w"], params["fc_b"] = fc_w, fc_b
    out_dim = 4 if color else 1
    # 0.1x xavier on the output layer: with RANDOM (non-pretrained) decoders
    # a full-scale head saturates sigmoid(10*occ) immediately, killing all
    # gradients; pretrained loads overwrite this anyway.
    a = 0.1 * np.sqrt(6.0 / (hidden + out_dim))
    params["out_w"] = jax.random.uniform(next(keys), (hidden, out_dim), minval=-a, maxval=a)
    params["out_b"] = jnp.zeros((out_dim,))
    return params


def mlp_decoder_apply(params, p_norm: jnp.ndarray, c: jnp.ndarray, skips=(2,), no_xyz: bool = False) -> jnp.ndarray:
    """reference forward: decoder_nice.py:208-233 (MLP) / :307-318 (MLP_no_xyz)."""
    if no_xyz:
        emb = c
        h = c
    else:
        emb = jnp.sin(p_norm @ params["B"])
        h = emb
    n_blocks = len(params["pts_w"])
    for i in range(n_blocks):
        h = jax.nn.relu(h @ params["pts_w"][i] + params["pts_b"][i])
        if (not no_xyz) and "fc_w" in params:
            h = h + c @ params["fc_w"][i] + params["fc_b"][i]
        if i in skips:
            h = jnp.concatenate([emb, h], -1)
    return h @ params["out_w"] + params["out_b"]


class ConvOnet(Model):
    config: ConvOnetConfig

    def __init__(self, config: ConvOnetConfig, camera, bounding_box, **kwargs) -> None:
        super().__init__(config, camera, bounding_box, **kwargs)
        c = config
        # enlarge bound to be divisible (conv_onet.py:322-329)
        bb = np.asarray(bounding_box, np.float64).copy()
        div = c.grid_bound_divisible
        bb[:, 1] = (((bb[:, 1] - bb[:, 0]) / div).astype(int) + 1) * div + bb[:, 0]
        self.bounding_box = bb.astype(np.float32)
        self._bound = jnp.asarray(self.bounding_box)
        self._bound_coarse = jnp.asarray(self.bounding_box * c.model_coarse_bound_enlarge)
        xyz_len = self.bounding_box[:, 1] - self.bounding_box[:, 0]
        self.grid_shapes: Dict[str, Tuple[int, int, int]] = {}
        self.grid_shapes["grid_middle"] = tuple(int(v) for v in xyz_len / c.grid_len_middle)
        self.grid_shapes["grid_fine"] = tuple(int(v) for v in xyz_len / c.grid_len_fine)
        self.grid_shapes["grid_color"] = tuple(int(v) for v in xyz_len / c.grid_len_color)
        if c.coarse:
            self.grid_shapes["grid_coarse"] = tuple(
                int(v) for v in xyz_len * c.model_coarse_bound_enlarge / c.grid_len_coarse
            )
        self.frozen: Dict[str, Any] = {}
        self._load_or_init_decoders()

    # ------------------------------------------------------------------
    def _load_or_init_decoders(self) -> None:
        """Load pretrained middle/fine(/coarse) decoders; fall back to
        trainable random decoders when checkpoints are unavailable
        (conv_onet.py:293-322 load_pretrain)."""
        c = self.config
        cd = c.model_c_dim
        key = jax.random.PRNGKey(7)
        ks = jax.random.split(key, 4)
        self._init_decoders = {
            "middle": mlp_decoder_init(ks[0], cd),
            "fine": mlp_decoder_init(ks[1], cd * 2),
            "color": mlp_decoder_init(ks[2], cd, color=True),
        }
        if c.coarse:
            self._init_decoders["coarse"] = mlp_decoder_init(ks[3], cd, no_xyz=True)

        loaded = {}
        mf = c.pretrained_decoders_middle_fine
        if mf is not None and os.path.exists(mf):
            try:
                from ..utils.torch_convert import load_nice_decoders

                loaded = load_nice_decoders(str(mf), str(c.pretrained_decoders_coarse) if c.coarse else None)
            except Exception as e:  # lfs stubs, missing torch, bad file
                print(f"[conv_onet] pretrained decoder load failed ({e}); training decoders from scratch")
        self.pretrained_available = bool(loaded)
        for k, v in loaded.items():
            self._init_decoders[k] = v

        # which decoders are trainable (conv_onet.py:189-194): without
        # pretrained weights middle/fine must train or nothing works.
        self.trainable_decoders = []
        if not c.mapping_fix_color:
            self.trainable_decoders.append("color")
        if not c.mapping_fix_fine or not self.pretrained_available:
            self.trainable_decoders.extend(["middle", "fine"])
            if c.coarse:
                self.trainable_decoders.append("coarse")
        self.trainable_decoders = list(dict.fromkeys(self.trainable_decoders))
        self.geo_supervision = (
            c.fallback_geo_supervision == "on"
            or (c.fallback_geo_supervision == "auto" and not self.pretrained_available)
        )

    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        c = self.config
        ks = iter(jax.random.split(key, 8))
        params: Dict[str, Any] = {}
        stds = {"grid_middle": 0.01, "grid_fine": 0.0001, "grid_color": 0.01, "grid_coarse": 0.01}
        for name, shape in self.grid_shapes.items():
            params[name] = jax.random.normal(next(ks), (*shape, c.model_c_dim)) * stds[name]
        params["decoder"] = {k: self._init_decoders[k] for k in self.trainable_decoders}
        self.frozen = {k: v for k, v in self._init_decoders.items() if k not in self.trainable_decoders}
        return params

    # ------------------------------------------------------------------
    def _dec(self, params, name):
        return params["decoder"][name] if name in params["decoder"] else self.frozen[name]

    def query_raw(self, params, pts: jnp.ndarray, stage: str) -> jnp.ndarray:
        """[..., 3] world pts -> [..., 4] raw (rgb, occ) per stage
        (decoder_nice.py:386-414 NICE.forward + conv_onet.py:356-375
        out-of-bound handling)."""
        shape = pts.shape[:-1]
        p = pts.reshape(-1, 3)
        p_norm = normalize_3d_coordinate(p, self._bound)

        def feat(grid_name):
            return grid_sample_3d(params[grid_name], p_norm)

        raw = jnp.zeros((p.shape[0], 4), pts.dtype)
        if stage == "coarse":
            pc = normalize_3d_coordinate(p, self._bound_coarse)
            cfeat = grid_sample_3d(params["grid_coarse"], pc)
            occ = mlp_decoder_apply(self._dec(params, "coarse"), pc, cfeat, no_xyz=True)[..., 0]
            raw = raw.at[:, 3].set(occ)
        else:
            c_middle = feat("grid_middle")
            middle_occ = mlp_decoder_apply(self._dec(params, "middle"), p_norm, c_middle)[..., 0]
            if stage == "middle":
                raw = raw.at[:, 3].set(middle_occ)
            else:
                c_fine = feat("grid_fine")
                cf = jnp.concatenate([c_fine, jax.lax.stop_gradient(c_middle)], -1)
                fine_occ = mlp_decoder_apply(self._dec(params, "fine"), p_norm, cf)[..., 0]
                occ = fine_occ + middle_occ
                if stage == "color":
                    c_color = feat("grid_color")
                    col = mlp_decoder_apply(self._dec(params, "color"), p_norm, c_color)
                    raw = col
                raw = raw.at[:, 3].set(occ)
        # out-of-bound points get occ=100 (conv_onet.py:371)
        inb = jnp.all((p > self._bound[:, 0]) & (p < self._bound[:, 1]), -1)
        raw = raw.at[:, 3].set(jnp.where(inb, raw[:, 3], 100.0))
        return raw.reshape(*shape, 4)

    # ------------------------------------------------------------------
    def _z_vals(self, key, rays_o, rays_d, gt_depth, use_surface: bool):
        """Stratified + surface z sampling (conv_onet.py:377-487)."""
        c = self.config
        n = rays_o.shape[0]
        n_samples = c.rendering_n_samples
        t_vals = jnp.linspace(0.0, 1.0, n_samples)
        # far = exit of the bounding box along the ray (conv_onet.py:408-415)
        t = (self._bound[None, :, :] - rays_o[:, :, None]) / rays_d[:, :, None]  # [N,3,2]
        far_bb = jnp.min(jnp.max(t, axis=2), axis=1)[:, None] + 0.01
        if gt_depth is None or not use_surface:
            near = jnp.full((n, 1), 0.01)
            far = far_bb
            z_vals = near * (1.0 - t_vals)[None, :] + far * t_vals[None, :]
            return z_vals
        gt = gt_depth.reshape(-1, 1)
        near = gt * 0.01
        far = jnp.clip(far_bb, 0.0, jnp.maximum(jnp.max(gt * 1.2), 0.01))
        z_vals = near * (1.0 - t_vals)[None, :] + far * t_vals[None, :]
        n_surf = c.rendering_n_surface
        if n_surf > 0:
            ts = jnp.linspace(0.0, 1.0, n_surf)
            z_surf_pos = 0.95 * gt * (1.0 - ts)[None, :] + 1.05 * gt * ts[None, :]
            far_surface = jnp.maximum(jnp.max(gt), 0.01)
            z_surf_zero = 0.001 * (1.0 - ts)[None, :] + far_surface * ts[None, :]
            z_surf = jnp.where(gt > 0, z_surf_pos, jnp.broadcast_to(z_surf_zero, (n, n_surf)))
            z_vals = jnp.sort(jnp.concatenate([z_vals, z_surf], -1), -1)
        return z_vals

    def render_rays(self, params, key, rays_o, rays_d, target_d, stage: str = "color") -> Dict[str, jnp.ndarray]:
        use_surface = stage != "coarse" and target_d is not None
        z_vals = self._z_vals(key, rays_o, rays_d, target_d, use_surface)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        raw = self.query_raw(params, pts, stage)
        depth, depth_var, rgb, weights = rendering.raw2outputs_occupancy(
            raw, z_vals, rays_d, occupancy=self.config.occupancy
        )
        return {"rgb": rgb, "depth": depth, "uncertainty": depth_var, "z_vals": z_vals,
                "weights": weights, "occ_raw": raw[..., 3]}

    # ------------------------------------------------------------------
    def get_loss(
        self, params, key, rays_o, rays_d, target_s, target_d, ray_mask, is_mapping: bool, stage: str
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """L1-sum losses (conv_onet.py:145-185 get_loss_dict)."""
        c = self.config
        out = self.render_rays(params, key, rays_o, rays_d, target_d if stage != "coarse" else None, stage)
        td = target_d[:, 0]
        depth = out["depth"]
        rgb = out["rgb"]
        unc = jax.lax.stop_gradient(out["uncertainty"])
        rm = ray_mask if ray_mask is not None else jnp.ones_like(td)
        loss_dict: Dict[str, jnp.ndarray] = {}
        if not is_mapping:
            tmp = jnp.abs(td - depth) / jnp.sqrt(unc + 1e-10)
            if c.tracking_handle_dynamic:
                med = _masked_median(tmp, rm * (td > 0))
                dmask = (tmp < 10 * med) & (td > 0)
            else:
                dmask = td > 0
            dmask = dmask.astype(depth.dtype) * rm
            loss_dict["depth_loss"] = jnp.sum(jnp.abs(td - depth) / jnp.sqrt(unc + 1e-10) * dmask)
            if c.tracking_use_color_in_tracking:
                loss_dict["rgb_loss"] = c.tracking_w_color_loss * jnp.sum(jnp.abs(target_s - rgb) * dmask[:, None])
        else:
            dmask = (td > 0).astype(depth.dtype) * rm
            loss_dict["depth_loss"] = jnp.sum(jnp.abs(td - depth) * dmask)
            if stage == "color":
                loss_dict["rgb_loss"] = c.mapping_w_color_loss * jnp.sum(jnp.abs(target_s - rgb) * rm[:, None])
            if self.geo_supervision:
                # see ConvOnetConfig.fallback_geo_supervision: free-space /
                # occupied logits-BCE in a +-geo_trunc band around measured
                # depth, normalized per supervised sample and scaled to the
                # ray count so it is commensurate with the depth L1 sum.
                occ_raw = out["occ_raw"]
                z = out["z_vals"]
                # clip keeps inf out of the inf*0 -> NaN path below; at
                # |logit| 1e4 the BCE gradient is a constant +-1 anyway
                x = jnp.clip(10.0 * occ_raw, -1e4, 1e4)
                tdz = td[:, None]
                free = (z < tdz - c.geo_trunc) & (tdz > 0)
                band = jnp.abs(z - tdz) <= c.geo_trunc
                sup = ((free | (band & (tdz > 0))).astype(depth.dtype)
                       * dmask[:, None])
                target = (z > tdz).astype(depth.dtype)
                bce = (jnp.maximum(x, 0.0) - x * target
                       + jnp.log1p(jnp.exp(-jnp.abs(x))))
                mean_bce = jnp.sum(bce * sup) / jnp.maximum(jnp.sum(sup), 1.0)
                loss_dict["geo_loss"] = c.geo_w * mean_bce * jnp.sum(dmask)
        return sum(loss_dict.values()), loss_dict

    # ------------------------------------------------------------------
    def frustum_grid_masks(self, c2w: np.ndarray, depth_np: np.ndarray) -> Dict[str, np.ndarray]:
        """Per-grid frustum optimization masks [X,Y,Z,1]
        (reference: utils.py:298-375 get_mask_from_c2w)."""
        cam = self.camera
        masks = {}
        for name, shape in self.grid_shapes.items():
            if name == "grid_coarse":
                masks[name] = np.ones((*shape, 1), np.float32)
                continue
            xs = [np.linspace(self.bounding_box[i, 0], self.bounding_box[i, 1], shape[i]) for i in range(3)]
            gx, gy, gz = np.meshgrid(*xs, indexing="ij")
            pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
            w2c = np.linalg.inv(np.asarray(c2w, np.float64))
            pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
            pc[:, 0] *= -1  # reference flips x before K (utils.py:336)
            z = pc[:, 2:3] + 1e-5
            # uv = (K @ cam_cord) / z exactly as utils.py:337-340
            u = cam.fx * pc[:, 0:1] / z + cam.cx
            v = cam.fy * pc[:, 1:2] / z + cam.cy
            uu = np.clip(u[:, 0], 0, cam.width - 1)
            vv = np.clip(v[:, 0], 0, cam.height - 1)
            x0 = np.clip(uu.astype(np.int64), 0, cam.width - 1)
            y0 = np.clip(vv.astype(np.int64), 0, cam.height - 1)
            x1 = np.minimum(x0 + 1, cam.width - 1)
            y1 = np.minimum(y0 + 1, cam.height - 1)
            fx_ = uu - x0
            fy_ = vv - y0
            d = (
                depth_np[y0, x0] * (1 - fx_) * (1 - fy_)
                + depth_np[y0, x1] * fx_ * (1 - fy_)
                + depth_np[y1, x0] * (1 - fx_) * fy_
                + depth_np[y1, x1] * fx_ * fy_
            )
            d = np.where(d == 0, d.max() if d.max() > 0 else 1e3, d)
            mask = (u[:, 0] > 0) & (u[:, 0] < cam.width) & (v[:, 0] > 0) & (v[:, 0] < cam.height)
            depth_along = -z[:, 0]
            mask &= (depth_along >= 0) & (depth_along <= d + 0.5)
            # keep grid near camera center (utils.py:365-371)
            dist2 = np.sum((pts - np.asarray(c2w)[:3, 3]) ** 2, -1)
            mask |= dist2 < 0.25
            masks[name] = mask.reshape(*shape, 1).astype(np.float32)
        return masks

    def frustum_grid_masks_dev(self, c2w: jnp.ndarray, depth: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Device (jit-traceable) twin of :meth:`frustum_grid_masks` so the
        fused super-step can compute per-grid optimization masks in-program
        (reference: utils.py:298-375 get_mask_from_c2w)."""
        cam = self.camera
        masks: Dict[str, jnp.ndarray] = {}
        for name, shape in self.grid_shapes.items():
            if name == "grid_coarse":
                masks[name] = jnp.ones((*shape, 1), jnp.float32)
                continue
            xs = [jnp.linspace(self.bounding_box[i, 0], self.bounding_box[i, 1], shape[i]) for i in range(3)]
            gx, gy, gz = jnp.meshgrid(*xs, indexing="ij")
            pts = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
            from ..ops.lie import pose_inverse

            w2c = pose_inverse(c2w)  # rigid inverse: exact in f32
            pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
            pc = pc.at[:, 0].multiply(-1.0)  # reference flips x before K (utils.py:336)
            z = pc[:, 2:3] + 1e-5
            u = cam.fx * pc[:, 0:1] / z + cam.cx
            v = cam.fy * pc[:, 1:2] / z + cam.cy
            uu = jnp.clip(u[:, 0], 0, cam.width - 1)
            vv = jnp.clip(v[:, 0], 0, cam.height - 1)
            x0 = jnp.clip(uu.astype(jnp.int32), 0, cam.width - 1)
            y0 = jnp.clip(vv.astype(jnp.int32), 0, cam.height - 1)
            x1 = jnp.minimum(x0 + 1, cam.width - 1)
            y1 = jnp.minimum(y0 + 1, cam.height - 1)
            fx_ = uu - x0
            fy_ = vv - y0
            d = (
                depth[y0, x0] * (1 - fx_) * (1 - fy_)
                + depth[y0, x1] * fx_ * (1 - fy_)
                + depth[y1, x0] * (1 - fx_) * fy_
                + depth[y1, x1] * fx_ * fy_
            )
            dmax = jnp.maximum(jnp.max(depth), 0.0)
            d = jnp.where(d == 0, jnp.where(dmax > 0, dmax, 1e3), d)
            mask = (u[:, 0] > 0) & (u[:, 0] < cam.width) & (v[:, 0] > 0) & (v[:, 0] < cam.height)
            depth_along = -z[:, 0]
            mask = mask & (depth_along >= 0) & (depth_along <= d + 0.5)
            dist2 = jnp.sum((pts - c2w[:3, 3]) ** 2, -1)
            mask = mask | (dist2 < 0.25)
            masks[name] = mask.reshape(*shape, 1).astype(jnp.float32)
        return masks


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of x over mask=1 entries (jit-safe)."""
    big = jnp.where(mask > 0, x, jnp.inf)
    order = jnp.sort(big)
    count = jnp.sum(mask > 0).astype(jnp.int32)
    idx = jnp.maximum(count // 2, 0)
    med = order[jnp.minimum(idx, x.shape[0] - 1)]
    return jnp.where(count > 0, med, 0.0)
