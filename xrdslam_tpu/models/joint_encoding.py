"""JointEncoding (Co-SLAM) scene model: hash grid + OneBlob → SDF/color MLPs.

TPU-native rebuild of the reference model (reference:
slam/models/joint_encoding.py:17-531 + decoder_coslam.py:139-163
``ColorSDFNet_v2``): a multiresolution hash grid and OneBlob coordinate
encoding feed a 2-layer SDF net (1 sdf + 15 geo features) and a 2-layer
color net; rays are rendered with depth-guided z sampling and the
truncated-SDF weight scheme. Everything is a pure function of
``(params, key, inputs)`` so the whole render+loss+grad pipeline jits and
scans on device — points are processed as flat ``[N*S, F]`` batches so the
MLP matmuls land on the MXU.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import encodings, losses, mlp, rendering
from ..ops.sampling import coslam_z_vals
from .base import Model, ModelConfig


@dataclass
class JointEncodingConfig(ModelConfig):
    """Mirrors JointEncodingConfig (reference: joint_encoding.py:17-67)."""

    _target: Type = field(default_factory=lambda: JointEncoding)
    # grid
    voxel_sdf: float = 0.02
    voxel_color: float = 0.08
    n_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    pos_nbins: int = 16
    hashsize: int = 16
    oneGrid: bool = True
    fast_encoder: bool = True
    # hash layout: packed patch rows (ops/hashgrid_packed — one gathered
    # row per level per sample, ~8x fewer gather rows; dense levels exact,
    # hash levels cell-keyed) vs the exact per-vertex reference layout
    # (ops/hashgrid_fast / ops/encodings).
    hash_packed: bool = True
    # scene encoding: 'hash' (reference tcnn HashGrid parity) or 'triplane'
    # (TPU-native fast path, ops/triplane.py — ~2x mapping, ~2x tracking)
    encoding: str = "hash"
    triplane_resolutions: Tuple[int, ...] = (128, 512)
    triplane_features: Tuple[int, ...] = (8, 8)
    # decoder
    geo_feat_dim: int = 15
    hidden_dim: int = 32
    num_layers: int = 2
    num_layers_color: int = 2
    hidden_dim_color: int = 32
    # train
    trainging_rgb_weight: float = 5.0
    trainging_depth_weight: float = 0.1
    trainging_sdf_weight: float = 1000.0
    trainging_fs_weight: float = 10.0
    trainging_smooth_weight: float = 1e-6
    trainging_smooth_pts: int = 32
    trainging_smooth_vox: float = 0.1
    trainging_smooth_margin: float = 0.05
    training_n_samples: int = 256
    training_n_sample_d: int = 32
    training_range_d: float = 0.1
    training_n_range_d: int = 11
    training_n_importance: int = 0
    training_perturb: int = 1
    training_white_bkgd: bool = False
    training_trunc: float = 0.1
    training_rgb_missing: float = 0.05
    # data
    data_sc_factor: float = 1.0
    # cam
    cam_near: float = 0.0
    cam_far: float = 5.0
    cam_depth_trunc: float = 100.0
    # mesh
    mesh_render_color: bool = True


class JointEncoding(Model):
    config: JointEncodingConfig

    def __init__(self, config: JointEncodingConfig, camera, bounding_box, **kwargs) -> None:
        super().__init__(config, camera, bounding_box, **kwargs)
        c = config
        dim_max = float((self.bounding_box[:, 1] - self.bounding_box[:, 0]).max())
        self.resolution_sdf = int(c.voxel_sdf) if c.voxel_sdf > 10 else int(dim_max / c.voxel_sdf)
        self.resolution_color = int(c.voxel_color) if c.voxel_color > 10 else int(dim_max / c.voxel_color)
        self.spec = encodings.hashgrid_spec(
            n_levels=c.n_levels,
            n_features=c.level_dim,
            log2_table_size=c.hashsize,
            base_resolution=c.base_resolution,
            finest_resolution=self.resolution_sdf,
        )
        if not c.oneGrid:
            self.spec_color = encodings.hashgrid_spec(
                n_levels=c.n_levels,
                n_features=c.level_dim,
                log2_table_size=c.hashsize,
                base_resolution=c.base_resolution,
                finest_resolution=self.resolution_color,
            )
        if c.encoding == "triplane":
            from ..ops.triplane import triplane_spec

            self.tp_spec = triplane_spec(c.triplane_resolutions, c.triplane_features)
            self.input_ch = self.tp_spec.out_dim
        else:
            self.tp_spec = None
            self.input_ch = self.spec.out_dim  # 32
        self.input_ch_pos = 3 * c.pos_nbins  # 48
        self._bound = jnp.asarray(self.bounding_box)
        self._packed_hash = c.encoding == "hash" and c.hash_packed
        # optimized encode (feature-major fwd + Pallas matmul-scatter bwd)
        # only on TPU; CPU tests take the reference path.
        from ..ops import hashgrid_fast

        self._use_fast = (
            c.fast_encoder and hashgrid_fast.on_tpu() and hashgrid_fast.supports(self.spec)
        )

    def _encode(self, table, x, spec, packed=None):
        if self.tp_spec is not None:
            from ..ops.triplane import triplane_encode

            flat = x.reshape(-1, 3)
            out = triplane_encode(table, flat, self.tp_spec, packed=packed)
            return out.reshape(x.shape[:-1] + (self.tp_spec.out_dim,))
        if self._packed_hash:
            from ..ops.hashgrid_packed import packed_hash_encode

            return packed_hash_encode(table, x, spec, packed=packed)
        from ..ops import hashgrid_fast

        return hashgrid_fast.encode(table, x, spec, use_opt=self._use_fast)

    def pack_tables(self, params):
        """Precompute the gather-layout copy of the scene encoding for a
        phase where tables are constant (tracking). None for the exact
        per-vertex hash mode (its table is gathered directly)."""
        if self.tp_spec is not None:
            from ..ops.triplane import triplane_pack

            return triplane_pack(params["embed_fn"]["table"], self.tp_spec)
        if self._packed_hash:
            from ..ops.hashgrid_packed import pack_gather_tables

            return pack_gather_tables(params["embed_fn"]["table"], self.spec)
        return None

    # ------------------------------------------------------------------
    # params
    # ------------------------------------------------------------------
    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        c = self.config
        k1, k2, k3, k4 = jax.random.split(key, 4)
        sdf_in = self.input_ch + self.input_ch_pos
        if not c.oneGrid:
            sdf_in = sdf_in  # color grid feeds only the color net (ColorSDFNet)
        sdf_dims = [sdf_in] + [c.hidden_dim] * (c.num_layers - 1) + [1 + c.geo_feat_dim]
        color_in = (self.input_ch_pos if c.oneGrid else self.input_ch_pos + self.spec_color.out_dim) + c.geo_feat_dim
        color_dims = [color_in] + [c.hidden_dim_color] * (c.num_layers_color - 1) + [3]
        if self.tp_spec is not None:
            from ..ops.triplane import triplane_init

            table = triplane_init(k1, self.tp_spec)
        elif self._packed_hash:
            from ..ops.hashgrid_packed import packed_init

            table = packed_init(k1, self.spec)
        else:
            table = encodings.hashgrid_init(k1, self.spec)
        params: Dict[str, Any] = {
            "embed_fn": {"table": table},
            "decoder": {"sdf": mlp.mlp_init(k2, sdf_dims), "color": mlp.mlp_init(k3, color_dims)},
        }
        if not c.oneGrid:
            if self._packed_hash:
                from ..ops.hashgrid_packed import packed_init

                params["embed_fn_color"] = {"table": packed_init(k4, self.spec_color)}
            else:
                params["embed_fn_color"] = {"table": encodings.hashgrid_init(k4, self.spec_color)}
        return params

    # ------------------------------------------------------------------
    # queries (pts are world coordinates; normalized internally like the
    # reference's tcnn_encoding path, joint_encoding.py:496-501)
    # ------------------------------------------------------------------
    def _normalize(self, pts: jnp.ndarray) -> jnp.ndarray:
        b = self._bound
        return (pts - b[:, 0]) / (b[:, 1] - b[:, 0])

    def query_raw(self, params, pts: jnp.ndarray, packed=None) -> jnp.ndarray:
        """[..., 3] world pts -> [..., 4] (rgb logits, sdf)."""
        x = self._normalize(pts)
        emb = self._encode(params["embed_fn"]["table"], x, self.spec, packed=packed)
        pos = encodings.oneblob_encode(x, self.config.pos_nbins)
        h = mlp.mlp_apply(params["decoder"]["sdf"], jnp.concatenate([emb, pos], -1))
        sdf, geo = h[..., :1], h[..., 1:]
        if self.config.oneGrid:
            color_in = jnp.concatenate([pos, geo], -1)
        else:
            embc = self._encode(params["embed_fn_color"]["table"], x, self.spec_color)
            color_in = jnp.concatenate([pos, embc, geo], -1)
        rgb = mlp.mlp_apply(params["decoder"]["color"], color_in)
        return jnp.concatenate([rgb, sdf], -1)

    def query_sdf(self, params, pts: jnp.ndarray) -> jnp.ndarray:
        """[..., 3] -> [...] sdf (for the mesher)."""
        x = self._normalize(pts)
        emb = self._encode(params["embed_fn"]["table"], x, self.spec)
        pos = encodings.oneblob_encode(x, self.config.pos_nbins)
        h = mlp.mlp_apply(params["decoder"]["sdf"], jnp.concatenate([emb, pos], -1))
        return h[..., 0]

    def query_color(self, params, pts: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.sigmoid(self.query_raw(params, pts)[..., :3])

    def query_sdf_embed(self, params, pts: jnp.ndarray) -> jnp.ndarray:
        """Hash-grid embedding only (smoothness loss, joint_encoding.py:190)."""
        x = self._normalize(pts)
        return self._encode(params["embed_fn"]["table"], x, self.spec)

    # ------------------------------------------------------------------
    # rendering
    # ------------------------------------------------------------------
    def render_rays(self, params, key: jax.Array, rays_o, rays_d, target_d, packed=None) -> Dict[str, jnp.ndarray]:
        """reference: joint_encoding.py:250-344 (no importance branch; the
        Co-SLAM config uses training_n_importance=0)."""
        c = self.config
        n_rays = rays_o.shape[0]
        z_vals = coslam_z_vals(
            key, target_d, n_rays, c.cam_near, c.cam_far, c.training_n_sample_d,
            c.training_range_d, c.training_n_range_d, bool(c.training_perturb),
        )
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        raw = self.query_raw(params, pts, packed=packed)
        rgb_map, disp, acc, weights, depth_map, depth_var = rendering.raw2outputs_sdf(
            raw, z_vals, c.training_trunc, c.data_sc_factor, c.training_white_bkgd
        )
        return {
            "rgb": rgb_map, "depth": depth_map, "disp_map": disp, "acc_map": acc,
            "depth_var": depth_var, "z_vals": z_vals, "raw": raw,
        }

    def render_rays_no_depth(self, params, rays_o, rays_d) -> Dict[str, jnp.ndarray]:
        """Uniform z sampling when no depth guidance is available."""
        c = self.config
        n_rays = rays_o.shape[0]
        z_vals = jnp.broadcast_to(
            jnp.linspace(c.cam_near, c.cam_far, c.training_n_samples, dtype=jnp.float32), (n_rays, c.training_n_samples)
        )
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        raw = self.query_raw(params, pts)
        rgb_map, disp, acc, weights, depth_map, depth_var = rendering.raw2outputs_sdf(
            raw, z_vals, c.training_trunc, c.data_sc_factor, c.training_white_bkgd
        )
        return {"rgb": rgb_map, "depth": depth_map, "acc_map": acc, "depth_var": depth_var}

    # ------------------------------------------------------------------
    # loss
    # ------------------------------------------------------------------
    def get_loss(
        self,
        params,
        key: jax.Array,
        rays_o,
        rays_d,
        target_s,
        target_d,
        ray_mask,
        is_mapping: bool,
        first: bool,
        packed=None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Weighted sum of rgb/depth/sdf/fs (+ smoothness) losses
        (reference: joint_encoding.py:94-147)."""
        c = self.config
        k_render, k_smooth = jax.random.split(key)
        out = self.render_rays(params, k_render, rays_o, rays_d, target_d, packed=packed)
        rgb_l, depth_l = losses.rgb_depth_losses(
            out["rgb"], out["depth"], target_s, target_d,
            depth_trunc=c.cam_depth_trunc, rgb_missing=c.training_rgb_missing, ray_mask=ray_mask,
        )
        fs_l, sdf_l = losses.sdf_losses(
            out["z_vals"], target_d, out["raw"][..., 3], c.training_trunc * c.data_sc_factor, ray_mask=ray_mask
        )
        loss_dict = {
            "rgb_loss": rgb_l * c.trainging_rgb_weight,
            "depth_loss": depth_l * c.trainging_depth_weight,
            "sdf_loss": sdf_l * c.trainging_sdf_weight,
            "fs_loss": fs_l * c.trainging_fs_weight,
        }
        if is_mapping and not first:
            loss_dict["smooth_loss"] = self.smoothness(params, k_smooth) * c.trainging_smooth_weight
        total = sum(loss_dict.values())
        return total, loss_dict

    def smoothness(self, params, key: jax.Array) -> jnp.ndarray:
        """TV regularizer on hash features over a random sub-grid
        (reference: joint_encoding.py:165-197).

        Triplane mode evaluates TV directly on the feature planes instead
        of sampling a 31^3 point grid — same regularization intent at
        ~1/100 the cost (the grid sample exists only because hash tables
        aren't spatially indexable; planes are)."""
        c = self.config
        if self.tp_spec is not None:
            tv = 0.0
            for s in range(len(self.tp_spec.resolutions)):
                P = params["embed_fn"]["table"][f"s{s}"]
                n = P.shape[1]
                tv = tv + (jnp.sum(jnp.square(P[:, 1:] - P[:, :-1]))
                           + jnp.sum(jnp.square(P[:, :, 1:] - P[:, :, :-1]))) / n
            return tv
        g = c.trainging_smooth_pts - 1
        vox = c.trainging_smooth_vox
        b = self._bound
        volume = b[:, 1] - b[:, 0]
        grid_size = g * vox
        offset_max = volume - grid_size - 2 * c.trainging_smooth_margin
        k1, k2 = jax.random.split(key)
        offset = jax.random.uniform(k1, (3,)) * offset_max + c.trainging_smooth_margin
        ax = jnp.arange(g, dtype=jnp.float32)
        coords = jnp.stack(jnp.meshgrid(ax, ax, ax, indexing="ij"), -1)  # [g,g,g,3]
        jitter = jax.random.uniform(k2, (1, 1, 1, 3))
        pts = (coords + jitter) * vox + b[:, 0] + offset
        emb = self.query_sdf_embed(params, pts)
        return losses.smoothness_tv(emb, c.trainging_smooth_pts)
