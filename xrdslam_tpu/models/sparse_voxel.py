"""SparseVoxel (Vox-Fusion) scene model: voxel-hash SDF field.

TPU-native rebuild of the reference model (reference:
slam/models/sparse_voxel.py:38-357 + decoder_voxfusion.py:84-149 +
voxel_helpers_voxfusion.py). The CUDA/C++ machinery maps as:

  * ``svo.Octree`` (CPU C++) -> ops.voxel_hash.VoxelHashMap (host dict +
    device open-addressed hash mirror).
  * ``ray_intersect`` (CUDA SVO-AABB) -> two-stage device search: coarse
    ray marching at voxel_size/2 with hash membership lookups, consecutive
    dedup, then exact slab tests on the <= max_voxel_hit selected voxels.
  * ``ray_sample`` (CUDA inverse-CDF) -> a fixed number of stratified
    samples per hit segment (static shapes; per-sample dt carried for
    correct weighting).
  * per-vertex embeddings (F.embedding gathers + trilinear,
    voxel_helpers:118-153) -> ops.pallas_scatter.table_lookup (XLA gather
    forward, Pallas matmul-scatter gradient).

Rendering keeps the reference semantics: sigmoid-product SDF weights with
first-surface masking and a per-ray hit mask; rays that miss every voxel
render to 0 and are excluded from the loss (sparse_voxel.py:102-144).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import losses as losses_ops
from ..ops.pallas_scatter import table_lookup
from ..ops.voxel_hash import CORNERS, lookup_voxels
from .base import Model, ModelConfig


@dataclass
class SparseVoxelConfig(ModelConfig):
    """reference: slam/models/sparse_voxel.py:38-74."""

    _target: Type = field(default_factory=lambda: SparseVoxel)
    voxels_each_dim: int = 256
    voxel_size: float = 0.2
    num_embeddings: int = 20000
    embed_dim: int = 16
    max_voxels: int = 16384
    max_distance: float = 10.0
    max_depth: float = 10.0
    # training weights
    training_trunc: float = 0.05
    trainging_rgb_weight: float = 0.5
    trainging_depth_weight: float = 1.0
    trainging_sdf_weight: float = 5000.0
    trainging_fs_weight: float = 10.0
    # decoder
    depth: int = 2
    width: int = 128
    sdf_dim: int = 128
    # sampling
    step_size: float = 0.1  # fraction of voxel_size (replica: 0.1)
    max_voxel_hit: int = 20
    samples_per_voxel: int = 10
    coarse_steps: int = 96  # membership probes along each ray
    data_sc_factor: float = 1.0
    fast_scatter: bool = True


class SparseVoxel(Model):
    config: SparseVoxelConfig

    def __init__(self, config: SparseVoxelConfig, camera, bounding_box=None, **kwargs) -> None:
        super().__init__(config, camera, np.zeros((3, 2), np.float32) if bounding_box is None else bounding_box, **kwargs)
        from ..ops.hashgrid_fast import on_tpu

        self._use_opt = config.fast_scatter and on_tpu()
        self.n_samples = config.max_voxel_hit * config.samples_per_voxel

    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        c = self.config
        k1, *ks = jax.random.split(key, 8)
        emb = jax.random.normal(k1, (c.num_embeddings, c.embed_dim)) * 0.01
        width, sdf_dim, in_dim = c.width, c.sdf_dim, c.embed_dim

        def linear(k, i, o):
            b = 1.0 / np.sqrt(i)
            kw, kb = jax.random.split(k)
            return {
                "w": jax.random.uniform(kw, (i, o), minval=-b, maxval=b),
                "b": jax.random.uniform(kb, (o,), minval=-b, maxval=b),
            }

        decoder = {
            "pts": [linear(ks[0], in_dim, width)] + [linear(ks[1 + i], width, width) for i in range(c.depth - 1)],
            "sdf_out": linear(ks[3], width, 1 + sdf_dim),
            "color0": linear(ks[4], sdf_dim + in_dim, width),
            "color1": linear(ks[5], width, 3),
        }
        return {"embeddings": {"table": emb}, "decoder": decoder}

    # ------------------------------------------------------------------
    def decode(self, dparams, emb: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """emb [N, 16] -> (rgb [N,3], sdf [N]) (decoder_voxfusion.py:121-149)."""
        h = emb
        for layer in dparams["pts"]:
            h = jax.nn.relu(h @ layer["w"] + layer["b"])
        so = h @ dparams["sdf_out"]["w"] + dparams["sdf_out"]["b"]
        sdf, feat = so[:, 0], so[:, 1:]
        hc = jnp.concatenate([feat, emb], -1)
        hc = jax.nn.relu(hc @ dparams["color0"]["w"] + dparams["color0"]["b"])
        rgb = jax.nn.sigmoid(hc @ dparams["color1"]["w"] + dparams["color1"]["b"])
        return rgb, sdf

    def interp_embeddings(self, params, maps, vox_idx: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
        """Trilinear interpolation of the 8 vertex embeddings
        (voxel_helpers_voxfusion.py:146-153)."""
        c = self.config
        vert_idx = jnp.take(maps["vox_vertex_idx"], vox_idx, axis=0)  # [N, 8]
        feats = table_lookup(params["embeddings"]["table"], vert_idx, self._use_opt)  # [N, 8, 16]
        coords = jnp.take(maps["vox_coords"], vox_idx, axis=0).astype(jnp.float32)  # [N, 3] int corner
        p = pts / c.voxel_size - coords  # [0,1]^3 position inside the voxel
        p = jnp.clip(p, 0.0, 1.0)
        q = jnp.asarray(CORNERS, jnp.float32)  # [8, 3]
        w = jnp.prod(p[:, None, :] * q[None] + (1.0 - p[:, None, :]) * (1.0 - q[None]), -1)  # [N, 8]
        return jnp.sum(feats * w[..., None], axis=1)

    # ------------------------------------------------------------------
    def intersect_and_sample(self, maps, rays_o, rays_d, key):
        """Two-stage voxel intersection + stratified per-segment sampling.

        Returns (z_vals [N,S], dt [N,S], vox_idx [N,S], sample_mask [N,S],
        ray_mask [N]).
        """
        c = self.config
        n = rays_o.shape[0]
        # 1. coarse membership probes along each ray
        t_coarse = (jnp.arange(c.coarse_steps, dtype=jnp.float32) + 0.5) * (c.voxel_size * 0.5)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * t_coarse[None, :, None]
        cc = jnp.floor(pts / c.voxel_size).astype(jnp.int32)
        vid = lookup_voxels(maps["hash_keys"], maps["hash_vals"], cc)  # [N, C]
        # 2. consecutive dedup, keep first occurrence order
        prev = jnp.concatenate([jnp.full((n, 1), -2, vid.dtype), vid[:, :-1]], 1)
        fresh = (vid >= 0) & (vid != prev)
        order = jnp.where(fresh, jnp.arange(c.coarse_steps)[None, :], c.coarse_steps + 1)
        sel = jnp.argsort(order, axis=1)[:, : c.max_voxel_hit]  # first K fresh
        hit_valid = jnp.take_along_axis(fresh, sel, 1)
        hit_vox = jnp.where(hit_valid, jnp.take_along_axis(vid, sel, 1), 0)  # [N, K]
        # 3. exact slab test on selected voxels
        centers = jnp.take(maps["vox_centers"], hit_vox, axis=0)  # [N, K, 3]
        half = 0.5 * c.voxel_size
        inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9, 1e-9, rays_d)
        t1 = (centers - half - rays_o[:, None, :]) * inv_d[:, None, :]
        t2 = (centers + half - rays_o[:, None, :]) * inv_d[:, None, :]
        t_near = jnp.max(jnp.minimum(t1, t2), -1)
        t_far = jnp.min(jnp.maximum(t1, t2), -1)
        seg_valid = hit_valid & (t_far > jnp.maximum(t_near, 0.0))
        t_near = jnp.maximum(t_near, 0.0)
        # 4. stratified samples per segment
        spv = c.samples_per_voxel
        frac = (jnp.arange(spv, dtype=jnp.float32) + 0.5) / spv
        seg_len = jnp.maximum(t_far - t_near, 0.0)
        z = t_near[..., None] + seg_len[..., None] * frac[None, None, :]  # [N, K, spv]
        dt = jnp.broadcast_to((seg_len / spv)[..., None], z.shape)
        mask = jnp.broadcast_to(seg_valid[..., None], z.shape)
        z = z.reshape(n, -1)
        dt = dt.reshape(n, -1)
        mask = mask.reshape(n, -1)
        vox = jnp.broadcast_to(hit_vox[..., None], (n, c.max_voxel_hit, spv)).reshape(n, -1)
        ray_mask = seg_valid.any(-1)
        # hit_vox (one id per SEGMENT) rides along so render_rays can gather
        # corner embeddings once per segment instead of once per sample
        return (z, dt, jnp.where(mask, vox, 0), mask.astype(jnp.float32),
                ray_mask, jnp.where(seg_valid, hit_vox, 0))

    # ------------------------------------------------------------------
    def render_rays(self, params, maps, key, rays_o, rays_d, target_d=None) -> Dict[str, jnp.ndarray]:
        c = self.config
        (z, dt, vox, smask, ray_mask,
         seg_vox) = self.intersect_and_sample(maps, rays_o, rays_d, key)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        n, s = z.shape
        # Segment-factored trilinear interpolation: the ``spv`` stratified
        # samples of a segment live in ONE voxel, so gather that voxel's 8
        # corner embeddings once ([N,K,8,F] rows — spv x fewer gather rows
        # and spv x fewer scatter-add rows in the VJP than the per-sample
        # path, which dominated the Vox-Fusion mapping iteration at
        # protocol scale: 6k rays x 200 samples x 8 verts = 10M table
        # updates/iter), then blend per sample on the MXU via einsum.
        # Identical math to interp_embeddings (kept for point queries).
        K, spv = c.max_voxel_hit, c.samples_per_voxel
        vert_idx = jnp.take(maps["vox_vertex_idx"], seg_vox, axis=0)  # [N,K,8]
        feats = table_lookup(params["embeddings"]["table"],
                             vert_idx.reshape(-1), self._use_opt)
        feats = feats.reshape(n, K, 8, -1)
        coords = jnp.take(maps["vox_coords"], seg_vox, axis=0).astype(jnp.float32)
        p = pts.reshape(n, K, spv, 3) / c.voxel_size - coords[:, :, None, :]
        p = jnp.clip(p, 0.0, 1.0)
        q = jnp.asarray(CORNERS, jnp.float32)  # [8, 3]
        w = jnp.prod(p[:, :, :, None, :] * q[None, None, None]
                     + (1.0 - p[:, :, :, None, :]) * (1.0 - q[None, None, None]),
                     -1)  # [N,K,spv,8]
        emb = jnp.einsum("nksc,nkcf->nksf", w, feats).reshape(n * s, -1)
        rgb, sdf = self.decode(params["decoder"], emb)
        rgb = rgb.reshape(n, s, 3)
        sdf = sdf.reshape(n, s)
        weights = self.sdf2weights(sdf, z, smask)
        rgb_map = jnp.sum(weights[..., None] * rgb, -2)
        depth_map = jnp.sum(weights * z, -1)
        return {
            "rgb": rgb_map,
            "depth": depth_map,
            "sdf": sdf,
            "z_vals": z,
            "ray_mask": ray_mask,
            "sample_mask": smask,
            "weights": weights,
        }

    def sdf2weights(self, sdf, z_vals, valid_mask):
        """reference: sparse_voxel.py:279-304 (with valid-sample masking)."""
        c = self.config
        w = jax.nn.sigmoid(sdf / c.training_trunc) * jax.nn.sigmoid(-sdf / c.training_trunc)
        signs = sdf[:, 1:] * sdf[:, :-1] * valid_mask[:, 1:] * valid_mask[:, :-1]
        mask_cross = (signs < 0.0).astype(z_vals.dtype)
        inds = jnp.argmax(mask_cross, axis=1)
        z_min = jnp.take_along_axis(z_vals, inds[:, None], axis=1)
        mask = (z_vals < z_min + c.data_sc_factor * c.training_trunc).astype(z_vals.dtype)
        w = w * mask * valid_mask
        return w / (jnp.sum(w, -1, keepdims=True) + 1e-8)

    # ------------------------------------------------------------------
    def get_loss(self, params, maps, key, rays_o, rays_d, target_s, target_d, extra_ray_mask=None):
        """reference: sparse_voxel.py:102-144 (l1 rgb/depth + l2 fs/sdf)."""
        c = self.config
        out = self.render_rays(params, maps, key, rays_o, rays_d, target_d)
        rm = out["ray_mask"].astype(jnp.float32)
        if extra_ray_mask is not None:
            rm = rm * extra_ray_mask
        td = target_d[:, 0]
        vdm = ((td > 0.01) & (td < c.max_depth)).astype(jnp.float32) * rm
        n_valid = jnp.maximum(jnp.sum(rm), 1.0)
        rgb_loss = jnp.sum(jnp.abs(out["rgb"] - target_s) * (vdm)[:, None]) / (n_valid * 3.0)
        depth_loss = jnp.sum(jnp.abs(out["depth"] - td) * vdm) / jnp.maximum(jnp.sum(vdm), 1.0)
        fs_l, sdf_l = losses_ops.sdf_losses(
            out["z_vals"], target_d, out["sdf"], c.training_trunc * c.data_sc_factor,
            ray_mask=rm, sample_mask=out["sample_mask"],
        )
        loss = (
            rgb_loss * c.trainging_rgb_weight
            + depth_loss * c.trainging_depth_weight
            + sdf_l * c.trainging_sdf_weight
            + fs_l * c.trainging_fs_weight
        )
        return loss, {"rgb": rgb_loss, "depth": depth_loss, "sdf": sdf_l, "fs": fs_l}
