"""GaussianSplatting (SplaTAM) scene model on the Pallas tile rasterizer.

TPU-native rebuild of the reference model (reference:
slam/models/gaussian_splatting.py:16-228 +
slam/model_components/gaussian_cloud_splatam.py). Structural mapping:

  * The gaussian cloud is a fixed-capacity table [MAX_G, ...] with a host
    count and an alive mask — growth (add_new_gaussians) appends rows at
    call boundaries; pruning flips the alive mask instead of compacting
    (the reference performs optimizer-state surgery per prune,
    gaussian_cloud_splatam.py:80-118; with per-call Adam state both are
    equivalent, and pruning here runs at mapping-call granularity instead
    of every prune_every iterations inside the loop).
  * Both reference rasterizer passes (RGB, then depth+sil+depth^2,
    gaussian_cloud_splatam.py:58-70) collapse into ONE 8-channel pass of
    ops.gaussian_raster.rasterize.
  * Losses follow gaussian_splatting.py:143-220: sil-masked L1 sums for
    tracking, 0.8*L1 + 0.2*(1-SSIM) + mean depth L1 for mapping.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie
from ..ops.gaussian_raster import N_CH, TileBinning, bin_gaussians, rasterize
from .base import Model, ModelConfig


@dataclass
class GaussianSplattingConfig(ModelConfig):
    """reference: slam/models/gaussian_splatting.py:16-66."""

    _target: Type = field(default_factory=lambda: GaussianSplatting)
    max_gaussians: int = 131072
    k_per_tile: int = 256
    # tracking
    tracking_use_sil_for_loss: bool = True
    tracking_sil_thres: float = 0.99
    tracking_rgb_weight: float = 0.5
    tracking_depth_weight: float = 1.0
    # mapping
    mapping_sil_thres: float = 0.5
    mapping_rgb_weight: float = 0.5
    mapping_depth_weight: float = 1.0
    # pruning (reference prune_dict)
    prune_opacity_threshold: float = 0.005
    prune_big_fraction: float = 0.1  # of scene_radius
    mean_sq_dist_method: str = "projective"


def ssim(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """11x11 gaussian-window SSIM over [H,W,3] (slam_external_splatam.py:59-96)."""
    x = np.arange(11) - 5
    g = np.exp(-(x**2) / (2 * 1.5**2))
    k = (np.outer(g, g) / g.sum() ** 2).astype(np.float32)
    kern = jnp.asarray(k)[None, None]  # [1,1,11,11]

    def filt(img):
        img = img.transpose(2, 0, 1)[:, None]  # [3,1,H,W]
        out = jax.lax.conv_general_dilated(img, kern, (1, 1), "SAME")
        return out[:, 0].transpose(1, 2, 0)

    c1, c2 = 0.01**2, 0.03**2
    mu_a, mu_b = filt(a), filt(b)
    var_a = filt(a * a) - mu_a**2
    var_b = filt(b * b) - mu_b**2
    cov = filt(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / ((mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2))
    return jnp.mean(s)


class GaussianSplatting(Model):
    config: GaussianSplattingConfig

    def __init__(self, config: GaussianSplattingConfig, camera, bounding_box=None, **kwargs) -> None:
        super().__init__(config, camera, np.zeros((3, 2), np.float32) if bounding_box is None else bounding_box, **kwargs)
        self.n_gauss = 0
        self.scene_radius = 1.0
        self._f = 0.5 * (camera.fx + camera.fy)

    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        g = self.config.max_gaussians
        return {
            "means3D": jnp.zeros((g, 3), jnp.float32),
            "rgb_colors": jnp.zeros((g, 3), jnp.float32),
            "unnorm_rotations": jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (g, 1)),
            "logit_opacities": jnp.zeros((g, 1), jnp.float32),
            "log_scales": jnp.full((g, 1), -10.0, jnp.float32),
        }

    # ------------------------------------------------------------------
    def project(self, params, w2c: jnp.ndarray):
        """Means -> (u, v, depth, sigma). OpenGL camera (-z forward)."""
        cam = self.camera
        pts = params["means3D"] @ w2c[:3, :3].T + w2c[:3, 3]
        depth = -pts[:, 2]
        inv = 1.0 / jnp.maximum(depth, 1e-6)
        u = cam.cx + cam.fx * pts[:, 0] * inv
        v = cam.cy - cam.fy * pts[:, 1] * inv
        sigma = jnp.exp(params["log_scales"][:, 0]) * self._f * inv
        return u, v, depth, sigma

    def render(self, params, alive: jnp.ndarray, w2c: jnp.ndarray, binning: Tuple, ntx: int, nty: int) -> Dict[str, jnp.ndarray]:
        """Single-pass 8-channel rasterization -> rgb/depth/sil/depth_sq."""
        cam = self.camera
        u, v, depth, sigma = self.project(params, w2c)
        opacity = jax.nn.sigmoid(params["logit_opacities"][:, 0]) * alive
        ch = jnp.concatenate(
            [
                params["rgb_colors"],
                depth[:, None],
                jnp.ones_like(depth[:, None]),
                (depth * depth)[:, None],
                jnp.zeros((depth.shape[0], N_CH - 6), depth.dtype),
            ],
            -1,
        )
        img = rasterize(u, v, sigma, opacity, ch, binning[0], binning[1], ntx, nty)
        img = img[: cam.height, : cam.width]
        return {
            "rgb": img[..., :3],
            "depth": img[..., 3],
            "sil": img[..., 4],
            "depth_sq": img[..., 5],
        }

    # ------------------------------------------------------------------
    def get_loss(self, out: Dict[str, jnp.ndarray], target_rgb, target_d, is_mapping: bool):
        """reference: gaussian_splatting.py:143-220."""
        c = self.config
        depth = out["depth"]
        sil = out["sil"]
        mask = (target_d > 0).astype(jnp.float32)
        if not is_mapping and c.tracking_use_sil_for_loss:
            mask = mask * (sil > c.tracking_sil_thres).astype(jnp.float32)
        mask = jax.lax.stop_gradient(mask)
        if not is_mapping:
            depth_loss = jnp.sum(jnp.abs(target_d - depth) * mask)
            rgb_loss = jnp.sum(jnp.abs(target_rgb - out["rgb"]) * mask[..., None])
            return c.tracking_depth_weight * depth_loss + c.tracking_rgb_weight * rgb_loss
        depth_loss = jnp.sum(jnp.abs(target_d - depth) * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        rgb_l1 = jnp.mean(jnp.abs(target_rgb - out["rgb"]))
        rgb_loss = 0.8 * rgb_l1 + 0.2 * (1.0 - ssim(out["rgb"], target_rgb))
        return c.mapping_depth_weight * depth_loss + c.mapping_rgb_weight * rgb_loss

    # ------------------------------------------------------------------
    # host-side growth / pruning (call boundaries)
    # ------------------------------------------------------------------
    def pointcloud_from_depth(self, rgb: np.ndarray, depth: np.ndarray, c2w: np.ndarray, mask: np.ndarray):
        """Back-project masked pixels (gaussian_cloud_splatam.py:347-399)."""
        cam = self.camera
        xs, ys = np.meshgrid(np.arange(cam.width), np.arange(cam.height))
        dirs = np.stack([(xs - cam.cx) / cam.fx, -(ys - cam.cy) / cam.fy, -np.ones_like(xs, np.float64)], -1)
        pts = c2w[:3, 3] + (dirs @ c2w[:3, :3].T) * depth[..., None]
        m = mask.reshape(-1)
        pts = pts.reshape(-1, 3)[m]
        cols = rgb.reshape(-1, 3)[m]
        scale = (depth.reshape(-1)[m] / self._f).astype(np.float32)  # projective mean_sq_dist
        return pts.astype(np.float32), cols.astype(np.float32), scale

    def add_gaussians(self, params, pts: np.ndarray, cols: np.ndarray, scales: np.ndarray):
        """Append rows at [n_gauss: n_gauss+n) (initialize_params semantics:
        opacity logit 0 (=0.5), isotropic log scale)."""
        n = len(pts)
        cap = self.config.max_gaussians
        if self.n_gauss + n > cap:
            n = cap - self.n_gauss
            if n <= 0:
                return params
            pts, cols, scales = pts[:n], cols[:n], scales[:n]
        s = self.n_gauss
        params = dict(params)
        params["means3D"] = jax.lax.dynamic_update_slice(params["means3D"], jnp.asarray(pts), (s, 0))
        params["rgb_colors"] = jax.lax.dynamic_update_slice(params["rgb_colors"], jnp.asarray(cols), (s, 0))
        params["logit_opacities"] = jax.lax.dynamic_update_slice(
            params["logit_opacities"], jnp.zeros((n, 1), jnp.float32), (s, 0)
        )
        params["log_scales"] = jax.lax.dynamic_update_slice(
            params["log_scales"], jnp.asarray(np.log(np.maximum(scales, 1e-6)))[:, None], (s, 0)
        )
        self.n_gauss += n
        return params

    def alive_mask(self, params) -> jnp.ndarray:
        idx = jnp.arange(self.config.max_gaussians)
        in_range = (idx < self.n_gauss).astype(jnp.float32)
        opacity_ok = (jax.nn.sigmoid(params["logit_opacities"][:, 0]) >= self.config.prune_opacity_threshold)
        not_big = jnp.exp(params["log_scales"][:, 0]) <= self.config.prune_big_fraction * self.scene_radius
        return in_range * opacity_ok.astype(jnp.float32) * not_big.astype(jnp.float32)
