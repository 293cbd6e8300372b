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
    # in-loop prune schedule (reference: gaussian_splatting.py:42-51
    # mapping_pruning_dict; applied inside the mapping scan at these
    # iteration numbers — gaussian_cloud_splatam.py:120-151)
    mapping_pruning_dict: Dict[str, Any] = field(default_factory=lambda: dict(
        start_after=0,
        remove_big_after=0,
        stop_after=20,
        prune_every=20,
        removal_opacity_threshold=0.005,
        final_removal_opacity_threshold=0.005,
        reset_opacities=False,
        reset_opacities_every=500,
    ))
    # clone/split densification schedule (reference:
    # gaussian_splatting.py:55-66 mapping_densify_dict; the reference ships
    # the flag OFF and the default schedule never fires within 60 mapping
    # iters — "needs to be updated based on the number of mapping
    # iterations")
    mapping_densify_dict: Dict[str, Any] = field(default_factory=lambda: dict(
        start_after=500,
        remove_big_after=3000,
        stop_after=5000,
        densify_every=100,
        grad_thresh=0.0002,
        num_to_split_into=2,
        removal_opacity_threshold=0.005,
        final_removal_opacity_threshold=0.005,
        reset_opacities_every=3000,
    ))


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
        # multi-chip: set by the owning Algorithm (devices>1). Rendering
        # then shards tile rows over the mesh 'dp' axis (rasterize_dp).
        self.mesh = None

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

    def render(self, params, alive: jnp.ndarray, w2c: jnp.ndarray, binning: Tuple, ntx: int, nty: int, duv: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
        """Single-pass 8-channel rasterization -> rgb/depth/sil/depth_sq.

        ``duv`` [G, 2]: optional zero-valued screen offset whose gradient
        is the per-gaussian means2D gradient (densification signal,
        gaussian_cloud_splatam.py:174-186)."""
        cam = self.camera
        u, v, depth, sigma = self.project(params, w2c)
        if duv is not None:
            u = u + duv[:, 0]
            v = v + duv[:, 1]
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
        if self.mesh is not None:
            from ..ops.gaussian_raster import rasterize_dp

            img = rasterize_dp(self.mesh, u, v, sigma, opacity, ch,
                               binning[0], binning[1], ntx, nty)
        else:
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
    def alive_mask(self, dead: jnp.ndarray, count) -> jnp.ndarray:
        """Row liveness: allocated and not pruned. Pruning flips ``dead``
        at the reference's in-loop schedule (prune_step) instead of
        deleting rows (gaussian_cloud_splatam.py:80-106 removes rows +
        Adam state; with a fixed table, freezing the row is equivalent)."""
        idx = jnp.arange(self.config.max_gaussians)
        return ((idx < count) & ~dead).astype(jnp.float32)

    # ------------------------------------------------------------------
    # in-scan prune / densify table ops (functional analogues of the
    # reference's optimizer-state surgery, gaussian_cloud_splatam.py:80-256)
    # ------------------------------------------------------------------
    def prune_step(self, params, dead, count, it: jnp.ndarray):
        """Apply the reference prune schedule at traced iteration ``it``
        (gaussian_cloud_splatam.py:120-140). Returns (dead, did_prune)."""
        d = self.config.mapping_pruning_dict
        do = ((it >= d["start_after"]) & (it <= d["stop_after"])
              & (it % max(d["prune_every"], 1) == 0))
        thresh = jnp.where(it == d["stop_after"],
                           d["final_removal_opacity_threshold"],
                           d["removal_opacity_threshold"])
        low = jax.nn.sigmoid(params["logit_opacities"][:, 0]) < thresh
        big = (jnp.exp(params["log_scales"][:, 0])
               > self.config.prune_big_fraction * self.scene_radius)
        remove = low | (big & (it >= d["remove_big_after"]))
        idx = jnp.arange(self.config.max_gaussians)
        remove = remove & (idx < count)
        return jnp.where(do, dead | remove, dead), do

    @staticmethod
    def reset_opacities_value():
        """inverse_sigmoid(0.01) (gaussian_cloud_splatam.py:143-150)."""
        return float(np.log(0.01 / 0.99))

    def append_rows(self, params, dead, count, mask, key=None, repeat: int = 1,
                    scale_div: Optional[float] = None):
        """Append ``repeat`` copies of each masked row at [count, ...) —
        fully traced (gather-based, no dynamic shapes). Used for clone
        (repeat=1) and split (repeat=n, jittered positions, scales/0.8n;
        gaussian_cloud_splatam.py:153-256). Returns (params, count)."""
        G = self.config.max_gaussians
        n_set = jnp.sum(mask.astype(jnp.int32))
        n_new = jnp.minimum(n_set * repeat, G - count)
        # stable list of source rows: masked rows first, original order
        srcs = jnp.argsort(jnp.where(mask, jnp.arange(G), G))
        j = jnp.arange(G)
        rel = j - count  # destination-relative index
        slot = jnp.clip(rel // repeat, 0, G - 1)
        src = srcs[slot]
        use = (rel >= 0) & (rel < n_new)
        new_params = dict(params)
        for k_ in ("means3D", "rgb_colors", "unnorm_rotations",
                   "logit_opacities", "log_scales"):
            copied = params[k_][src]
            new_params[k_] = jnp.where(use[:, None], copied, params[k_])
        if scale_div is not None:
            # split: jitter positions by the parent's scale, shrink scales
            scales = jnp.exp(params["log_scales"][src, 0])
            noise = jax.random.normal(key, (G, 3)) * scales[:, None]
            quats = params["unnorm_rotations"][src]
            quats = quats / jnp.maximum(jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-8)
            rot = jax.vmap(lie.quaternion_to_matrix)(quats)
            offset = jnp.einsum("nij,nj->ni", rot, noise)
            new_params["means3D"] = jnp.where(
                use[:, None], new_params["means3D"] + offset, new_params["means3D"])
            new_params["log_scales"] = jnp.where(
                use[:, None],
                new_params["log_scales"] - float(np.log(scale_div)),
                new_params["log_scales"])
        dead = jnp.where(use, False, dead)
        return new_params, dead, count + n_new
