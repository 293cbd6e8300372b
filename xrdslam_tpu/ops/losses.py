"""SDF / free-space / render losses with padding-aware masking.

Re-implements the reference's loss math (reference:
slam/model_components/utils.py:100-186 — ``get_masks``, ``compute_loss``,
``get_sdf_loss``; slam/models/joint_encoding.py:94-147 ``get_loss_dict``)
with one TPU-specific extension: every loss takes an optional per-ray
validity mask, because batches here are padded to static shapes (XLA cannot
have data-dependent batch sizes). With a full-ones mask the values agree
exactly with the reference's unpadded means.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray], denom: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean of x over elements where mask=1 (denominator overridable)."""
    if mask is None:
        return jnp.mean(x)
    num = jnp.sum(x * mask)
    if denom is None:
        d = jnp.sum(mask)
    else:
        d = jnp.sum(denom)
    return num / jnp.maximum(d, 1.0)


def sdf_masks(
    z_vals: jnp.ndarray, target_d: jnp.ndarray, truncation: float, ray_mask: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Front / sdf-region masks and their complement weights.

    Args:
        z_vals: [N, S]; target_d: [N, 1]; ray_mask: [N] 0/1 padding mask.
    Returns:
        (front_mask [N,S], sdf_mask [N,S], fs_weight scalar, sdf_weight scalar).
    """
    front_mask = (z_vals < (target_d - truncation)).astype(z_vals.dtype)
    back_mask = (z_vals > (target_d + truncation)).astype(z_vals.dtype)
    depth_mask = (target_d > 0.0).astype(z_vals.dtype)
    sdf_mask = (1.0 - front_mask) * (1.0 - back_mask) * depth_mask
    if ray_mask is not None:
        front_mask = front_mask * ray_mask[:, None]
        sdf_mask = sdf_mask * ray_mask[:, None]
    num_fs = jnp.sum(front_mask)
    num_sdf = jnp.sum(sdf_mask)
    num = jnp.maximum(num_fs + num_sdf, 1.0)
    fs_weight = 1.0 - num_fs / num
    sdf_weight = 1.0 - num_sdf / num
    return front_mask, sdf_mask, fs_weight, sdf_weight


def sdf_losses(
    z_vals: jnp.ndarray,
    target_d: jnp.ndarray,
    predicted_sdf: jnp.ndarray,
    truncation: float,
    ray_mask: Optional[jnp.ndarray] = None,
    sample_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(fs_loss, sdf_loss) — l2, matching get_sdf_loss (utils.py:154-186).

    The reference divides by the full element count N*S (its masks multiply
    both prediction and target inside an unmasked mse); with padding we
    divide by (#valid rays * S) instead. ``sample_mask`` [N,S] additionally
    drops per-sample padding (Vox-Fusion samples outside any voxel).
    """
    front_mask, sdf_mask, fs_weight, sdf_weight = sdf_masks(z_vals, target_d, truncation, ray_mask)
    if sample_mask is not None:
        front_mask = front_mask * sample_mask
        sdf_mask = sdf_mask * sample_mask
    n, s = z_vals.shape
    if ray_mask is None:
        denom = jnp.asarray(n * s, z_vals.dtype)
    else:
        denom = jnp.maximum(jnp.sum(ray_mask) * s, 1.0)
    fs_loss = jnp.sum(front_mask * (predicted_sdf - 1.0) ** 2) / denom * fs_weight
    sdf_loss = jnp.sum(sdf_mask * (z_vals + predicted_sdf * truncation - target_d) ** 2) / denom * sdf_weight
    return fs_loss, sdf_loss


def rgb_depth_losses(
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    target_rgb: jnp.ndarray,
    target_d: jnp.ndarray,
    depth_trunc: float = 100.0,
    rgb_missing: float = 0.05,
    ray_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(rgb_loss, depth_loss) as in JointEncoding.get_loss_dict
    (reference: slam/models/joint_encoding.py:105-120).

    rgb pixels with invalid depth are down-weighted by ``rgb_missing``;
    depth loss runs only over valid-depth pixels.
    """
    td = target_d[:, 0]
    valid_depth = ((td > 0.0) & (td < depth_trunc)).astype(rgb.dtype)
    rgb_w = jnp.where(valid_depth[:, None] > 0, 1.0, rgb_missing)
    if ray_mask is not None:
        rm = ray_mask
    else:
        rm = jnp.ones_like(td)
    n_valid_rays = jnp.maximum(jnp.sum(rm), 1.0)
    rgb_loss = jnp.sum(((rgb - target_rgb) * rgb_w) ** 2 * rm[:, None]) / (n_valid_rays * 3.0)
    dmask = valid_depth * rm
    depth_loss = jnp.sum((depth - td) ** 2 * dmask) / jnp.maximum(jnp.sum(dmask), 1.0)
    return rgb_loss, depth_loss


def smoothness_tv(sdf_grid: jnp.ndarray, sample_points: int) -> jnp.ndarray:
    """Total-variation smoothness over a [G,G,G] SDF-feature sample grid
    (reference: slam/models/joint_encoding.py:165-197)."""
    tv_x = jnp.sum(jnp.square(sdf_grid[1:, ...] - sdf_grid[:-1, ...]))
    tv_y = jnp.sum(jnp.square(sdf_grid[:, 1:, ...] - sdf_grid[:, :-1, ...]))
    tv_z = jnp.sum(jnp.square(sdf_grid[:, :, 1:, ...] - sdf_grid[:, :, :-1, ...]))
    return (tv_x + tv_y + tv_z) / (sample_points**3)
