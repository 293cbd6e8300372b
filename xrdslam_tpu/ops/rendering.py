"""Volume-rendering primitives: SDF-weight and occupancy renderers.

Pure-jnp replacements for the reference's renderers:
  * ``sdf2weights`` / ``raw2outputs`` — Co-SLAM's truncated-SDF weighting
    with first-surface masking (reference: slam/models/joint_encoding.py:346-406).
  * ``raw2outputs_nerf_color`` — NICE-SLAM's occupancy alpha compositing
    (reference: slam/model_components/utils.py:189-244).

All functions operate on [N_rays, N_samples(,C)] arrays with static shapes
and are differentiable end-to-end (the first-surface argmax produces a hard
mask exactly like the reference, with gradients flowing through the weights).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sdf2weights(sdf: jnp.ndarray, z_vals: jnp.ndarray, truncation: float, sc_factor: float = 1.0) -> jnp.ndarray:
    """Convert SDF samples along rays to normalized rendering weights.

    w_i = sigmoid(sdf/tr) * sigmoid(-sdf/tr), masked to samples in front of
    the first zero crossing (+ truncation band), renormalized.
    """
    weights = _sig(sdf / truncation) * _sig(-sdf / truncation)
    signs = sdf[:, 1:] * sdf[:, :-1]
    mask_cross = (signs < 0.0).astype(z_vals.dtype)  # [N, S-1]
    inds = jnp.argmax(mask_cross, axis=1)  # first sign change (0 if none)
    z_min = jnp.take_along_axis(z_vals, inds[:, None], axis=1)  # [N, 1]
    mask = (z_vals < z_min + sc_factor * truncation).astype(z_vals.dtype)
    weights = weights * mask
    return weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-8)


def _sig(x):
    # jax.nn.sigmoid, NOT 1/(1+exp(-x)): the naive form's backward produces
    # inf/inf^2 = NaN for |x| > ~88 (f32 exp overflow).
    return jax.nn.sigmoid(x)


def raw2outputs_sdf(
    raw: jnp.ndarray, z_vals: jnp.ndarray, truncation: float, sc_factor: float = 1.0, white_bkgd: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Volume render from raw [N, S, 4] = (rgb logits, sdf).

    Returns (rgb_map [N,3], disp_map [N], acc_map [N], weights [N,S],
    depth_map [N], depth_var [N]).
    """
    rgb = _sig(raw[..., :3])
    weights = sdf2weights(raw[..., 3], z_vals, truncation, sc_factor)
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    depth_var = jnp.sum(weights * jnp.square(z_vals - depth_map[..., None]), axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / jnp.maximum(acc_map, 1e-10))
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, disp_map, acc_map, weights, depth_map, depth_var


def raw2outputs_occupancy(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray = None,
    occupancy: bool = True,
    coef: float = 10.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NICE-SLAM-style occupancy compositing from raw [N, S, 4].

    alpha_i = sigmoid(coef * raw) in occupancy mode (utils.py:230-232), else
    1 - exp(-relu(density) * delta) with deltas scaled by |rays_d|
    (utils.py:218-227). raw[..., :3] is rgb already in [0,1].

    Returns (depth [N], depth_var [N], rgb [N,3], weights [N,S]).
    """
    if occupancy:
        u = coef * raw[..., 3]
        alpha = _sig(u)
        # log(1 - sigmoid(u)) == -softplus(u) exactly: bounded backward
        # (-sigmoid(u)) even where alpha saturates to 1.0 in fp32, where the
        # generic log(1-alpha+eps) backward (1/eps = 1e10) overflowed inside
        # XLA's fused VJP and NaN'd the mapping step (round-3 diagnosis).
        log_t = -jax.nn.softplus(u)
    else:
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], -1)
        if rays_d is not None:
            dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        alpha = 1.0 - jnp.exp(-jnp.maximum(raw[..., 3], 0.0) * dists)
        # Transmittance in log space: cumprod's backward divides by the
        # cumulative product, which NaNs once it underflows to 0 (saturated
        # alpha=1 rays); exp(cumsum(log)) is mathematically identical and
        # gradient-safe.
        log_t = jnp.log(1.0 - alpha + 1e-10)
    zeros = jnp.zeros_like(log_t[..., :1])
    transmittance = jnp.exp(jnp.concatenate([zeros, jnp.cumsum(log_t, -1)[..., :-1]], -1))
    weights = alpha * transmittance
    rgb_map = jnp.sum(weights[..., None] * raw[..., :3], axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    depth_var = jnp.sum(weights * jnp.square(z_vals - depth_map[..., None]), axis=-1)
    return depth_map, depth_var, rgb_map, weights
