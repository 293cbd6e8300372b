"""Ray generation and depth-sample utilities.

Pure-jnp replacements for the reference's ray helpers:
  * ``camera_ray_dirs`` — per-pixel camera-frame directions, OpenGL
    convention (reference: slam/utils/utils.py:28-65 ``get_camera_rays``).
  * ``rays_from_uv`` / ``sample_pixels`` — random ray batches from an image
    region (reference: slam/common/common.py:39-72, 188-227 ``get_samples``).
  * ``sample_pdf`` — inverse-CDF importance sampling (reference:
    slam/model_components/utils.py:31-76).
  * ``stratified_perturb`` — jittered z samples
    (reference: slam/models/joint_encoding.py:288-293).

All functions take explicit PRNG keys and produce static shapes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..common.camera import Camera


def camera_ray_dirs(camera: Camera, convention: str = "OpenGL") -> jnp.ndarray:
    """Per-pixel camera-frame ray directions [H, W, 3]."""
    i = jnp.arange(camera.width, dtype=jnp.float32)[None, :]  # x / columns
    j = jnp.arange(camera.height, dtype=jnp.float32)[:, None]  # y / rows
    x = (i - camera.cx) / camera.fx
    if convention == "OpenGL":
        y = -(j - camera.cy) / camera.fy
        z = -jnp.ones((camera.height, camera.width), jnp.float32)
    elif convention == "OpenCV":
        y = (j - camera.cy) / camera.fy
        z = jnp.ones((camera.height, camera.width), jnp.float32)
    else:
        raise ValueError(convention)
    x = jnp.broadcast_to(x, (camera.height, camera.width))
    y = jnp.broadcast_to(y, (camera.height, camera.width))
    return jnp.stack([x, y, z], -1)


def rays_from_uv(u: jnp.ndarray, v: jnp.ndarray, c2w: jnp.ndarray, camera: Camera) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World-frame rays for pixel coords (u=column, v=row). Returns (o, d) [N,3]."""
    dirs = jnp.stack(
        [(u - camera.cx) / camera.fx, -(v - camera.cy) / camera.fy, -jnp.ones_like(u)], -1
    )
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def sample_pixels(
    key: jax.Array,
    n: int,
    height: int,
    width: int,
    h_edge: int = 0,
    w_edge: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniformly sample n pixel coords (u=col, v=row) from the interior region.

    Sampling is with replacement, matching torch.randint in the reference
    (slam/common/common.py:63).
    """
    ku, kv = jax.random.split(key)
    u = jax.random.randint(ku, (n,), w_edge, width - w_edge).astype(jnp.float32)
    v = jax.random.randint(kv, (n,), h_edge, height - h_edge).astype(jnp.float32)
    return u, v


def gather_pixels(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Gather img[v, u] for float pixel coords (converted to int)."""
    ui = u.astype(jnp.int32)
    vi = v.astype(jnp.int32)
    return img[vi, ui]


def stratified_perturb(key: jax.Array, z_vals: jnp.ndarray) -> jnp.ndarray:
    """Jitter z samples uniformly within their stratified bins."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
    lower = jnp.concatenate([z_vals[..., :1], mids], -1)
    t = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * t


def sample_pdf(key: jax.Array, bins: jnp.ndarray, weights: jnp.ndarray, n_importance: int, det: bool = False, eps: float = 1e-5) -> jnp.ndarray:
    """Inverse-CDF sampling of ``n_importance`` new z values per ray.

    Args:
        bins: [N, S] bin positions (z midpoints).
        weights: [N, S] unnormalized weights.
    Returns:
        [N, n_importance] sampled positions.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [N, S+1]
    if det:
        u = jnp.linspace(0.5 / n_importance, 1.0 - 0.5 / n_importance, n_importance, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_importance,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_importance,), dtype=cdf.dtype)
    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)
    cdf_b = jnp.take_along_axis(cdf, below, -1)
    cdf_a = jnp.take_along_axis(cdf, above, -1)
    bins_ext = jnp.concatenate([bins, bins[..., -1:]], -1)  # align with cdf length
    bins_b = jnp.take_along_axis(bins_ext, below, -1)
    bins_a = jnp.take_along_axis(bins_ext, above, -1)
    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def coslam_z_vals(
    key: jax.Array,
    target_d: jnp.ndarray,
    n_rays: int,
    near: float,
    far: float,
    n_samples_d: int,
    range_d: float,
    n_range_d: int,
    perturb: bool,
) -> jnp.ndarray:
    """Depth-guided z sampling (reference: slam/models/joint_encoding.py:263-293).

    ``n_range_d`` samples in [d - range_d, d + range_d] around the measured
    depth (falling back to uniform [near, far] where depth is invalid), plus
    ``n_samples_d`` uniform samples over [near, far]; merged and sorted.

    Args:
        target_d: [N, 1] measured depths (<=0 marks invalid).
    Returns:
        [N, n_samples_d + n_range_d] sorted (optionally jittered) z values.
    """
    lin_range = jnp.linspace(-range_d, range_d, n_range_d, dtype=jnp.float32)
    z_samples = lin_range[None, :] + target_d  # [N, n_range_d]
    fallback = jnp.broadcast_to(jnp.linspace(near, far, n_range_d, dtype=jnp.float32), (n_rays, n_range_d))
    valid = (target_d[:, 0] > 0.0)[:, None]
    z_samples = jnp.where(valid, z_samples, fallback)
    if n_samples_d > 0:
        z_uniform = jnp.broadcast_to(jnp.linspace(near, far, n_samples_d, dtype=jnp.float32), (n_rays, n_samples_d))
        z_vals = jnp.sort(jnp.concatenate([z_uniform, z_samples], -1), axis=-1)
    else:
        z_vals = z_samples
    if perturb:
        z_vals = stratified_perturb(key, z_vals)
    return z_vals
