"""Patch correlation over feature pyramids (the altcorr CUDA replacement).

Rebuild of the reference's ``cuda_corr`` extension (reference:
third_party/dpvo_ext/altcorr/correlation.py:5-75 + correlation_kernel.cu),
used by DPVO's update operator (slam/algorithms/dpvo.py:205-232): each
patch's P x P feature vectors correlate with a (2r+1)^2 window of
bilinearly-sampled features around the patch's reprojected location in the
target frame. With DPVO's sizes (P=3, r=3, 2 pyramid levels) the flattened
output is 2*9*49 = 882 features per edge — the input of the update GRU's
correlation encoder.

Pure XLA: bilinear sampling is 4 gathers + lerp; the channel contraction is
an einsum (MXU). No custom kernel needed — the gathers are the same
~2 ns/row class as the rest of the framework.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(fmap: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """fmap [C, H, W]; coords [..., 2] (x, y) -> [..., C]. Zero padding."""
    C, H, W = fmap.shape
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def at(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi = jnp.clip(xi, 0, W - 1)
        yi = jnp.clip(yi, 0, H - 1)
        flat = fmap.reshape(C, -1)
        vals = jnp.take(flat, yi * W + xi, axis=1)  # [C, ...]
        return jnp.moveaxis(vals, 0, -1) * inb[..., None]

    v00 = at(x0i, y0i)
    v01 = at(x0i + 1, y0i)
    v10 = at(x0i, y0i + 1)
    v11 = at(x0i + 1, y0i + 1)
    return (
        v00 * ((1 - fx) * (1 - fy))[..., None]
        + v01 * (fx * (1 - fy))[..., None]
        + v10 * ((1 - fx) * fy)[..., None]
        + v11 * (fx * fy)[..., None]
    )


def patch_correlation(
    fmaps: jnp.ndarray,
    gpatches: jnp.ndarray,
    coords: jnp.ndarray,
    jj: jnp.ndarray,
    radius: int = 3,
) -> jnp.ndarray:
    """Correlate patch features with windows around reprojected locations.

    Args:
        fmaps: [F, C, H, W] per-frame feature maps (one pyramid level).
        gpatches: [E, C, P, P] patch features from the host frames.
        coords: [E, P, P, 2] reprojected (x, y) in the target frame's scale.
        jj: [E] target frame per edge.
    Returns:
        corr [E, P, P, (2r+1), (2r+1)] normalized by sqrt(C).
    """
    E, C, P, _ = gpatches.shape
    win = 2 * radius + 1
    d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    offsets = jnp.stack([dx, dy], -1)  # [win, win, 2]
    sample_pts = coords[:, :, :, None, None, :] + offsets[None, None, None]  # [E,P,P,win,win,2]

    def per_edge(f_idx, pts, gp):
        fm = fmaps[f_idx]
        feats = bilinear_sample(fm, pts)  # [P,P,win,win,C]
        return jnp.einsum("pqwvc,cpq->pqwv", feats, gp) / jnp.sqrt(C).astype(fm.dtype)

    return jax.vmap(per_edge)(jj, sample_pts, gpatches)


def patch_correlation_chunked(
    fmaps: jnp.ndarray,
    gpatches: jnp.ndarray,
    coords: jnp.ndarray,
    jj: jnp.ndarray,
    radius: int = 3,
    chunk: int = 2048,
) -> jnp.ndarray:
    """patch_correlation with bounded HBM: the naive form materializes
    [E, P, P, win, win, C] gathered features (~6 GB at DPVO scale); this
    lax.map's over edge chunks so the peak is chunk-sized. E must be a
    multiple of ``chunk`` (pad edges; padded rows just correlate garbage
    and are masked downstream)."""
    E = gpatches.shape[0]
    if E <= chunk:
        return patch_correlation(fmaps, gpatches, coords, jj, radius)
    assert E % chunk == 0, (E, chunk)
    n = E // chunk

    def body(args):
        gp, co, j = args
        return patch_correlation(fmaps, gp, co, j, radius)

    out = jax.lax.map(body, (
        gpatches.reshape((n, chunk) + gpatches.shape[1:]),
        coords.reshape((n, chunk) + coords.shape[1:]),
        jj.reshape(n, chunk),
    ))
    return out.reshape((E,) + out.shape[2:])


def extract_patches(fmap: jnp.ndarray, centers: jnp.ndarray, p: int = 3) -> jnp.ndarray:
    """Bilinearly extract P x P feature patches at subpixel centers
    (altcorr ``patchify``, correlation.py:52-74).

    fmap [C, H, W]; centers [M, 2] -> [M, C, P, P].
    """
    r = (p - 1) / 2.0
    d = jnp.arange(p, dtype=jnp.float32) - r
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    pts = centers[:, None, None, :] + jnp.stack([dx, dy], -1)[None]
    feats = bilinear_sample(fmap, pts)  # [M, P, P, C]
    return jnp.moveaxis(feats, -1, 1)
