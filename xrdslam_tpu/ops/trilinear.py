"""Trilinear feature-grid sampling (the F.grid_sample replacement).

The reference samples dense [1, C, Z, Y, X] feature grids with
``F.grid_sample(..., padding_mode='border', align_corners=True)``
(reference: slam/model_components/decoder_nice.py:195-205). Here grids are
stored ``[X, Y, Z, C]`` (channel-last — the natural TPU layout, keeping C
on the fastest-varying lane axis) and sampled with the same
align-corners/border semantics: normalized coord u in [-1,1] maps to index
(u+1)/2*(S-1), clamped. Gathers of the 8 corners become XLA gathers whose
transpose (scatter-add) is exactly the gradient the mapping step needs.
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample_3d(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample grid [X, Y, Z, C] at normalized coords [..., 3] in [-1, 1].

    coords[..., i] indexes grid axis i (x, y, z). align_corners=True,
    border padding. Returns [..., C].
    """
    X, Y, Z, C = grid.shape
    shape = coords.shape[:-1]
    uv = coords.reshape(-1, 3)
    sizes = jnp.array([X, Y, Z], jnp.float32)
    pos = (uv + 1.0) * 0.5 * (sizes - 1.0)  # align_corners=True
    pos = jnp.clip(pos, 0.0, sizes - 1.0)  # border padding
    i0 = jnp.floor(pos).astype(jnp.int32)
    i0 = jnp.minimum(i0, (sizes - 2.0).astype(jnp.int32).clip(0))
    frac = pos - i0.astype(pos.dtype)
    x0, y0, z0 = i0[:, 0], i0[:, 1], i0[:, 2]
    x1 = jnp.minimum(x0 + 1, X - 1)
    y1 = jnp.minimum(y0 + 1, Y - 1)
    z1 = jnp.minimum(z0 + 1, Z - 1)
    fx, fy, fz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]

    flat = grid.reshape(-1, C)

    def at(xi, yi, zi):
        return flat[(xi * Y + yi) * Z + zi]

    c000 = at(x0, y0, z0)
    c001 = at(x0, y0, z1)
    c010 = at(x0, y1, z0)
    c011 = at(x0, y1, z1)
    c100 = at(x1, y0, z0)
    c101 = at(x1, y0, z1)
    c110 = at(x1, y1, z0)
    c111 = at(x1, y1, z1)

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    out = c0 * (1 - fx) + c1 * fx
    return out.reshape(*shape, C)


def normalize_3d_coordinate(p: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """World [..., 3] -> [-1, 1] per-axis (reference: common.py:16-31)."""
    lo = bound[:, 0]
    hi = bound[:, 1]
    return (p - lo) / (hi - lo) * 2.0 - 1.0
