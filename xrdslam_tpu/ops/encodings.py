"""Positional encodings: multiresolution hash grid, OneBlob, frequency.

TPU-native replacement for the reference's tinycudann encoder factory
(reference: slam/model_components/encodings_coslam.py:9-95). The hash grid
follows the instant-NGP scheme the tcnn 'HashGrid' type implements: L levels
with geometric resolution growth, F features per level, spatial hashing with
the (1, 2654435761, 805459861) primes for levels whose dense grid exceeds the
table, dense indexing otherwise, and trilinear interpolation of the 8 corner
features.

Implementation notes (why this shape is TPU-friendly):
  * All level metadata (resolutions, dense/hashed switch) is static Python,
    so the per-level loop unrolls at trace time into 16 gathers that XLA
    pipelines; there is no dynamic shape anywhere.
  * The table is stored ``[L, T, F]`` and gathered with
    ``jnp.take_along_axis`` over a flattened ``[L*T, F]`` view; the backward
    pass becomes a scatter-add, which is exactly what the Adam update needs.
  * Points are processed in large flat batches ``[N, 3]`` so the subsequent
    MLP matmuls are big enough for the MXU.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

_PRIMES = (1, 2654435761, 805459861)


class HashGridSpec(NamedTuple):
    """Static metadata for a multiresolution hash grid."""

    n_levels: int
    n_features: int
    log2_table_size: int
    resolutions: Tuple[int, ...]  # per-level grid resolution
    dense: Tuple[bool, ...]  # per-level: dense indexing instead of hashing

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features


def hashgrid_spec(
    n_levels: int = 16,
    n_features: int = 2,
    log2_table_size: int = 16,
    base_resolution: int = 16,
    finest_resolution: int = 512,
) -> HashGridSpec:
    """Geometric level progression (per_level_scale of tcnn, encodings_coslam.py:41-42)."""
    if n_levels > 1:
        b = math.exp2(math.log2(finest_resolution / base_resolution) / (n_levels - 1))
    else:
        b = 1.0
    resolutions = tuple(int(math.floor(base_resolution * (b**l))) for l in range(n_levels))
    table = 1 << log2_table_size
    dense = tuple((r + 1) ** 3 <= table for r in resolutions)
    return HashGridSpec(n_levels, n_features, log2_table_size, resolutions, dense)


def hashgrid_init(key: jax.Array, spec: HashGridSpec, dtype=jnp.float32) -> jnp.ndarray:
    """tcnn initializes hash tables U(-1e-4, 1e-4)."""
    return jax.random.uniform(
        key, (spec.n_levels, spec.table_size, spec.n_features), dtype=dtype, minval=-1e-4, maxval=1e-4
    )


def _corner_indices(ix: jnp.ndarray, res: int, dense: bool, table_size: int) -> jnp.ndarray:
    """Map integer corner coords [..., 8, 3] to table rows [..., 8]."""
    if dense:
        stride = jnp.uint32(res + 1)
        idx = ix[..., 0] + stride * (ix[..., 1] + stride * ix[..., 2])
    else:
        h = ix[..., 0] * jnp.uint32(_PRIMES[0])
        h = h ^ (ix[..., 1] * jnp.uint32(_PRIMES[1]))
        h = h ^ (ix[..., 2] * jnp.uint32(_PRIMES[2]))
        idx = h & jnp.uint32(table_size - 1)
    return idx


_CORNER_OFFSETS = jnp.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=jnp.int32
)  # [8, 3]


def hashgrid_encode(table: jnp.ndarray, x: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    """Encode normalized coords x in [0,1]^3.

    Args:
        table: [L, T, F] feature table.
        x: [..., 3] coordinates (values outside [0,1] are clamped).
    Returns:
        [..., L*F] concatenated per-level trilinear features.
    """
    batch_shape = x.shape[:-1]
    xf = jnp.clip(x.reshape(-1, 3), 0.0, 1.0)
    n = xf.shape[0]
    feats = []
    for level in range(spec.n_levels):
        res = spec.resolutions[level]
        pos = xf * res
        ix0 = jnp.floor(pos).astype(jnp.int32)
        ix0 = jnp.clip(ix0, 0, res - 1)
        frac = pos - ix0.astype(pos.dtype)
        corners = ix0[:, None, :] + _CORNER_OFFSETS[None, :, :]  # [n, 8, 3]
        idx = _corner_indices(corners.astype(jnp.uint32), res, spec.dense[level], spec.table_size)
        idx = idx.astype(jnp.int32)  # [n, 8]
        lvl_feats = jnp.take(table[level], idx.reshape(-1), axis=0).reshape(n, 8, spec.n_features)
        # trilinear weights in the same corner order as _CORNER_OFFSETS
        wx = jnp.stack([1.0 - frac[:, 0], frac[:, 0]], -1)  # [n, 2]
        wy = jnp.stack([1.0 - frac[:, 1], frac[:, 1]], -1)
        wz = jnp.stack([1.0 - frac[:, 2], frac[:, 2]], -1)
        w = (wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]).reshape(n, 8)
        feats.append(jnp.sum(lvl_feats * w[..., None], axis=1))
    out = jnp.concatenate(feats, axis=-1)
    return out.reshape(*batch_shape, spec.out_dim)


# ---------------------------------------------------------------------------
# OneBlob encoding
# ---------------------------------------------------------------------------

def _quartic_cdf(u: jnp.ndarray) -> jnp.ndarray:
    """CDF of the quartic kernel 15/16 (1-u^2)^2 on [-1, 1] (tcnn OneBlob)."""
    uc = jnp.clip(u, -1.0, 1.0)
    cdf = 0.5 + (15.0 / 16.0) * (uc - (2.0 / 3.0) * uc**3 + 0.2 * uc**5)
    return jnp.where(u < -1.0, 0.0, jnp.where(u > 1.0, 1.0, cdf))


def oneblob_encode(x: jnp.ndarray, n_bins: int = 16) -> jnp.ndarray:
    """OneBlob encoding (NRC-style, as in tcnn's 'OneBlob' type).

    Each input dimension in [0,1] is encoded as the mass a quartic kernel
    centered at x deposits into each of ``n_bins`` uniform bins.

    Args:
        x: [..., D] normalized coords.
    Returns:
        [..., D * n_bins].
    """
    batch_shape = x.shape[:-1]
    d = x.shape[-1]
    xf = jnp.clip(x.reshape(-1, d), 0.0, 1.0)
    edges = jnp.arange(n_bins + 1, dtype=xf.dtype) / n_bins  # [n_bins+1]
    sigma = 1.0 / n_bins
    u = (edges[None, None, :] - xf[..., None]) / sigma  # [n, d, n_bins+1]
    cdf = _quartic_cdf(u)
    feats = cdf[..., 1:] - cdf[..., :-1]  # [n, d, n_bins]
    return feats.reshape(*batch_shape, d * n_bins)


# ---------------------------------------------------------------------------
# Frequency (NeRF) encoding — used by NICE-SLAM decoders
# ---------------------------------------------------------------------------

def frequency_encode(x: jnp.ndarray, n_frequencies: int = 12, include_input: bool = True) -> jnp.ndarray:
    """Classic NeRF sin/cos positional encoding with 2^k frequency bands."""
    bands = 2.0 ** jnp.arange(n_frequencies, dtype=x.dtype)  # [F]
    xb = x[..., None, :] * bands[:, None]  # [..., F, D]
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)  # [..., F, 2D]
    enc = enc.reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def spherical_harmonics_encode(d: jnp.ndarray, degree: int = 4,
                               from_unit_cube: bool = False) -> jnp.ndarray:
    """Real spherical-harmonics basis of a direction, tcnn parity.

    The reference's encoder factory exposes tcnn's 'SphericalHarmonics'
    (reference: slam/model_components/encodings_coslam.py:55-63) for view
    directions. Coefficients and component ordering follow tinycudann's
    sh_enc (degree <= 4 -> 16 outputs). ``from_unit_cube=True`` applies
    tcnn's input convention (directions packed into [0,1]^3, mapped with
    x*2-1 before evaluation).
    """
    if not 1 <= degree <= 4:
        raise ValueError("degree must be in [1, 4]")
    if from_unit_cube:
        d = d * 2.0 - 1.0
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    x2, y2, z2 = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    out = [jnp.full_like(x, 0.28209479177387814)]
    if degree >= 2:
        out += [-0.48860251190291987 * y,
                0.48860251190291987 * z,
                -0.48860251190291987 * x]
    if degree >= 3:
        out += [1.0925484305920792 * xy,
                -1.0925484305920792 * yz,
                0.94617469575755997 * z2 - 0.31539156525251999,
                -1.0925484305920792 * xz,
                0.54627421529603959 * (x2 - y2)]
    if degree >= 4:
        out += [0.59004358992664352 * y * (-3.0 * x2 + y2),
                2.8906114426405538 * xy * z,
                0.45704579946446572 * y * (1.0 - 5.0 * z2),
                0.3731763325901154 * z * (5.0 * z2 - 3.0),
                0.45704579946446572 * x * (1.0 - 5.0 * z2),
                1.4453057213202769 * z * (x2 - y2),
                0.59004358992664352 * x * (x2 - 3.0 * y2)]
    return jnp.stack(out, axis=-1)
