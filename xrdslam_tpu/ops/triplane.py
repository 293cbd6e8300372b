"""Tri-plane (TensoRF-VM style) scene encoding — the TPU-native fast path.

Motivation (measured, tools/profile_r2.py + tools/bench_splat_gather.py):
the instant-NGP hash encoding is RANDOM-GATHER bound on TPU, and even the
tri-plane's natural lowering leaves two costs on the table:

  * Gather count. XLA gather on this chip has a large per-ROW cost with a
    strongly sublinear per-byte cost (4 rows of 8 floats cost ~1.8x ONE row
    of 32 floats — tools/bench_splat_gather.py). So each plane stores a
    PACKED 2x2 corner patch per cell, [R*R, 4C]: one gathered row yields
    all four bilinear corners. Packing is a cheap dense rebuild
    (concat of rolls, ~100 MB of sequential HBM traffic) done inside the
    encode; the gathered corners are saved as VJP residuals so the backward
    pass re-gathers nothing.
  * Table gradients. The round-1 scatter-free one-hot matmul costs
    2*N*R^2*C FLOPs (~12 ms/plane at mapping scale); a plain 4-corner
    scatter-add costs 4 scattered rows per point. The MOMENT TRICK cuts it
    to ONE scattered row per point: scatter [g, fu*g, fv*g, fu*fv*g]
    (4C channels) into the point's BASE cell only, then reconstruct the
    true 2x2 bilinear splat with a constant 2x2 "deconvolution" of the
    moment field — exact in exact arithmetic because the corner weights
    are bilinear polynomials in (fu, fv):
        (1-fu)(1-fv) = m00 - m10 - m01 + m11   at the base cell
        fu(1-fv)     = m10 - m11               shifted +1 row
        (1-fu)fv     = m01 - m11               shifted +1 col
        fu*fv        = m11                     shifted +1 row+col
    Measured: 1.8 ms vs 11.7 ms per 512-plane at 176k points
    (tools/bench_splat_gather.py B3 vs B0). Scatter tables are kept at
    their exact R*R size — XLA scatter cost grows with table size, so
    pooling planes into one scatter is a large loss (130 ms pooled vs
    ~8 ms as six per-plane ops).

This is a deviation from the reference's tcnn HashGrid (offered as
``JointEncodingConfig.encoding = 'triplane'``; 'hash' remains for parity).
Quality characteristics match the tri-plane literature: smoother low-rank
bias, same O(1) query.
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

_PLANES = ((0, 1), (0, 2), (1, 2))


class TriplaneSpec(NamedTuple):
    resolutions: Tuple[int, ...]  # per scale
    n_features: Tuple[int, ...]  # per scale (per plane)

    @property
    def out_dim(self) -> int:
        return 3 * sum(self.n_features)


def triplane_spec(resolutions=(128, 512), n_features=(8, 8)) -> TriplaneSpec:
    return TriplaneSpec(tuple(resolutions), tuple(n_features))


def triplane_init(key, spec: TriplaneSpec, std: float = 1e-4) -> Dict[str, jnp.ndarray]:
    tables = {}
    for s, (R, C) in enumerate(zip(spec.resolutions, spec.n_features)):
        key, k = jax.random.split(key)
        tables[f"s{s}"] = jax.random.normal(k, (3, R, R, C), jnp.float32) * std
    return tables


def _plane_uv(x, a, b, R):
    u = jnp.clip(x[:, a], 0.0, 1.0) * (R - 1)
    v = jnp.clip(x[:, b], 0.0, 1.0) * (R - 1)
    u0 = jnp.clip(jnp.floor(u), 0, R - 2)
    v0 = jnp.clip(jnp.floor(v), 0, R - 2)
    return u, v, u0.astype(jnp.int32), v0.astype(jnp.int32), u - u0, v - v0


def _good_rows(r: int) -> int:
    """XLA gather throughput is non-monotonic in operand row count
    (measured, tools/gather_bench*.py): <= 8192 rows and 2^18 rows are
    pathological; 16384-131072, 9*2^14/9*2^15 and >= 2^19 run fast. Pad
    the flattened plane to the nearest fast size."""
    if r < 16384:
        return 16384
    if r == 262144:
        return 294912  # 9 * 2^15
    return r


def _pack_patch(plane):
    """[R, R, C] -> [rows_padded, 4C] where row (u0*R + v0) holds the 2x2
    corner patch [P(u0,v0) | P(u0,v0+1) | P(u0+1,v0) | P(u0+1,v0+1)].
    The wrap rows/cols introduced by roll are never gathered (u0,v0 <= R-2).
    """
    R = plane.shape[0]
    p01 = jnp.roll(plane, -1, axis=1)
    p10 = jnp.roll(plane, -1, axis=0)
    p11 = jnp.roll(p10, -1, axis=1)
    packed = jnp.concatenate([plane, p01, p10, p11], -1).reshape(R * R, -1)
    pad = _good_rows(R * R) - R * R
    if pad:
        packed = jnp.pad(packed, ((0, pad), (0, 0)))
    return packed


def triplane_pack(tables, spec: TriplaneSpec):
    """Precompute the packed 2x2-patch gather tables for all planes.

    Pass the result to ``triplane_encode(..., packed=...)`` when the tables
    are constant across many encodes (tracking: the model is frozen while
    the pose optimizes) so the pack isn't rebuilt per call."""
    packed = {}
    for s, R in enumerate(spec.resolutions):
        planes = tables[f"s{s}"]
        packed[f"s{s}"] = jnp.stack([_pack_patch(planes[p]) for p in range(3)])
    return packed


def _gather_corners(packed_plane, R, C, u0, v0):
    """packed_plane [rows_padded, 4C] -> (f00, f01, f10, f11) each [N, C]
    via ONE gather of packed 2x2 patch rows."""
    f = jnp.take(packed_plane, u0 * R + v0, axis=0)  # [N, 4C]
    return f[:, :C], f[:, C:2 * C], f[:, 2 * C:3 * C], f[:, 3 * C:]


def _bilerp(corners, fu, fv):
    f00, f01, f10, f11 = corners
    w00 = ((1 - fu) * (1 - fv))[:, None]
    w01 = ((1 - fu) * fv)[:, None]
    w10 = (fu * (1 - fv))[:, None]
    w11 = (fu * fv)[:, None]
    return f00 * w00 + f01 * w01 + f10 * w10 + f11 * w11


def _encode_fwd(packed, x, spec, want_res: bool = False):
    outs = []
    res_corners = []
    for s, (R, C) in enumerate(zip(spec.resolutions, spec.n_features)):
        planes = packed[f"s{s}"]
        for p, (a, b) in enumerate(_PLANES):
            _, _, u0, v0, fu, fv = _plane_uv(x, a, b, R)
            corners = _gather_corners(planes[p], R, C, u0, v0)
            if want_res:
                res_corners.append(corners)
            outs.append(_bilerp(corners, fu, fv))
    out = jnp.concatenate(outs, -1)
    if want_res:
        return out, res_corners
    return out


def _splat_moment(u0, v0, fu, fv, g, R):
    """Exact bilinear table gradient via base-cell moment scatter + 2x2
    deconvolution (see module docstring). g [N, C] -> dP [R, R, C]."""
    C = g.shape[-1]
    m = jnp.concatenate(
        [g, g * fu[:, None], g * fv[:, None], g * (fu * fv)[:, None]], -1)
    M = jax.ops.segment_sum(m, u0 * R + v0, num_segments=R * R)
    M = M.reshape(R, R, 4, C)
    m00, m10, m01, m11 = M[:, :, 0], M[:, :, 1], M[:, :, 2], M[:, :, 3]
    d = m00 - m10 - m01 + m11
    d = d + jnp.pad((m10 - m11)[:-1], ((1, 0), (0, 0), (0, 0)))
    d = d + jnp.pad((m01 - m11)[:, :-1], ((0, 0), (1, 0), (0, 0)))
    d = d + jnp.pad(m11[:-1, :-1], ((1, 0), (1, 0), (0, 0)))
    return d


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _encode_core(tables, packed, x, spec: TriplaneSpec):
    return _encode_fwd(packed, x, spec)


def _tp_fwd(tables, packed, x, spec):
    out, corners = _encode_fwd(packed, x, spec, want_res=True)
    return out, (x, corners)


def _tp_bwd(spec, res, g):
    x, corners = res
    dtables = {}
    dpacked = {}
    dx = jnp.zeros_like(x)
    off = 0
    ci = 0
    for s, (R, C) in enumerate(zip(spec.resolutions, spec.n_features)):
        dplanes = []
        for p, (a, b) in enumerate(_PLANES):
            gk = g[:, off:off + C]
            off += C
            _, _, u0, v0, fu, fv = _plane_uv(x, a, b, R)
            dplanes.append(_splat_moment(u0, v0, fu, fv, gk, R))
            # position gradient from the saved forward corners (no regather)
            f00, f01, f10, f11 = corners[ci]
            ci += 1
            dfu = (f10 - f00) * (1 - fv)[:, None] + (f11 - f01) * fv[:, None]
            dfv = (f01 - f00) * (1 - fu)[:, None] + (f11 - f10) * fu[:, None]
            scale = R - 1.0
            da = jnp.sum(gk * dfu, -1) * scale
            db = jnp.sum(gk * dfv, -1) * scale
            dx = dx.at[:, a].add(da).at[:, b].add(db)
        dtables[f"s{s}"] = jnp.stack(dplanes)
        # the packed copy is a derived value; its cotangent is identically
        # zero (a broadcast-0, which XLA folds out of the add chain)
        dpacked[f"s{s}"] = jnp.zeros(
            (3, _good_rows(R * R), 4 * C), jnp.float32)
    return dtables, dpacked, dx


def triplane_encode(tables, x, spec: TriplaneSpec, packed=None):
    """tables {s{i}: [3, R, R, C]}, x [N, 3] in [0, 1] -> [N, out_dim].

    ``packed``: optional result of :func:`triplane_pack`. When given, the
    2x2-patch gather tables are NOT rebuilt inside the call — pass it when
    tables are constant across many encodes (tracking). Gradients w.r.t.
    ``tables`` remain exact either way (the moment-splat backward indexes
    the ORIGINAL table layout, not the packed copy)."""
    if packed is None:
        packed = triplane_pack(tables, spec)
    else:
        packed = jax.lax.stop_gradient(packed)
    return _encode_core(tables, packed, x, spec)


_encode_core.defvjp(_tp_fwd, _tp_bwd)
