"""Tri-plane (TensoRF-VM style) scene encoding — the TPU-native fast path.

Motivation (measured, tools/profile_mapping.py): the instant-NGP hash
encoding is RANDOM-GATHER bound on TPU — 16 levels x 8 corners = 128
gathered rows per sample at ~2.8 ns/row dominates both directions (63 ms
forward at office0 mapping scale), and the table-gradient one-hot matmul
costs FLOPs proportional to entries x table size. GPUs hide this with
hardware gather units; the TPU answer is to change the representation:

  * 3 orthogonal feature planes per scale: feature(x) = concat over planes
    of bilinear(P_ab, x_a, x_b). Forward needs 3 x 4 = 12 gathered rows per
    sample (10x fewer than hash).
  * The plane gradient factorizes through the bilinear weights:
        dP[r, c, k] = sum_n A[n, r] * B[n, c] * g[n, k]
    with A/B the (2-nonzero) row/col bilinear weight vectors stored DENSE.
    Evaluated as C matmuls (A * g_k)^T @ B on the MXU — NO scatter at all,
    FLOPs = 2 N R^2 C per plane (~2.5 TFLOP at office0 scale, ~15 ms)
    versus the hash dtable's ~6 TFLOP one-hot scatter.

This is a deviation from the reference's tcnn HashGrid (offered as
``JointEncodingConfig.encoding = 'triplane'``; default stays 'hash' for
parity). Quality characteristics match the tri-plane literature: smoother
low-rank bias, same O(1) query.
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
    """XLA gather throughput on v5e is wildly non-monotonic in operand row
    count (measured, tools/gather_bench*.py): <= 8192 rows ~2000 ns/row
    (pathological lowering), 2^18 rows 12.8 ns/row and 2^18+2^13 37.9,
    while 16384-131072, 9*2^14, 9*2^15 and >= 2^19 all run at ~4-5 ns/row.
    Pad the flattened plane to the nearest fast size."""
    if r < 16384:
        return 16384
    if r == 262144:
        return 294912  # 9 * 2^15
    return r


def _gather_corners(plane, u0, v0):
    """plane [R, R, C]; returns f00, f01, f10, f11 each [N, C].
    Rows are 32-64 B contiguous; the flat table is padded to a
    fast-gather row count (see _good_rows)."""
    R, _, C = plane.shape
    flat = plane.reshape(R * R, C)
    pad = _good_rows(R * R) - R * R
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    base = u0 * R + v0
    # one batched gather for all 4 corners (amortizes per-op overhead)
    idx = jnp.concatenate([base, base + 1, base + R, base + R + 1])
    f = jnp.take(flat, idx, axis=0).reshape(4, -1, C)
    return f[0], f[1], f[2], f[3]  # [N, C] each


def _bilerp_cm(corners, fu, fv):
    """Weighted corner sum -> [N, C]."""
    f00, f01, f10, f11 = corners
    w00 = ((1 - fu) * (1 - fv))[:, None]
    w01 = ((1 - fu) * fv)[:, None]
    w10 = (fu * (1 - fv))[:, None]
    w11 = (fu * fv)[:, None]
    return f00 * w00 + f01 * w01 + f10 * w10 + f11 * w11


def _encode_fwd(tables, x, spec):
    outs = []
    for s, (R, C) in enumerate(zip(spec.resolutions, spec.n_features)):
        planes = tables[f"s{s}"]
        for p, (a, b) in enumerate(_PLANES):
            _, _, u0, v0, fu, fv = _plane_uv(x, a, b, R)
            corners = _gather_corners(planes[p], u0, v0)
            outs.append(_bilerp_cm(corners, fu, fv))
    return jnp.concatenate(outs, -1)


def _splat_plane(A, B, g):
    """dP[r, c, k] = sum_n A[n,r] B[n,c] g[n,k] as unrolled bf16 MXU
    matmuls (scatter-free plane gradient). A/B [N, R], g [N, C].

    Notes from tuning: lax.map over k lowers to a serializing while loop
    (~60 ms/step); a VMEM-resident Pallas accumulator kernel was tried and
    is 40x SLOWER (the read-modify-write accumulator serializes the MXU).
    Unrolled independent matmuls are the fast form — XLA pipelines them."""
    C = g.shape[-1]
    Bb = B.astype(jnp.bfloat16)
    dP = [
        jax.lax.dot_general(
            (A * g[:, k:k + 1]).astype(jnp.bfloat16), Bb,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        for k in range(C)
    ]
    return jnp.stack(dP, -1)  # [R, R, C]


def _dense_weights(u0, fu, R):
    """Dense [N, R] bilinear row weights: (1-fu) at u0, fu at u0+1."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (u0.shape[0], R), 1)
    return ((iota == u0[:, None]) * (1 - fu[:, None])
            + (iota == u0[:, None] + 1) * fu[:, None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def triplane_encode(tables, x, spec: TriplaneSpec):
    """tables {s{i}: [3, R, R, C]}, x [N, 3] in [0, 1] -> [N, out_dim]."""
    return _encode_fwd(tables, x, spec)


def _tp_fwd(tables, x, spec):
    return _encode_fwd(tables, x, spec), (tables, x)


def _tp_bwd(spec, res, g):
    tables, x = res
    n = x.shape[0]
    dtables = {}
    dx = jnp.zeros_like(x)
    off = 0
    for s, (R, C) in enumerate(zip(spec.resolutions, spec.n_features)):
        planes = tables[f"s{s}"]
        dplanes = []
        for p, (a, b) in enumerate(_PLANES):
            gk = g[:, off:off + C]
            off += C
            _, _, u0, v0, fu, fv = _plane_uv(x, a, b, R)
            # plane gradient: CP-factored matmuls (no scatter)
            A = _dense_weights(u0, fu, R)
            B = _dense_weights(v0, fv, R)
            dplanes.append(_splat_plane(A, B, gk))
            # position gradient: analytic bilinear derivative (re-gather,
            # 4 rows/plane — cheap)
            f00, f01, f10, f11 = _gather_corners(planes[p], u0, v0)
            dfu = (f10 - f00) * (1 - fv)[:, None] + (f11 - f01) * fv[:, None]
            dfv = (f01 - f00) * (1 - fu)[:, None] + (f11 - f10) * fu[:, None]
            scale = R - 1.0
            da = jnp.sum(gk * dfu, -1) * scale
            db = jnp.sum(gk * dfv, -1) * scale
            dx = dx.at[:, a].add(da).at[:, b].add(db)
        dtables[f"s{s}"] = jnp.stack(dplanes)
    return dtables, dx


triplane_encode.defvjp(_tp_fwd, _tp_bwd)
