"""Packed patch-row hash-grid encoding — the round-3 fast hash path.

The instant-NGP hash encode is RANDOM-GATHER bound on TPU: the per-vertex
layout needs 8 gathered rows per sample per level (128 rows/sample at the
Co-SLAM spec), and XLA gather on v5e costs ~2.6-4.6 ns per ROW regardless
of width (tools/bench_hashpack.py, tools/gather_bench.py). This module
restructures the table so ONE gathered row per level yields the whole
2x2x2 corner patch (8F = 16 floats), cutting the mapping-scale gather cost
57 ms -> ~7 ms per iteration, and makes the table gradient ONE scattered
row per sample per level.

Semantics vs the reference tcnn HashGrid
(reference: slam/model_components/encodings_coslam.py:9-44,
``get_encoder('hash', ...)``):

* DENSE levels ((res+1)^3 <= table_size): EXACT. Canonical params remain
  the per-vertex grid ``[(R+1)^3, F]``; the packed patch table is rebuilt
  from slices inside the encode, so vertex sharing — and hence C0
  continuity — is preserved, and the table gradient flows through the
  pack transpose automatically (plain-JAX rolls, no custom rule needed).
* HASH levels: the table is keyed by the BASE CELL (one hash of the cell
  coords, storing the full 2x2x2 patch ``[T, 8F]``) instead of hashing
  each vertex. Collisions alias patches rather than vertices, and the
  field is piecewise-trilinear per cell (C0 breaks across cell borders,
  which the downstream MLP smooths — same tradeoff class as instant-NGP's
  own hash collisions). This is the deliberate TPU-native redesign; the
  exact per-vertex path survives in ops/hashgrid_fast
  (``JointEncodingConfig.hash_packed=False``).

Table-gradient scatter: segment_sum cost on v5e scales with SEGMENT COUNT,
not row width (measured: [176k,16]->65536 segs 2.5 ms, [176k,64]->16384
segs 1.4 ms). Each level's scatter is therefore widened by ``k`` — the
16-wide row value is placed into sub-slot ``idx % k`` of a ``16k``-wide
row and scattered into ``rows/k`` segments, then reshaped back.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .encodings import _PRIMES, HashGridSpec

# segment target: scatters are fastest around 8k-16k segments
_SEG_TARGET = 16384


def _good_rows(r: int) -> int:
    """Fast gather operand sizes on v5e (tools/gather_bench.py): <=8192 rows
    and 2^18 rows are pathological; pad to the nearest fast size. Rounded
    to a multiple of 1024 so the widened-scatter factor always divides."""
    r = ((r + 1023) // 1024) * 1024
    if r < 16384:
        return 16384
    if r == 262144:
        return 294912  # 9 * 2^15
    return r


def _scatter_k(rows: int) -> int:
    """Widening factor for the table-gradient segment_sum."""
    k = max(1, rows // _SEG_TARGET)
    while rows % k:
        k -= 1
    return min(k, 8)


def dense_rows(res: int) -> int:
    return res * res * res


def packed_init(key: jax.Array, spec: HashGridSpec) -> Dict[str, jnp.ndarray]:
    """tcnn-style U(-1e-4, 1e-4) init.

    Dense level l -> ``v{l}``: [(R+1)^3, F] vertex grid (exact semantics).
    Hash level l -> ``h{l}``: [T, 8F] cell-keyed patch rows.
    """
    tables: Dict[str, jnp.ndarray] = {}
    f = spec.n_features
    for l in range(spec.n_levels):
        key, k = jax.random.split(key)
        r = spec.resolutions[l]
        if spec.dense[l]:
            shape = ((r + 1) ** 3, f)
            name = f"v{l}"
        else:
            shape = (spec.table_size, 8 * f)
            name = f"h{l}"
        tables[name] = jax.random.uniform(k, shape, jnp.float32, -1e-4, 1e-4)
    return tables


def _pack_dense(vertex: jnp.ndarray, res: int, f: int) -> jnp.ndarray:
    """[(R+1)^3, F] vertex grid -> [good_rows(R^3), 8F] patch rows.

    Row (x*R^2 + y*R + z) holds [V(x+i,y+j,z+k) for (i,j,k) in corner
    order i,j,k in {0,1} x {0,1} x {0,1} (slot c = 4i+2j+k)], matching
    encodings._CORNER_OFFSETS."""
    r1 = res + 1
    v = vertex.reshape(r1, r1, r1, f)
    slots = []
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                slots.append(v[i:i + res, j:j + res, k:k + res])
    packed = jnp.concatenate(slots, -1).reshape(res ** 3, 8 * f)
    pad = _good_rows(res ** 3) - res ** 3
    if pad:
        packed = jnp.pad(packed, ((0, pad), (0, 0)))
    return packed


def pack_gather_tables(tables: Dict[str, jnp.ndarray], spec: HashGridSpec) -> Tuple[jnp.ndarray, ...]:
    """Per-level gather operands. Hash levels are identity (the canonical
    param IS the gather table); dense levels are packed from vertex grids.
    Differentiable, so table grads flow through the pack transpose."""
    out = []
    for l in range(spec.n_levels):
        if spec.dense[l]:
            out.append(_pack_dense(tables[f"v{l}"], spec.resolutions[l], spec.n_features))
        else:
            out.append(tables[f"h{l}"])
    return tuple(out)


def _cell_and_frac(x: jnp.ndarray, res: int):
    """x [N,3] in [0,1] -> base cell int32 [N,3], frac [N,3]."""
    pos = x * res
    ix0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res - 1)
    return ix0, pos - ix0.astype(pos.dtype)


def _row_ids(ix0: jnp.ndarray, res: int, dense: bool, table_size: int) -> jnp.ndarray:
    if dense:
        r = jnp.int32(res)
        return ix0[:, 0] * (r * r) + ix0[:, 1] * r + ix0[:, 2]
    h = ix0[:, 0].astype(jnp.uint32) * np.uint32(_PRIMES[0])
    h = h ^ (ix0[:, 1].astype(jnp.uint32) * np.uint32(_PRIMES[1]))
    h = h ^ (ix0[:, 2].astype(jnp.uint32) * np.uint32(_PRIMES[2]))
    return (h & np.uint32(table_size - 1)).astype(jnp.int32)


def _corner_weights(frac: jnp.ndarray) -> jnp.ndarray:
    """frac [N,3] -> w [N,8] in slot order c = 4i+2j+k."""
    wx = jnp.stack([1.0 - frac[:, 0], frac[:, 0]], -1)  # [N,2]
    wy = jnp.stack([1.0 - frac[:, 1], frac[:, 1]], -1)
    wz = jnp.stack([1.0 - frac[:, 2], frac[:, 2]], -1)
    return (wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]).reshape(-1, 8)


def _fwd_rows(packed: Tuple[jnp.ndarray, ...], x: jnp.ndarray, spec: HashGridSpec):
    """Gather one patch row per level. Returns rows [L, N, 8F]."""
    rows = []
    for l in range(spec.n_levels):
        ix0, _ = _cell_and_frac(x, spec.resolutions[l])
        rid = _row_ids(ix0, spec.resolutions[l], spec.dense[l], spec.table_size)
        rows.append(jnp.take(packed[l], rid, axis=0))
    return jnp.stack(rows)


def _lerp(rows: jnp.ndarray, x: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    """rows [L, N, 8F], x [N,3] -> out [N, L*F]."""
    n = x.shape[0]
    f = spec.n_features
    ws = []
    for l in range(spec.n_levels):
        _, frac = _cell_and_frac(x, spec.resolutions[l])
        ws.append(_corner_weights(frac))
    w = jnp.stack(ws)  # [L, N, 8]
    out = jnp.einsum("lncf,lnc->lnf", rows.reshape(spec.n_levels, n, 8, f), w)
    return out.transpose(1, 0, 2).reshape(n, spec.n_levels * f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_lerp(packed: Tuple[jnp.ndarray, ...], x: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    xc = jnp.clip(x, 0.0, 1.0)
    return _lerp(_fwd_rows(packed, xc, spec), xc, spec)


def _gl_fwd(packed, x, spec):
    xc = jnp.clip(x, 0.0, 1.0)
    rows = _fwd_rows(packed, xc, spec)
    return _lerp(rows, xc, spec), (x, rows, tuple(p.shape[0] for p in packed))


def _widened_segsum(vals: jnp.ndarray, rid: jnp.ndarray, rows: int) -> jnp.ndarray:
    """segment_sum [N, W] -> [rows, W], widened k-fold to cut segments."""
    n, w = vals.shape
    k = _scatter_k(rows)
    if k == 1:
        return jax.ops.segment_sum(vals, rid, num_segments=rows)
    sub = rid % k
    seg = rid // k
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w * k), 1) // w
    wide = jnp.where(lane == sub[:, None], jnp.tile(vals, (1, k)), 0.0)
    s = jax.ops.segment_sum(wide, seg, num_segments=rows // k)
    return s.reshape(rows, w)


def _gl_bwd(spec, res, g):
    x, rows_all, packed_rows = res
    xc = jnp.clip(x, 0.0, 1.0)
    n = x.shape[0]
    f = spec.n_features
    g_lnf = g.reshape(n, spec.n_levels, f).transpose(1, 0, 2)  # [L, N, F]
    in_range = ((x > 0.0) & (x < 1.0)).astype(jnp.float32)  # [N, 3]
    d_packed = []
    dx = jnp.zeros_like(x)
    for l in range(spec.n_levels):
        r = spec.resolutions[l]
        ix0, frac = _cell_and_frac(xc, r)
        rid = _row_ids(ix0, r, spec.dense[l], spec.table_size)
        w = _corner_weights(frac)  # [N, 8]
        gl = g_lnf[l]  # [N, F]
        rows = rows_all[l].reshape(n, 8, f)
        # table gradient: one scattered row per point
        vals = (w[:, :, None] * gl[:, None, :]).reshape(n, 8 * f)
        d_packed.append(_widened_segsum(vals, rid, packed_rows[l]))
        # position gradient from saved rows
        gdotf = jnp.einsum("ncf,nf->nc", rows, gl)  # [N, 8]
        wx = jnp.stack([1.0 - frac[:, 0], frac[:, 0]], -1)
        wy = jnp.stack([1.0 - frac[:, 1], frac[:, 1]], -1)
        wz = jnp.stack([1.0 - frac[:, 2], frac[:, 2]], -1)
        sgn = jnp.asarray([-1.0, 1.0], jnp.float32)
        g8 = gdotf.reshape(n, 2, 2, 2)
        dfx = jnp.einsum("nijk,i,nj,nk->n", g8, sgn, wy, wz)
        dfy = jnp.einsum("nijk,ni,j,nk->n", g8, wx, sgn, wz)
        dfz = jnp.einsum("nijk,ni,nj,k->n", g8, wx, wy, sgn)
        dx = dx + jnp.stack([dfx, dfy, dfz], -1) * r * in_range
    return tuple(d_packed), dx.astype(x.dtype)


_gather_lerp.defvjp(_gl_fwd, _gl_bwd)


def packed_hash_encode(
    tables: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    spec: HashGridSpec,
    packed: Tuple[jnp.ndarray, ...] | None = None,
) -> jnp.ndarray:
    """tables (see :func:`packed_init`), x [..., 3] in [0,1] -> [..., L*F].

    ``packed``: optional result of :func:`pack_gather_tables`; pass it when
    the tables are frozen across many encodes (tracking) so dense levels
    aren't re-packed per call. Gradients w.r.t. ``tables`` are exact either
    way (with ``packed`` given it is stop_gradient'ed and only d/dx flows)."""
    if packed is None:
        packed = pack_gather_tables(tables, spec)
    else:
        packed = jax.lax.stop_gradient(packed)
    batch_shape = x.shape[:-1]
    out = _gather_lerp(packed, x.reshape(-1, 3), spec)
    return out.reshape(*batch_shape, spec.out_dim)
