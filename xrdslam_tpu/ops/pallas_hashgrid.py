"""Fused Pallas TPU kernel for multiresolution hash-grid encoding.

Replaces the XLA gather/scatter path of ops.encodings.hashgrid_encode for
the training hot loop (the tinycudann-equivalent kernel the reference gets
from CUDA — encodings_coslam.py:39-53). Why a kernel: XLA's row-gathers
cost ~2 ns/row and its scatter-add (the table gradient) is far worse, and
every intermediate with minor dim F=2 wastes 64x of the VPU lanes. Here the
whole per-level pipeline runs on-chip:

  * Table layout: each level's T entries are stored as a VMEM plane
    ``[T/128, 128]`` per feature (entry e at (e >> 7, e & 127)); all
    levels+features together are ~8 MB — they fit in VMEM, so lookups
    never touch HBM.
  * Lookup = two Mosaic ``dynamic_gather`` ops: a sublane gather fetches
    each point's 128-wide row (idx broadcast over lanes), then a lane
    gather selects the entry's lane. 512 points per op (one per sublane).
  * Trilinear weights and the level accumulation run on [512, 8]-free
    layouts (everything is [512, 128] tiles), no padded minor dims.
  * Backward (custom_vjp): the table gradient is computed as one-hot
    matmuls on the MXU — dPlane[r, j] = sum_i 1[row_i = r] (w_i g_i)
    1[lane_i = j] — i.e. A^T @ M with A [B, S] row-one-hot and M [B, 128]
    the lane-masked weighted grads; no scatter op anywhere. The position
    gradient re-gathers corner features and differentiates the trilinear
    weights in-kernel.

Constraints: points are processed in blocks of 512 (padded); the table size
is fixed at T = 2^16 (512 sublane rows/feature) — exactly the Co-SLAM
hashsize=16 configuration (reference: input_config.py:256).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .pl_compat import pallas_call as _pallas_call
from jax.experimental.pallas import tpu as pltpu

from .encodings import _PRIMES, HashGridSpec

BLK = 512  # points per kernel grid step == sublane count of a table plane


def _plane_rows(spec: HashGridSpec) -> int:
    assert spec.table_size % 128 == 0
    return spec.table_size // 128


def pack_table(table: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    """[L, T, F] -> [L, F, T/128, 128] VMEM plane layout."""
    L, T, F = table.shape
    return table.reshape(L, T // 128, 128, F).transpose(0, 3, 1, 2)


def unpack_table(planes: jnp.ndarray) -> jnp.ndarray:
    """[L, F, T/128, 128] -> [L, T, F]."""
    L, F, S, _ = planes.shape
    return planes.transpose(0, 2, 3, 1).reshape(L, S * 128, F)


def _corner_entry(ix: jnp.ndarray, iy: jnp.ndarray, iz: jnp.ndarray, res: int, dense: bool, table_size: int):
    """Entry index for integer corner coords (vectors [B])."""
    if dense:
        stride = np.uint32(res + 1)
        e = ix.astype(jnp.uint32) + stride * (iy.astype(jnp.uint32) + stride * iz.astype(jnp.uint32))
    else:
        e = (
            ix.astype(jnp.uint32) * np.uint32(_PRIMES[0])
            ^ iy.astype(jnp.uint32) * np.uint32(_PRIMES[1])
            ^ iz.astype(jnp.uint32) * np.uint32(_PRIMES[2])
        )
        e = e & np.uint32(table_size - 1)
    return e.astype(jnp.int32)


def _lookup(plane_ref, level: int, feat: int, e: jnp.ndarray) -> jnp.ndarray:
    """Gather plane[e >> 7, e & 127] for e [B] -> [B] via two dynamic gathers."""
    rows = e >> 7  # [B]
    lanes = e & 127
    rows_b = jnp.broadcast_to(rows[:, None], (BLK, 128))
    plane = plane_ref[level, feat]  # [S, 128] with S == 512 == BLK
    y = jnp.take_along_axis(plane, rows_b, axis=0)  # y[i, :] = row of point i
    lanes_b = jnp.broadcast_to(lanes[:, None], (BLK, 128))
    z = jnp.take_along_axis(y, lanes_b, axis=1)  # all lanes = selected value
    return z[:, 0]


def _point_setup(x_ref):
    """Clip coords and return per-axis columns [B]."""
    x = jnp.clip(x_ref[:, 0], 0.0, 1.0)
    y = jnp.clip(x_ref[:, 1], 0.0, 1.0)
    z = jnp.clip(x_ref[:, 2], 0.0, 1.0)
    return x, y, z


_CORNERS = [(cx, cy, cz) for cx in (0, 1) for cy in (0, 1) for cz in (0, 1)]


def _fwd_kernel(x_ref, planes_ref, out_ref, *, spec: HashGridSpec):
    xs, ys, zs = _point_setup(x_ref)
    for level in range(spec.n_levels):
        res = spec.resolutions[level]
        px, py, pz = xs * res, ys * res, zs * res
        ix = jnp.clip(jnp.floor(px), 0, res - 1).astype(jnp.int32)
        iy = jnp.clip(jnp.floor(py), 0, res - 1).astype(jnp.int32)
        iz = jnp.clip(jnp.floor(pz), 0, res - 1).astype(jnp.int32)
        fx, fy, fz = px - ix, py - iy, pz - iz
        acc0 = jnp.zeros((BLK,), jnp.float32)
        acc1 = jnp.zeros((BLK,), jnp.float32)
        for (cx, cy, cz) in _CORNERS:
            e = _corner_entry(ix + cx, iy + cy, iz + cz, res, spec.dense[level], spec.table_size)
            w = (fx if cx else 1.0 - fx) * (fy if cy else 1.0 - fy) * (fz if cz else 1.0 - fz)
            acc0 = acc0 + w * _lookup(planes_ref, level, 0, e)
            acc1 = acc1 + w * _lookup(planes_ref, level, 1, e)
        out_ref[:, 2 * level] = acc0
        out_ref[:, 2 * level + 1] = acc1


def _bwd_kernel(x_ref, planes_ref, g_ref, dx_ref, dplanes_ref, *, spec: HashGridSpec):
    """Gradients wrt positions and table planes for one point block.

    dplanes is accumulated across grid steps (output revisiting), so the
    first grid step must zero it.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        dplanes_ref[...] = jnp.zeros_like(dplanes_ref)

    xs, ys, zs = _point_setup(x_ref)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)  # [B, S]
    dx = jnp.zeros((BLK,), jnp.float32)
    dy = jnp.zeros((BLK,), jnp.float32)
    dz = jnp.zeros((BLK,), jnp.float32)
    for level in range(spec.n_levels):
        res = spec.resolutions[level]
        px, py, pz = xs * res, ys * res, zs * res
        ix = jnp.clip(jnp.floor(px), 0, res - 1).astype(jnp.int32)
        iy = jnp.clip(jnp.floor(py), 0, res - 1).astype(jnp.int32)
        iz = jnp.clip(jnp.floor(pz), 0, res - 1).astype(jnp.int32)
        fx, fy, fz = px - ix, py - iy, pz - iz
        g0 = g_ref[:, 2 * level]
        g1 = g_ref[:, 2 * level + 1]
        for (cx, cy, cz) in _CORNERS:
            e = _corner_entry(ix + cx, iy + cy, iz + cz, res, spec.dense[level], spec.table_size)
            wx = fx if cx else 1.0 - fx
            wy = fy if cy else 1.0 - fy
            wz = fz if cz else 1.0 - fz
            w = wx * wy * wz
            f0 = _lookup(planes_ref, level, 0, e)
            f1 = _lookup(planes_ref, level, 1, e)
            gdotf = g0 * f0 + g1 * f1
            sx = 1.0 if cx else -1.0
            sy = 1.0 if cy else -1.0
            sz = 1.0 if cz else -1.0
            dx = dx + gdotf * sx * wy * wz * res
            dy = dy + gdotf * wx * sy * wz * res
            dz = dz + gdotf * wx * wy * sz * res
            # table grad: one-hot matmul scatter on the MXU
            rows = e >> 7
            lanes = e & 127
            row_onehot = (row_iota == rows[:, None]).astype(jnp.float32)  # [B, S]
            lane_mask0 = (lane_iota == lanes[:, None]).astype(jnp.float32)  # [B, 128]
            m0 = lane_mask0 * (w * g0)[:, None]
            m1 = lane_mask0 * (w * g1)[:, None]
            dplanes_ref[level, 0] += jnp.dot(row_onehot.T, m0, preferred_element_type=jnp.float32)
            dplanes_ref[level, 1] += jnp.dot(row_onehot.T, m1, preferred_element_type=jnp.float32)
    dx_ref[:, 0] = dx
    dx_ref[:, 1] = dy
    dx_ref[:, 2] = dz


def _pad_to_block(x: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    n = x.shape[0]
    pad = (-n) % BLK
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hashgrid_encode_pallas(planes: jnp.ndarray, x: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    """Encode normalized coords with the fused kernel.

    Args:
        planes: [L, F=2, T/128, 128] packed table (see pack_table).
        x: [..., 3] coords in [0, 1].
    Returns:
        [..., L*F] features.
    """
    return _forward(planes, x, spec)


def _forward(planes, x, spec):
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, 3).astype(jnp.float32)
    xf, n = _pad_to_block(xf)
    grid = (xf.shape[0] // BLK,)
    out = _pallas_call(
        functools.partial(_fwd_kernel, spec=spec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLK, 3), lambda i: (i, 0)),
            pl.BlockSpec(planes.shape, lambda i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BLK, spec.out_dim), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((xf.shape[0], spec.out_dim), jnp.float32),
    )(xf, planes)
    return out[:n].reshape(*batch_shape, spec.out_dim)


def _fwd_rule(planes, x, spec):
    return _forward(planes, x, spec), (planes, x)


def _bwd_rule(spec, res, g):
    planes, x = res
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, 3).astype(jnp.float32)
    gf = g.reshape(-1, spec.out_dim).astype(jnp.float32)
    xf, n = _pad_to_block(xf)
    gf, _ = _pad_to_block(gf)
    grid = (xf.shape[0] // BLK,)
    dx, dplanes = _pallas_call(
        functools.partial(_bwd_kernel, spec=spec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLK, 3), lambda i: (i, 0)),
            pl.BlockSpec(planes.shape, lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((BLK, spec.out_dim), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BLK, 3), lambda i: (i, 0)),
            pl.BlockSpec(planes.shape, lambda i: (0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((xf.shape[0], 3), jnp.float32),
            jax.ShapeDtypeStruct(planes.shape, jnp.float32),
        ],
    )(xf, planes, gf)
    dx = dx[:n].reshape(*batch_shape, 3).astype(x.dtype)
    return dplanes, dx


hashgrid_encode_pallas.defvjp(_fwd_rule, _bwd_rule)
