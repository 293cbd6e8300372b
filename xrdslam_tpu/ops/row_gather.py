"""Pallas DMA row gather: ``table [R, C], idx [N] -> [N, C]``.

XLA's native gather on TPU moves ~4 elements/ns regardless of row width
(measured v5e: 200k x 128-float rows = 6.6 ms, ~15 GB/s) because it is
lowered onto the vector unit's lane shuffles. For genuine row gathers the
DMA engine is the right tool: one async HBM->VMEM copy per row, hundreds in
flight, which runs at memory bandwidth. This is the same trick the packed
hash encoder uses for patch rows, generalized to any (row-indexed) table.

Used by the Point-SLAM spatial-hash kNN (cell member/position rows) where
it replaces three ``jnp.take`` calls (reference workload equivalent:
FAISS-GPU IVFFlat list scans, neural_point_cloud.py:223-282).

Backward: a gather's VJP is a scatter-add, delegated to
``pallas_scatter.scatter_add_matmul`` (itself adaptive Pallas/XLA).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 256  # rows per grid step; also the number of in-flight DMAs


def _kernel(idx_ref, table_ref, out_ref, sems):
    i = pl.program_id(0)

    def start(j, carry):
        r = idx_ref[i * BLK + j]
        pltpu.make_async_copy(table_ref.at[r], out_ref.at[j], sems.at[j]).start()
        return carry

    jax.lax.fori_loop(0, BLK, start, 0)

    def wait(j, carry):
        r = idx_ref[i * BLK + j]
        pltpu.make_async_copy(table_ref.at[r], out_ref.at[j], sems.at[j]).wait()
        return carry

    jax.lax.fori_loop(0, BLK, wait, 0)


def _flat_kernel(idx_ref, table_ref, out_ref, sems, *, width):
    # 1D HBM memrefs carry a (1024,) tile, so width must be a multiple of
    # 1024 elements for an aligned dynamic slice; row r lives at r*width
    i = pl.program_id(0)

    def start(j, carry):
        r = idx_ref[i * BLK + j]
        pltpu.make_async_copy(table_ref.at[pl.ds(r * width, width)],
                              out_ref.at[pl.ds(j * width, width)],
                              sems.at[j]).start()
        return carry

    jax.lax.fori_loop(0, BLK, start, 0)

    def wait(j, carry):
        r = idx_ref[i * BLK + j]
        pltpu.make_async_copy(table_ref.at[pl.ds(r * width, width)],
                              out_ref.at[pl.ds(j * width, width)],
                              sems.at[j]).wait()
        return carry

    jax.lax.fori_loop(0, BLK, wait, 0)


def _row_gather_impl(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    n = idx.shape[0]
    c = table.shape[1]
    pad = (-n) % BLK
    idx_p = jnp.pad(idx, (0, pad)) if pad else idx
    np_ = idx_p.shape[0]
    if c % 1024 == 0:
        # wide rows: flat 1D layout, one aligned chunk DMA per row
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(np_ // BLK,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((BLK * c,), lambda i, idx: (i,)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((BLK,))],
        )
        out = pl.pallas_call(
            functools.partial(_flat_kernel, width=c),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((np_ * c,), table.dtype),
        )(idx_p.astype(jnp.int32), table.reshape(-1))
        out = out.reshape(np_, c)
    elif c == 128:
        # 2D per-row DMA: Mosaic accepts single-row slices only when the
        # row is exactly one (8, 128) tile wide
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(np_ // BLK,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((BLK, c), lambda i, idx: (i, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((BLK,))],
        )
        out = pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((np_, c), table.dtype),
        )(idx_p.astype(jnp.int32), table)
    else:
        out = jnp.take(table, idx_p, axis=0)
    return out[:n] if pad else out


def _on_tpu() -> bool:
    from .hashgrid_fast import on_tpu

    return on_tpu()


@jax.custom_vjp
def row_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [R, C], idx [...] int32 -> [..., C]. DMA-speed on TPU; plain
    XLA take elsewhere (CPU interpret mode would be pathologically slow)."""
    flat = idx.reshape(-1)
    if _on_tpu():
        out = _row_gather_impl(table, flat)
    else:
        out = jnp.take(table, flat, axis=0)
    return out.reshape(*idx.shape, table.shape[1])


def _rg_fwd(table, idx):
    return row_gather(table, idx), (idx, table.shape[0])


def _rg_bwd(res, g):
    idx, num_rows = res
    from .pallas_scatter import scatter_add_matmul

    gf = g.reshape(-1, g.shape[-1])
    if 128 % g.shape[-1] == 0:
        dt = scatter_add_matmul(idx.reshape(-1), gf, num_rows)
    else:
        dt = jnp.zeros((num_rows, g.shape[-1]), gf.dtype).at[idx.reshape(-1)].add(gf)
    return dt, None


row_gather.defvjp(_rg_fwd, _rg_bwd)
