"""Tile-based isotropic Gaussian rasterizer (Pallas TPU, custom VJP).

Replaces the reference's ``diff-gaussian-rasterization-w-depth`` CUDA
extension (reference: requirements.txt:3, used via
slam/model_components/gaussian_cloud_splatam.py:47-78). SplaTAM uses
*isotropic* gaussians (scalar ``log_scales``,
gaussian_cloud_splatam.py:330-334), so the screen-space footprint is a
circle — no 2D covariance — and one pass renders all 8 channels the
reference needs two rasterizer calls for: rgb(3), depth, silhouette
(alpha accumulation), depth^2, plus the final transmittance.

Pipeline:
  * Projection (XLA, differentiable): camera-frame means -> pixel centers
    (u, v), depth, screen sigma. OpenGL convention (-z forward).
  * Tile binning (host NumPy, rebuilt per optimization call): gaussians are
    depth-sorted globally, then assigned to 16x16-pixel tiles they overlap
    (3 sigma radius + margin, so the lists stay valid while poses/means
    move slightly within a jitted optimization scan). Fixed K gaussians per
    tile, nearest-first.
  * Forward kernel: one grid step per tile; alpha compositing over the
    tile's K gaussians in depth order, transmittance via
    exp(cumsum(log1p(-alpha))) (gradient-safe at saturation).
  * Backward kernel: recomputes alpha/T, forms the suffix-sum term
    S_i = sum_{j>i} g.c_j a_j T_j via reverse cumsum, and reduces
    per-gaussian gradients (d opacity, d u, d v, d sigma, d channels) over
    the tile's pixels; global accumulation uses ops.pallas_scatter
    (no scatter op on the device).

The VJP boundary sits at the *projected* gaussian level, so pose and means
gradients flow through the XLA projection automatically — exactly what
SplaTAM's tracking (camera_grad) and mapping (gaussians_grad) need
(slam_helpers_splatam.py:263-292).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .pl_compat import pallas_call as _pallas_call
from jax.experimental.pallas import tpu as pltpu

from .pallas_scatter import scatter_add_matmul

TILE = 16  # pixels per tile side
ALPHA_MAX = 0.99
N_CH = 8  # rgb(3), depth, sil, depth_sq, spare, spare

# Tiles rendered per Pallas grid step. The per-tile math is ~5 us but a
# grid step costs ~43 us measured on v5e (launch + DMA latency dominate at
# [1, 16, K] block sizes), so batching TB tiles into one step amortizes
# the fixed cost. The kernel loop over the block is a *static* Python
# unroll — same math per tile, identical results for any TB.
import os as _os

_TB = max(int(_os.environ.get("XRDSLAM_RASTER_TB", "1")), 1)


class TileBinning(NamedTuple):
    """Static-shape per-tile gaussian lists (host-built)."""

    tile_ids: np.ndarray  # [n_tiles, K] gaussian indices (depth-sorted)
    tile_mask: np.ndarray  # [n_tiles, K] validity
    n_tiles_x: int
    n_tiles_y: int


def bin_gaussians(
    u: np.ndarray, v: np.ndarray, depth: np.ndarray, radius: np.ndarray, alive: np.ndarray,
    height: int, width: int, k_per_tile: int = 256, margin: float = 8.0, max_span: int = 6,
) -> TileBinning:
    """Assign depth-sorted gaussians to the 16x16 tiles they overlap.

    Fully vectorized (1-core host): expand (gaussian, tile) pairs with a
    capped per-gaussian tile span (SplaTAM gaussians are ~1 px by
    construction — scale = depth/f projects to ~1 px), lexsort by
    (tile, depth rank) and fill fixed-K lists.
    """
    ntx = (width + TILE - 1) // TILE
    nty = (height + TILE - 1) // TILE
    n_tiles = ntx * nty
    valid = alive & (depth > 0.01) & np.isfinite(u) & np.isfinite(v) & (radius > 0)
    order = np.argsort(np.where(valid, depth, np.inf), kind="stable")
    order = order[valid[order]]
    ids_out = np.zeros((n_tiles, k_per_tile), np.int32)
    mask_out = np.zeros((n_tiles, k_per_tile), bool)
    if order.size == 0:
        return TileBinning(ids_out, mask_out, ntx, nty)
    uu, vv, rr = u[order], v[order], radius[order] + margin
    inside = (uu + rr >= 0) & (uu - rr < width) & (vv + rr >= 0) & (vv - rr < height)
    order, uu, vv, rr = order[inside], uu[inside], vv[inside], rr[inside]
    x0 = np.clip(((uu - rr) // TILE).astype(np.int64), 0, ntx - 1)
    x1 = np.clip(((uu + rr) // TILE).astype(np.int64), 0, ntx - 1)
    y0 = np.clip(((vv - rr) // TILE).astype(np.int64), 0, nty - 1)
    y1 = np.clip(((vv + rr) // TILE).astype(np.int64), 0, nty - 1)
    x1 = np.minimum(x1, x0 + max_span - 1)
    y1 = np.minimum(y1, y0 + max_span - 1)
    dx = np.arange(max_span)
    tx = x0[:, None, None] + dx[None, None, :]
    ty = y0[:, None, None] + dx[None, :, None]
    ok = (tx <= x1[:, None, None]) & (ty <= y1[:, None, None])
    tiles = (ty * ntx + tx).reshape(len(order), -1)
    ranks = np.broadcast_to(np.arange(len(order))[:, None], tiles.shape)
    gids = np.broadcast_to(order[:, None], tiles.shape)
    okf = ok.reshape(len(order), -1)
    tiles, ranks, gids = tiles[okf], ranks[okf], gids[okf]
    sort = np.lexsort((ranks, tiles))
    tiles, gids = tiles[sort], gids[sort]
    # position within each tile
    starts = np.searchsorted(tiles, np.arange(n_tiles), side="left")
    pos = np.arange(len(tiles)) - starts[tiles]
    keep = pos < k_per_tile
    ids_out[tiles[keep], pos[keep]] = gids[keep]
    mask_out[tiles[keep], pos[keep]] = True
    return TileBinning(ids_out, mask_out, ntx, nty)


def bin_gaussians_device(
    u, v, depth, radius, alive, height: int, width: int,
    k_per_tile: int = 256, margin: float = 8.0, max_span: int = 6,
):
    """Device-side tile binning (jittable): same semantics as
    :func:`bin_gaussians` but built with one sort + one unique-index
    scatter, so binning runs inside the per-frame device program instead
    of a host round trip (fetch projections -> numpy lexsort -> upload:
    ~300 ms/frame on the 1-core host, the round-1 SplaTAM bottleneck).

    Returns (tile_ids [n_tiles, K] int32, tile_mask [n_tiles, K] bool).
    """
    ntx = (width + TILE - 1) // TILE
    nty = (height + TILE - 1) // TILE
    n_tiles = ntx * nty
    G = u.shape[0]
    S = max_span * max_span
    valid = (alive > 0) & (depth > 0.01) & jnp.isfinite(u) & jnp.isfinite(v) & (radius > 0)
    rr = radius + margin
    inside = (u + rr >= 0) & (u - rr < width) & (v + rr >= 0) & (v - rr < height)
    valid = valid & inside
    # depth rank (front-to-back compositing order)
    order = jnp.argsort(jnp.where(valid, depth, jnp.inf))  # [G]
    uu = u[order]
    vv = v[order]
    rro = rr[order]
    val_o = valid[order]
    x0 = jnp.clip(((uu - rro) // TILE).astype(jnp.int32), 0, ntx - 1)
    x1 = jnp.clip(((uu + rro) // TILE).astype(jnp.int32), 0, ntx - 1)
    y0 = jnp.clip(((vv - rro) // TILE).astype(jnp.int32), 0, nty - 1)
    y1 = jnp.clip(((vv + rro) // TILE).astype(jnp.int32), 0, nty - 1)
    x1 = jnp.minimum(x1, x0 + max_span - 1)
    y1 = jnp.minimum(y1, y0 + max_span - 1)
    dx = jnp.arange(max_span, dtype=jnp.int32)
    tx = x0[:, None, None] + dx[None, None, :]
    ty = y0[:, None, None] + dx[None, :, None]
    ok = (tx <= x1[:, None, None]) & (ty <= y1[:, None, None]) & val_o[:, None, None]
    tiles = jnp.where(ok, ty * ntx + tx, n_tiles).reshape(-1)  # [G*S]
    ranks = jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32)[:, None], (G, S)).reshape(-1)
    gids = jnp.broadcast_to(order[:, None].astype(jnp.int32), (G, S)).reshape(-1)
    # one sort by (tile, depth rank); rank order is preserved within a tile
    assert (n_tiles + 1) * G < 2**31, "tile-sort key overflows int32"
    key = tiles * G + ranks
    sort_idx = jnp.argsort(key)
    tiles_s = tiles[sort_idx]
    gids_s = gids[sort_idx]
    # position within each tile
    starts = jnp.searchsorted(tiles_s, jnp.arange(n_tiles, dtype=jnp.int32))
    pos = jnp.arange(G * S, dtype=jnp.int32) - starts[jnp.clip(tiles_s, 0, n_tiles - 1)].astype(jnp.int32)
    keep = (tiles_s < n_tiles) & (pos >= 0) & (pos < k_per_tile)
    # out-of-range dests are dropped; kept dests are unique by construction
    dest = jnp.where(keep, tiles_s * k_per_tile + pos, n_tiles * k_per_tile)
    flat_ids = jnp.zeros(n_tiles * k_per_tile, jnp.int32).at[dest].set(
        gids_s, mode="drop", unique_indices=True)
    flat_mask = jnp.zeros(n_tiles * k_per_tile, jnp.bool_).at[dest].set(
        keep, mode="drop", unique_indices=True)
    return (flat_ids.reshape(n_tiles, k_per_tile),
            flat_mask.reshape(n_tiles, k_per_tile))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _pixel_grid(tile_idx, ntx):
    """Tile pixel coordinates as [P, 1] columns (Mosaic needs all-2D values;
    1-D vectors in outer broadcasts crash the AOT compiler)."""
    ty = tile_idx // ntx
    tx = tile_idx % ntx
    lin = jax.lax.broadcasted_iota(jnp.int32, (TILE * TILE, 1), 0)
    px = (lin % TILE).astype(jnp.float32) + (tx * TILE).astype(jnp.float32)
    py = (lin // TILE).astype(jnp.float32) + (ty * TILE).astype(jnp.float32)
    return px, py  # [P, 1]


def _alphas(gu, gv, gsig, gop, gmask, px, py):
    """alpha [P, K]; gaussian attributes are [1, K] rows, pixels [P, 1]."""
    du = px - gu
    dv = py - gv
    inv2s2 = 0.5 / jnp.maximum(gsig * gsig, 1e-12)
    gauss = jnp.exp(-(du * du + dv * dv) * inv2s2)
    alpha = jnp.clip(gop * gauss, 0.0, ALPHA_MAX)
    return jnp.where(gmask, alpha, 0.0)


def _cumsum_scan(x, exclusive=False):
    """Exact f32 inclusive/exclusive cumulative sum along axis 1 (lanes) via
    a Hillis-Steele doubling scan on pltpu.roll. Mosaic has no cumsum
    lowering, and a triangular matmul runs at bf16 on the MXU (precision
    hints are not honored in-kernel) — catastrophic for log-transmittance.
    """
    k = x.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = x
    d = 1
    while d < k:
        rolled = pltpu.roll(s, d, axis=1)
        s = s + jnp.where(cols >= d, rolled, 0.0)
        d *= 2
    if exclusive:
        rolled = pltpu.roll(s, 1, axis=1)
        s = jnp.where(cols >= 1, rolled, 0.0)
    return s


def _suffix_sum(x):
    """suffix[k] = sum_{j>k} x[j] = total - inclusive_cumsum (lax.rev is not
    lowerable in Mosaic, so no flipping)."""
    total = jnp.sum(x, axis=1, keepdims=True)
    return total - _cumsum_scan(x, exclusive=False)


def _transmittance(alpha):
    log1m = jnp.log1p(-alpha)
    return jnp.exp(_cumsum_scan(log1m, exclusive=True))


def _fwd_kernel(g_ref, out_ref, *, ntx: int, tb: int):
    """g_ref [tb, 16, K]: per-tile gaussian data transposed (attribute rows:
    u, v, sigma, opacity, mask, ch0..7, pad). out [tb, N_CH, P] —
    CHANNEL-major: a pixel-major [P, 8] block would put 8 in the lane
    dimension and waste 15/16 of every vector register/store (Mosaic
    pads the minor dim to 128 lanes); channel-major keeps the 256 pixels
    on lanes and the 8 channels on sublanes, a perfect f32 tile.

    ``tb`` tiles per grid step (static unroll) amortize the ~43 us fixed
    grid-step cost over tb tiles."""
    base = pl.program_id(0) * tb
    for t in range(tb):
        px, py = _pixel_grid(base + t, ntx)
        g = g_ref[t]  # [16, K]
        gu, gv, gsig, gop = g[0:1, :], g[1:2, :], g[2:3, :], g[3:4, :]
        gmask = g[4:5, :] > 0.5
        alpha = _alphas(gu, gv, gsig, gop, gmask, px, py)  # [P, K]
        T = _transmittance(alpha)
        w = alpha * T  # [P, K]
        ch = g[5 : 5 + N_CH, :]  # [N_CH, K]
        out_ref[t] = jax.lax.dot_general(
            ch, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


def _bwd_kernel(g_ref, gout_ref, dg_ref, *, ntx: int, tb: int):
    """Gradients wrt per-tile gaussian data (transposed layout [16, K]).
    gout arrives CHANNEL-major [tb, N_CH, P] for the same lane-utilization
    reason as the forward's output; ``tb`` tiles per step as in the
    forward."""
    base = pl.program_id(0) * tb
    for t in range(tb):
        px, py = _pixel_grid(base + t, ntx)
        g = g_ref[t]  # [16, K]
        gu, gv, gsig, gop = g[0:1, :], g[1:2, :], g[2:3, :], g[3:4, :]
        gmask = g[4:5, :] > 0.5
        ch = g[5 : 5 + N_CH, :]  # [C, K]
        du = px - gu  # [P, K]
        dv = py - gv
        sig2 = jnp.maximum(gsig * gsig, 1e-12)  # [1, K]
        inv2s2 = 0.5 / sig2
        r2 = du * du + dv * dv
        gauss = jnp.exp(-r2 * inv2s2)
        raw_alpha = gop * gauss
        clamped = raw_alpha > ALPHA_MAX
        alpha = jnp.where(gmask, jnp.clip(raw_alpha, 0.0, ALPHA_MAX), 0.0)
        T = _transmittance(alpha)
        w = alpha * T
        gpx = gout_ref[t]  # [C, P]
        # dch[c, k] = sum_p gpx[c, p] * w[p, k]
        dch = jax.lax.dot_general(
            gpx, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # gdotc[p, k] = sum_c gpx[c, p] * ch[c, k]
        gdotc = jax.lax.dot_general(
            gpx, ch, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        contrib = gdotc * w
        suffix = _suffix_sum(contrib)
        dalpha = T * gdotc - suffix / jnp.maximum(1.0 - alpha, 1e-6)
        dalpha = jnp.where(clamped | ~gmask, 0.0, dalpha)
        # chain: alpha = op * G, G = exp(-r^2/(2 sig^2));
        # dG/dgu = G * du/sig^2, dG/dgv = G * dv/sig^2, dG/dsig = G * r^2/sig^3
        dgauss = dalpha * gop
        dG_common = dgauss * gauss
        K = g.shape[1]
        # assemble by concatenation: value-level .at[].set lowers to an
        # (unsupported) scatter in Mosaic
        zero_row = jnp.zeros((1, K), jnp.float32)
        dg = jnp.concatenate(
            [
                jnp.sum(dG_common * du, axis=0, keepdims=True) / sig2,
                jnp.sum(dG_common * dv, axis=0, keepdims=True) / sig2,
                jnp.sum(dG_common * r2, axis=0, keepdims=True) / (sig2 * jnp.maximum(gsig, 1e-6)),
                jnp.sum(dalpha * gauss, axis=0, keepdims=True),
                zero_row,
                dch,
                jnp.zeros((16 - 5 - N_CH, K), jnp.float32),
            ],
            axis=0,
        )
        dg_ref[t] = dg


# ---------------------------------------------------------------------------
# host-facing entry
# ---------------------------------------------------------------------------

def _pack_tile_data(u, v, sigma, opacity, channels, tile_ids, tile_mask):
    """Gather per-tile gaussian attributes -> [n_tiles, K, 16]."""
    data = jnp.concatenate(
        [
            u[:, None], v[:, None], sigma[:, None], opacity[:, None],
            jnp.ones_like(u[:, None]),  # placeholder for mask
            channels,
            jnp.zeros((u.shape[0], 16 - 5 - channels.shape[1]), u.dtype),
        ],
        -1,
    )
    tiled = jnp.take(data, tile_ids, axis=0)  # [T, K, 16]
    tiled = tiled.at[:, :, 4].set(tile_mask.astype(u.dtype))
    return tiled.transpose(0, 2, 1)  # [T, 16, K] (attributes in sublanes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def rasterize(u, v, sigma, opacity, channels, tile_ids, tile_mask, ntx, nty):
    """Rasterize projected gaussians to [H_pad, W_pad, N_CH].

    Args:
        u, v: [G] pixel centers. sigma: [G] screen-space std (px).
        opacity: [G]. channels: [G, N_CH] per-gaussian channel values.
        tile_ids [T,K] int32 / tile_mask [T,K] bool: host-built binning
            (held fixed across an optimization call; int/bool cotangents
            are float0).
    """
    return _raster_fwd_impl(u, v, sigma, opacity, channels, (tile_ids, tile_mask), ntx, nty)


def _pad_tiles(arrs, n_tiles: int, tb: int):
    """Zero-pad the tile axis to a multiple of ``tb`` (padded tiles have
    mask rows = 0 so they render/grad to zeros and are sliced off)."""
    if n_tiles % tb == 0:
        return arrs, n_tiles
    n_pad = ((n_tiles + tb - 1) // tb) * tb
    out = []
    for a in arrs:
        pad = jnp.zeros((n_pad - n_tiles,) + a.shape[1:], a.dtype)
        out.append(jnp.concatenate([a, pad], 0))
    return out, n_pad


def _fwd_pallas(tiled, ntx: int):
    """[T, 16, K] -> per-tile rendered blocks [T, N_CH, P]."""
    n_tiles, _, K = tiled.shape
    tb = _TB
    (tiled,), n_pad = _pad_tiles((tiled,), n_tiles, tb)
    out = _pallas_call(
        functools.partial(_fwd_kernel, ntx=ntx, tb=tb),
        grid=(n_pad // tb,),
        in_specs=[
            pl.BlockSpec((tb, 16, K), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, N_CH, TILE * TILE), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, N_CH, TILE * TILE), jnp.float32),
    )(tiled)
    return out[:n_tiles]


def _bwd_pallas(tiled, gt, ntx: int):
    """([T, 16, K], [T, N_CH, P]) -> per-tile attribute grads [T, 16, K]."""
    n_tiles, _, K = tiled.shape
    tb = _TB
    (tiled, gt), n_pad = _pad_tiles((tiled, gt), n_tiles, tb)
    dg = _pallas_call(
        functools.partial(_bwd_kernel, ntx=ntx, tb=tb),
        grid=(n_pad // tb,),
        in_specs=[
            pl.BlockSpec((tb, 16, K), lambda i: (i, 0, 0)),
            pl.BlockSpec((tb, N_CH, TILE * TILE), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, 16, K), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 16, K), jnp.float32),
    )(tiled, gt)
    return dg[:n_tiles]


def _raster_fwd_impl(u, v, sigma, opacity, channels, tile_ids_mask, ntx, nty):
    tile_ids, tile_mask = tile_ids_mask
    tiled = _pack_tile_data(u, v, sigma, opacity, channels, tile_ids, tile_mask)
    out = _fwd_pallas(tiled, ntx)
    # [T, C, P] -> [H_pad, W_pad, C]
    out = out.reshape(nty, ntx, N_CH, TILE, TILE).transpose(0, 3, 1, 4, 2).reshape(nty * TILE, ntx * TILE, N_CH)
    return out


def _raster_fwd(u, v, sigma, opacity, channels, tile_ids, tile_mask, ntx, nty):
    out = _raster_fwd_impl(u, v, sigma, opacity, channels, (tile_ids, tile_mask), ntx, nty)
    return out, (u, v, sigma, opacity, channels, tile_ids, tile_mask)


def _raster_bwd(ntx, nty, res, gout):
    u, v, sigma, opacity, channels, tile_ids, tile_mask = res
    tiled = _pack_tile_data(u, v, sigma, opacity, channels, tile_ids, tile_mask)
    n_tiles = tiled.shape[0]
    gt = gout.reshape(nty, TILE, ntx, TILE, N_CH).transpose(0, 2, 4, 1, 3).reshape(n_tiles, N_CH, TILE * TILE)
    dg = _bwd_pallas(tiled, gt, ntx)
    # accumulate per-gaussian over tiles: scatter-free matmul kernel
    flat_idx = tile_ids.reshape(-1)
    flat_dg = (dg.transpose(0, 2, 1) * tile_mask[..., None]).reshape(-1, 16)
    acc = scatter_add_matmul(flat_idx, flat_dg, u.shape[0])  # [G, 16]
    du = acc[:, 0]
    dv = acc[:, 1]
    dsig = acc[:, 2]
    dop = acc[:, 3]
    dch = acc[:, 5 : 5 + N_CH]
    ft0 = jax.dtypes.float0
    d_ids = np.zeros(tile_ids.shape, ft0)
    d_mask = np.zeros(tile_mask.shape, ft0)
    return du, dv, dsig, dop, dch, d_ids, d_mask


rasterize.defvjp(_raster_fwd, _raster_bwd)


# ---------------------------------------------------------------------------
# multi-chip: tile-row-sharded rasterization (SURVEY.md §2.8 — SplaTAM's
# per-pixel work shards over image tiles the way ray algorithms shard rays)
# ---------------------------------------------------------------------------
#
# The Pallas kernels derive a tile's pixel origin from the GLOBAL
# program_id, which restarts per shard under shard_map. Rather than
# plumbing a tile offset into the kernels, shards split the image by TILE
# ROWS and shift the gaussians' v coordinate by the shard's pixel-row
# origin — the per-shard kernel then renders a correctly-registered
# sub-image with its local ids. Per-gaussian gradients are partial sums
# over each shard's tiles and psum over 'dp' in the explicit VJP.

def _dp_specs(n):
    from jax.sharding import PartitionSpec as P

    return tuple([P()] * n)


def rasterize_dp(mesh, u, v, sigma, opacity, channels, tile_ids, tile_mask,
                 ntx, nty):
    """Sharded :func:`rasterize`: tile rows split over the mesh 'dp' axis.

    Semantically identical to the single-device path (same compositing,
    same gradients up to f32 reduction order); tile_ids/tile_mask arrive
    as the usual [nty*ntx, K] global binning and are padded to a
    row-divisible count here.
    """
    d = mesh.shape["dp"]
    nty_pad = ((nty + d - 1) // d) * d
    T, K = tile_ids.shape
    pad_t = nty_pad * ntx - T
    if pad_t:
        tile_ids = jnp.concatenate(
            [tile_ids, jnp.zeros((pad_t, K), tile_ids.dtype)])
        tile_mask = jnp.concatenate(
            [tile_mask, jnp.zeros((pad_t, K), tile_mask.dtype)])
    rows_per = nty_pad // d
    out = _raster_dp(mesh, ntx, rows_per)(
        u, v, sigma, opacity, channels, tile_ids, tile_mask)
    return out  # [nty_pad*TILE, ntx*TILE, N_CH]; caller slices to H, W


@functools.lru_cache(maxsize=None)
def _raster_dp(mesh, ntx: int, rows_per: int):
    import inspect

    try:
        from jax import shard_map as _sm
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm
    # rep/vma checking must be off (the body is a Pallas call, opaque to
    # the replication checker); the kwarg was renamed check_rep->check_vma
    _kw = ("check_vma" if "check_vma" in inspect.signature(_sm).parameters
           else "check_rep")

    def shard_map(f, **kwargs):
        return _sm(f, **{**kwargs, _kw: False})

    from jax.sharding import PartitionSpec as P

    def fwd_body(u, v, sigma, opacity, channels, ti, tm):
        voff = (jax.lax.axis_index("dp") * (rows_per * TILE)).astype(v.dtype)
        return _raster_fwd_impl(u, v - voff, sigma, opacity, channels,
                                (ti, tm), ntx, rows_per)

    fwd_sm = shard_map(
        fwd_body, mesh=mesh,
        in_specs=_dp_specs(5) + (P("dp"), P("dp")),
        out_specs=P("dp"))

    def bwd_body(u, v, sigma, opacity, channels, ti, tm, gt_local):
        voff = (jax.lax.axis_index("dp") * (rows_per * TILE)).astype(v.dtype)
        tiled = _pack_tile_data(u, v - voff, sigma, opacity, channels, ti, tm)
        n_tiles = tiled.shape[0]
        gt = gt_local.reshape(rows_per, TILE, ntx, TILE, N_CH).transpose(
            0, 2, 4, 1, 3).reshape(n_tiles, N_CH, TILE * TILE)
        dg = _bwd_pallas(tiled, gt, ntx)
        flat_idx = ti.reshape(-1)
        flat_dg = (dg.transpose(0, 2, 1) * tm[..., None]).reshape(-1, 16)
        acc = scatter_add_matmul(flat_idx, flat_dg, u.shape[0])  # [G, 16]
        return jax.lax.psum(acc, "dp")

    bwd_sm = shard_map(
        bwd_body, mesh=mesh,
        in_specs=_dp_specs(5) + (P("dp"), P("dp"), P("dp")),
        out_specs=P())

    @jax.custom_vjp
    def fn(u, v, sigma, opacity, channels, tile_ids, tile_mask):
        return fwd_sm(u, v, sigma, opacity, channels, tile_ids, tile_mask)

    def fn_fwd(u, v, sigma, opacity, channels, tile_ids, tile_mask):
        out = fwd_sm(u, v, sigma, opacity, channels, tile_ids, tile_mask)
        return out, (u, v, sigma, opacity, channels, tile_ids, tile_mask)

    def fn_bwd(res, gout):
        u, v, sigma, opacity, channels, tile_ids, tile_mask = res
        acc = bwd_sm(u, v, sigma, opacity, channels, tile_ids, tile_mask, gout)
        ft0 = jax.dtypes.float0
        return (acc[:, 0], acc[:, 1], acc[:, 2], acc[:, 3],
                acc[:, 5 : 5 + N_CH],
                np.zeros(tile_ids.shape, ft0), np.zeros(tile_mask.shape, ft0))

    fn.defvjp(fn_fwd, fn_bwd)
    return fn
