"""Microbench: paired-corner gathers and table-gradient splat alternatives.

Hypotheses (round 2 perf work):
  A. XLA gather cost on v5e is per-ROW, so storing a 2x2 corner patch per
     row (C -> 4C wide) cuts encode gather volume 4x.
  B. The scatter-free plane-gradient matmul (2*N*R^2*C FLOPs) can be beaten
     by sorting points into row-blocks and doing block-local matmuls
     (FLOPs / (R/tile)^2, plus one sort).

Run: python tools/bench_splat_gather.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, n=20):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    N = 176128  # 4096 rays x 43 samples
    R = 512
    C = 8

    # ---------------- A: gather row-width scaling --------------------
    rows = 294912  # 9 * 2^15 fast size
    idx = jnp.asarray(rng.integers(0, R * R - R - 2, N).astype(np.int32))
    for width in (8, 16, 32, 64):
        tbl = jnp.asarray(rng.normal(size=(rows, width)).astype(np.float32))
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        ms = timeit(f, tbl, idx)
        print(f"A gather [{rows},{width}] x {N}: {ms:7.2f} ms "
              f"({ms*1e6/N:6.1f} ns/row, {N*width*4/ms*1e3/1e9:6.1f} GB/s)", flush=True)

    # gather 4x fewer rows at 4x width == one patch-row per sample
    idx4 = idx[: N]
    tbl32 = jnp.asarray(rng.normal(size=(rows, 32)).astype(np.float32))
    f32_ = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    ms_paired = timeit(f32_, tbl32, idx4)
    tbl8 = jnp.asarray(rng.normal(size=(rows, 8)).astype(np.float32))
    idx_all = jnp.concatenate([idx, idx + 1, idx + R, idx + R + 1])
    ms_4rows = timeit(f32_, tbl8, idx_all)
    print(f"A2 4 rows of 8:  {ms_4rows:7.2f} ms  vs  1 row of 32: {ms_paired:7.2f} ms"
          f"  -> {ms_4rows/ms_paired:4.1f}x", flush=True)

    # ---------------- B: splat alternatives --------------------------
    u0 = jnp.asarray(rng.integers(0, R - 1, N).astype(np.int32))
    v0 = jnp.asarray(rng.integers(0, R - 1, N).astype(np.int32))
    fu = jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))
    fv = jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))

    def dense_w(u0_, fu_, R_):
        iota = jax.lax.broadcasted_iota(jnp.int32, (u0_.shape[0], R_), 1)
        return ((iota == u0_[:, None]) * (1 - fu_[:, None])
                + (iota == u0_[:, None] + 1) * fu_[:, None])

    # B0: current unrolled matmul splat
    def splat_matmul(u0, v0, fu, fv, g):
        A = dense_w(u0, fu, R)
        B = dense_w(v0, fv, R)
        Bb = B.astype(jnp.bfloat16)
        dP = [
            jax.lax.dot_general((A * g[:, k:k+1]).astype(jnp.bfloat16), Bb,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            for k in range(C)
        ]
        return jnp.stack(dP, -1)
    f0 = jax.jit(splat_matmul)
    ms0 = timeit(f0, u0, v0, fu, fv, g, n=5)
    ref = np.asarray(f0(u0, v0, fu, fv, g))
    print(f"B0 matmul splat (current):  {ms0:7.2f} ms", flush=True)

    # B1: segment_sum (XLA scatter-add) of 4 corners
    def splat_scatter(u0, v0, fu, fv, g):
        w00 = ((1 - fu) * (1 - fv))[:, None] * g
        w01 = ((1 - fu) * fv)[:, None] * g
        w10 = (fu * (1 - fv))[:, None] * g
        w11 = (fu * fv)[:, None] * g
        base = u0 * R + v0
        ids = jnp.concatenate([base, base + 1, base + R, base + R + 1])
        vals = jnp.concatenate([w00, w01, w10, w11], 0)
        out = jax.ops.segment_sum(vals, ids, num_segments=R * R)
        return out.reshape(R, R, C)
    f1 = jax.jit(splat_scatter)
    ms1 = timeit(f1, u0, v0, fu, fv, g, n=5)
    err = np.abs(np.asarray(f1(u0, v0, fu, fv, g)) - ref).max()
    print(f"B1 segment_sum splat:       {ms1:7.2f} ms (err {err:.2e})", flush=True)

    # B2: sort by row-block, then block-local matmuls
    TILE = 64
    NB = R // TILE  # row blocks

    def splat_sorted(u0, v0, fu, fv, g):
        blk = u0 // TILE
        order = jnp.argsort(blk)
        u0s, v0s, fus, fvs, gs = u0[order], v0[order], fu[order], fv[order], g[order]
        blks = blk[order]
        # pad each block to Nmax? simpler: reshape into NB equal chunks only
        # works if sorted blocks align to chunks -> they don't. Use masked
        # per-block matmuls over the full sorted array segmented by
        # searchsorted bounds, padded to a static max block size.
        Nmax = int(2.0 * N / NB)  # assume <2x imbalance
        starts = jnp.searchsorted(blks, jnp.arange(NB))
        out = jnp.zeros((R + 2, R, C), jnp.float32)
        local_rows = TILE + 1

        def per_block(b, out):
            s = starts[b]
            idxs = s + jnp.arange(Nmax)
            valid = (idxs < jnp.searchsorted(blks, b, side="right")) & (idxs < N)
            idxs = jnp.minimum(idxs, N - 1)
            ub = jnp.where(valid, u0s[idxs] - b * TILE, 0)
            vb = v0s[idxs]
            fub = jnp.where(valid, fus[idxs], 0.0)
            fvb = fvs[idxs]
            gb = g[order][idxs] * valid[:, None]
            iota = jax.lax.broadcasted_iota(jnp.int32, (Nmax, local_rows), 1)
            Ab = ((iota == ub[:, None]) * (1 - fub[:, None]) + (iota == ub[:, None] + 1) * fub[:, None])
            Ab = Ab * valid[:, None]
            Bb = dense_w(vb, fvb, R).astype(jnp.bfloat16)
            dP = [jax.lax.dot_general((Ab * gb[:, k:k+1]).astype(jnp.bfloat16), Bb,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
                  for k in range(C)]
            dPb = jnp.stack(dP, -1)  # [local_rows, R, C]
            return jax.lax.dynamic_update_slice(
                out, dPb + jax.lax.dynamic_slice(out, (b * TILE, 0, 0), (local_rows, R, C)),
                (b * TILE, 0, 0))
        out = jax.lax.fori_loop(0, NB, per_block, out)
        return out[:R]
    f2 = jax.jit(splat_sorted)
    ms2 = timeit(f2, u0, v0, fu, fv, g, n=5)
    err = np.abs(np.asarray(f2(u0, v0, fu, fv, g)) - ref).max()
    print(f"B2 sorted block splat:      {ms2:7.2f} ms (err {err:.2e})", flush=True)

    # B3: moment trick + segment_sum (1 row/point, 4C channels)
    def splat_moment(u0, v0, fu, fv, g):
        m = jnp.concatenate([g, g * fu[:, None], g * fv[:, None], g * (fu * fv)[:, None]], -1)
        base = u0 * R + v0
        M = jax.ops.segment_sum(m, base, num_segments=R * R).reshape(R, R, 4, C)
        m00, m10, m01, m11 = M[:, :, 0], M[:, :, 1], M[:, :, 2], M[:, :, 3]
        # dP[r,c] gets from source (r,c):   (1-fu)(1-fv) = m00 - m10 - m01 + m11
        #               source (r-1,c):     fu(1-fv)     = m10 - m11
        #               source (r,c-1):     (1-fu)fv     = m01 - m11
        #               source (r-1,c-1):   fu*fv        = m11
        d = m00 - m10 - m01 + m11
        d = d + jnp.pad((m10 - m11)[:-1], ((1, 0), (0, 0), (0, 0)))
        d = d + jnp.pad((m01 - m11)[:, :-1], ((0, 0), (1, 0), (0, 0)))
        d = d + jnp.pad(m11[:-1, :-1], ((1, 0), (1, 0), (0, 0)))
        return d
    f3 = jax.jit(splat_moment)
    ms3 = timeit(f3, u0, v0, fu, fv, g, n=5)
    err = np.abs(np.asarray(f3(u0, v0, fu, fv, g)) - ref).max()
    print(f"B3 moment segment_sum:      {ms3:7.2f} ms (err {err:.2e})", flush=True)


if __name__ == "__main__":
    main()
