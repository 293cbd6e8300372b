"""Microbench for the packed hash-grid encoder design (round 3).

Protocol notes (hard-won): under the axon tunnel, (a) block_until_ready
can return before execution finishes — force with float(jnp.sum(r));
(b) per-dispatch latency is ~16-30 ms, so small ops must be measured by
in-program repetition: run K iterations inside one jit (index offset per
iteration defeats CSE) and report the K2-K1 slope.

Run: python tools/bench_hashpack.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

K1, K2 = 4, 36


def slope_ms(make_fn, *args):
    """make_fn(K) -> jitted fn(*args); returns per-iteration ms via slope."""
    ts = {}
    for k in (K1, K2):
        f = make_fn(k)
        r = f(*args)
        _ = float(jnp.sum(r))  # force compile+run
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            r = f(*args)
        _ = float(jnp.sum(r))
        ts[k] = (time.perf_counter() - t0) / reps * 1e3
    return (ts[K2] - ts[K1]) / (K2 - K1)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    N = 176128  # 4096 rays x 43 samples
    T = 65536

    idx = jnp.asarray(rng.integers(0, T, N).astype(np.int32))

    # P1: packed patch-row gather, one level
    for rows, width, dt in ((T, 16, jnp.float32), (T, 16, jnp.bfloat16),
                            (16384, 16, jnp.float32), (294912, 32, jnp.float32)):
        tbl = jnp.asarray(rng.normal(size=(rows, width)).astype(np.float32)).astype(dt)

        def mk(K, rows=rows):
            def f(tbl, idx):
                def body(i, acc):
                    r = jnp.take(tbl, (idx + i) % rows, axis=0)
                    return acc + jnp.sum(r.astype(jnp.float32))
                return lax.fori_loop(0, K, body, 0.0)
            return jax.jit(f)

        ms = slope_ms(mk, tbl, idx)
        print(f"P1 gather [{rows},{width}] {np.dtype(dt).name} x {N}: {ms:7.3f} ms "
              f"({ms*1e6/N:6.2f} ns/row)", flush=True)

    # P2: segment_sum [N,16] -> segs
    vals = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
    for segs in (T, 16384):
        def mk(K, segs=segs):
            def f(vals, idx):
                def body(i, acc):
                    s = jax.ops.segment_sum(vals + i, (idx + i) % segs, num_segments=segs)
                    return acc + jnp.sum(s)
                return lax.fori_loop(0, K, body, 0.0)
            return jax.jit(f)
        ms = slope_ms(mk, vals, idx)
        print(f"P2 segsum [{N},16] -> {segs}: {ms:7.3f} ms", flush=True)

    # P3: old path — one level as 8 corner-row gathers of [T, 2]
    tbl2 = jnp.asarray(rng.normal(size=(T, 2)).astype(np.float32))
    idx8 = jnp.asarray(rng.integers(0, T, 8 * N).astype(np.int32))

    def mk3(K):
        def f(tbl, idx):
            def body(i, acc):
                r = jnp.take(tbl, (idx + i) % T, axis=0)
                return acc + jnp.sum(r)
            return lax.fori_loop(0, K, body, 0.0)
        return jax.jit(f)

    ms = slope_ms(mk3, tbl2, idx8)
    print(f"P3 gather [T,2] x {8*N} (one level, 8 corners): {ms:7.3f} ms", flush=True)

    # P5: trilinear weight+reduce math on gathered rows [N,L,8,F]
    rows16 = jnp.asarray(rng.normal(size=(16, N, 16)).astype(np.float32))
    w16 = jnp.asarray(rng.normal(size=(16, N, 8)).astype(np.float32))

    def mk5(K):
        def f(rows, w):
            def body(i, acc):
                r = (rows + i).reshape(16, N, 8, 2)
                out = jnp.einsum("lncf,lnc->lnf", r, w + i)
                return acc + jnp.sum(out)
            return lax.fori_loop(0, K, body, 0.0)
        return jax.jit(f)

    ms = slope_ms(mk5, rows16, w16)
    print(f"P5 16-level einsum lerp: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
