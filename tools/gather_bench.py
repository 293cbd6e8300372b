"""Gather-throughput probe: XLA gather cost vs table size on TPU v5e.

Measured results (2.1M random indices, 30-iter amortized):
    rows    4096 x8 : ~1750 ns/row  (pathological small-table lowering)
    rows    8192 x8 : ~2060 ns/row
    rows   16384 x8 :   4.7 ns/row
    rows   65536 x8 :   4.6 ns/row
    rows  131072 x8 :   4.7 ns/row
    rows  147456 x8 :   4.7 ns/row
    rows  262144 x8 :  12.8 ns/row  (2^18 anomaly)
    rows  270336 x8 :  37.9 ns/row
    rows  294912 x8 :   3.9 ns/row  (9 * 2^15)
    rows  524288 x8 :   3.9 ns/row
    rows 1048576 x8 :   4.5 ns/row

ops/triplane.py pads plane tables accordingly (_good_rows).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def timeit(f, *args, n=30):
    r = f(*args); r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n): r = f(*args)
    _ = float(jnp.sum(r[..., :1]))
    return (time.perf_counter()-t0)/n*1e3

rng = np.random.default_rng(0)
N = 2_101_248
for RR, C in [(4096,8),(16384,8),(65536,8),(131072,8),(262144,8),(294912,8),(524288,8),(1048576,8)]:
    tbl = jnp.asarray(rng.normal(size=(RR, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, min(RR,262144), N).astype(np.int32))
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    ms = timeit(f, tbl, idx)
    print(f"table {RR:8d}x{C} ({RR*C*4/1e6:6.1f} MB): {ms:7.2f} ms ({ms*1e6/N:.1f} ns/row)", flush=True)
