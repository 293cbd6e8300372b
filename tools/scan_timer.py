"""Trustworthy TPU timing over the axon tunnel.

block_until_ready over axon does not reliably synchronize, and dispatch can
block on backpressure — per-call host timing is garbage. The only sound
measurement: run the op N times inside ONE jitted lax.scan with a carried
data dependency, fetch a dependent scalar (device_get round trip), and
subtract the single-run baseline:

    per_iter_ms = (T(scan_n) - T(scan_1)) / (n - 1)

This removes dispatch, RTT, and compile noise, and the carry forces true
serialization on device.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _scan_program(f: Callable, n: int):
    """Build jit(lambda *args: scan of f n times with forced dependency)."""

    def run(*args):
        def body(carry, _):
            out = f(*args, carry)
            # fold a tiny piece of the output back into the carry so XLA
            # cannot DCE or parallelize iterations
            leaf = jax.tree_util.tree_leaves(out)[0]
            dep = jnp.sum(leaf.reshape(-1)[:8]).astype(jnp.float32)
            return carry + dep * 1e-30, None

        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return carry

    return jax.jit(run)


def measure(f: Callable, *args, n: int = 10, reps: int = 3) -> float:
    """Per-iteration ms of ``f(*args, carry_scalar)`` on device.

    f must accept a trailing scalar carry (add it to something, or ignore it
    in a way that still consumes it — e.g. ``x + carry * 0`` defeats CSE).
    """
    p1 = _scan_program(f, 1)
    pn = _scan_program(f, n)
    # compile + warm both
    float(p1(*args))
    float(pn(*args))

    def best(prog):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(prog(*args))  # scalar fetch = true round trip
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, tn = best(p1), best(pn)
    return (tn - t1) / (n - 1) * 1e3


def measure_program(f: Callable, *args, reps: int = 5) -> float:
    """Wall ms of a full program launch incl. one fetch round trip, minus
    the measured bare round-trip time."""
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf))

    @jax.jit
    def _noop(x):
        return x + 1.0

    nop_in = jnp.zeros((), jnp.float32)
    float(_noop(nop_in))
    rtts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(_noop(nop_in))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)

    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        ts.append(time.perf_counter() - t0)
    return (min(ts) - rtt) * 1e3
