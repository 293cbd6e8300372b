"""Backend-aware ``pallas_call``: interpret mode off-TPU.

The Pallas TPU kernels in this package (rasterizer, hashgrid, scatter)
only lower on real TPU backends; JAX's CPU backend supports them solely
through interpret mode. This wrapper picks ``interpret=True`` whenever
the default backend is not a TPU so the same library/CLI surface runs
everywhere (CI, laptops) without per-call-site plumbing. An explicit
``interpret=`` kwarg always wins.
"""
from __future__ import annotations

import jax
from jax.experimental import pallas as pl


def pallas_call(*args, **kwargs):
    if "interpret" not in kwargs:
        kwargs["interpret"] = jax.default_backend() not in ("tpu", "axon", "gpu")
    return pl.pallas_call(*args, **kwargs)
