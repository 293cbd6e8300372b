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
        interpret = jax.default_backend() not in ("tpu", "axon", "gpu")
        if not interpret:
            # the axon plugin registers a TPU backend even when tests pin
            # jax_default_device to CPU — kernels would then lower for a
            # device they never run on (hashgrid_fast.on_tpu has the same
            # check)
            dd = jax.config.jax_default_device
            interpret = dd is not None and getattr(dd, "platform", "tpu") not in ("tpu", "gpu")
        kwargs["interpret"] = interpret
    return pl.pallas_call(*args, **kwargs)
