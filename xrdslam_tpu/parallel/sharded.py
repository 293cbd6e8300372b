"""Multi-chip sharding for SLAM: data-parallel rays over a device mesh.

The reference has no multi-device story (SURVEY.md §2.8: DataParallel pinned
to one GPU). The TPU-native scaling axis for neural SLAM is **rays**: each
tracking/mapping iteration renders thousands of independent rays whose only
coupling is the shared map parameters. We shard the ray batch over a ``dp``
mesh axis and replicate map parameters; XLA then inserts one all-reduce
(psum) of the parameter gradients per step over ICI — exactly the
"annotate shardings, let XLA insert collectives" recipe.

Entry points:
  * ``CoSLAMConfig(devices=N)`` (CLI: ``--xrdslam.algorithm.devices``) —
    the production path: every track/map/super-step program constrains its
    per-iteration ray batches to ``P('dp')`` (algorithms/coslam.py
    ``_shard_rays``) and replicates parameters, covering tracking AND
    mapping. Parity vs single-device is asserted by
    tests/test_parallel.py on the 8-device CPU mesh.
  * ``build_sharded_map_step`` — a standalone mesh-sharded mapping step
    used by unit tests and the multichip dry-run.

A tensor-parallel axis over encoding levels/channels is deliberately NOT
provided: the scene models here are 10-50 MB — far below per-chip HBM —
and splitting features would trade one gather for per-step collectives on
the activation path. Rays are the only axis with useful parallel width.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.optimizers import GroupOptimizers


def make_mesh(n_devices: int, axis_names: Tuple[str, ...] = ("dp",), shape: Tuple[int, ...] = None) -> Mesh:
    devs = jax.devices()
    if len(devs) < n_devices:
        devs = jax.devices("cpu")
    devs = devs[:n_devices]
    if shape is None:
        shape = (n_devices,)
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def replicate(mesh: Mesh, tree):
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def shard_rays(mesh: Mesh, tree):
    """Shard leading (ray) axis over 'dp'."""
    s = NamedSharding(mesh, P("dp"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def build_sharded_map_step(model, opt_cfgs: Dict[str, Any], mesh: Mesh, n_iters: int = 1):
    """A jitted, mesh-sharded mapping train step.

    Ray batches arrive sharded over 'dp'; model params are replicated.
    Returns (step_fn, placement helpers). The returned function runs
    ``n_iters`` Adam iterations as a lax.scan, just like the single-chip
    map step.
    """
    groups = list(opt_cfgs.keys())
    opt = GroupOptimizers(opt_cfgs)

    def step(params, opt_state, rays_o, rays_d, target_s, target_d, key):
        def body(carry, k):
            params, opt_state = carry

            def loss_fn(p):
                loss, _ = model.get_loss(p, k, rays_o, rays_d, target_s, target_d, None, True, True)
                return loss

            loss, g = jax.value_and_grad(loss_fn)(params)
            params, opt_state = opt.update(g, opt_state, params)
            return (params, opt_state), loss

        keys = jax.random.split(key, n_iters)
        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), keys)
        return params, opt_state, losses

    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("dp"))
    step_jit = jax.jit(
        step,
        in_shardings=(rep, rep, shard, shard, shard, shard, rep),
        out_shardings=(rep, rep, rep),
    )
    return step_jit, opt
