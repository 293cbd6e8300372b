"""Breakdown of the Co-SLAM mapping iteration cost on real TPU.

Times, at office0 bench scale (4096 rays x 43 samples, 16-level hashgrid):
  A. full mapping step (loss + grads to tables/MLP/pose)
  B. encode forward only
  C. encode forward+backward (tables)
  D. matmul-scatter alone at the same entry count
  E. trilerp fwd+bwd alone
Prints ms per item; run on the TPU host (python tools/profile_mapping.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from xrdslam_tpu.models.joint_encoding import JointEncoding, JointEncodingConfig
from xrdslam_tpu.ops import hashgrid_fast as hf
from xrdslam_tpu.ops.pallas_scatter import scatter_add_matmul

N_RAYS, N_SAMP = 4096, 43
N = N_RAYS * N_SAMP


def timeit(f, *args, n=20):
    r = f(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, r)
    # force a scalar fetch to defeat async dispatch over axon
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    _ = float(jnp.sum(leaf))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = JointEncodingConfig()
    from xrdslam_tpu.common.camera import Camera
    cam = Camera(fx=300.0, fy=300.0, cx=300.0, cy=170.0, height=340, width=600)
    bb = np.array([[-3.0, 3.0], [-3.0, 3.0], [-3.0, 3.0]], np.float32)
    model = JointEncoding(cfg, cam, bb)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)

    rng = np.random.default_rng(0)
    # normalized coords in [0,1] like _encode's input
    pts = jnp.asarray(rng.uniform(0.05, 0.95, (N, 3)).astype(np.float32))
    spec = model.spec

    # B: encode forward
    @jax.jit
    def enc_fwd(tab, p):
        return hf.encode(tab, p, spec, use_opt=True)

    tab = params["embed_fn"]["table"]
    print(f"B encode fwd:        {timeit(enc_fwd, tab, pts):8.2f} ms", flush=True)

    # C: encode fwd+bwd
    @jax.jit
    def enc_bwd(tab, p):
        return jax.grad(lambda t: jnp.sum(hf.encode(t, p, spec, use_opt=True) ** 2))(tab)

    print(f"C encode fwd+bwd:    {timeit(enc_bwd, tab, pts):8.2f} ms", flush=True)

    # D: scatter alone at hashgrid entry count (16 levels x 8 corners)
    n_entries = N * 8
    rows = spec.table_size
    idx = jnp.asarray(rng.integers(0, rows, n_entries).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(n_entries, 2)).astype(np.float32))

    @jax.jit
    def scat(i, gg):
        return scatter_add_matmul(i, gg, rows)

    per = timeit(scat, idx, g)
    print(f"D scatter 1 lvl:     {per:8.2f} ms  (x16 = {per*16:.1f})", flush=True)

    # A: full mapping-like loss step
    rays_o = jnp.asarray(rng.uniform(-1, 1, (N_RAYS, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(N_RAYS, 3)).astype(np.float32))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    target_d = jnp.asarray(rng.uniform(0.5, 3.0, (N_RAYS, 1)).astype(np.float32))
    target_s = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))

    ray_mask = jnp.ones((N_RAYS,), jnp.float32)

    @jax.jit
    def full(p, k):
        def loss_fn(pp):
            loss, _ = model.get_loss(pp, k, rays_o, rays_d, target_s, target_d,
                                     ray_mask, True, False)
            return loss
        return jax.grad(loss_fn)(p)

    print(f"A full map iter:     {timeit(full, params, key, n=10):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
