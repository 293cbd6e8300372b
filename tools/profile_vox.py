"""Profile Vox-Fusion per-frame pieces on the chip at smoke scale:
track program, device insert, map program, fused program.

Run: python tools/profile_vox.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from xrdslam_tpu.common.synthetic import SyntheticDataset
from xrdslam_tpu.engine.optimizers import AdamOptimizerConfig as A
from xrdslam_tpu.algorithms.voxfusion import VoxFusionConfig
from xrdslam_tpu.models.sparse_voxel import SparseVoxelConfig


def force(x):
    return float(jnp.sum(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
        x, jnp.asarray(0.0))))


def timeit(fn, *args, n=4):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ds = SyntheticDataset(n_frames=4, height=120, width=160)
    for i in range(len(ds)):
        ds[i]
    cam = ds.get_camera()
    cfg = VoxFusionConfig(
        rot_rep="axis_angle", tracking_n_iters=30, mapping_n_iters=15,
        mapping_first_n_iters=30, mapping_window_size=5, mapping_sample=1024,
        tracking_sample=1024, ray_batch_size=3072, max_keyframes=16,
        model=SparseVoxelConfig(),
        optimizers={
            "decoder": {"optimizer": A(lr=5e-3), "scheduler": None},
            "embeddings": {"optimizer": A(lr=5e-3), "scheduler": None},
            "tracking_pose": {"optimizer": A(lr=1e-2), "scheduler": None},
            "mapping_pose": {"optimizer": A(lr=1e-3), "scheduler": None},
        })
    algo = cfg.setup(camera=cam)
    _, rgb, depth, c2w = ds[0]
    rgbj = jnp.asarray(rgb)
    depthj = jnp.asarray(depth)
    t = jnp.asarray(c2w[:3, 3])
    r = jnp.zeros(3, jnp.float32)

    maps = algo._insert_jit(algo.maps, depthj, t, r)
    print(f"n_vox after first insert: {int(maps['n_voxels'])}", flush=True)
    ms = timeit(lambda m: algo._insert_jit(m, depthj, t, r), maps)
    print(f"insert: {ms:8.1f} ms", flush=True)

    ms = timeit(lambda: algo._track_step(algo.model_params, maps, rgbj, depthj, t, r, jax.random.PRNGKey(0)))
    print(f"track (30 iters): {ms:8.1f} ms", flush=True)

    wn = cfg.mapping_window_size
    images = jnp.tile(jnp.concatenate([rgbj, depthj[..., None]], -1)[None], (wn, 1, 1, 1))
    poses = jnp.tile(jnp.concatenate([t, r])[None], (wn, 1))
    fn = algo._map_variant(wn, cfg.mapping_n_iters, True)
    sub = {"decoder": algo.model_params["decoder"], "embeddings": algo.model_params["embeddings"]}
    ms = timeit(lambda: fn(sub, algo.model_opt_state, maps, images, poses,
                           jnp.asarray(wn, jnp.int32), jax.random.PRNGKey(0)))
    print(f"map (15 iters, BA): {ms:8.1f} ms", flush=True)

    import functools
    fused = jax.jit(functools.partial(algo._fused_raw, n_frames=wn,
                                      n_iters=cfg.mapping_n_iters,
                                      optimize_pose=True, do_kf=True))
    win = jnp.zeros((wn - 1,), jnp.int32)
    ms = timeit(lambda: fused(algo.model_params, algo.model_opt_state, maps,
                              algo.kf_images, algo.kf_pose, rgbj, depthj, win,
                              jnp.asarray(wn, jnp.int32), t, r, t, r,
                              jax.random.PRNGKey(0), jnp.asarray(0, jnp.int32)))
    print(f"fused frame: {ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
