"""Round-2 profiling: per-program wall time for the triplane Co-SLAM bench
path on the real TPU, plus component ablations.

Times (office0 bench scale, triplane encoding):
  1. track_step: 10 iters x 1024 rays (the jitted tracking program)
  2. map_step:   10 iters x 4096 rays (the jitted mapping program)
  3. encode fwd only at mapping scale (4096*43 pts)
  4. loss+grad wrt POSE only (one iteration, tracking scale)
  5. loss+grad wrt tables+mlp+pose (one iteration, mapping scale)
  6. one tracking iteration as its own program (scan overhead check)

Run: python tools/profile_r2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, n=10):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    from xrdslam_tpu.algorithms.coslam import CoSLAMConfig
    from xrdslam_tpu.common.camera import Camera
    from xrdslam_tpu.common.mesher import MesherConfig
    from xrdslam_tpu.engine.optimizers import AdamOptimizerConfig
    from xrdslam_tpu.models.joint_encoding import JointEncodingConfig

    H, W = 340, 600
    cam = Camera(fx=300.0, fy=300.0, cx=W / 2, cy=H / 2, height=H, width=W)
    bound = [[-4.0, 4.0], [-4.0, 4.0], [-4.0, 4.0]]
    opts = {
        "decoder": {"optimizer": AdamOptimizerConfig(lr=1e-2)},
        "embed_fn": {"optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15)},
        "tracking_pose_r": {"optimizer": AdamOptimizerConfig(lr=1e-3)},
        "tracking_pose_t": {"optimizer": AdamOptimizerConfig(lr=1e-3)},
        "mapping_pose_r": {"optimizer": AdamOptimizerConfig(lr=1e-3, accum_step=5)},
        "mapping_pose_t": {"optimizer": AdamOptimizerConfig(lr=1e-3, accum_step=5)},
    }
    cfg = CoSLAMConfig(
        separate_LR=True, rot_rep="axis_angle",
        tracking_n_iters=10, mapping_n_iters=10, mapping_first_n_iters=200,
        mapping_sample=2048, tracking_sample=1024, min_sample_pixels=100,
        tracking_Wedge=20, tracking_Hedge=20,
        mapping_bound=bound, marching_cubes_bound=bound, max_keyframes=16,
        mesher=MesherConfig(resolution=64),
        model=JointEncodingConfig(encoding="triplane"),
        optimizers=opts,
    )
    algo = cfg.setup(camera=cam)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 4.0, (H, W)).astype(np.float32))
    t0v = jnp.zeros(3, jnp.float32)
    r0v = jnp.zeros(3, jnp.float32)
    key = jax.random.PRNGKey(0)

    # warm the kf table a bit
    algo.kf_count = 8

    t = timeit(lambda: algo._track_step(algo.model_params, rgb, depth, t0v, r0v, key))
    print(f"1 track_step (10 it):       {t:8.1f} ms", flush=True)

    t = timeit(lambda: algo._get_map_step(algo._cur_cap())(
        algo.model_params, algo.model_opt_state, algo.kf_rays, algo.kf_pose_t,
        algo.kf_pose_r, jnp.asarray(8, jnp.int32), rgb, depth, t0v, r0v, key))
    print(f"2 map_step (10 it):         {t:8.1f} ms", flush=True)

    # 3: encode fwd at mapping scale
    model = algo.model
    N = 4096 * 43
    pts = jnp.asarray(rng.uniform(0.05, 0.95, (N, 3)).astype(np.float32))
    tab = algo.model_params["embed_fn"]["table"]

    from xrdslam_tpu.ops.triplane import triplane_encode
    enc = jax.jit(lambda t_, p: triplane_encode(t_, p, model.tp_spec))
    t = timeit(enc, tab, pts)
    print(f"3 tp encode fwd {N} pts:  {t:8.2f} ms", flush=True)

    # 3b: encode fwd+bwd tables
    encb = jax.jit(lambda t_, p: jax.grad(
        lambda tt: jnp.sum(triplane_encode(tt, p, model.tp_spec) ** 2))(t_))
    t = timeit(encb, tab, pts)
    print(f"3b tp encode fwd+bwd tab:   {t:8.2f} ms", flush=True)

    # 3c: encode fwd + bwd x only
    encx = jax.jit(lambda t_, p: jax.grad(
        lambda pp: jnp.sum(triplane_encode(t_, pp, model.tp_spec) ** 2))(p))
    t = timeit(encx, tab, pts)
    print(f"3c tp encode fwd+bwd x:     {t:8.2f} ms", flush=True)

    # 4: one-iteration pose-grad program at tracking scale
    dirs = algo._dirs
    def one_track_iter(params, rv, tv, k):
        k1, k2 = jax.random.split(k)
        from xrdslam_tpu.ops.sampling import sample_pixels
        from xrdslam_tpu.ops import lie
        u, v = sample_pixels(k1, 1024, H, W, 20, 20)
        ui, vi = u.astype(jnp.int32), v.astype(jnp.int32)
        td = depth[vi, ui][:, None]
        ts = rgb[vi, ui]
        d_cam = dirs[vi, ui]
        def loss_fn(p):
            Rm = lie.axis_angle_to_matrix(p["r"])
            rays_d = d_cam @ Rm.T
            rays_o = jnp.broadcast_to(p["t"], rays_d.shape)
            loss, _ = model.get_loss(params, k2, rays_o, rays_d, ts, td, None, False, False)
            return loss
        return jax.value_and_grad(loss_fn)({"r": rv, "t": tv})
    f4 = jax.jit(one_track_iter)
    t = timeit(f4, algo.model_params, r0v, t0v, key)
    print(f"4 one track iter (program): {t:8.2f} ms", flush=True)

    # 5: one mapping iteration: loss+grad wrt tables+mlp (4096 rays)
    def one_map_iter(params, k):
        k1, k2 = jax.random.split(k)
        from xrdslam_tpu.ops.sampling import sample_pixels
        u, v = sample_pixels(k1, 4096, H, W)
        ui, vi = u.astype(jnp.int32), v.astype(jnp.int32)
        td = depth[vi, ui][:, None]
        ts = rgb[vi, ui]
        d_cam = dirs[vi, ui]
        def loss_fn(p):
            loss, _ = model.get_loss(p, k2, jnp.zeros_like(d_cam), d_cam, ts, td, None, True, False)
            return loss
        return jax.value_and_grad(loss_fn)(params)
    f5 = jax.jit(one_map_iter)
    t = timeit(f5, algo.model_params, key)
    print(f"5 one map iter (program):   {t:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
