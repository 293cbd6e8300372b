"""Piecewise profile of one Co-SLAM tracking iteration (triplane path).

Uses tools/scan_timer.measure (in-program scan with data dependency — the
only trustworthy timing over the axon tunnel).

Run: python tools/profile_track.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from scan_timer import measure


def main():
    print("devices:", jax.devices(), flush=True)
    from xrdslam_tpu.common.camera import Camera
    from xrdslam_tpu.models.joint_encoding import JointEncoding, JointEncodingConfig
    from xrdslam_tpu.ops import lie
    from xrdslam_tpu.ops.sampling import camera_ray_dirs, coslam_z_vals, sample_pixels

    H, W = 340, 600
    NR = 1024  # tracking rays
    cam = Camera(fx=300.0, fy=300.0, cx=W / 2, cy=H / 2, height=H, width=W)
    bb = np.array([[-4, 4], [-4, 4], [-4, 4]], np.float32)
    cfg = JointEncodingConfig(encoding="triplane")
    model = JointEncoding(cfg, cam, bb)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 4.0, (H, W)).astype(np.float32))
    dirs = camera_ray_dirs(cam)
    key = jax.random.PRNGKey(1)
    r0 = jnp.zeros(3, jnp.float32)
    t0 = jnp.zeros(3, jnp.float32)

    NS = cfg.training_n_sample_d + cfg.training_n_range_d  # 43
    N = NR * NS

    # a) sampling: pixels + image gathers
    def samp(carry):
        k = jax.random.fold_in(key, (carry * 0).astype(jnp.int32))
        u, v = sample_pixels(k, NR, H, W, 20, 20)
        ui, vi = u.astype(jnp.int32), v.astype(jnp.int32)
        return depth[vi, ui][:, None] + carry, rgb[vi, ui], dirs[vi, ui]
    print(f"a sampling+img gathers:   {measure(samp, n=20):7.2f} ms", flush=True)

    # b) z_vals (incl. sort + perturb)
    td = depth.reshape(-1)[:NR][:, None]
    def zv(carry):
        return coslam_z_vals(key, td + carry, NR, cfg.cam_near, cfg.cam_far,
                             cfg.training_n_sample_d, cfg.training_range_d,
                             cfg.training_n_range_d, True)
    print(f"b z_vals (sort+perturb):  {measure(zv, n=20):7.2f} ms", flush=True)

    # c) encode fwd at tracking scale
    pts = jnp.asarray(rng.uniform(0.05, 0.95, (N, 3)).astype(np.float32))
    from xrdslam_tpu.ops.triplane import triplane_encode
    def enc(carry):
        return triplane_encode(params["embed_fn"]["table"], pts + carry * 0, model.tp_spec)
    print(f"c encode fwd {N} pts:   {measure(enc, n=20):7.2f} ms", flush=True)

    # d) full query_raw fwd (encode + oneblob + 2 MLPs)
    def qr(carry):
        return model.query_raw(params, pts.reshape(NR, NS, 3) + carry * 0)
    print(f"d query_raw fwd:          {measure(qr, n=20):7.2f} ms", flush=True)

    # e) full loss fwd (render + losses)
    ts = rgb.reshape(-1, 3)[:NR]
    d_cam = dirs.reshape(-1, 3)[:NR]
    def lf(carry):
        loss, _ = model.get_loss(params, key, jnp.zeros((NR, 3)) + carry * 0, d_cam,
                                 ts, td, None, False, False)
        return loss
    print(f"e loss fwd:               {measure(lf, n=20):7.2f} ms", flush=True)

    # f) loss + pose grad (the real tracking iteration compute)
    def lg(carry):
        def loss_fn(p):
            Rm = lie.axis_angle_to_matrix(p["r"])
            rays_d = d_cam @ Rm.T
            rays_o = jnp.broadcast_to(p["t"], rays_d.shape)
            loss, _ = model.get_loss(params, key, rays_o, rays_d, ts, td, None, False, False)
            return loss
        return jax.value_and_grad(loss_fn)({"r": r0 + carry, "t": t0})
    print(f"f loss+pose grad:         {measure(lg, n=20):7.2f} ms", flush=True)

    # g) loss + pose grad with tables pre-packed outside (hoist check):
    # approximated by timing encode fwd with pack hoisted — pack alone:
    from xrdslam_tpu.ops.triplane import _pack_patch
    def pk(carry):
        t = params["embed_fn"]["table"]
        return [_pack_patch(t[f"s{s}"][p] + carry * 0) for s in range(2) for p in range(3)]
    print(f"g pack alone:             {measure(pk, n=20):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
