"""Instrument one NICE-SLAM track_step on office data: per-iter loss +
pose delta, to find why tracking is inert (round-3 ATE-90cm bug)."""
import copy
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from xrdslam_tpu.common.frame import Frame
    from xrdslam_tpu.common.synthetic import SyntheticDataset
    from xrdslam_tpu.configs.registry import algorithm_configs

    ds = SyntheticDataset(n_frames=60, height=340, width=600, scene="office")
    ds.load_cache("/tmp/acc_cache_60_600x340.npz")

    cfg = copy.deepcopy(algorithm_configs["nice-slam"]).xrdslam
    a = cfg.algorithm
    bound = ds.bounds.tolist()
    a.mapping_bound = bound
    a.marching_cubes_bound = bound
    a.max_keyframes = 64
    algo = a.setup(camera=ds.get_camera())
    print("cfg: tracking_sample", a.tracking_sample, "iters", a.tracking_n_iters,
          "lr", a.optimizers["tracking_pose"]["optimizer"].lr,
          "edges", a.tracking_Hedge, a.tracking_Wedge, flush=True)

    _, rgb0, d0, c2w0 = ds[0]
    f0 = Frame(fid=0, rgb=rgb0, depth=d0, init_pose=c2w0, gt_pose=c2w0, rot_rep="quat")
    t0 = time.time()
    algo.do_mapping(f0)
    algo.add_keyframe(f0)
    algo.estimate_c2w_list = [f0.get_pose()]
    print(f"first map in {time.time()-t0:.0f}s", flush=True)
    # a few more mapping frames at GT poses so the map is decent
    for i in range(1, 5):
        _, rgb, d, c2w = ds[i]
        fi = Frame(fid=i, rgb=rgb, depth=d, init_pose=c2w, gt_pose=c2w, rot_rep="quat")
        algo.do_mapping(fi)
        algo.add_keyframe(fi)
    print(f"5 maps in {time.time()-t0:.0f}s", flush=True)

    from xrdslam_tpu.ops import lie_np

    _, rgb5, d5, c2w5 = ds[5]
    _, _, _, c2w4 = ds[4]
    t_gt, q_gt = lie_np.matrix_to_pose_vec(np.asarray(c2w5, np.float32), rot_rep="quat")
    t_in, q_in = lie_np.matrix_to_pose_vec(np.asarray(c2w4, np.float32), rot_rep="quat")

    for name, (tt, qq) in [("init=prev(c2w4)", (t_in, q_in)),
                           ("init=gt(c2w5)", (t_gt, q_gt))]:
        pose0 = jnp.concatenate([jnp.asarray(tt), jnp.asarray(qq)])
        best, best_loss = algo._track_step(
            algo.model_params, jnp.asarray(rgb5), jnp.asarray(d5), pose0,
            jax.random.PRNGKey(3))
        best = np.asarray(best)
        print(f"{name}: best_loss {float(best_loss):.6f} "
              f"dt_vs_init {np.linalg.norm(best[:3]-np.asarray(tt))*100:.3f} cm "
              f"dt_vs_gt {np.linalg.norm(best[:3]-t_gt)*100:.3f} cm "
              f"quat_moved {np.linalg.norm(best[3:]-np.asarray(qq)):.5f}", flush=True)

    # raw loss values at perturbed poses: is there gradient signal?
    import jax

    def probe_loss(pose_vec, key):
        # replicate the loss NICE-SLAM tracking uses, via the jitted step
        # with 1 iteration is hard; instead call model.get_loss directly
        from xrdslam_tpu.ops import lie as lie_ops
        from xrdslam_tpu.ops.sampling import sample_pixels

        H, W = algo.camera.height, algo.camera.width
        k1, k2 = jax.random.split(key)
        u, v = sample_pixels(k1, a.tracking_sample, H, W, a.tracking_Hedge, a.tracking_Wedge)
        ui, vi = u.astype(jnp.int32), v.astype(jnp.int32)
        depth = jnp.asarray(d5)
        rgb = jnp.asarray(rgb5)
        td = depth[vi, ui][:, None]
        ts = rgb[vi, ui]
        d_cam = algo._dirs[vi, ui]
        R = lie_ops.quaternion_to_matrix(pose_vec[3:])
        rays_d = d_cam @ R.T
        rays_o = jnp.broadcast_to(pose_vec[:3], rays_d.shape)
        bnd = jnp.asarray(algo.model.bounding_box)
        t = (bnd[None] - rays_o[:, :, None]) / rays_d[:, :, None]
        t_exit = jnp.min(jnp.max(t, axis=2), axis=1)
        rm = (t_exit >= td[:, 0]).astype(jnp.float32)
        loss, parts = algo.model.get_loss(
            algo.model_params, k2, rays_o, rays_d, ts, td, rm, False, "color")
        return float(loss), float(rm.mean())

    key = jax.random.PRNGKey(0)
    gt_pose = jnp.concatenate([jnp.asarray(t_gt), jnp.asarray(q_gt)])
    for axis in range(3):
        for eps in [-0.02, -0.01, -0.005, 0.0, 0.005, 0.01, 0.02]:
            p = gt_pose.at[axis].add(eps)
            l, frac = probe_loss(p, key)
            print(f"probe t[{axis}]={eps*100:+5.1f} cm: loss {l:12.1f} rm_frac {frac:.3f}", flush=True)

    # depth-render bias at the exact GT pose
    from xrdslam_tpu.ops import lie as lie_ops
    from xrdslam_tpu.ops.sampling import sample_pixels

    H, W = algo.camera.height, algo.camera.width
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    u, v = sample_pixels(k1, 2000, H, W, a.tracking_Hedge, a.tracking_Wedge)
    ui, vi = u.astype(jnp.int32), v.astype(jnp.int32)
    depth = jnp.asarray(d5)
    td = depth[vi, ui][:, None]
    d_cam = algo._dirs[vi, ui]
    R = lie_ops.quaternion_to_matrix(gt_pose[3:])
    rays_d = d_cam @ R.T
    rays_o = jnp.broadcast_to(gt_pose[:3], rays_d.shape)
    out = algo.model.render_rays(algo.model_params, k2, rays_o, rays_d, td, "color")
    dd = np.asarray(out["depth"]) - np.asarray(td[:, 0])
    unc = np.asarray(out["uncertainty"])
    print(f"depth residual at GT: mean {dd.mean()*100:+.3f} cm  median {np.median(dd)*100:+.3f} cm  "
          f"std {dd.std()*100:.3f} cm", flush=True)
    print(f"uncertainty: median {np.median(unc):.3e}  p5 {np.percentile(unc,5):.3e}  "
          f"p95 {np.percentile(unc,95):.3e}", flush=True)
    w = 1.0 / np.sqrt(unc + 1e-10)
    print(f"weighted-residual mean {np.mean(dd*w)/np.mean(w)*100:+.3f} cm  "
          f"top1pct weight share {np.sort(w)[-20:].sum()/w.sum():.3f}", flush=True)


if __name__ == "__main__":
    main()
