"""Manual middle-stage mapping loop with per-iter loss/grad-norm prints to
find the exact iteration the NICE-SLAM field NaNs."""
import copy
import sys

import numpy as np


def main():
    import os

    import jax
    import jax.numpy as jnp
    import optax
    if os.environ.get("DIAG_DEBUG_NANS"):
        jax.config.update("jax_debug_nans", True)

    from xrdslam_tpu.common.synthetic import SyntheticDataset
    from xrdslam_tpu.configs.registry import algorithm_configs
    from xrdslam_tpu.ops import lie as lie_ops
    from xrdslam_tpu.ops import lie_np
    from xrdslam_tpu.ops.sampling import sample_pixels

    ds = SyntheticDataset(n_frames=60, height=340, width=600, scene="office")
    ds.load_cache("/tmp/acc_cache_60_600x340.npz")

    cfg = copy.deepcopy(algorithm_configs["nice-slam"]).xrdslam
    a = cfg.algorithm
    bound = ds.bounds.tolist()
    a.mapping_bound = bound
    a.marching_cubes_bound = bound
    algo = a.setup(camera=ds.get_camera())
    model = algo.model

    _, rgb0, d0, c2w0 = ds[0]
    H, W = algo.camera.height, algo.camera.width
    rgbj, dj = jnp.asarray(rgb0), jnp.asarray(d0)
    c2wj = jnp.asarray(c2w0)

    stage = sys.argv[1] if len(sys.argv) > 1 else "middle"
    lr = 0.1 * a.mapping_lr_first_factor  # middle-stage first-map lr
    print(f"stage {stage} lr {lr}", flush=True)

    params = algo.model_params
    train = {"grid_middle": params["grid_middle"],
             "decoder": params["decoder"]}
    opt = optax.multi_transform(
        {"grid": optax.adam(lr),
         "dec": optax.chain(optax.clip_by_global_norm(10.0), optax.adam(0.005))},
        {"grid_middle": "grid", "decoder": "dec"})
    opt_state = opt.init(train)

    bnd = jnp.asarray(model.bounding_box)

    @jax.jit
    def step(train, opt_state, key):
        k1, k2 = jax.random.split(key)
        u, v = sample_pixels(k1, 1000, H, W, 0, 0)
        ui, vi = u.astype(jnp.int32), v.astype(jnp.int32)
        td = dj[vi, ui][:, None]
        ts = rgbj[vi, ui]
        d_cam = algo._dirs[vi, ui]
        rays_d = d_cam @ c2wj[:3, :3].T
        rays_o = jnp.broadcast_to(c2wj[:3, 3], rays_d.shape)
        t = (bnd[None] - rays_o[:, :, None]) / rays_d[:, :, None]
        t_exit = jnp.min(jnp.max(t, axis=2), axis=1)
        rm = (t_exit >= td[:, 0]).astype(jnp.float32)

        def loss_fn(tr):
            mp = {**params, **tr}
            loss, parts = model.get_loss(mp, k2, rays_o, rays_d, ts, td, rm, True, stage)
            return loss, parts

        (loss, parts), g = jax.value_and_grad(loss_fn, has_aux=True)(train)
        gn = {k: optax.global_norm({k: v}) for k, v in g.items()}
        upd, opt_state = opt.update(g, opt_state)
        train = optax.apply_updates(train, upd)
        return train, opt_state, loss, parts, gn

    key = jax.random.PRNGKey(0)
    prev = train
    prev_key = None
    for i in range(60):
        key, k = jax.random.split(key)
        prev = train
        prev_key = k
        train, opt_state, loss, parts, gn = step(train, opt_state, k)
        bad = (not np.isfinite(float(loss))) or any(
            not np.isfinite(float(v)) for v in gn.values())
        if i < 10 or i % 5 == 0 or bad:
            pstr = " ".join(f"{k}={float(v):.1f}" for k, v in parts.items())
            gstr = " ".join(f"g[{k}]={float(v):.2e}" for k, v in gn.items())
            print(f"it {i:3d} loss {float(loss):14.1f}  {pstr}  {gstr}", flush=True)
        if bad:
            break

    # per-part gradient autopsy at the pre-NaN state
    def part_grad(part_name):
        def loss_fn(tr):
            k1, k2 = jax.random.split(prev_key)
            u, v = sample_pixels(k1, 1000, H, W, 0, 0)
            ui, vi = u.astype(jnp.int32), v.astype(jnp.int32)
            td = dj[vi, ui][:, None]
            ts = rgbj[vi, ui]
            d_cam = algo._dirs[vi, ui]
            rays_d = d_cam @ c2wj[:3, :3].T
            rays_o = jnp.broadcast_to(c2wj[:3, 3], rays_d.shape)
            t = (bnd[None] - rays_o[:, :, None]) / rays_d[:, :, None]
            t_exit = jnp.min(jnp.max(t, axis=2), axis=1)
            rm = (t_exit >= td[:, 0]).astype(jnp.float32)
            mp = {**params, **tr}
            _, parts = model.get_loss(mp, k2, rays_o, rays_d, ts, td, rm, True, stage)
            return parts[part_name]

        g = jax.grad(loss_fn)(prev)
        return {k: float(optax.global_norm({k: v})) for k, v in g.items()}

    for pn in ("depth_loss", "geo_loss"):
        try:
            print(f"autopsy grad[{pn}]: {part_grad(pn)}", flush=True)
        except KeyError:
            pass

    # same autopsy under jit: does XLA's fused backward NaN where eager is ok?
    def total_loss(tr):
        k1, k2 = jax.random.split(prev_key)
        u, v = sample_pixels(k1, 1000, H, W, 0, 0)
        ui, vi = u.astype(jnp.int32), v.astype(jnp.int32)
        td = dj[vi, ui][:, None]
        ts = rgbj[vi, ui]
        d_cam = algo._dirs[vi, ui]
        rays_d = d_cam @ c2wj[:3, :3].T
        rays_o = jnp.broadcast_to(c2wj[:3, 3], rays_d.shape)
        t = (bnd[None] - rays_o[:, :, None]) / rays_d[:, :, None]
        t_exit = jnp.min(jnp.max(t, axis=2), axis=1)
        rm = (t_exit >= td[:, 0]).astype(jnp.float32)
        mp = {**params, **tr}
        loss, _ = model.get_loss(mp, k2, rays_o, rays_d, ts, td, rm, True, stage)
        return loss

    g_e = jax.grad(total_loss)(prev)
    g_j = jax.jit(jax.grad(total_loss))(prev)
    for nm, g in (("eager", g_e), ("jit", g_j)):
        print(f"autopsy total grad [{nm}]: "
              f"{{k: {[f'{k}={float(optax.global_norm({k: v})):.3e}' for k, v in g.items()]}}}", flush=True)

    # forward intermediates at the pre-NaN state
    k1, k2 = jax.random.split(prev_key)
    u, v = sample_pixels(k1, 1000, H, W, 0, 0)
    ui, vi = u.astype(jnp.int32), v.astype(jnp.int32)
    td = dj[vi, ui][:, None]
    d_cam = algo._dirs[vi, ui]
    rays_d = d_cam @ c2wj[:3, :3].T
    rays_o = jnp.broadcast_to(c2wj[:3, 3], rays_d.shape)
    mp = {**params, **prev}
    out = model.render_rays(mp, k2, rays_o, rays_d, td, stage)
    occ = np.asarray(out["occ_raw"])
    z = np.asarray(out["z_vals"])
    print(f"occ finite {np.isfinite(occ).mean():.4f} min {np.nanmin(occ):.2e} max {np.nanmax(occ):.2e}", flush=True)
    print(f"z min {z.min():.3f} max {z.max():.3f} dup_fr {np.mean(np.diff(z,axis=1)==0):.4f}", flush=True)
    w = np.asarray(out["weights"]) ; print(f"w finite {np.isfinite(w).mean():.4f} sum med {np.median(w.sum(1)):.3f}", flush=True)


if __name__ == "__main__":
    main()
