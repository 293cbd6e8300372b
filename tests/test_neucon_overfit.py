"""NeuralRecon CAN LEARN: overfit one synthetic fragment.

Round-2 item (VERDICT): the dense coarse-to-fine U-Net + ConvGRU redesign
must demonstrably fit data, not just produce shapes. GT TSDF comes from
the analytic synthetic scene SDF (common/synthetic.py), targets follow the
reference's training setup (neucon_network.py:249-300: per-level
pos-weighted occupancy BCE + log-L1 TSDF over occupied voxels, truncation
3 voxels).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from xrdslam_tpu.algorithms.neural_recon import NeuralReconConfig
from xrdslam_tpu.common.frame import Frame
from xrdslam_tpu.common.synthetic import SyntheticDataset, scene_sdf
from xrdslam_tpu.models.neucon import NeuConModelConfig


def _level_targets(mc, vol_origin):
    """Per-level dense (tsdf, occ) targets from the analytic scene SDF.
    Truncation = 3 voxels at each level's spacing (NeuralRecon's TSDF GT
    generation convention)."""
    tsdf_ts, occ_ts = [], []
    for i in range(mc.n_layer):
        interval = 2 ** (mc.n_layer - 1 - i)
        dim = mc.n_vox // interval
        ax = np.arange(dim, dtype=np.float32) * interval
        gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
        pts = np.stack([gx, gy, gz], -1).reshape(-1, 3) * mc.voxel_size + vol_origin
        sdf = scene_sdf(pts).reshape(dim, dim, dim)
        # fixed metric truncation (3 finest voxels) at EVERY level: scaling
        # the band with the level spacing makes the coarse occupancy target
        # all-ones, which zeroes the BCE pos-weight (n_all == n_p) and
        # leaves level-0 occupancy — the gate for all finer levels — free
        trunc = 3.0 * mc.voxel_size
        tsdf = np.clip(sdf / trunc, -1.0, 1.0).astype(np.float32)
        occ = (np.abs(tsdf) < 1.0).astype(np.float32)
        tsdf_ts.append(jnp.asarray(tsdf))
        occ_ts.append(jnp.asarray(occ))
    return tsdf_ts, occ_ts


def test_neucon_overfits_one_fragment():
    ds = SyntheticDataset(n_frames=5, height=48, width=64)
    mc = NeuConModelConfig(n_vox=32, voxel_size=0.15)
    cfg = NeuralReconConfig(
        mapping_window_size=4, min_angle=0.0, min_distance=0.0,
        max_depth=3.0, img_size_w=64, img_size_h=48, model=mc)
    algo = cfg.setup(camera=ds.get_camera())
    frames = []
    for i in range(len(ds)):
        _, rgb, depth, c2w = ds[i]
        frames.append(Frame(fid=i, rgb=rgb, depth=depth, init_pose=c2w, gt_pose=c2w))
    imgs, projs, vol_origin, origin_vox, aligned_T = algo._fragment_inputs(frames)
    tsdf_ts, occ_ts = _level_targets(mc, vol_origin)
    # at fragment scale the GT surface must actually be in the volume
    assert float(occ_ts[-1].mean()) > 0.01

    model = algo.model
    hiddens = []
    from xrdslam_tpu.models.neucon import OUT_CHANNELS
    for i in range(mc.n_layer):
        interval = 2 ** (mc.n_layer - 1 - i)
        dim = mc.n_vox // interval
        hiddens.append(jnp.zeros((dim, dim, dim, OUT_CHANNELS[i]), jnp.float32))

    imgs_j = jnp.asarray(imgs)
    projs_j = jnp.asarray(projs)
    org_j = jnp.asarray(vol_origin)
    at_j = jnp.asarray(aligned_T)

    opt = optax.adam(1e-3)
    opt_state = opt.init(model.params)

    @jax.jit
    def step(params, opt_state):
        loss, g = jax.value_and_grad(model.loss)(
            params, imgs_j, projs_j, org_j, hiddens, at_j, tsdf_ts, occ_ts)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    frag = jax.jit(model.fragment_step)

    def tsdf_err(params):
        tsdf, occ, _ = frag(params, imgs_j, projs_j, org_j, hiddens, at_j)
        m = occ_ts[-1]
        err = float(jnp.sum(jnp.abs(tsdf - tsdf_ts[-1]) * m) / jnp.sum(m))
        occ_acc = float((occ.astype(jnp.float32) == m).mean())
        return err, occ_acc

    err0, _ = tsdf_err(model.params)
    params = model.params
    losses = []
    for _ in range(80):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    err1, occ_acc1 = tsdf_err(params)
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.1 * losses[0], f"loss did not drop: {losses[0]} -> {losses[-1]}"
    assert err1 < 0.6 * err0, f"TSDF error did not drop: {err0} -> {err1}"
    assert occ_acc1 > 0.7, f"occupancy did not learn: acc {occ_acc1}"
