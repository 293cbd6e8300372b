"""NeuralRecon model + algorithm tests (CPU, tiny volumes)."""
import jax
import jax.numpy as jnp
import numpy as np

from xrdslam_tpu.models.neucon import (NeuCon, NeuConModelConfig,
                                       back_project, backbone2d_apply,
                                       backbone2d_init, convgru_apply,
                                       convgru_init, unet3d_apply,
                                       unet3d_init)


def test_backbone_pyramid_shapes():
    params = backbone2d_init(jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (2, 64, 80, 3)).astype(np.float32))
    f4, f8, f16 = backbone2d_apply(params, imgs)
    assert f4.shape == (2, 16, 20, 24)
    assert f8.shape == (2, 8, 10, 40)
    assert f16.shape == (2, 4, 5, 80)
    assert np.isfinite(np.asarray(f4)).all()


def test_back_project_center_voxel():
    """A voxel at the optical axis samples the image center feature."""
    V, h, w, C = 1, 16, 16, 4
    feats = jnp.asarray(np.arange(V * h * w * C, dtype=np.float32).reshape(V, h, w, C))
    K = np.array([[10.0, 0, 7.5, 0], [0, 10.0, 7.5, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    vox = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, -1.0]])  # front / behind
    out, count = back_project(vox, feats, jnp.asarray(K)[None])
    out, count = np.asarray(out), np.asarray(count)
    assert count[0] == 1 and count[1] == 0
    # pixel (7.5, 7.5): average of the 4 center texels
    ref = np.asarray(feats[0, 7:9, 7:9].reshape(4, C).mean(0))
    np.testing.assert_allclose(out[0, :C], ref, rtol=1e-5)
    np.testing.assert_allclose(out[1, :C], 0.0)


def test_unet3d_and_gru_shapes():
    p = unet3d_init(jax.random.PRNGKey(1), cin=13, cr=0.5)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(16, 16, 16, 13)),
                    jnp.float32)
    y = unet3d_apply(p, x)
    assert y.shape == (16, 16, 16, 48)
    g = convgru_init(jax.random.PRNGKey(2), hidden=48, cin=48)
    h = convgru_apply(g, jnp.zeros((16, 16, 16, 48)), y)
    assert h.shape == (16, 16, 16, 48)
    assert np.isfinite(np.asarray(h)).all()


def test_neuralrecon_pipeline_smoke(tmp_path):
    """Fragment pipeline end to end on a tiny synthetic sequence: keyframe
    gating, fragment assembly, jitted coarse-to-fine step, global volume
    writeback, meshing path (random weights — machinery, not quality)."""
    from xrdslam_tpu.algorithms.neural_recon import NeuralReconConfig
    from xrdslam_tpu.common.synthetic import SyntheticDataset
    from xrdslam_tpu.pipeline.slam import (MapperConfig, SLAMPipelineConfig,
                                           TrackerConfig)

    ds = SyntheticDataset(n_frames=8, height=48, width=64)
    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=1, render_freq=-1,
                              use_relative_pose=False,
                              save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=100),
        algorithm=NeuralReconConfig(
            mapping_window_size=3,
            min_angle=0.0,
            min_distance=0.0,
            max_depth=3.0,
            img_size_w=64,
            img_size_h=48,
            model=NeuConModelConfig(n_vox=32, voxel_size=0.15),
        ),
    )
    pipe = cfg.setup(dataset=ds, out_dir=str(tmp_path), verbose=False)
    pipe.run()
    algo = pipe.algorithm
    assert algo.fragment_id >= 1  # at least one fragment fused
    assert algo.tsdf_vol.data is not None
    assert np.isfinite(algo.tsdf_vol.data).all()
    # hidden states were written back
    assert algo.hidden_vols[0].data is not None
    assert np.abs(algo.hidden_vols[-1].data).max() > 0
