"""DPVO network + algorithm machinery tests (CPU, tiny sizes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrdslam_tpu.models.vonet import (VONet, VONetConfig, update_apply,
                                      update_init)


def test_extract_features_shapes():
    net = VONet(VONetConfig(), seed=0)
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(3, 64, 80)),
                      jnp.float32)
    fmap, imap = VONet.extract_features(net.params, img)
    assert fmap.shape == (128, 16, 20)
    assert imap.shape == (384, 16, 20)
    assert np.isfinite(np.asarray(fmap)).all()


def test_update_apply_shapes_and_mask():
    key = jax.random.PRNGKey(0)
    params = update_init(key)
    E = 16
    net = jnp.zeros((E, 384))
    inp = jax.random.normal(key, (E, 384)) * 0.1
    corr = jax.random.normal(key, (E, 882)) * 0.1
    seg_kk = jnp.asarray(np.arange(E) % 4)
    seg_ij = jnp.asarray(np.arange(E) % 3)
    ix = jnp.full((E,), -1)
    jx = jnp.full((E,), -1)
    mask = jnp.asarray([True] * 12 + [False] * 4)
    net2, delta, weight = update_apply(params, net, inp, corr, seg_kk,
                                       seg_ij, ix, jx, mask, num_segments=E + 1)
    assert net2.shape == (E, 384) and delta.shape == (E, 2)
    w = np.asarray(weight)
    assert (w[:12] >= 0).all() and (w[:12] <= 1).all()
    # padded edges produce zero hidden state and weight
    np.testing.assert_allclose(np.asarray(net2)[12:], 0.0, atol=1e-6)
    np.testing.assert_allclose(w[12:], 0.0, atol=1e-6)
    assert np.isfinite(np.asarray(delta)).all()


def test_dpvo_pipeline_smoke(tmp_path):
    """End-to-end machinery: patch graph, rings, update+BA, keyframing.
    Random weights (no pretrained net) — checks mechanics, not accuracy."""
    from xrdslam_tpu.algorithms.dpvo import DPVOConfig
    from xrdslam_tpu.common.synthetic import SyntheticDataset
    from xrdslam_tpu.pipeline.slam import (MapperConfig, SLAMPipelineConfig,
                                           TrackerConfig)

    ds = SyntheticDataset(n_frames=10, height=64, width=80)
    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=-1, render_freq=-1,
                              save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=100),
        algorithm=DPVOConfig(
            patch_per_frame=8,
            patch_lifetime=4,
            init_frame_num=4,
            optimization_window=5,
            removal_window=6,
            keyframe_index=2,
            keyframe_thresh=0.01,  # avoid dropping frames in a 10-frame run
            buffer_size=64,
            mem=12,
            edge_chunk=256,
            motion_init_thresh=0.0,  # random weights: accept every frame
        ),
    )
    pipe = cfg.setup(dataset=ds, out_dir=str(tmp_path), verbose=False)
    pipe.run()
    algo = pipe.algorithm
    assert algo.counter == 10
    assert algo.is_initialized()
    assert algo.n >= 4
    est = np.stack(algo.estimate_c2w_list)
    assert np.isfinite(est).all()
    assert len(algo.ii) > 0
    pos, rgb = algo.get_cloud()
    assert np.isfinite(pos).all()
