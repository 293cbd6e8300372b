"""Multi-chip ray-DP sharding: parity with the single-device path.

Runs the SAME CoSLAM sequence (same seed, same frames) twice on the
virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8): once with devices=1, once with
devices=8 (ray batches sharded P('dp'), params replicated, gradients
all-reduced by XLA). Results must agree to float-reduction tolerance —
the sharded path changes only the summation order.
"""
import jax
import numpy as np
import pytest

from xrdslam_tpu.algorithms.coslam import CoSLAMConfig
from xrdslam_tpu.common.camera import Camera
from xrdslam_tpu.common.frame import Frame
from xrdslam_tpu.common.mesher import MesherConfig
from xrdslam_tpu.common.synthetic import SyntheticDataset
from xrdslam_tpu.engine.optimizers import AdamOptimizerConfig
from xrdslam_tpu.models.joint_encoding import JointEncodingConfig


def _mk_algo(devices: int):
    ds = SyntheticDataset(n_frames=6, height=48, width=64)
    bound = ds.bounds.tolist()
    cam = ds.get_camera()
    opts = {
        "decoder": {"optimizer": AdamOptimizerConfig(lr=1e-2)},
        "embed_fn": {"optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15)},
        "tracking_pose_r": {"optimizer": AdamOptimizerConfig(lr=1e-3)},
        "tracking_pose_t": {"optimizer": AdamOptimizerConfig(lr=1e-3)},
        "mapping_pose_r": {"optimizer": AdamOptimizerConfig(lr=1e-3)},
        "mapping_pose_t": {"optimizer": AdamOptimizerConfig(lr=1e-3)},
    }
    cfg = CoSLAMConfig(
        separate_LR=True, rot_rep="axis_angle",
        tracking_n_iters=4, mapping_n_iters=4, mapping_first_n_iters=8,
        mapping_sample=128, tracking_sample=64, min_sample_pixels=16,
        tracking_Wedge=4, tracking_Hedge=4,
        mapping_bound=bound, marching_cubes_bound=bound, max_keyframes=8,
        mesher=MesherConfig(resolution=32),
        model=JointEncodingConfig(encoding="triplane",
                                  triplane_resolutions=(16, 32),
                                  triplane_features=(2, 2)),
        optimizers=opts, seed=7, devices=devices,
    )
    return cfg.setup(camera=cam), ds


def _run_sequence(devices: int):
    algo, ds = _mk_algo(devices)
    frames = []
    for i in range(4):
        _, rgb, depth, c2w = ds[i]
        fr = Frame(fid=i, rgb=rgb, depth=depth, init_pose=c2w, gt_pose=c2w)
        frames.append(fr)
    # first mapping + keyframe
    algo.do_mapping(frames[0])
    algo.add_keyframe(frames[0])
    algo.estimate_c2w_list = [frames[0].get_pose()]
    # tracked frame
    c1 = algo.do_tracking(frames[1])
    algo.estimate_c2w_list.append(np.asarray(c1))
    # steady mapping
    algo.do_mapping(frames[1])
    # fused super-step over frames 2..3
    h = algo.dispatch_superstep(frames[2:4], True, algo.estimate_c2w_list[1],
                                algo.estimate_c2w_list[0])
    poses = algo.finish_superstep(h)
    leaf = np.asarray(algo.model_params["embed_fn"]["table"]["s1"])
    return np.asarray(c1), np.stack([np.asarray(p) for p in poses]), leaf


@pytest.mark.skipif(len(jax.devices("cpu")) < 8, reason="needs 8-device mesh")
def test_ray_dp_parity_with_single_device():
    c1_a, poses_a, leaf_a = _run_sequence(1)
    c1_b, poses_b, leaf_b = _run_sequence(8)
    np.testing.assert_allclose(c1_a, c1_b, atol=2e-4)
    np.testing.assert_allclose(poses_a, poses_b, atol=5e-4)
    scale = np.abs(leaf_a).max() + 1e-9
    np.testing.assert_allclose(leaf_a / scale, leaf_b / scale, atol=2e-3)


@pytest.mark.skipif(len(jax.devices("cpu")) < 8, reason="needs 8-device mesh")
def test_sharded_arrays_actually_sharded():
    """The dp path must actually place ray shards on all 8 devices."""
    algo, ds = _mk_algo(8)
    assert algo.mesh is not None and algo.mesh.devices.size == 8
    _, rgb, depth, c2w = ds[0]
    fr = Frame(fid=0, rgb=rgb, depth=depth, init_pose=c2w, gt_pose=c2w)
    algo.do_mapping(fr)  # must compile + run under the mesh without error
    assert np.isfinite(np.asarray(algo.model_params["decoder"]["sdf"]["w"][0])).all()


# ---------------------------------------------------------------------------
# NICE-SLAM / Point-SLAM ray-DP parity (round-3: devices hoisted to the
# Algorithm base; rays shard P('dp'), params replicate — SURVEY.md §2.8)
# ---------------------------------------------------------------------------

def _mk_nice(devices: int):
    from xrdslam_tpu.algorithms.nice_slam import NiceSLAMConfig
    from xrdslam_tpu.engine.schedulers import LRconfig, NiceSLAMSchedulerConfig as NS
    from xrdslam_tpu.models.conv_onet import ConvOnetConfig

    ds = SyntheticDataset(n_frames=6, height=48, width=64)
    bound = [[-2.2, 2.2], [-2.2, 2.2], [-2.2, 2.2]]
    cfg = NiceSLAMConfig(
        coarse=True, rot_rep="quat", tracking_n_iters=4, mapping_n_iters=8,
        mapping_first_n_iters=16, mapping_window_size=3,
        tracking_sample=64, mapping_sample=192, min_sample_pixels=16,
        ray_batch_size=512, tracking_Wedge=4, tracking_Hedge=4,
        mapping_bound=bound, marching_cubes_bound=bound,
        mapping_color_refine=False, max_keyframes=8,
        mesher=MesherConfig(resolution=16),
        model=ConvOnetConfig(grid_len_middle=0.32, grid_len_fine=0.16,
                             grid_len_color=0.16, rendering_n_samples=16,
                             rendering_n_surface=8),
        optimizers={
            "decoder": {"optimizer": AdamOptimizerConfig(), "scheduler": NS(stage_lr=LRconfig(color=0.005))},
            "grid_coarse": {"optimizer": AdamOptimizerConfig(), "scheduler": NS(stage_lr=LRconfig(coarse=0.001))},
            "grid_middle": {"optimizer": AdamOptimizerConfig(), "scheduler": NS(stage_lr=LRconfig(middle=0.1, fine=0.005, color=0.005))},
            "grid_fine": {"optimizer": AdamOptimizerConfig(), "scheduler": NS(stage_lr=LRconfig(fine=0.005, color=0.005))},
            "grid_color": {"optimizer": AdamOptimizerConfig(), "scheduler": NS(stage_lr=LRconfig(color=0.005))},
            "tracking_pose": {"optimizer": AdamOptimizerConfig(lr=1e-3), "scheduler": None},
            "mapping_pose": {"optimizer": AdamOptimizerConfig(lr=1e-3), "scheduler": None},
        },
        seed=7, devices=devices,
    )
    return cfg.setup(camera=ds.get_camera()), ds


def _mk_point(devices: int):
    from xrdslam_tpu.algorithms.point_slam import PointSLAMConfig
    from xrdslam_tpu.engine.schedulers import PointSLAMSchedulerConfig as S
    from xrdslam_tpu.models.conv_onet_pointslam import ConvOnet2Config

    ds = SyntheticDataset(n_frames=6, height=48, width=64)
    cfg = PointSLAMConfig(
        rot_rep="quat", tracking_n_iters=4, mapping_n_iters=8,
        mapping_first_n_iters=12, mapping_window_size=3,
        tracking_sample=64, mapping_sample=192, min_sample_pixels=16,
        ray_batch_size=512, tracking_Wedge=4, tracking_Hedge=4,
        pixels_adding=400, max_keyframes=8, mesh_resolution=16,
        model=ConvOnet2Config(max_points=4096),
        optimizers={
            "decoder": {"optimizer": AdamOptimizerConfig(), "scheduler": S(start_lr=0.001, end_lr=0.005)},
            "geometry": {"optimizer": AdamOptimizerConfig(), "scheduler": S(start_lr=0.03, end_lr=0.005)},
            "color": {"optimizer": AdamOptimizerConfig(), "scheduler": S(start_lr=0.0, end_lr=0.005)},
            "tracking_pose": {"optimizer": AdamOptimizerConfig(lr=2e-3), "scheduler": None},
            "mapping_pose": {"optimizer": AdamOptimizerConfig(lr=1e-3), "scheduler": None},
        },
        seed=7, devices=devices,
    )
    return cfg.setup(camera=ds.get_camera()), ds


def _run_map_track(mk, devices: int, leaf_fn, rot_rep: str = "quat"):
    algo, ds = mk(devices)
    _, rgb, depth, c2w = ds[0]
    f0 = Frame(fid=0, rgb=rgb, depth=depth, init_pose=c2w, gt_pose=c2w, rot_rep=rot_rep)
    algo.do_mapping(f0)
    algo.add_keyframe(f0)
    algo.estimate_c2w_list = [f0.get_pose()]
    _, rgb1, depth1, c2w1 = ds[1]
    f1 = Frame(fid=1, rgb=rgb1, depth=depth1, init_pose=c2w, gt_pose=c2w1, rot_rep=rot_rep)
    c1 = algo.do_tracking(f1)
    algo.do_mapping(f1)
    return np.asarray(c1), leaf_fn(algo)


@pytest.mark.skipif(len(jax.devices("cpu")) < 8, reason="needs 8-device mesh")
def test_nice_slam_ray_dp_parity():
    """NICE-SLAM's parity gates are STATISTICAL, unlike the other
    algorithms': its config runs the middle grid at Adam lr 0.1 for 24
    iterations, which is measurably chaotic — a 1e-7 depth perturbation
    at identical code shifts 1.9% of grid_middle elements by >2e-3 of
    scale (up to 0.19x scale) and the tracked pose by 4e-3 (measured
    round 5, /tmp/nice_chaos.py protocol). Elementwise 2e-3 parity
    between the 1- and 8-device programs is therefore not a property the
    system HAS (XLA schedules the two programs differently, which is a
    perturbation of the same order); what dp-correctness guarantees is
    that the two runs track each other far better than a broken sharding
    would (a dropped shard moves most touched elements by ~1/8)."""
    leaf = lambda a: np.asarray(a.model_params["grid_middle"])
    c1_a, leaf_a = _run_map_track(_mk_nice, 1, leaf)
    c1_b, leaf_b = _run_map_track(_mk_nice, 8, leaf)
    assert np.isfinite(c1_b).all() and np.isfinite(leaf_b).all()
    np.testing.assert_allclose(c1_a, c1_b, atol=2e-2)
    scale = np.abs(leaf_a).max() + 1e-9
    frac_bad = np.mean(np.abs(leaf_a - leaf_b) / scale > 2e-3)
    assert frac_bad < 0.05, f"{frac_bad:.1%} of grid_middle beyond 2e-3*scale"
    # the dp run really had a mesh
    algo8, _ = _mk_nice(8)
    assert algo8.mesh is not None and algo8.mesh.devices.size == 8


@pytest.mark.skipif(len(jax.devices("cpu")) < 8, reason="needs 8-device mesh")
def test_point_slam_ray_dp_parity():
    leaf = lambda a: np.asarray(a.model_params["geometry"]["feats"][:256])
    c1_a, leaf_a = _run_map_track(_mk_point, 1, leaf)
    c1_b, leaf_b = _run_map_track(_mk_point, 8, leaf)
    np.testing.assert_allclose(c1_a, c1_b, atol=5e-4)
    scale = np.abs(leaf_a).max() + 1e-9
    np.testing.assert_allclose(leaf_a / scale, leaf_b / scale, atol=2e-3)


# ---------------------------------------------------------------------------
# Vox-Fusion / SplaTAM ray/tile-DP parity (round-4: VERDICT item #6 — 5 of
# 7 algorithms now have tested dp paths)
# ---------------------------------------------------------------------------

def _mk_vox(devices: int):
    from xrdslam_tpu.algorithms.voxfusion import VoxFusionConfig
    from xrdslam_tpu.models.sparse_voxel import SparseVoxelConfig

    ds = SyntheticDataset(n_frames=6, height=48, width=64)
    cfg = VoxFusionConfig(
        rot_rep="axis_angle", tracking_n_iters=4, mapping_n_iters=6,
        mapping_first_n_iters=10, mapping_window_size=3,
        mapping_sample=128, tracking_sample=64, ray_batch_size=512,
        max_keyframes=8,
        model=SparseVoxelConfig(max_voxels=4096, num_embeddings=8192,
                                coarse_steps=48, max_voxel_hit=6,
                                samples_per_voxel=4),
        optimizers={
            "decoder": {"optimizer": AdamOptimizerConfig(lr=5e-3), "scheduler": None},
            "embeddings": {"optimizer": AdamOptimizerConfig(lr=5e-3), "scheduler": None},
            "tracking_pose": {"optimizer": AdamOptimizerConfig(lr=1e-2), "scheduler": None},
            "mapping_pose": {"optimizer": AdamOptimizerConfig(lr=1e-3), "scheduler": None},
        },
        seed=7, devices=devices,
    )
    return cfg.setup(camera=ds.get_camera()), ds


def _mk_splat(devices: int):
    from xrdslam_tpu.algorithms.splatam import SplaTAMConfig
    from xrdslam_tpu.models.gaussian_splatting import GaussianSplattingConfig

    ds = SyntheticDataset(n_frames=6, height=48, width=64)
    cfg = SplaTAMConfig(
        separate_LR=True, rot_rep="quat", tracking_n_iters=4,
        mapping_n_iters=6, mapping_first_n_iters=8, mapping_window_size=3,
        model=GaussianSplattingConfig(max_gaussians=8192, k_per_tile=48),
        optimizers={
            "means3D": {"optimizer": AdamOptimizerConfig(lr=0.0001, eps=1e-15), "scheduler": None},
            "rgb_colors": {"optimizer": AdamOptimizerConfig(lr=0.0025, eps=1e-15), "scheduler": None},
            "unnorm_rotations": {"optimizer": AdamOptimizerConfig(lr=0.001, eps=1e-15), "scheduler": None},
            "logit_opacities": {"optimizer": AdamOptimizerConfig(lr=0.05, eps=1e-15), "scheduler": None},
            "log_scales": {"optimizer": AdamOptimizerConfig(lr=0.001, eps=1e-15), "scheduler": None},
            "tracking_pose_r": {"optimizer": AdamOptimizerConfig(lr=0.0004), "scheduler": None},
            "tracking_pose_t": {"optimizer": AdamOptimizerConfig(lr=0.002), "scheduler": None},
        },
        seed=7, devices=devices,
    )
    return cfg.setup(camera=ds.get_camera()), ds


def _run_vox(devices: int):
    """Map + track (no second mapping): Vox-Fusion's ray-voxel membership
    is discrete, so float-reduction noise in the tracked pose flips which
    voxels later mapping iterations touch — the map leaf is only
    order-independent up to the first tracking call."""
    algo, ds = _mk_vox(devices)
    _, rgb, depth, c2w = ds[0]
    f0 = Frame(fid=0, rgb=rgb, depth=depth, init_pose=c2w, gt_pose=c2w, rot_rep="axis_angle")
    algo.do_mapping(f0)
    algo.add_keyframe(f0)
    leaf = np.asarray(algo.model_params["embeddings"]["table"])[:256]
    _, rgb1, depth1, c2w1 = ds[1]
    f1 = Frame(fid=1, rgb=rgb1, depth=depth1, init_pose=c2w, gt_pose=c2w1, rot_rep="axis_angle")
    c1 = algo.do_tracking(f1)
    return np.asarray(c1), leaf


@pytest.mark.skipif(len(jax.devices("cpu")) < 8, reason="needs 8-device mesh")
def test_voxfusion_ray_dp_parity():
    c1_a, leaf_a = _run_vox(1)
    c1_b, leaf_b = _run_vox(8)
    np.testing.assert_allclose(c1_a, c1_b, atol=5e-4)
    scale = np.abs(leaf_a).max() + 1e-9
    np.testing.assert_allclose(leaf_a / scale, leaf_b / scale, atol=2e-3)


@pytest.mark.skipif(len(jax.devices("cpu")) < 8, reason="needs 8-device mesh")
def test_splatam_tile_dp_parity():
    leaf = lambda a: np.asarray(a.params["means3D"])[:256]
    c1_a, leaf_a = _run_map_track(_mk_splat, 1, leaf)
    c1_b, leaf_b = _run_map_track(_mk_splat, 8, leaf)
    np.testing.assert_allclose(c1_a, c1_b, atol=5e-4)
    scale = np.abs(leaf_a).max() + 1e-9
    np.testing.assert_allclose(leaf_a / scale, leaf_b / scale, atol=2e-3)


# ---------------------------------------------------------------- DPVO
def _run_dpvo(devices: int):
    """Short DPVO pipeline; only the padded-edge update program shards
    (edges over 'dp'), so pose parity checks the whole dp chain:
    reproject -> correlation -> update operator -> GN BA."""
    import tempfile

    from xrdslam_tpu.algorithms.dpvo import DPVOConfig
    from xrdslam_tpu.pipeline.slam import (MapperConfig, SLAMPipelineConfig,
                                           TrackerConfig)

    ds = SyntheticDataset(n_frames=8, height=64, width=80)
    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=-1, render_freq=-1,
                              save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=100),
        algorithm=DPVOConfig(
            patch_per_frame=8, patch_lifetime=4, init_frame_num=4,
            optimization_window=5, removal_window=6, keyframe_index=2,
            keyframe_thresh=0.01, buffer_size=64, mem=12, edge_chunk=256,
            motion_init_thresh=0.0, devices=devices,
        ),
    )
    pipe = cfg.setup(dataset=ds, out_dir=tempfile.mkdtemp(), verbose=False)
    pipe.run()
    algo = pipe.algorithm
    return (np.stack(algo.estimate_c2w_list),
            algo.patches[:algo.n].reshape(-1, 3)[:512])


@pytest.mark.skipif(len(jax.devices("cpu")) < 8, reason="needs 8-device mesh")
def test_dpvo_edge_dp_parity():
    poses_a, patch_a = _run_dpvo(1)
    poses_b, patch_b = _run_dpvo(8)
    assert np.isfinite(poses_b).all()
    np.testing.assert_allclose(poses_a, poses_b, atol=5e-4)
    scale = np.abs(patch_a).max() + 1e-9
    np.testing.assert_allclose(patch_a / scale, patch_b / scale, atol=2e-3)


# ---------------------------------------------------------- NeuralRecon
def _run_neucon(devices: int):
    """One fused fragment; views shard over 'dp' (V zero-padded to the
    mesh size), volume contributions psum'd by XLA."""
    import tempfile

    from xrdslam_tpu.algorithms.neural_recon import NeuralReconConfig
    from xrdslam_tpu.models.neucon import NeuConModelConfig
    from xrdslam_tpu.pipeline.slam import (MapperConfig, SLAMPipelineConfig,
                                           TrackerConfig)

    ds = SyntheticDataset(n_frames=5, height=48, width=64)
    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=1, render_freq=-1,
                              use_relative_pose=False,
                              save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=100),
        algorithm=NeuralReconConfig(
            mapping_window_size=3, min_angle=0.0, min_distance=0.0,
            max_depth=3.0, img_size_w=64, img_size_h=48,
            model=NeuConModelConfig(n_vox=32, voxel_size=0.15),
            devices=devices,
        ),
    )
    pipe = cfg.setup(dataset=ds, out_dir=tempfile.mkdtemp(), verbose=False)
    pipe.run()
    algo = pipe.algorithm
    assert algo.fragment_id >= 1
    return algo.tsdf_vol.data.copy(), algo.hidden_vols[-1].data.copy()


@pytest.mark.skipif(len(jax.devices("cpu")) < 8, reason="needs 8-device mesh")
def test_neucon_view_dp_parity():
    tsdf_a, hid_a = _run_neucon(1)
    tsdf_b, hid_b = _run_neucon(8)
    assert np.isfinite(tsdf_b).all()
    np.testing.assert_allclose(tsdf_a, tsdf_b, atol=1e-3)
    scale = np.abs(hid_a).max() + 1e-9
    np.testing.assert_allclose(hid_a / scale, hid_b / scale, atol=2e-3)
