"""Short end-to-end pipeline smokes for Vox-Fusion / SplaTAM / Point-SLAM.

(Co-SLAM has its own deeper e2e in test_e2e_coslam.py; these verify each
algorithm's full pipeline — tracking, mapping, growth, artifacts — runs and
stays sane on a tiny synthetic sequence.)
"""
import tempfile

import jax.experimental.pallas as pl
import numpy as np
import pytest

from xrdslam_tpu.common.synthetic import SyntheticDataset
from xrdslam_tpu.engine.optimizers import AdamOptimizerConfig as A
from xrdslam_tpu.pipeline.slam import MapperConfig, SLAMPipelineConfig, TrackerConfig
from xrdslam_tpu.utils.eval_ate import evaluate_ate


@pytest.fixture()
def interp_kernels(monkeypatch):
    import xrdslam_tpu.ops.gaussian_raster as gr
    import xrdslam_tpu.ops.pallas_scatter as ps

    orig = pl.pallas_call
    monkeypatch.setattr(gr.pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(ps.pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True}))


def _run(cfg, n_frames=5, hw=(48, 64)):
    ds = SyntheticDataset(n_frames=n_frames, height=hw[0], width=hw[1])
    pipe = cfg.setup(dataset=ds, out_dir=tempfile.mkdtemp(), verbose=False)
    pipe.run()
    res = evaluate_ate(pipe.algorithm.gt_c2w_list, pipe.algorithm.estimate_c2w_list)
    return pipe, ds, res


def test_voxfusion_pipeline():
    from xrdslam_tpu.algorithms.voxfusion import VoxFusionConfig
    from xrdslam_tpu.models.sparse_voxel import SparseVoxelConfig

    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=1, render_freq=-1, use_relative_pose=True, init_pose_offset=10, save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=2),
        algorithm=VoxFusionConfig(
            rot_rep="axis_angle", tracking_n_iters=8, mapping_n_iters=8, mapping_first_n_iters=20,
            mapping_window_size=3, mapping_sample=192, tracking_sample=192, ray_batch_size=512, max_keyframes=8,
            model=SparseVoxelConfig(max_voxels=4096, num_embeddings=8192, coarse_steps=48, max_voxel_hit=6, samples_per_voxel=4),
            optimizers={
                "decoder": {"optimizer": A(lr=5e-3), "scheduler": None},
                "embeddings": {"optimizer": A(lr=5e-3), "scheduler": None},
                "tracking_pose": {"optimizer": A(lr=1e-2), "scheduler": None},
                "mapping_pose": {"optimizer": A(lr=1e-3), "scheduler": None},
            },
        ),
    )
    pipe, ds, res = _run(cfg)
    # ~2x the measured smoke actual (3.1 cm, docs/benchmark.md) so a real
    # regression trips the gate instead of hiding under a loose 10 cm bound
    assert res["rmse"] * 100 < 6.0
    assert int(pipe.algorithm.maps["n_voxels"]) > 10
    # the fused per-frame super-step must have engaged for the mid frames
    assert pipe.algorithm._fused_variants, "fused super-step path not taken"


def test_splatam_pipeline(interp_kernels):
    from xrdslam_tpu.algorithms.splatam import SplaTAMConfig
    from xrdslam_tpu.models.gaussian_splatting import GaussianSplattingConfig

    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=1, render_freq=-1, use_relative_pose=True, save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=2),
        algorithm=SplaTAMConfig(
            separate_LR=True, rot_rep="quat", tracking_n_iters=6, mapping_n_iters=10, mapping_first_n_iters=15,
            mapping_window_size=3,
            model=GaussianSplattingConfig(max_gaussians=8192, k_per_tile=48),
            optimizers={
                "means3D": {"optimizer": A(lr=0.0001, eps=1e-15), "scheduler": None},
                "rgb_colors": {"optimizer": A(lr=0.0025, eps=1e-15), "scheduler": None},
                "unnorm_rotations": {"optimizer": A(lr=0.001, eps=1e-15), "scheduler": None},
                "logit_opacities": {"optimizer": A(lr=0.05, eps=1e-15), "scheduler": None},
                "log_scales": {"optimizer": A(lr=0.001, eps=1e-15), "scheduler": None},
                "tracking_pose_r": {"optimizer": A(lr=0.0004), "scheduler": None},
                "tracking_pose_t": {"optimizer": A(lr=0.002), "scheduler": None},
            },
        ),
    )
    pipe, ds, res = _run(cfg, n_frames=6)
    # ~2x the measured smoke actual (2.9 cm, docs/benchmark.md)
    assert res["rmse"] * 100 < 6.0
    assert pipe.algorithm.model.n_gauss > 100
    # the fused per-frame super-step must have engaged for the mid frames
    assert pipe.algorithm._fused_variants, "fused super-step path not taken"


def tiny_nice_pipeline_config():
    from xrdslam_tpu.algorithms.nice_slam import NiceSLAMConfig
    from xrdslam_tpu.common.mesher import MesherConfig
    from xrdslam_tpu.engine.schedulers import LRconfig, NiceSLAMSchedulerConfig as NS
    from xrdslam_tpu.models.conv_onet import ConvOnetConfig

    # MUST enclose the scene (ROOM_HALF=2.0) with margin: the NICE-SLAM
    # ray prefilter drops rays whose bound-exit precedes their depth, so a
    # bound tighter than the walls silently kills EVERY ray (found as the
    # round-3 60-frame ATE-90cm inert-tracking bug).
    bound = [[-2.2, 2.2], [-2.2, 2.2], [-2.2, 2.2]]
    return SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=2, render_freq=-1, save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=2),
        algorithm=NiceSLAMConfig(
            coarse=True, rot_rep="quat", tracking_n_iters=6, mapping_n_iters=10,
            mapping_first_n_iters=30, mapping_window_size=3,
            tracking_sample=160, mapping_sample=300, min_sample_pixels=40,
            ray_batch_size=512, tracking_Wedge=6, tracking_Hedge=6,
            mapping_bound=bound, marching_cubes_bound=bound,
            mapping_color_refine=False, max_keyframes=8,
            mesher=MesherConfig(resolution=32),
            model=ConvOnetConfig(grid_len_middle=0.32, grid_len_fine=0.16,
                                 grid_len_color=0.16, rendering_n_samples=24,
                                 rendering_n_surface=12),
            optimizers={
                "decoder": {"optimizer": A(), "scheduler": NS(stage_lr=LRconfig(coarse=0.0, middle=0.0, fine=0.0, color=0.005))},
                "grid_coarse": {"optimizer": A(), "scheduler": NS(stage_lr=LRconfig(coarse=0.001, middle=0.0, fine=0.0, color=0.0))},
                "grid_middle": {"optimizer": A(), "scheduler": NS(stage_lr=LRconfig(coarse=0.0, middle=0.1, fine=0.005, color=0.005))},
                "grid_fine": {"optimizer": A(), "scheduler": NS(stage_lr=LRconfig(coarse=0.0, middle=0.0, fine=0.005, color=0.005))},
                "grid_color": {"optimizer": A(), "scheduler": NS(stage_lr=LRconfig(coarse=0.0, middle=0.0, fine=0.0, color=0.005))},
                "tracking_pose": {"optimizer": A(lr=1e-3), "scheduler": None},
                "mapping_pose": {"optimizer": A(), "scheduler": NS(stage_lr=LRconfig(coarse=0.0, middle=0.0, fine=0.0, color=0.001))},
            },
        ),
    )


def test_nice_slam_fused_pipeline():
    """NICE-SLAM through the pipeline with the fused group super-step.

    Gate: measured actual is 0.42 cm (round 5); 1.5 cm = ~3.5x headroom
    for the config's measured chaotic sensitivity (see
    test_parallel.test_nice_slam_ray_dp_parity) while still catching the
    round-4 class of regression (which was 20+ cm)."""
    pipe, ds, res = _run(tiny_nice_pipeline_config(), n_frames=8)
    assert res["rmse"] * 100 < 1.5
    assert pipe.algorithm._fused_variants, "fused super-step path not taken"


def test_pointslam_pipeline():
    from xrdslam_tpu.algorithms.point_slam import PointSLAMConfig
    from xrdslam_tpu.engine.schedulers import PointSLAMSchedulerConfig as S
    from xrdslam_tpu.models.conv_onet_pointslam import ConvOnet2Config

    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=2, render_freq=-1, save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=2),
        algorithm=PointSLAMConfig(
            rot_rep="quat", tracking_n_iters=8, mapping_n_iters=20, mapping_first_n_iters=40,
            mapping_window_size=3, tracking_sample=192, mapping_sample=384, min_sample_pixels=40,
            ray_batch_size=512, tracking_Wedge=6, tracking_Hedge=6, pixels_adding=800,
            max_keyframes=8, mesh_resolution=48,
            model=ConvOnet2Config(max_points=8192),
            optimizers={
                "decoder": {"optimizer": A(), "scheduler": S(start_lr=0.001, end_lr=0.005)},
                "geometry": {"optimizer": A(), "scheduler": S(start_lr=0.03, end_lr=0.005)},
                "color": {"optimizer": A(), "scheduler": S(start_lr=0.0, end_lr=0.005)},
                "tracking_pose": {"optimizer": A(lr=2e-3), "scheduler": None},
                "mapping_pose": {"optimizer": A(lr=1e-3), "scheduler": None},
            },
        ),
    )
    pipe, ds, res = _run(cfg, n_frames=8)
    # ~2-3x the measured smoke actual (0.66 cm, docs/benchmark.md)
    assert res["rmse"] * 100 < 2.0
    assert pipe.algorithm.point_map.n_points > 100
    # the fused two-program super-step must have engaged for the mid frames
    assert pipe.algorithm._fused_variants, "fused super-step path not taken"
