"""Algorithm registry: full default config trees per algorithm.

Counterpart of the reference's ``algorithm_configs`` dict (reference:
slam/configs/input_config.py:34-498). Hyperparameters mirror the published
per-algorithm settings; per-scene bounds default to Replica office0 (the
primary benchmark scene) and are CLI-overridable — the reference keeps the
other scenes' bounds as commented-out code (input_config.py:225-248), which
SURVEY.md flags as a wart; here they are plain flags.
"""
from __future__ import annotations

from typing import Dict

from pathlib import Path

from ..algorithms.coslam import CoSLAMConfig
from ..algorithms.nice_slam import NiceSLAMConfig
from ..common.mesher import MesherConfig
from ..engine.optimizers import AdamOptimizerConfig
from ..engine.runner import RunnerConfig
from ..engine.schedulers import LRconfig, NiceSLAMSchedulerConfig
from ..models.conv_onet import ConvOnetConfig
from ..models.joint_encoding import JointEncodingConfig
from ..pipeline.slam import MapperConfig, SLAMPipelineConfig, TrackerConfig

algorithm_configs: Dict[str, RunnerConfig] = {}

descriptions = {
    "co-slam": "Implementation of co-slam.",
    "nice-slam": "Implementation of nice-slam.",
    "vox-fusion": "Implementation of vox-fusion.",
    "point-slam": "Implementation of point-slam.",
    "splaTAM": "Implementation of splaTAM.",
    "dpvo": "Implementation of DPVO.",
}

# --------------------------------------------------------------------------
# nice-slam (reference: input_config.py:46-158)
# --------------------------------------------------------------------------
algorithm_configs["nice-slam"] = RunnerConfig(
    algorithm_name="nice-slam",
    xrdslam=SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=5, render_freq=50, use_relative_pose=False, save_debug_result=False),
        mapper=MapperConfig(keyframe_every=50),
        algorithm=NiceSLAMConfig(
            coarse=True,
            rot_rep="quat",
            tracking_n_iters=10,
            mapping_n_iters=60,
            mapping_first_n_iters=1500,
            mapping_window_size=5,
            tracking_sample=200,
            mapping_sample=1000,
            min_sample_pixels=200,
            ray_batch_size=30720,
            tracking_Wedge=100,
            tracking_Hedge=100,
            # Replica office0 bounds (reference: input_config.py:66-68)
            mapping_bound=[[-5.5, 5.9], [-6.7, 5.4], [-4.7, 5.3]],
            marching_cubes_bound=[[-5.5, 5.9], [-6.7, 5.4], [-4.7, 5.3]],
            mapping_middle_iter_ratio=0.4,
            mapping_fine_iter_ratio=0.6,
            mapping_lr_factor=1.0,
            mapping_lr_first_factor=5.0,
            max_keyframes=64,
            mesher=MesherConfig(resolution=256, points_batch_size=30000),
            model=ConvOnetConfig(
                points_batch_size=100000,
                mapping_frustum_feature_selection=True,
                pretrained_decoders_coarse=Path("pretrained/nice_slam/coarse.pt"),
                pretrained_decoders_middle_fine=Path("pretrained/nice_slam/middle_fine.pt"),
            ),
            optimizers={
                "decoder": {
                    "optimizer": AdamOptimizerConfig(),
                    "scheduler": NiceSLAMSchedulerConfig(stage_lr=LRconfig(coarse=0.0, middle=0.0, fine=0.0, color=0.005)),
                },
                "grid_coarse": {
                    "optimizer": AdamOptimizerConfig(),
                    "scheduler": NiceSLAMSchedulerConfig(stage_lr=LRconfig(coarse=0.001, middle=0.0, fine=0.0, color=0.0)),
                },
                "grid_middle": {
                    "optimizer": AdamOptimizerConfig(),
                    "scheduler": NiceSLAMSchedulerConfig(stage_lr=LRconfig(coarse=0.0, middle=0.1, fine=0.005, color=0.005)),
                },
                "grid_fine": {
                    "optimizer": AdamOptimizerConfig(),
                    "scheduler": NiceSLAMSchedulerConfig(stage_lr=LRconfig(coarse=0.0, middle=0.0, fine=0.005, color=0.005)),
                },
                "grid_color": {
                    "optimizer": AdamOptimizerConfig(),
                    "scheduler": NiceSLAMSchedulerConfig(stage_lr=LRconfig(coarse=0.0, middle=0.0, fine=0.0, color=0.005)),
                },
                "tracking_pose": {"optimizer": AdamOptimizerConfig(lr=1e-3), "scheduler": None},
                "mapping_pose": {
                    "optimizer": AdamOptimizerConfig(),
                    "scheduler": NiceSLAMSchedulerConfig(stage_lr=LRconfig(coarse=0.0, middle=0.0, fine=0.0, color=0.001)),
                },
            },
        ),
        enable_vis=False,
    ),
)

# --------------------------------------------------------------------------
# splaTAM (reference: input_config.py:377-433)
# --------------------------------------------------------------------------
from ..algorithms.splatam import SplaTAMConfig  # noqa: E402
from ..models.gaussian_splatting import GaussianSplattingConfig  # noqa: E402

algorithm_configs["splaTAM"] = RunnerConfig(
    algorithm_name="splaTAM",
    xrdslam=SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=1, render_freq=50, use_relative_pose=True, save_debug_result=False),
        mapper=MapperConfig(keyframe_every=5),
        algorithm=SplaTAMConfig(
            separate_LR=True,
            rot_rep="quat",
            keyframe_use_ray_sample=False,
            tracking_n_iters=40,
            mapping_n_iters=60,
            mapping_first_n_iters=60,
            mapping_window_size=24,
            model=GaussianSplattingConfig(),
            optimizers={
                "means3D": {"optimizer": AdamOptimizerConfig(lr=0.0001, eps=1e-15), "scheduler": None},
                "rgb_colors": {"optimizer": AdamOptimizerConfig(lr=0.0025, eps=1e-15), "scheduler": None},
                "unnorm_rotations": {"optimizer": AdamOptimizerConfig(lr=0.001, eps=1e-15), "scheduler": None},
                "logit_opacities": {"optimizer": AdamOptimizerConfig(lr=0.05, eps=1e-15), "scheduler": None},
                "log_scales": {"optimizer": AdamOptimizerConfig(lr=0.001, eps=1e-15), "scheduler": None},
                "tracking_pose_r": {"optimizer": AdamOptimizerConfig(lr=0.0004), "scheduler": None},
                "tracking_pose_t": {"optimizer": AdamOptimizerConfig(lr=0.002), "scheduler": None},
            },
        ),
        enable_vis=False,
    ),
)

# --------------------------------------------------------------------------
# vox-fusion (reference: input_config.py:160-200)
# --------------------------------------------------------------------------
from ..algorithms.voxfusion import VoxFusionConfig  # noqa: E402
from ..models.sparse_voxel import SparseVoxelConfig  # noqa: E402

algorithm_configs["vox-fusion"] = RunnerConfig(
    algorithm_name="vox-fusion",
    xrdslam=SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=1, render_freq=50, use_relative_pose=True, save_debug_result=False, init_pose_offset=10),
        mapper=MapperConfig(keyframe_every=50),
        algorithm=VoxFusionConfig(
            keyframe_selection_method="random",
            rot_rep="axis_angle",
            tracking_n_iters=30,
            mapping_n_iters=15,
            mapping_first_n_iters=30,
            mapping_window_size=5,
            mapping_sample=1024,
            tracking_sample=1024,
            ray_batch_size=3072,
            max_keyframes=64,
            model=SparseVoxelConfig(),
            optimizers={
                "decoder": {"optimizer": AdamOptimizerConfig(lr=5e-3), "scheduler": None},
                "embeddings": {"optimizer": AdamOptimizerConfig(lr=5e-3), "scheduler": None},
                "tracking_pose": {"optimizer": AdamOptimizerConfig(lr=1e-2), "scheduler": None},
                "mapping_pose": {"optimizer": AdamOptimizerConfig(lr=1e-3), "scheduler": None},
            },
        ),
        enable_vis=False,
    ),
)

# --------------------------------------------------------------------------
# co-slam (reference: input_config.py:203-295)
# --------------------------------------------------------------------------
algorithm_configs["co-slam"] = RunnerConfig(
    algorithm_name="co-slam",
    xrdslam=SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=5, render_freq=50, use_relative_pose=False, save_debug_result=False),
        mapper=MapperConfig(keyframe_every=5),
        algorithm=CoSLAMConfig(
            separate_LR=True,
            rot_rep="axis_angle",
            tracking_n_iters=10,
            mapping_n_iters=10,
            mapping_first_n_iters=200,
            keyframe_selection_method="all",
            mapping_sample=2048,
            tracking_sample=1024,
            min_sample_pixels=100,
            ray_batch_size=30720,
            tracking_Wedge=20,
            tracking_Hedge=20,
            # Replica office0 bounds (reference: input_config.py:226-228)
            mapping_bound=[[-3, 3], [-4, 2.5], [-2, 2.5]],
            marching_cubes_bound=[[-2.2, 2.6], [-3.4, 2.1], [-1.4, 2.0]],
            max_keyframes=512,
            mesher=MesherConfig(resolution=256, points_batch_size=30000),
            model=JointEncodingConfig(cam_depth_trunc=100.0),
            optimizers={
                "decoder": {"optimizer": AdamOptimizerConfig(lr=1e-2, weight_decay=1e-6, betas=(0.9, 0.99)), "scheduler": None},
                "embed_fn": {"optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15, betas=(0.9, 0.99)), "scheduler": None},
                "embed_fn_color": {"optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15, betas=(0.9, 0.99)), "scheduler": None},
                "tracking_pose_r": {"optimizer": AdamOptimizerConfig(lr=1e-3), "scheduler": None},
                "tracking_pose_t": {"optimizer": AdamOptimizerConfig(lr=1e-3), "scheduler": None},
                "mapping_pose_r": {"optimizer": AdamOptimizerConfig(lr=1e-3, accum_step=5), "scheduler": None},
                "mapping_pose_t": {"optimizer": AdamOptimizerConfig(lr=1e-3, accum_step=5), "scheduler": None},
            },
        ),
        enable_vis=False,
    ),
)

# --------------------------------------------------------------------------
# point-slam (reference: input_config.py:298-375)
# --------------------------------------------------------------------------
from ..algorithms.point_slam import PointSLAMConfig  # noqa: E402
from ..engine.schedulers import PointSLAMSchedulerConfig  # noqa: E402
from ..models.conv_onet_pointslam import ConvOnet2Config  # noqa: E402

algorithm_configs["point-slam"] = RunnerConfig(
    algorithm_name="point-slam",
    xrdslam=SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=5, lazy_start=20, render_freq=50, use_relative_pose=False, save_debug_result=False),
        mapper=MapperConfig(keyframe_every=20),
        algorithm=PointSLAMConfig(
            separate_LR=False,
            rot_rep="quat",
            tracking_n_iters=40,
            mapping_n_iters=300,
            mapping_first_n_iters=1500,
            mapping_window_size=12,
            tracking_sample=1500,
            mapping_sample=5000,
            min_sample_pixels=40,
            ray_batch_size=3072,
            tracking_Wedge=100,
            tracking_Hedge=100,
            mapping_BA=False,
            model=ConvOnet2Config(pretrained_decoders_middle_fine=Path("pretrained/point_slam/middle_fine.pt")),
            optimizers={
                "decoder": {"optimizer": AdamOptimizerConfig(), "scheduler": PointSLAMSchedulerConfig(start_lr=0.001, end_lr=0.005)},
                "geometry": {"optimizer": AdamOptimizerConfig(), "scheduler": PointSLAMSchedulerConfig(start_lr=0.03, end_lr=0.005)},
                "color": {"optimizer": AdamOptimizerConfig(), "scheduler": PointSLAMSchedulerConfig(start_lr=0.0, end_lr=0.005)},
                "tracking_pose": {"optimizer": AdamOptimizerConfig(lr=2e-3), "scheduler": None},
                "mapping_pose": {"optimizer": AdamOptimizerConfig(lr=1e-3), "scheduler": None},
            },
        ),
        enable_vis=False,
    ),
)

# --------------------------------------------------------------------------
# dpvo (reference: input_config.py:434-453)
# --------------------------------------------------------------------------
from ..algorithms.dpvo import DPVOConfig  # noqa: E402
from ..models.vonet import VONetConfig  # noqa: E402

algorithm_configs["dpvo"] = RunnerConfig(
    algorithm_name="dpvo",
    xrdslam=SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=-1, render_freq=50, save_debug_result=False),
        algorithm=DPVOConfig(
            mapping_window_size=32,
            patch_lifetime=13,
            patch_per_frame=96,
            init_frame_num=8,
            optimization_window=10,
            buffer_size=2048,
            mem=32,
            model=VONetConfig(pretrained_path="pretrained/dpvo/dpvo.pth"),
        ),
        enable_vis=False,
    ),
)

# --------------------------------------------------------------------------
# neuralRecon (reference: input_config.py:455-493)
# --------------------------------------------------------------------------
from ..algorithms.neural_recon import NeuralReconConfig  # noqa: E402
from ..models.neucon import NeuConModelConfig  # noqa: E402

algorithm_configs["neuralRecon"] = RunnerConfig(
    algorithm_name="neuralRecon",
    xrdslam=SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=1, render_freq=50, use_relative_pose=False, save_debug_result=False),
        algorithm=NeuralReconConfig(
            mapping_window_size=9,
            max_depth=3.5,
            c2w_offset=(0.0, 0.0, 1.5),
            mesh_use_double=False,
            model=NeuConModelConfig(
                n_vox=96,
                voxel_size=0.05,
                pos_weight=1.5,
                pretrained_path="pretrained/neural_recon/model_000047.ckpt",
            ),
        ),
        enable_vis=False,
    ),
)
