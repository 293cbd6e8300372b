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

from ..algorithms.coslam import CoSLAMConfig
from ..common.mesher import MesherConfig
from ..engine.optimizers import AdamOptimizerConfig
from ..engine.runner import RunnerConfig
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
