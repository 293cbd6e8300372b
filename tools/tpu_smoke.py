import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, tempfile, time, sys
from xrdslam_tpu.common.synthetic import SyntheticDataset
from xrdslam_tpu.engine.optimizers import AdamOptimizerConfig as A
from xrdslam_tpu.pipeline.slam import MapperConfig, SLAMPipelineConfig, TrackerConfig
from xrdslam_tpu.utils.eval_ate import evaluate_ate

which = sys.argv[1]
ds = SyntheticDataset(n_frames=int(os.environ.get("SMOKE_FRAMES", 8)), height=120, width=160)
for i in range(len(ds)): ds[i]

if which == "voxfusion":
    from xrdslam_tpu.algorithms.voxfusion import VoxFusionConfig
    from xrdslam_tpu.models.sparse_voxel import SparseVoxelConfig
    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=1, render_freq=-1, use_relative_pose=True, init_pose_offset=10, save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=2),
        algorithm=VoxFusionConfig(rot_rep="axis_angle", tracking_n_iters=30, mapping_n_iters=15, mapping_first_n_iters=30,
            mapping_window_size=5, mapping_sample=1024, tracking_sample=1024, ray_batch_size=3072, max_keyframes=16,
            model=SparseVoxelConfig(),
            optimizers={
                "decoder": {"optimizer": A(lr=5e-3), "scheduler": None},
                "embeddings": {"optimizer": A(lr=5e-3), "scheduler": None},
                "tracking_pose": {"optimizer": A(lr=1e-2), "scheduler": None},
                "mapping_pose": {"optimizer": A(lr=1e-3), "scheduler": None},
            }))
elif which == "splatam":
    from xrdslam_tpu.algorithms.splatam import SplaTAMConfig
    from xrdslam_tpu.models.gaussian_splatting import GaussianSplattingConfig
    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=1, render_freq=-1, use_relative_pose=True, save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=2),
        algorithm=SplaTAMConfig(separate_LR=True, rot_rep="quat", tracking_n_iters=40, mapping_n_iters=60,
            mapping_first_n_iters=60, mapping_window_size=6,
            model=GaussianSplattingConfig(max_gaussians=65536, k_per_tile=256),
            optimizers={
                "means3D": {"optimizer": A(lr=0.0001, eps=1e-15), "scheduler": None},
                "rgb_colors": {"optimizer": A(lr=0.0025, eps=1e-15), "scheduler": None},
                "unnorm_rotations": {"optimizer": A(lr=0.001, eps=1e-15), "scheduler": None},
                "logit_opacities": {"optimizer": A(lr=0.05, eps=1e-15), "scheduler": None},
                "log_scales": {"optimizer": A(lr=0.001, eps=1e-15), "scheduler": None},
                "tracking_pose_r": {"optimizer": A(lr=0.0004), "scheduler": None},
                "tracking_pose_t": {"optimizer": A(lr=0.002), "scheduler": None},
            }))
elif which == "dpvo":
    from xrdslam_tpu.algorithms.dpvo import DPVOConfig
    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=-1, render_freq=-1, save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=100),
        algorithm=DPVOConfig(patch_per_frame=16, patch_lifetime=5, init_frame_num=4,
            optimization_window=6, removal_window=8, keyframe_index=2, keyframe_thresh=0.01,
            buffer_size=64, mem=16, edge_chunk=512, motion_init_thresh=0.0))
elif which == "neucon":
    from xrdslam_tpu.algorithms.neural_recon import NeuralReconConfig
    from xrdslam_tpu.models.neucon import NeuConModelConfig
    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=1, render_freq=-1, use_relative_pose=False, save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=100),
        algorithm=NeuralReconConfig(mapping_window_size=3, min_angle=0.0, min_distance=0.0,
            max_depth=3.0, img_size_w=160, img_size_h=112,
            model=NeuConModelConfig(n_vox=48, voxel_size=0.1)))
else:
    from xrdslam_tpu.algorithms.point_slam import PointSLAMConfig
    from xrdslam_tpu.engine.schedulers import PointSLAMSchedulerConfig as S
    from xrdslam_tpu.models.conv_onet_pointslam import ConvOnet2Config
    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=2, render_freq=-1, save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=2),
        algorithm=PointSLAMConfig(rot_rep="quat", tracking_n_iters=40, mapping_n_iters=60, mapping_first_n_iters=150,
            mapping_window_size=6, tracking_sample=1500, mapping_sample=2048, min_sample_pixels=40,
            ray_batch_size=3072, tracking_Wedge=10, tracking_Hedge=10, pixels_adding=3000, max_keyframes=16,
            mesh_resolution=64,
            model=ConvOnet2Config(max_points=131072),
            optimizers={
                "decoder": {"optimizer": A(), "scheduler": S(start_lr=0.001, end_lr=0.005)},
                "geometry": {"optimizer": A(), "scheduler": S(start_lr=0.03, end_lr=0.005)},
                "color": {"optimizer": A(), "scheduler": S(start_lr=0.0, end_lr=0.005)},
                "tracking_pose": {"optimizer": A(lr=2e-3), "scheduler": None},
                "mapping_pose": {"optimizer": A(lr=1e-3), "scheduler": None},
            }))

t0 = time.time()
pipe = cfg.setup(dataset=ds, out_dir=tempfile.mkdtemp(), verbose=False)
pipe.run()
res = evaluate_ate(pipe.algorithm.gt_c2w_list, pipe.algorithm.estimate_c2w_list)
steady = np.mean(pipe.frame_times[3:]) if len(pipe.frame_times) > 3 else np.mean(pipe.frame_times)
print(f"[{which}] TPU: total {time.time()-t0:.0f}s, steady {1.0/steady:.2f} fps, ATE {res['rmse']*100:.2f} cm")

# appended algorithms: dpvo / neucon (run: python tools/tpu_smoke.py dpvo)
