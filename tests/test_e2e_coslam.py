"""End-to-end Co-SLAM smoke on a synthetic RGB-D sequence (CPU).

The reference has no such test (SURVEY.md §4); this is the test pyramid's
top: run the full pipeline (tracking + mapping + keyframes + mesh + eval
artifacts) on a tiny synthetic scene and assert trajectory and
reconstruction quality against exact ground truth.
"""
import os
import pickle

import numpy as np
import pytest

from xrdslam_tpu.algorithms.coslam import CoSLAMConfig
from xrdslam_tpu.common.datasets import SyntheticDataset
from xrdslam_tpu.common.mesher import MesherConfig
from xrdslam_tpu.engine.optimizers import AdamOptimizerConfig
from xrdslam_tpu.models.joint_encoding import JointEncodingConfig
from xrdslam_tpu.pipeline.slam import MapperConfig, SLAMPipelineConfig, TrackerConfig
from xrdslam_tpu.utils.eval_ate import evaluate_ate


def tiny_coslam_config(bound):
    opts = {
        "decoder": {"optimizer": AdamOptimizerConfig(lr=1e-2, weight_decay=1e-6, betas=(0.9, 0.99)), "scheduler": None},
        "embed_fn": {"optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15, betas=(0.9, 0.99)), "scheduler": None},
        "tracking_pose_r": {"optimizer": AdamOptimizerConfig(lr=1e-3), "scheduler": None},
        "tracking_pose_t": {"optimizer": AdamOptimizerConfig(lr=1e-3), "scheduler": None},
        "mapping_pose_r": {"optimizer": AdamOptimizerConfig(lr=1e-3, accum_step=5), "scheduler": None},
        "mapping_pose_t": {"optimizer": AdamOptimizerConfig(lr=1e-3, accum_step=5), "scheduler": None},
    }
    return CoSLAMConfig(
        separate_LR=True,
        rot_rep="axis_angle",
        tracking_n_iters=10,
        mapping_n_iters=10,
        mapping_first_n_iters=120,
        mapping_sample=1024,
        tracking_sample=512,
        min_sample_pixels=64,
        ray_batch_size=4096,
        tracking_Wedge=8,
        tracking_Hedge=8,
        mapping_bound=bound,
        marching_cubes_bound=bound,
        max_keyframes=16,
        mesher=MesherConfig(resolution=64, points_batch_size=16384),
        model=JointEncodingConfig(hashsize=13, training_n_sample_d=24, cam_far=5.0),
        optimizers=opts,
    )


@pytest.fixture(scope="module")
def slam_run(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("slam_out"))
    ds = SyntheticDataset(n_frames=14, height=60, width=80)
    bound = ds.bounds.tolist()
    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=2, render_freq=-1, save_re_render_result=True),
        mapper=MapperConfig(keyframe_every=2),
        algorithm=tiny_coslam_config(bound),
    )
    pipeline = cfg.setup(dataset=ds, out_dir=out_dir, verbose=False)
    pipeline.run()
    return pipeline, ds, out_dir


def test_e2e_trajectory_accuracy(slam_run):
    pipeline, ds, out_dir = slam_run
    res = evaluate_ate([p for p in np.asarray(ds.poses)], pipeline.algorithm.estimate_c2w_list)
    assert res["rmse"] * 100 < 6.0, f"ATE too high: {res['rmse']*100:.2f} cm"


def test_e2e_render_quality(slam_run):
    pipeline, ds, out_dir = slam_run
    _, rgb, depth_gt, _ = ds[0]
    color, depth = pipeline.algorithm.render_img(pipeline.algorithm.estimate_c2w_list[0], gt_depth=depth_gt)
    mask = depth_gt > 0
    depth_l1 = np.abs(depth - depth_gt)[mask].mean()
    assert depth_l1 * 100 < 5.0, f"depth L1 too high: {depth_l1*100:.2f} cm"
    assert np.abs(color - rgb).mean() < 0.15


def test_e2e_artifacts(slam_run):
    pipeline, ds, out_dir = slam_run
    with open(os.path.join(out_dir, "eval.tar"), "rb") as f:
        data = pickle.load(f)
    assert len(data["estimate_c2w_list"]) == len(ds)
    assert os.path.exists(os.path.join(out_dir, "mesh", "final_mesh_rec.ply"))


def test_e2e_mesh_on_surface(slam_run):
    from xrdslam_tpu.common.synthetic import scene_sdf
    from xrdslam_tpu.utils.io import read_ply

    pipeline, ds, out_dir = slam_run
    mesh = read_ply(os.path.join(out_dir, "mesh", "final_mesh_rec.ply"))
    assert len(mesh.vertices) > 1000
    sd = np.abs(scene_sdf(mesh.vertices.astype(np.float64)))
    assert np.median(sd) < 0.05, f"mesh far from true surface: median |sdf| {np.median(sd):.3f} m"
