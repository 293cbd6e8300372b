"""Round-2 eval-surface tests: mesh depth rasterizer, calc_2d_metric,
T&T full evaluation, MS-SSIM."""
import os

import numpy as np
import pytest

from xrdslam_tpu.common.metrics import ms_ssim, ssim
from xrdslam_tpu.utils.eval_recon import (calc_2d_metric,
                                          evaluate_3d_reconstruction)
from xrdslam_tpu.utils.io import Mesh


def _quad(z: float, half: float = 10.0, tilt: float = 0.0) -> Mesh:
    """Two triangles spanning x,y in [-half, half] at z_cam = z + tilt*x.
    In world coords (identity pose, camera at origin looking down -z):
    p_world = (x, y, -z_cam)."""
    xs = np.array([-half, half, half, -half], np.float64)
    ys = np.array([-half, -half, half, half], np.float64)
    zs = z + tilt * xs
    v = np.stack([xs, ys, -zs], -1).astype(np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return Mesh(v, f)


def test_raster_frontal_plane_depth():
    from xrdslam_tpu.ops.mesh_raster import render_mesh_depth_np

    mesh = _quad(z=2.0)
    d = render_mesh_depth_np(mesh, np.eye(4), 60.0, 60.0, 31.5, 23.5, 48, 64)
    assert d.shape == (48, 64)
    np.testing.assert_allclose(d, 2.0, atol=1e-4)


def test_raster_tilted_plane_perspective_correct():
    from xrdslam_tpu.ops.mesh_raster import render_mesh_depth_np

    fx = 60.0
    cx, cy = 31.5, 23.5
    b = 0.3
    mesh = _quad(z=2.0, half=3.0, tilt=b)  # z in [1.1, 2.9]: no near-plane clip
    d = render_mesh_depth_np(mesh, np.eye(4), fx, fx, cx, cy, 48, 64)
    u = np.arange(64) + 0.5
    # plane z = 2 + b*x_cam, x_cam = (u-cx)/fx * z  =>  z = 2/(1 - b(u-cx)/fx)
    expect = 2.0 / (1.0 - b * (u - cx) / fx)
    got = d[24]  # central row
    np.testing.assert_allclose(got, expect, rtol=2e-3)


def test_raster_zbuffer_nearest_wins():
    from xrdslam_tpu.ops.mesh_raster import render_mesh_depth_np

    near = _quad(z=1.0, half=0.5)
    far = _quad(z=3.0, half=10.0)
    mesh = Mesh(np.concatenate([near.vertices, far.vertices]),
                np.concatenate([near.faces, far.faces + 4]).astype(np.int32))
    d = render_mesh_depth_np(mesh, np.eye(4), 60.0, 60.0, 31.5, 23.5, 48, 64)
    assert abs(d[24, 32] - 1.0) < 1e-3  # center: near quad
    # near quad spans u in [1.5, 61.5]: pixel column 0 sees only the far quad
    assert abs(d[24, 0] - 3.0) < 1e-3


def test_raster_matches_synthetic_gt_depth():
    """GT-mesh raster vs the analytic sphere-traced depth of a dataset
    frame (agreement bounded by the marching resolution)."""
    from xrdslam_tpu.common.synthetic import SyntheticDataset
    from xrdslam_tpu.ops.mesh_raster import render_mesh_depth_np

    ds = SyntheticDataset(n_frames=2, height=48, width=64, scene="office")
    mesh = ds.gt_mesh(voxel=0.05)
    _, _, depth, c2w = ds[0]
    cam = ds.get_camera()
    d = render_mesh_depth_np(mesh, c2w, cam.fx, cam.fy, cam.cx, cam.cy,
                             cam.height, cam.width)
    valid = (depth > 0) & (d > 0)
    assert valid.mean() > 0.6
    err = np.abs(d - depth)[valid]
    assert np.median(err) < 0.08, f"median raster-vs-trace err {np.median(err)}"


def test_calc_2d_metric_identical_and_offset():
    from xrdslam_tpu.common.synthetic import SyntheticDataset

    ds = SyntheticDataset(n_frames=2, height=48, width=64, scene="office")
    gt = ds.gt_mesh(voxel=0.08)
    r = calc_2d_metric(gt, gt, n_imgs=4, align=False, height=60, width=60,
                       focal=40.0)
    assert r["depth_l1_cm"] < 0.5
    off = Mesh(gt.vertices + np.array([0.0, 0.0, 0.05], np.float32), gt.faces)
    r2 = calc_2d_metric(off, gt, n_imgs=4, align=False, height=60, width=60,
                        focal=40.0)
    assert r2["depth_l1_cm"] > r["depth_l1_cm"]


def test_tnt_full_evaluation(tmp_path):
    from xrdslam_tpu.common.synthetic import SyntheticDataset

    ds = SyntheticDataset(n_frames=2, height=48, width=64, scene="office")
    gt = ds.gt_mesh(voxel=0.08)
    # protocol note: one side is the denser mesh's VERTICES, so distances
    # never go below the mesh's vertex spacing (~4 cm at voxel 0.08) —
    # tau must sit above that floor for an identical-mesh sanity check
    out = evaluate_3d_reconstruction(gt, gt, distance_thresh=0.05,
                                     align=False, out_dir=str(tmp_path),
                                     scene_name="sc")
    assert out["precision"] > 0.85 and out["recall"] > 0.85
    assert out["fscore"] > 0.85
    assert len(out["cum_source"]) > 10
    assert out["cum_source"][-1] <= 1.0
    for suffix in ("precision.txt", "recall.txt", "prf_tau_plotstr.txt",
                   "precision.ply", "recall.ply",
                   "min12_max12_mean12_median12_std12.txt"):
        assert os.path.exists(os.path.join(str(tmp_path), f"sc.{suffix}")), suffix
    # a diagonally shifted mesh at tau=5 cm must lose precision
    sh = Mesh(gt.vertices + np.array([0.08, 0.07, 0.08], np.float32), gt.faces)  # diagonal: every wall normal moves > tau
    out2 = evaluate_3d_reconstruction(sh, gt, distance_thresh=0.05, align=False)
    assert out2["precision"] < 0.7
    assert out2["fscore"] < out["fscore"]


def test_ms_ssim_properties():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (192, 192, 3))
    assert ms_ssim(img, img) > 0.9999
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1)
    v = ms_ssim(img, noisy)
    assert 0.0 < v < 1.0
    # ms-ssim is more forgiving of high-frequency noise than plain ssim
    assert v > ssim(img, noisy)
    # small images fall back to fewer scales without crashing
    small = rng.uniform(0, 1, (24, 24))
    assert 0.0 < ms_ssim(small, small) <= 1.0
