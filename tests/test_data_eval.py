"""Tests for the synthetic dataset, ATE evaluation, and Frame pose handling."""
import numpy as np

from xrdslam_tpu.common.frame import Frame
from xrdslam_tpu.common.synthetic import SyntheticDataset, scene_sdf
from xrdslam_tpu.utils.eval_ate import evaluate_ate, horn_align


def test_synthetic_frames_consistent():
    ds = SyntheticDataset(n_frames=3, height=40, width=56)
    idx, color, depth, c2w = ds[0]
    assert color.shape == (40, 56, 3) and depth.shape == (40, 56)
    assert (depth > 0).mean() > 0.95  # room walls are always hit
    assert depth.max() < 5.0
    # back-project center pixel: point must lie on the scene surface
    cam = ds.camera
    v, u = 20, 28
    d = depth[v, u]
    dir_cam = np.array([(u - cam.cx) / cam.fx, -(v - cam.cy) / cam.fy, -1.0])
    p = c2w[:3, 3] + (c2w[:3, :3] @ dir_cam) * d
    assert abs(scene_sdf(p[None])[0]) < 2e-2


def test_synthetic_depth_consistency_across_views():
    # Back-projected points from two views must agree with the SDF surface.
    ds = SyntheticDataset(n_frames=10, height=32, width=40)
    for idx in (0, 5, 9):
        _, _, depth, c2w = ds[idx]
        cam = ds.camera
        j, i = np.meshgrid(np.arange(cam.height), np.arange(cam.width), indexing="ij")
        dirs = np.stack([(i - cam.cx) / cam.fx, -(j - cam.cy) / cam.fy, -np.ones_like(i, np.float64)], -1)
        pts = c2w[:3, 3] + (dirs @ c2w[:3, :3].T) * depth[..., None]
        valid = depth > 0
        sd = np.abs(scene_sdf(pts[valid].reshape(-1, 3)))
        assert np.median(sd) < 1e-2


def test_horn_alignment_recovers_transform():
    rng = np.random.RandomState(0)
    model = rng.randn(3, 50)
    from scipy.spatial.transform import Rotation

    R_true = Rotation.from_rotvec([0.2, -0.4, 0.8]).as_matrix()
    t_true = np.array([[1.0], [2.0], [-0.5]])
    data = 1.7 * (R_true @ model) + t_true
    R, t, s = horn_align(model, data, correct_scale=True)
    np.testing.assert_allclose(R, R_true, atol=1e-6)
    np.testing.assert_allclose(s, 1.7, atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)


def test_evaluate_ate_zero_for_identical():
    poses = [np.eye(4) for _ in range(10)]
    for i, p in enumerate(poses):
        p[:3, 3] = [i * 0.1, 0, 0]
    res = evaluate_ate(poses, [p.copy() for p in poses])
    assert res["rmse"] < 1e-9


def test_evaluate_ate_known_noise():
    rng = np.random.RandomState(1)
    gt = []
    est = []
    for i in range(100):
        p = np.eye(4)
        p[:3, 3] = [np.sin(i * 0.1), np.cos(i * 0.1), i * 0.01]
        gt.append(p)
        q = p.copy()
        q[:3, 3] += 0.01 * rng.randn(3)
        est.append(q)
    res = evaluate_ate(gt, est)
    assert 0.005 < res["rmse"] < 0.03


def test_evaluate_ate_masks_invalid():
    gt = [np.eye(4) for _ in range(5)]
    est = [np.eye(4) for _ in range(5)]
    est[2] = np.full((4, 4), np.nan)
    res = evaluate_ate(gt, est)
    assert np.isfinite(res["rmse"])


def test_frame_pose_roundtrip():
    ds = SyntheticDataset(n_frames=2, height=16, width=16)
    _, color, depth, c2w = ds[1]
    f = Frame(1, color, depth, init_pose=c2w, gt_pose=c2w)
    np.testing.assert_allclose(f.get_pose(), c2w, atol=1e-3)


def test_euroc_loader(tmp_path):
    """EuRoC layout parse: yaml sensor configs, csv timestamps, gt pose
    lookup with w-first quaternions, IMU windows."""
    import os

    from PIL import Image as PILImage

    from xrdslam_tpu.common.datasets import Euroc

    root = tmp_path
    cam_dir = root / "mav0" / "cam0"
    imu_dir = root / "mav0" / "imu0"
    gt_dir = root / "mav0" / "state_groundtruth_estimate0"
    (cam_dir / "data").mkdir(parents=True)
    imu_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)

    (cam_dir / "sensor.yaml").write_text(
        "%YAML:1.0\n"
        "resolution: [64, 48]\n"
        "intrinsics: [60.0, 60.0, 32.0, 24.0]\n"
        "T_BS:\n  data: [1,0,0,0, 0,1,0,0, 0,0,1,0, 0,0,0,1]\n"
        "rate_hz: 20\n")
    (imu_dir / "sensor.yaml").write_text(
        "gyroscope_noise_density: 1.6968e-04\n"
        "gyroscope_random_walk: 1.9393e-05\n"
        "accelerometer_noise_density: 2.0e-3\n"
        "accelerometer_random_walk: 3.0e-3\n"
        "rate_hz: 200\n")
    rows = ["#timestamp [ns],filename"]
    rng = np.random.default_rng(0)
    for i in range(3):
        ts = 1000000 + i * 50000
        name = f"{ts}.png"
        PILImage.fromarray(
            (rng.uniform(0, 255, (48, 64, 3))).astype(np.uint8)).save(
            str(cam_dir / "data" / name))
        rows.append(f"{ts},{name}")
    (cam_dir / "data.csv").write_text("\n".join(rows) + "\n")

    gt_rows = ["#ts,px,py,pz,qw,qx,qy,qz,..."]
    for i in range(6):
        ts = 1000000 + i * 25000
        gt_rows.append(f"{ts},{0.1*i},0,0,1,0,0,0,0,0,0")
    (gt_dir / "data.csv").write_text("\n".join(gt_rows) + "\n")

    imu_rows = ["#ts,wx,wy,wz,ax,ay,az"]
    for i in range(20):
        ts = 1000000 + i * 5000
        imu_rows.append(f"{ts},0.01,0,0,0,0,9.81")
    (imu_dir / "data.csv").write_text("\n".join(imu_rows) + "\n")

    ds = Euroc(str(root))
    assert len(ds) == 3
    assert ds.camera.width == 64 and ds.camera.height == 48
    idx, rgb, depth, c2w = ds[1]
    assert rgb.shape == (48, 64, 3) and depth.shape == (48, 64)
    assert (depth == 0).all()  # monocular
    # pose: translation x = 0.1 * 2 (nearest gt at the image timestamp),
    # with the y/z camera-convention flip applied
    assert np.isclose(c2w[0, 3], 0.2, atol=1e-6)
    assert np.isclose(c2w[1, 1], -1.0)
    imu = ds.get_imu_window(1000000, 1050000)
    assert imu.shape == (11, 6)
