"""Marching tetrahedra + mesher + PLY IO tests."""
import os

import numpy as np

from xrdslam_tpu.common.camera import Camera
from xrdslam_tpu.common.mesher import Mesher, MesherConfig
from xrdslam_tpu.ops.marching_tets import marching_tetrahedra
from xrdslam_tpu.utils.eval_recon import calc_3d_metric, sample_mesh_points
from xrdslam_tpu.utils.io import Mesh, read_ply, write_ply


def _sphere_volume(n=48, r=0.7):
    ax = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = np.sqrt(x**2 + y**2 + z**2) - r
    spacing = ax[1] - ax[0]
    return vol, (-1.0, -1.0, -1.0), (spacing,) * 3


def test_marching_tets_sphere():
    vol, origin, spacing = _sphere_volume()
    verts, faces = marching_tetrahedra(vol, 0.0, origin, spacing)
    assert len(verts) > 500 and len(faces) > 500
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.7, atol=0.01)
    assert radii.std() < 0.01
    assert faces.max() < len(verts)


def test_marching_tets_empty():
    vol = np.ones((8, 8, 8))
    verts, faces = marching_tetrahedra(vol, 0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_mesher_with_analytic_sdf(tmp_path):
    cam = Camera(100, 100, 32, 24, 48, 64)
    bound = [[-1, 1], [-1, 1], [-1, 1]]
    mesher = MesherConfig(resolution=40, points_batch_size=8192).setup(
        camera=cam, bounding_box=np.array(bound), marching_cubes_bound=np.array(bound)
    )
    query = lambda pts: np.linalg.norm(pts, axis=-1) - 0.6  # noqa: E731
    color = lambda pts: np.clip(pts * 0.5 + 0.5, 0, 1)  # noqa: E731
    mesh = mesher.get_mesh(query, color)
    assert mesh is not None
    radii = np.linalg.norm(mesh.vertices, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.02)
    assert mesh.vertex_colors is not None and mesh.vertex_colors.shape == mesh.vertices.shape
    # ply roundtrip
    path = os.path.join(tmp_path, "m.ply")
    mesh.export(path)
    back = read_ply(path)
    np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-5)
    assert back.faces.shape == mesh.faces.shape


def test_calc_3d_metric_identical_spheres():
    vol, origin, spacing = _sphere_volume()
    verts, faces = marching_tetrahedra(vol, 0.0, origin, spacing)
    mesh = Mesh(verts, faces)
    # With 20k samples on a ~6.2 m^2 surface the expected NN distance between
    # two independent samplings is ~0.9 cm — that's sampling noise, not error.
    m = calc_3d_metric(mesh, mesh, n_points=20000)
    assert m["accuracy_cm"] < 1.2
    assert m["completion_cm"] < 1.2
    assert m["completion_ratio_pct"] > 99.5
    assert m["f1_pct"] > 60.0


def test_sample_mesh_points_on_surface():
    vol, origin, spacing = _sphere_volume()
    verts, faces = marching_tetrahedra(vol, 0.0, origin, spacing)
    pts = sample_mesh_points(Mesh(verts, faces), 5000)
    radii = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.7, atol=0.02)


def test_clean_mesh_drops_small_components():
    from xrdslam_tpu.utils.io import Mesh
    from xrdslam_tpu.utils.mesh_ops import clean_mesh

    # big component: a strip of 200 triangles; small: a single triangle
    n = 202
    verts = np.zeros((n + 3, 3), np.float32)
    verts[:n, 0] = np.arange(n)
    verts[:n, 1] = np.arange(n) % 2
    faces = np.stack([np.arange(n - 2), np.arange(1, n - 1), np.arange(2, n)], -1)
    verts[n:] = [[50, 50, 0], [51, 50, 0], [50, 51, 0]]
    faces = np.concatenate([faces, [[n, n + 1, n + 2]]])
    mesh = Mesh(vertices=verts, faces=faces.astype(np.int32))
    out = clean_mesh(mesh, min_len=100)
    assert len(out.vertices) == n
    assert len(out.faces) == n - 2
    assert out.faces.max() < len(out.vertices)


def test_cull_mesh_removes_unseen_faces():
    from xrdslam_tpu.common.synthetic import SyntheticDataset
    from xrdslam_tpu.utils.io import Mesh
    from xrdslam_tpu.utils.mesh_ops import cull_mesh

    ds = SyntheticDataset(n_frames=2, height=48, width=64)
    _, _, _, c2w = ds[0]
    # triangle in front of camera 0 vs triangle far outside the room
    fwd = c2w[:3, :3] @ np.array([0, 0, -1.0])
    center = c2w[:3, 3] + fwd * 1.0
    near = np.stack([center, center + [0.05, 0, 0], center + [0, 0.05, 0]])
    up = c2w[:3, :3] @ np.array([0, 1.0, 0])
    far = near + 500.0 * up  # far off-axis: outside every frustum
    verts = np.concatenate([near, far]).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    out = cull_mesh(ds, Mesh(vertices=verts, faces=faces),
                    estimate_c2w_list=[ds[i][3] for i in range(2)])
    assert len(out.faces) == 1
    assert np.allclose(out.vertices[:3], near, atol=1e-5)
