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
