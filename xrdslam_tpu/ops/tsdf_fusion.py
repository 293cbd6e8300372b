"""TSDF volume fusion (jit-accelerated integration + marching tets).

Replaces the reference's Open3D ScalableTSDFVolume meshing path
(reference: slam/common/common.py:622-663 ``get_mesh_from_RGBD``, used by
Point-SLAM). A dense TSDF + color grid over a bounding box; each RGB-D
frame projects every voxel into the camera and integrates truncated SDF
and color averages; the zero isosurface is extracted with marching
tetrahedra.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common.camera import Camera
from ..utils.io import Mesh
from .marching_tets import marching_tetrahedra


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11))
def _integrate(tsdf, weight, color, pts, img_rgb, img_d, fx, fy, cx, cy, trunc, depth_max):
    """One frame into the volume. pts [N,3] are voxel centers in CAMERA frame."""
    z = -pts[:, 2]
    u = cx + fx * pts[:, 0] / jnp.maximum(z, 1e-6)
    v = cy - fy * pts[:, 1] / jnp.maximum(z, 1e-6)
    H, W = img_d.shape
    ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, H - 1)
    d = img_d[vi, ui]
    rgb = img_rgb[vi, ui]
    valid = (z > 0.01) & (u >= 0) & (u < W) & (v >= 0) & (v < H) & (d > 0) & (d < depth_max)
    sdf = (d - z) / trunc
    valid &= sdf > -1.0
    sdf = jnp.clip(sdf, -1.0, 1.0)
    w_new = valid.astype(jnp.float32)
    w_tot = weight + w_new
    tsdf = (tsdf * weight + sdf * w_new) / jnp.maximum(w_tot, 1e-6)
    color = (color * weight[:, None] + rgb * w_new[:, None]) / jnp.maximum(w_tot[:, None], 1e-6)
    return tsdf, w_tot, color


class TSDFVolume:
    def __init__(self, bound: np.ndarray, voxel_size: float = 0.02, trunc: Optional[float] = None, depth_max: float = 10.0):
        self.bound = np.asarray(bound, np.float64)
        self.voxel_size = voxel_size
        self.trunc = trunc or 4.0 * voxel_size
        self.depth_max = depth_max
        extent = self.bound[:, 1] - self.bound[:, 0]
        self.dims = np.maximum((extent / voxel_size).astype(np.int64) + 1, 2)
        xs = [self.bound[i, 0] + np.arange(self.dims[i]) * voxel_size for i in range(3)]
        gx, gy, gz = np.meshgrid(*xs, indexing="ij")
        self._pts = jnp.asarray(np.stack([gx, gy, gz], -1).reshape(-1, 3), jnp.float32)
        n = int(np.prod(self.dims))
        self.tsdf = jnp.ones((n,), jnp.float32)
        self.weight = jnp.zeros((n,), jnp.float32)
        self.color = jnp.zeros((n, 3), jnp.float32)

    def integrate(self, rgb: np.ndarray, depth: np.ndarray, c2w: np.ndarray, camera: Camera) -> None:
        w2c = np.linalg.inv(np.asarray(c2w, np.float64)).astype(np.float32)
        pts_cam = self._pts @ jnp.asarray(w2c[:3, :3]).T + jnp.asarray(w2c[:3, 3])
        self.tsdf, self.weight, self.color = _integrate(
            self.tsdf, self.weight, self.color, pts_cam,
            jnp.asarray(rgb, jnp.float32), jnp.asarray(depth, jnp.float32),
            camera.fx, camera.fy, camera.cx, camera.cy, self.trunc, self.depth_max,
        )

    def extract_mesh(self) -> Optional[Mesh]:
        vol = np.asarray(self.tsdf).reshape(*self.dims)
        seen = np.asarray(self.weight).reshape(*self.dims) > 0
        verts, faces = marching_tetrahedra(
            vol, 0.0, origin=tuple(self.bound[:, 0]), spacing=(self.voxel_size,) * 3, mask=seen
        )
        if len(verts) == 0:
            return None
        # vertex colors by nearest voxel lookup
        idx = np.clip(((verts - self.bound[:, 0]) / self.voxel_size).astype(np.int64), 0, self.dims - 1)
        flat = (idx[:, 0] * self.dims[1] + idx[:, 1]) * self.dims[2] + idx[:, 2]
        colors = np.asarray(self.color)[flat]
        return Mesh(verts, faces, colors)
