"""Mesher: SDF/occupancy grid evaluation + marching-tetrahedra extraction.

Rebuild of the reference's ``Mesher`` (reference: slam/common/mesher.py:32-263):
a uniform grid over ``marching_cubes_bound`` is evaluated through the
model's ``query_fn`` in fixed-size padded chunks (jit-friendly), the
isosurface is extracted on host, and vertex colors are optionally queried
through ``color_fn``. The reference's optional keyframe-frustum masking is
exposed via a point mask callback.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Type

import numpy as np

from ..configs.base import InstantiateConfig
from ..ops.marching_tets import marching_tetrahedra
from ..utils.io import Mesh


@dataclass
class MesherConfig(InstantiateConfig):
    """reference: slam/common/mesher.py (resolution, points_batch_size)."""

    _target: Type = field(default_factory=lambda: Mesher)
    resolution: int = 256
    points_batch_size: int = 30000
    level_set: float = 0.0


class Mesher:
    def __init__(self, config: MesherConfig, camera, bounding_box, marching_cubes_bound, **kwargs) -> None:
        self.config = config
        self.camera = camera
        self.bound = np.asarray(marching_cubes_bound, np.float64)

    def grid_points(self):
        """Uniform grid; the max dimension gets ``resolution`` cells."""
        b = self.bound
        extent = b[:, 1] - b[:, 0]
        vox = float(extent.max()) / self.config.resolution
        dims = np.maximum((extent / vox).astype(np.int64) + 1, 2)
        xs = [b[i, 0] + np.arange(dims[i]) * vox for i in range(3)]
        return xs, vox, dims

    def get_mesh(
        self,
        query_fn: Callable[[np.ndarray], np.ndarray],
        color_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        point_mask_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    ) -> Optional[Mesh]:
        """query_fn maps [N,3] world points -> [N] field values (sdf or occ)."""
        xs, vox, dims = self.grid_points()
        gx, gy, gz = np.meshgrid(xs[0], xs[1], xs[2], indexing="ij")
        pts = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)

        bs = self.config.points_batch_size
        vals = np.empty(pts.shape[0], np.float32)
        for i in range(0, pts.shape[0], bs):
            chunk = pts[i : i + bs]
            pad = bs - chunk.shape[0]
            if pad > 0:
                chunk = np.concatenate([chunk, np.zeros((pad, 3), np.float32)])
            out = np.asarray(query_fn(chunk))
            vals[i : i + bs] = out[: bs - pad] if pad > 0 else out
        volume = vals.reshape(*dims)

        mask = None
        if point_mask_fn is not None:
            mask = np.asarray(point_mask_fn(pts)).reshape(*dims)

        verts, faces = marching_tetrahedra(
            volume, level=self.config.level_set, origin=(xs[0][0], xs[1][0], xs[2][0]), spacing=(vox, vox, vox), mask=mask
        )
        if verts.shape[0] == 0:
            return None
        colors = None
        if color_fn is not None:
            colors = np.empty((verts.shape[0], 3), np.float32)
            for i in range(0, verts.shape[0], bs):
                chunk = verts[i : i + bs]
                pad = bs - chunk.shape[0]
                if pad > 0:
                    chunk = np.concatenate([chunk, np.zeros((pad, 3), np.float32)])
                out = np.asarray(color_fn(chunk))
                colors[i : i + bs] = out[: bs - pad] if pad > 0 else out
        return Mesh(verts, faces, colors)
