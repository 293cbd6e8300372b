"""Fixed-capacity neural point cloud with spatial-hash kNN.

Replaces the reference's FAISS-GPU IVFFlat index (reference:
slam/model_components/neural_point_cloud.py:45-52 — nlist 400, nprobe 4,
65k-point query chunks). TPU design: points live in a fixed table; queries
search a uniform spatial hash whose cell size equals the query radius, so
the k=8 nearest neighbors within radius are found among the 27 neighboring
cells' fixed-capacity member lists — all static shapes, top-k on device.

Host side (like FAISS index mutation, which the reference also does on
host): ``add_points`` appends rows and maintains the cell lists.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_P1, _P2, _P3 = 73856093, 19349669, 83492791


class PointMap:
    """Host-side point store + spatial-hash cells with a device mirror."""

    def __init__(self, max_points: int = 262144, cell_size: float = 0.08, hash_cap: int = 1 << 17, per_cell: int = 24):
        self.max_points = max_points
        self.cell_size = cell_size
        self.hash_cap = hash_cap
        self.per_cell = per_cell
        self.n_points = 0
        self.pos = np.zeros((max_points, 3), np.float32)
        self.cell_keys = np.full((hash_cap, 3), np.iinfo(np.int32).min, np.int32)
        self.cell_list = np.zeros((hash_cap, per_cell), np.int32)
        self.cell_count = np.zeros((hash_cap,), np.int32)
        self.overflowed = False

    def _slot(self, key: Tuple[int, int, int]) -> int:
        h = ((key[0] * _P1) ^ (key[1] * _P2) ^ (key[2] * _P3)) % self.hash_cap
        for p in range(64):
            s = (h + p) % self.hash_cap
            if self.cell_count[s] == 0 and self.cell_keys[s][0] == np.iinfo(np.int32).min:
                self.cell_keys[s] = key
                return s
            if tuple(self.cell_keys[s]) == key:
                return s
        self.overflowed = True
        return int(h)

    def add_points(self, pts: np.ndarray) -> int:
        """Append points; returns number actually added."""
        n = min(len(pts), self.max_points - self.n_points)
        if n <= 0:
            self.overflowed = True
            return 0
        pts = np.asarray(pts[:n], np.float32)
        start = self.n_points
        self.pos[start : start + n] = pts
        cells = np.floor(pts / self.cell_size).astype(np.int64)
        for i in range(n):
            s = self._slot(tuple(cells[i]))
            c = self.cell_count[s]
            if c < self.per_cell:
                self.cell_list[s, c] = start + i
                self.cell_count[s] = c + 1
        self.n_points += n
        return n

    def neighbor_counts(self, pts: np.ndarray, radius) -> np.ndarray:
        """Host query: number of stored points within radius of each pt.
        ``radius`` may be a scalar or a per-point array (Point-SLAM's
        dynamic r_add, reference point_slam.py:339-366)."""
        if self.n_points == 0:
            return np.zeros(len(pts), np.int64)
        radius = np.broadcast_to(np.asarray(radius, np.float64), (len(pts),))
        counts = np.zeros(len(pts), np.int64)
        cells = np.floor(np.asarray(pts) / self.cell_size).astype(np.int64)
        for i, (c, p) in enumerate(zip(cells, pts)):
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        key = (c[0] + dx, c[1] + dy, c[2] + dz)
                        h = ((key[0] * _P1) ^ (key[1] * _P2) ^ (key[2] * _P3)) % self.hash_cap
                        for q in range(64):
                            s = (h + q) % self.hash_cap
                            if self.cell_keys[s][0] == np.iinfo(np.int32).min:
                                break
                            if tuple(self.cell_keys[s]) == key:
                                idx = self.cell_list[s, : self.cell_count[s]]
                                d = np.linalg.norm(self.pos[idx] - p, axis=-1)
                                counts[i] += int((d <= radius[i]).sum())
                                break
        return counts

    def device_state(self) -> Dict[str, jnp.ndarray]:
        return {
            "pos": jnp.asarray(self.pos),
            "cell_keys": jnp.asarray(self.cell_keys),
            "cell_list": jnp.asarray(self.cell_list),
            "cell_count": jnp.asarray(self.cell_count),
            "n_points": jnp.asarray(self.n_points, jnp.int32),
            "cell_size": jnp.asarray(self.cell_size, jnp.float32),
        }


def knn_query(
    maps: Dict[str, jnp.ndarray], pts: jnp.ndarray, cell_size=None, k: int = 8, n_probes: int = 8
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Device kNN: pts [N,3] -> (D2 [N,k], I [N,k], n_valid [N]).

    Searches the 2x2x2 cell block nearest the query point (cell size ==
    query radius x2 covers a radius-r ball); distances are squared (FAISS
    convention, neural_point_cloud.py:223-282). cell_size defaults to the
    map's own (it MUST match the hashing grid; an override is only for
    tests).
    """
    if cell_size is None:
        cell_size = maps["cell_size"]
    cap = maps["cell_keys"].shape[0]
    per_cell = maps["cell_list"].shape[1]
    base = jnp.floor(pts / cell_size - 0.5).astype(jnp.int64)
    cand_idx = []
    cand_valid = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                key = base + jnp.asarray([dx, dy, dz], jnp.int64)
                h = ((key[:, 0] * _P1) ^ (key[:, 1] * _P2) ^ (key[:, 2] * _P3)) % cap
                found_idx = jnp.zeros(pts.shape[0], jnp.int32)
                found = jnp.zeros(pts.shape[0], bool)
                done = jnp.zeros(pts.shape[0], bool)
                for p in range(n_probes):
                    s = ((h + p) % cap).astype(jnp.int32)
                    keys = jnp.take(maps["cell_keys"], s, axis=0)
                    match = jnp.all(keys == key.astype(jnp.int32), -1) & ~done
                    empty = (keys[:, 0] == jnp.iinfo(jnp.int32).min)
                    found_idx = jnp.where(match, s, found_idx)
                    found = found | match
                    done = done | match | empty
                members = jnp.take(maps["cell_list"], found_idx, axis=0)  # [N, M]
                cnt = jnp.take(maps["cell_count"], found_idx, axis=0)  # [N]
                valid = (jnp.arange(per_cell)[None, :] < cnt[:, None]) & found[:, None]
                cand_idx.append(members)
                cand_valid.append(valid)
    idx = jnp.concatenate(cand_idx, -1)  # [N, 8M]
    valid = jnp.concatenate(cand_valid, -1)
    cpos = jnp.take(maps["pos"], idx, axis=0)  # [N, 8M, 3]
    d2 = jnp.sum(jnp.square(cpos - pts[:, None, :]), -1)
    d2 = jnp.where(valid, d2, jnp.inf)
    neg_d2, top = jax.lax.top_k(-d2, k)
    D2 = -neg_d2
    I = jnp.take_along_axis(idx, top, axis=-1)
    n_valid = jnp.sum(jnp.isfinite(D2), -1)
    D2 = jnp.where(jnp.isfinite(D2), D2, 1e10)
    return D2, I, n_valid
