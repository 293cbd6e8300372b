"""Fixed-capacity voxel hash map: the TPU replacement for the sparse octree.

The reference maintains a CPU pointer octree (third_party/sparse_octree —
``svo.Octree.insert`` + ``get_centres_and_children``) whose flat outputs
feed CUDA ray-intersection kernels. Here the same role is played by:

  * a host-side ``VoxelHashMap`` (python dict insertion, like the
    reference's CPU octree) that assigns voxel slots and shared vertex
    embedding slots, and mirrors its keys into
  * fixed-capacity device arrays: an open-addressed hash table
    ``hash_keys [CAP, 3]`` / ``hash_vals [CAP]`` for jit-side membership
    queries (``lookup_voxels``), plus ``vox_centers [MAX_VOX, 3]`` and
    ``vox_vertex_idx [MAX_VOX, 8]``.

Everything device-side is static-shape: insertion happens on host between
jitted steps (the reference's octree insert is likewise a host call per
mapping frame — slam/algorithms/voxfusion.py:96-110).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_P1, _P2, _P3 = 73856093, 19349669, 83492791  # classic spatial-hash primes
N_PROBES = 8

# vertex corner offsets, fixed ordering shared by interpolation
CORNERS = np.array([[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], np.int64)


def _hash_np(coords: np.ndarray, cap: int) -> np.ndarray:
    h = (coords[..., 0] * _P1) ^ (coords[..., 1] * _P2) ^ (coords[..., 2] * _P3)
    return (h % cap + cap) % cap


class VoxelHashMap:
    """Host-side voxel/vertex slot allocator with a device mirror."""

    def __init__(self, max_voxels: int = 16384, max_vertices: int = 20000, voxel_size: float = 0.2, hash_cap: int = 1 << 16):
        self.max_voxels = max_voxels
        self.max_vertices = max_vertices
        self.voxel_size = voxel_size
        self.hash_cap = hash_cap
        self.vox_index: Dict[Tuple[int, int, int], int] = {}
        self.vert_index: Dict[Tuple[int, int, int], int] = {}
        # host mirrors
        self.hash_keys = np.full((hash_cap, 3), np.iinfo(np.int32).min, np.int32)
        self.hash_vals = np.full((hash_cap,), -1, np.int32)
        self.vox_coords = np.zeros((max_voxels, 3), np.int32)
        self.vox_vertex_idx = np.zeros((max_voxels, 8), np.int32)
        self.overflowed = False

    @property
    def n_voxels(self) -> int:
        return len(self.vox_index)

    @property
    def n_vertices(self) -> int:
        return len(self.vert_index)

    def insert_points(self, points: np.ndarray) -> bool:
        """World points -> voxel coords -> allocate new voxels/vertices.

        Returns True if anything was inserted.
        """
        coords = np.unique(np.floor(points / self.voxel_size).astype(np.int64), axis=0)
        new = [tuple(c) for c in coords if tuple(c) not in self.vox_index]
        if not new:
            return False
        for key in new:
            if len(self.vox_index) >= self.max_voxels:
                self.overflowed = True
                break
            vi = len(self.vox_index)
            self.vox_index[key] = vi
            self.vox_coords[vi] = key
            for ci, off in enumerate(CORNERS):
                vkey = (key[0] + int(off[0]), key[1] + int(off[1]), key[2] + int(off[2]))
                ei = self.vert_index.get(vkey)
                if ei is None:
                    if len(self.vert_index) >= self.max_vertices:
                        self.overflowed = True
                        ei = 0
                    else:
                        ei = len(self.vert_index)
                        self.vert_index[vkey] = ei
                self.vox_vertex_idx[vi, ci] = ei
            # open addressing insert into the hash mirror
            k = np.asarray(key, np.int64)
            h = int(_hash_np(k, self.hash_cap))
            for p in range(self.hash_cap):
                slot = (h + p) % self.hash_cap
                if self.hash_vals[slot] == -1:
                    self.hash_keys[slot] = key
                    self.hash_vals[slot] = vi
                    break
        return True

    def device_state(self) -> Dict[str, jnp.ndarray]:
        return {
            "hash_keys": jnp.asarray(self.hash_keys),
            "hash_vals": jnp.asarray(self.hash_vals),
            "vox_centers": jnp.asarray((self.vox_coords.astype(np.float32) + 0.5) * self.voxel_size),
            "vox_coords": jnp.asarray(self.vox_coords),
            "vox_vertex_idx": jnp.asarray(self.vox_vertex_idx),
            "n_voxels": jnp.asarray(self.n_voxels, jnp.int32),
        }


def lookup_voxels(hash_keys: jnp.ndarray, hash_vals: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Device-side voxel membership: int coords [..., 3] -> voxel idx or -1.

    Linear probing, N_PROBES unrolled (host inserts with the same scheme;
    load factor stays < 0.5 so 8 probes cover effectively all entries).
    """
    cap = hash_keys.shape[0]
    c = coords.astype(jnp.int64)
    h = ((c[..., 0] * _P1) ^ (c[..., 1] * _P2) ^ (c[..., 2] * _P3))
    h = ((h % cap) + cap) % cap
    result = jnp.full(coords.shape[:-1], -1, jnp.int32)
    found = jnp.zeros(coords.shape[:-1], bool)
    for p in range(N_PROBES):
        slot = ((h + p) % cap).astype(jnp.int32)
        keys = jnp.take(hash_keys, slot, axis=0)
        vals = jnp.take(hash_vals, slot, axis=0)
        match = jnp.all(keys == coords.astype(jnp.int32), -1) & (vals >= 0) & (~found)
        result = jnp.where(match, vals, result)
        found = found | match | (vals < 0)  # empty slot terminates probe chain
    return result
