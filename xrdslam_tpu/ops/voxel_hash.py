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
    """Host twin of the device hash (_hash_i32): int32-wraparound products,
    so host-built tables and device lookups agree for ALL coords."""
    c = coords.astype(np.int64)
    h = (c[..., 0] * _P1) ^ (c[..., 1] * _P2) ^ (c[..., 2] * _P3)
    h32 = ((h & 0xFFFFFFFF) ^ 0x80000000) - 0x80000000  # sign-extend low 32
    return (h32 % cap + cap) % cap


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


EMPTY_KEY = np.iinfo(np.int32).min


def _hash_i32(kx, ky, kz, cap: int):
    """int32-wraparound spatial hash -> slot in [0, cap). The SINGLE hash
    definition shared by device insertion and lookup (device paths never
    have int64 without x64, so int32 wrap is the pinned semantics)."""
    h = ((kx * np.int32(_P1)) ^ (ky * np.int32(_P2)) ^ (kz * np.int32(_P3)))
    return jax.lax.rem(jax.lax.rem(h, np.int32(cap)) + np.int32(cap), np.int32(cap))


def hash_insert(
    keys_tbl: jnp.ndarray,
    vals_tbl: jnp.ndarray,
    counter: jnp.ndarray,
    cand: jnp.ndarray,
    cand_valid: jnp.ndarray,
    max_items: int,
    n_probes: int = N_PROBES,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Vectorized open-addressed hash insertion with in-batch dedupe.

    Device analogue of the host allocator loop: per probe stage, every
    still-unplaced candidate checks its slot (existing match -> adopt id),
    empty slots elect ONE winner by scatter-min, winners allocate ids
    ``counter + rank``, and a post-insert re-read lets duplicate candidates
    of a winner's key adopt the fresh id in the same stage. Distinct keys
    that lose a slot race chain to the next probe. Candidates still
    unplaced after ``n_probes`` stages (chain exhausted / table or
    ``max_items`` full) return id -1 — callers either retry next frame
    (voxels) or fall back to slot 0 (vertices, the host allocator's own
    overflow behavior).

    Returns (keys_tbl, vals_tbl, counter, ids [C]).
    """
    cap = keys_tbl.shape[0]
    c = cand.shape[0]
    h = _hash_i32(cand[:, 0], cand[:, 1], cand[:, 2], cap)
    arange = jnp.arange(c, dtype=jnp.int32)
    ids = jnp.full((c,), -1, jnp.int32)
    done = ~cand_valid
    for p in range(n_probes):
        slot = ((h + p) % cap).astype(jnp.int32)
        k_at = jnp.take(keys_tbl, slot, axis=0)
        v_at = jnp.take(vals_tbl, slot, axis=0)
        match = jnp.all(k_at == cand, -1) & (v_at >= 0) & ~done
        ids = jnp.where(match, v_at, ids)
        done = done | match
        empty = (v_at < 0) & ~done
        wtbl = jnp.full((cap,), c, jnp.int32).at[slot].min(jnp.where(empty, arange, c))
        is_w = empty & (jnp.take(wtbl, slot) == arange)
        rank = jnp.cumsum(is_w.astype(jnp.int32))
        new_id = counter + rank - 1
        ok = is_w & (new_id < max_items)
        sslot = jnp.where(ok, slot, cap)
        keys_tbl = keys_tbl.at[sslot].set(cand, mode="drop")
        vals_tbl = vals_tbl.at[sslot].set(new_id, mode="drop")
        ids = jnp.where(ok, new_id, ids)
        done = done | ok
        counter = counter + jnp.sum(ok)
        # duplicates of this stage's winners adopt the fresh entry
        k_at2 = jnp.take(keys_tbl, slot, axis=0)
        v_at2 = jnp.take(vals_tbl, slot, axis=0)
        match2 = jnp.all(k_at2 == cand, -1) & (v_at2 >= 0) & ~done
        ids = jnp.where(match2, v_at2, ids)
        done = done | match2
    return keys_tbl, vals_tbl, counter, ids


def new_voxel_mask(
    maps: Dict[str, jnp.ndarray],
    pts: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    voxel_size: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stage 1 of device insertion: voxel coords + not-yet-allocated mask.

    MUST live in its own jit: fusing this image-sized gather chain with the
    insertion scatters makes the remote TPU compiler blow up (measured:
    each piece compiles in 1-5 s, the fused program in 120-400 s). The
    algorithm dispatches stage 1 and stage 2 back-to-back (async, no host
    sync between them).
    """
    cc = jnp.floor(pts / voxel_size).astype(jnp.int32)
    cc = jnp.where(valid[:, None], cc, EMPTY_KEY)
    vidx = lookup_voxels(maps["hash_keys"], maps["hash_vals"], cc)
    return cc, valid & (vidx < 0)


def insert_marked(
    maps: Dict[str, jnp.ndarray],
    cc: jnp.ndarray,
    new: jnp.ndarray,
    *,
    voxel_size: float,
    max_voxels: int,
    max_vertices: int,
    max_new: int = 1024,
) -> Dict[str, jnp.ndarray]:
    """Stage 2 of ON-DEVICE voxel allocation — replaces the per-mapping-
    frame host insertion loop (reference: the CPU octree insert,
    slam/algorithms/voxfusion.py:96-110; round-2 host VoxelHashMap).

    Winner-per-home-slot pre-dedupe, compaction to ``max_new`` candidates,
    probe-staged hash insertion (voxels), then shared-vertex embedding
    allocation for the new voxels through a second (vertex) hash table.
    Coords dropped by slot races or the ``max_new`` budget are simply
    re-attempted on the next mapping frame (insertion is monotone).

    ``maps`` needs: hash_keys, hash_vals, vox_coords, vox_centers,
    vox_vertex_idx, n_voxels, vhash_keys, vhash_vals, n_vertices.
    """
    cap = maps["hash_keys"].shape[0]
    n = cc.shape[0]
    # winner-per-home-slot pre-dedupe: one candidate per distinct key
    # (distinct keys sharing a home slot lose a frame, not correctness)
    h0 = _hash_i32(cc[:, 0], cc[:, 1], cc[:, 2], cap)
    ar = jnp.arange(n, dtype=jnp.int32)
    wt = jnp.full((cap,), n, jnp.int32).at[h0].min(jnp.where(new, ar, n))
    pre = new & (jnp.take(wt, h0) == ar)
    (idx,) = jnp.nonzero(pre, size=max_new, fill_value=n)
    cc_pad = jnp.concatenate([cc, jnp.full((1, 3), EMPTY_KEY, jnp.int32)], 0)
    cand = cc_pad[idx]
    cand_valid = idx < n

    n_vox0 = maps["n_voxels"]
    hk, hv, n_vox, vids = hash_insert(
        maps["hash_keys"], maps["hash_vals"], n_vox0, cand, cand_valid, max_voxels)
    newly = (vids >= n_vox0) & cand_valid
    tgt = jnp.where(newly, vids, max_voxels)
    vox_coords = maps["vox_coords"].at[tgt].set(cand, mode="drop")
    vox_centers = maps["vox_centers"].at[tgt].set(
        (cand.astype(jnp.float32) + 0.5) * voxel_size, mode="drop")

    # shared vertex embedding slots for the new voxels
    corners = jnp.asarray(CORNERS, jnp.int32)  # [8, 3]
    vkeys = cand[:, None, :] + corners[None]  # [C, 8, 3]
    vkeys = jnp.where(newly[:, None, None], vkeys, EMPTY_KEY).reshape(-1, 3)
    vvalid_all = jnp.repeat(newly, 8)
    # hash_insert compile time explodes past ~8192 candidates on the TPU
    # backend (measured: 5 s at 8192, minutes at 32768+), so the vertex
    # batch is processed in <=8192-candidate chunks (sequential, exact)
    vk, vv, n_vert = maps["vhash_keys"], maps["vhash_vals"], maps["n_vertices"]
    eins_parts = []
    chunk = 8192
    for s in range(0, vkeys.shape[0], chunk):
        vk, vv, n_vert, e = hash_insert(
            vk, vv, n_vert, vkeys[s:s + chunk], vvalid_all[s:s + chunk], max_vertices)
        eins_parts.append(e)
    eins = jnp.concatenate(eins_parts)
    ei = jnp.maximum(eins, 0).reshape(-1, 8)
    vox_vertex_idx = maps["vox_vertex_idx"].at[tgt].set(ei, mode="drop")

    return {
        "hash_keys": hk,
        "hash_vals": hv,
        "vox_coords": vox_coords,
        "vox_centers": vox_centers,
        "vox_vertex_idx": vox_vertex_idx,
        "n_voxels": n_vox,
        "vhash_keys": vk,
        "vhash_vals": vv,
        "n_vertices": n_vert,
    }


def insert_points_device(
    maps: Dict[str, jnp.ndarray],
    pts: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    voxel_size: float,
    max_voxels: int,
    max_vertices: int,
    max_new: int = 1024,
) -> Dict[str, jnp.ndarray]:
    """Single-call composition of :func:`new_voxel_mask` +
    :func:`insert_marked` (tests / CPU; on the TPU backend prefer
    dispatching the two stages as separate jits — see new_voxel_mask)."""
    cc, new = new_voxel_mask(maps, pts, valid, voxel_size=voxel_size)
    return insert_marked(maps, cc, new, voxel_size=voxel_size,
                         max_voxels=max_voxels, max_vertices=max_vertices,
                         max_new=max_new)


def empty_device_maps(
    max_voxels: int, max_vertices: int, hash_cap: int = 1 << 16
) -> Dict[str, jnp.ndarray]:
    """Fresh all-device voxel map state (see insert_points_device)."""
    return {
        "hash_keys": jnp.full((hash_cap, 3), EMPTY_KEY, jnp.int32),
        "hash_vals": jnp.full((hash_cap,), -1, jnp.int32),
        "vox_coords": jnp.zeros((max_voxels, 3), jnp.int32),
        "vox_centers": jnp.zeros((max_voxels, 3), jnp.float32),
        "vox_vertex_idx": jnp.zeros((max_voxels, 8), jnp.int32),
        "n_voxels": jnp.asarray(0, jnp.int32),
        "vhash_keys": jnp.full((hash_cap, 3), EMPTY_KEY, jnp.int32),
        "vhash_vals": jnp.full((hash_cap,), -1, jnp.int32),
        "n_vertices": jnp.asarray(0, jnp.int32),
    }


def lookup_voxels(hash_keys: jnp.ndarray, hash_vals: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Device-side voxel membership: int coords [..., 3] -> voxel idx or -1.

    Linear probing, N_PROBES unrolled (host inserts with the same scheme;
    load factor stays < 0.5 so 8 probes cover effectively all entries).
    """
    cap = hash_keys.shape[0]
    c = coords.astype(jnp.int32)
    h = _hash_i32(c[..., 0], c[..., 1], c[..., 2], cap)
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
