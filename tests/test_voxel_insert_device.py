"""On-device voxel insertion (ops/voxel_hash.insert_points_device) vs the
host VoxelHashMap reference allocator."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from xrdslam_tpu.ops.voxel_hash import (
    CORNERS,
    VoxelHashMap,
    empty_device_maps,
    insert_points_device,
    lookup_voxels,
)

VS = 0.2
CAP = 1 << 12


def _ins_fn(max_new=512):
    return jax.jit(functools.partial(
        insert_points_device, voxel_size=VS, max_voxels=2048,
        max_vertices=8192, max_new=max_new))


def _insert_to_fixpoint(maps, pts, valid=None, iters=8):
    ins = _ins_fn()
    valid = jnp.ones(pts.shape[0], bool) if valid is None else valid
    for _ in range(iters):
        maps = ins(maps, jnp.asarray(pts), valid)
    return maps


def test_matches_host_allocator():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1.5, (2000, 3)).astype(np.float32)
    host = VoxelHashMap(max_voxels=2048, max_vertices=8192, voxel_size=VS, hash_cap=CAP)
    host.insert_points(pts)
    maps = _insert_to_fixpoint(empty_device_maps(2048, 8192, hash_cap=CAP), pts)
    nv = int(maps["n_voxels"])
    assert nv == host.n_voxels
    dev_set = set(map(tuple, np.asarray(maps["vox_coords"][:nv]).tolist()))
    host_set = set(map(tuple, host.vox_coords[: host.n_voxels].tolist()))
    assert dev_set == host_set
    assert int(maps["n_vertices"]) == host.n_vertices
    # vertex slots are a consistent function of the vertex coord (sharing)
    coords = np.asarray(maps["vox_coords"][:nv])
    vvi = np.asarray(maps["vox_vertex_idx"][:nv])
    seen = {}
    for i in range(nv):
        for ci, off in enumerate(np.asarray(CORNERS)):
            key = tuple((coords[i] + off).tolist())
            assert seen.setdefault(key, vvi[i, ci]) == vvi[i, ci]
    # all allocated vertex ids distinct per key
    assert len(set(seen.values())) == len(seen)
    # lookup finds every inserted voxel
    found = lookup_voxels(maps["hash_keys"], maps["hash_vals"], jnp.asarray(coords))
    assert int(jnp.min(found)) >= 0


def test_idempotent_and_incremental():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1.0, (500, 3)).astype(np.float32)
    b = rng.uniform(1.0, 2.0, (500, 3)).astype(np.float32)
    maps = _insert_to_fixpoint(empty_device_maps(2048, 8192, hash_cap=CAP), a)
    nv1, ne1 = int(maps["n_voxels"]), int(maps["n_vertices"])
    maps = _insert_to_fixpoint(maps, a)  # reinsert: no growth
    assert int(maps["n_voxels"]) == nv1 and int(maps["n_vertices"]) == ne1
    maps = _insert_to_fixpoint(maps, b)
    assert int(maps["n_voxels"]) > nv1


def test_valid_mask_respected():
    pts = np.tile(np.array([[0.1, 0.1, 0.1]], np.float32), (10, 1))
    valid = jnp.asarray([True] * 5 + [False] * 5)
    maps = _insert_to_fixpoint(empty_device_maps(64, 512, hash_cap=256), pts, valid=valid, iters=2)
    assert int(maps["n_voxels"]) == 1
    maps2 = _insert_to_fixpoint(empty_device_maps(64, 512, hash_cap=256), pts,
                                valid=jnp.zeros(10, bool), iters=2)
    assert int(maps2["n_voxels"]) == 0
