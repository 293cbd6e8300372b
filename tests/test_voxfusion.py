"""Vox-Fusion components: voxel hash, scatter kernel, model, e2e smoke."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jax.experimental.pallas as pl

from xrdslam_tpu.common.camera import Camera
from xrdslam_tpu.models.sparse_voxel import SparseVoxel, SparseVoxelConfig
from xrdslam_tpu.ops.voxel_hash import VoxelHashMap, lookup_voxels


def test_voxel_hash_roundtrip():
    vm = VoxelHashMap(max_voxels=512, max_vertices=2048, voxel_size=0.25)
    rng = np.random.RandomState(0)
    pts = rng.rand(2000, 3) * 2 - 1
    vm.insert_points(pts)
    assert 0 < vm.n_voxels <= 512
    maps = vm.device_state()
    ids = lookup_voxels(maps["hash_keys"], maps["hash_vals"], jnp.asarray(vm.vox_coords[: vm.n_voxels]))
    np.testing.assert_array_equal(np.asarray(ids), np.arange(vm.n_voxels))
    assert int(lookup_voxels(maps["hash_keys"], maps["hash_vals"], jnp.asarray([[77, 77, 77]]))[0]) == -1
    # vertices shared between adjacent voxels
    assert vm.n_vertices < vm.n_voxels * 8


def test_scatter_add_matmul_matches_scatter(monkeypatch):
    import xrdslam_tpu.ops.pallas_scatter as ps

    orig = pl.pallas_call
    monkeypatch.setattr(ps.pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    rng = np.random.RandomState(1)
    idx = jnp.asarray(rng.randint(0, 100, 700))
    g = jnp.asarray(rng.randn(700, 16).astype(np.float32))
    ref = jnp.zeros((100, 16)).at[idx].add(g)
    out = ps.scatter_add_matmul(idx, g, 100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=6e-2)  # bf16 one-hot matmul rounding


def test_table_lookup_grad(monkeypatch):
    import xrdslam_tpu.ops.pallas_scatter as ps

    orig = pl.pallas_call
    monkeypatch.setattr(ps.pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    table = jax.random.normal(jax.random.PRNGKey(0), (50, 8))
    idx = jnp.asarray([0, 3, 3, 49])
    out = ps.table_lookup(table, idx, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[idx]), atol=1e-6)
    g = jax.grad(lambda t: jnp.sum(ps.table_lookup(t, idx, True) * 2.0))(table)
    ref = jnp.zeros_like(table).at[idx].add(2.0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), atol=1e-2)


def test_intersect_and_sample_geometry():
    # single voxel at origin, ray straight through it
    cam = Camera(60.0, 60.0, 32.0, 24.0, 48, 64)
    model = SparseVoxel(SparseVoxelConfig(coarse_steps=48, max_voxel_hit=4, samples_per_voxel=4), cam)
    vm = VoxelHashMap(voxel_size=0.2)
    vm.insert_points(np.array([[1.05, 0.05, 0.05]]))
    maps = vm.device_state()
    rays_o = jnp.asarray([[0.0, 0.05, 0.05], [0.0, 5.0, 5.0]])
    rays_d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    z, dt, vox, smask, ray_mask, seg_vox = model.intersect_and_sample(
        maps, rays_o, rays_d, jax.random.PRNGKey(0))
    assert bool(ray_mask[0]) and not bool(ray_mask[1])
    zs = np.asarray(z[0])[np.asarray(smask[0]) > 0]
    assert zs.min() >= 1.0 - 1e-4 and zs.max() <= 1.2 + 1e-4  # inside the voxel slab


def test_sparse_voxel_loss_grads():
    cam = Camera(60.0, 60.0, 32.0, 24.0, 48, 64)
    model = SparseVoxel(SparseVoxelConfig(coarse_steps=48, max_voxel_hit=4, samples_per_voxel=4,
                                          max_voxels=1024, num_embeddings=2048), cam)
    params = model.init_params(jax.random.PRNGKey(0))
    vm = VoxelHashMap(max_voxels=1024, max_vertices=2048, voxel_size=0.2)
    rng = np.random.RandomState(0)
    vm.insert_points(rng.rand(500, 3) * 1.5)
    maps = vm.device_state()
    n = 32
    rays_o = jnp.zeros((n, 3))
    d = rng.randn(n, 3).astype(np.float32)
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    td = jnp.ones((n, 1))
    ts = jnp.full((n, 3), 0.5)
    loss, _ = model.get_loss(params, maps, jax.random.PRNGKey(1), rays_o, rays_d, ts, td)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.get_loss(p, maps, jax.random.PRNGKey(1), rays_o, rays_d, ts, td)[0])(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))
