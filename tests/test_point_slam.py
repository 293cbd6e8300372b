"""Point-SLAM components: spatial-hash kNN, TSDF fusion, model grads."""
import jax
import jax.numpy as jnp
import numpy as np

from xrdslam_tpu.common.camera import Camera
from xrdslam_tpu.models.conv_onet_pointslam import ConvOnet2, ConvOnet2Config
from xrdslam_tpu.ops.point_table import PointMap, knn_query
from xrdslam_tpu.ops.tsdf_fusion import TSDFVolume


def test_knn_exact_nearest():
    pm = PointMap(max_points=2048, cell_size=0.16)
    rng = np.random.RandomState(0)
    pts = rng.rand(500, 3).astype(np.float32)
    pm.add_points(pts)
    maps = pm.device_state()
    q = pts[:40] + 0.01
    D2, I, nv = knn_query(maps, jnp.asarray(q), 0.16, k=8)
    d_all = np.linalg.norm(pts[None] - q[:, None], axis=-1)
    np.testing.assert_allclose(np.sqrt(np.asarray(D2)[:, 0]), np.sort(d_all, 1)[:, 0], atol=1e-5)
    assert int(nv.min()) >= 1


def test_neighbor_counts_host():
    pm = PointMap(max_points=256, cell_size=0.2)
    pm.add_points(np.array([[0.0, 0, 0], [0.05, 0, 0], [1.0, 1, 1]], np.float32))
    counts = pm.neighbor_counts(np.array([[0.01, 0, 0], [2.0, 2, 2]]), radius=0.1)
    assert counts[0] == 2 and counts[1] == 0


def test_tsdf_fusion_flat_wall():
    cam = Camera(fx=60.0, fy=60.0, cx=32.0, cy=24.0, height=48, width=64)
    bound = np.array([[-1.5, 1.5], [-1.5, 1.5], [-2.5, 0.5]])
    vol = TSDFVolume(bound, voxel_size=0.05)
    depth = np.full((48, 64), 2.0, np.float32)
    rgb = np.full((48, 64, 3), 0.5, np.float32)
    vol.integrate(rgb, depth, np.eye(4), cam)
    mesh = vol.extract_mesh()
    assert mesh is not None and len(mesh.vertices) > 100
    # wall sits at z = -2 along the optical axis; allow ray-length skew at
    # the image borders (depth here is along-ray, not planar)
    z = mesh.vertices[:, 2]
    assert abs(np.median(z) + 2.0) < 0.1


def test_pointslam_model_grads():
    cam = Camera(fx=60.0, fy=60.0, cx=32.0, cy=24.0, height=48, width=64)
    model = ConvOnet2(ConvOnet2Config(max_points=2048), cam)
    params = model.init_params(jax.random.PRNGKey(0))
    pm = PointMap(max_points=2048, cell_size=0.16)
    rng = np.random.RandomState(1)
    pm.add_points((rng.rand(400, 3) * 0.5 + np.array([0, 0, -1.5])).astype(np.float32))
    maps = pm.device_state()
    n = 16
    rays_o = jnp.zeros((n, 3))
    d = rng.randn(n, 3).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    td = jnp.full((n, 1), 1.5)
    ts = jnp.full((n, 3), 0.5)
    loss, _ = model.get_loss(params, maps, jax.random.PRNGKey(2), rays_o, rays_d, ts, td, True, "color")
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.get_loss(p, maps, jax.random.PRNGKey(2), rays_o, rays_d, ts, td, True, "color")[0])(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert float(jnp.abs(g["geometry"]["feats"]).max()) > 0


def test_scatter_add_matmul_large_table(monkeypatch):
    """Row-blocked matmul-scatter at Point-SLAM scale (the full-table
    accumulator used to exceed the 16 MB VMEM scoped limit on v5e)."""
    from jax.experimental import pallas as pl

    import xrdslam_tpu.ops.pallas_scatter as ps

    orig = pl.pallas_call
    monkeypatch.setattr(ps.pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    rng = np.random.default_rng(0)
    num_rows, n, c = 131072, 8192, 32
    idx = rng.integers(0, num_rows, n).astype(np.int32)
    g = rng.normal(size=(n, c)).astype(np.float32)
    out = np.asarray(ps.scatter_add_matmul(jnp.asarray(idx), jnp.asarray(g), num_rows))
    ref = np.zeros((num_rows, c), np.float32)
    np.add.at(ref, idx, g)
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-3


def test_exposure_mlp_compensates_affine():
    """MLP_exposure parity (decoder_pointslam.py:294-309): with
    model_encode_exposure on, a per-frame latent drives a 3x3+offset color
    affine. Training ONLY the exposure MLP + latent must reproduce a
    global gain/offset distortion of the rendered colors that the frozen
    map cannot explain."""
    import optax

    cam = Camera(fx=60.0, fy=60.0, cx=32.0, cy=24.0, height=48, width=64)
    model = ConvOnet2(ConvOnet2Config(max_points=2048, model_encode_exposure=True), cam)
    params = model.init_params(jax.random.PRNGKey(0))
    assert "exposure" in params
    pm = PointMap(max_points=2048, cell_size=0.16)
    rng = np.random.RandomState(1)
    pm.add_points((rng.rand(400, 3) * 0.5 + np.array([0, 0, -1.5])).astype(np.float32))
    maps = pm.device_state()
    n = 64
    rays_o = jnp.zeros((n, 3))
    d = rng.randn(n, 3).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    td = jnp.full((n, 1), 1.5)
    key = jax.random.PRNGKey(2)

    base = model.render_rays(params, maps, key, rays_o, rays_d, td)["rgb"]
    # distorted target: channel gains + offset the base map can't produce
    target = base * jnp.asarray([1.4, 0.7, 1.1]) + jnp.asarray([0.1, -0.05, 0.02])

    latent = jnp.zeros((model.config.model_exposure_dim,))
    train = {"exposure": params["exposure"], "latent": latent}
    opt = optax.adam(1e-2)
    st = opt.init(train)

    @jax.jit
    def step(train, st):
        def loss_fn(tr):
            p = {**params, "exposure": tr["exposure"]}
            out = model.render_rays(p, maps, key, rays_o, rays_d, td,
                                    exposure_feat=tr["latent"])
            return jnp.mean(jnp.square(out["rgb"] - target))

        loss, g = jax.value_and_grad(loss_fn)(train)
        upd, st = opt.update(g, st)
        return optax.apply_updates(train, upd), st, loss

    l0 = None
    for i in range(300):
        train, st, loss = step(train, st)
        if l0 is None:
            l0 = float(loss)
    lN = float(loss)
    err0 = float(jnp.abs(base - target).mean())
    p = {**params, "exposure": train["exposure"]}
    out = model.render_rays(p, maps, key, rays_o, rays_d, td,
                            exposure_feat=train["latent"])
    errN = float(jnp.abs(out["rgb"] - target).mean())
    assert lN < 0.05 * l0, (l0, lN)
    assert errN < 0.2 * err0, (err0, errN)
