"""Unit + integration tests for the NICE-SLAM model and algorithm."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrdslam_tpu.common.camera import Camera
from xrdslam_tpu.common.synthetic import SyntheticDataset
from xrdslam_tpu.models.conv_onet import ConvOnet, ConvOnetConfig, mlp_decoder_apply, mlp_decoder_init
from xrdslam_tpu.ops.trilinear import grid_sample_3d, normalize_3d_coordinate


def small_model():
    cam = Camera(60.0, 60.0, 32.0, 24.0, 48, 64)
    bound = np.array([[-2, 2], [-2, 2], [-2, 2]], np.float32)
    cfg = ConvOnetConfig(rendering_n_samples=16, rendering_n_surface=8, mapping_frustum_feature_selection=True)
    return ConvOnet(cfg, cam, bound)


def test_grid_sample_matches_manual_trilinear():
    grid = jax.random.normal(jax.random.PRNGKey(0), (5, 6, 7, 4))
    # at exact grid vertices the sample equals the stored value
    coords = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0], [0.0, 0.0, 0.0]])
    out = grid_sample_3d(grid, coords)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(grid[0, 0, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(grid[4, 5, 6]), atol=1e-6)
    # center: fractional index (2, 2.5, 3) -> mean of the two Y neighbors
    expect = 0.5 * (np.asarray(grid[2, 2, 3]) + np.asarray(grid[2, 3, 3]))
    np.testing.assert_allclose(np.asarray(out[2]), expect, atol=1e-5)
    # border padding: far out-of-range clamps
    out2 = grid_sample_3d(grid, jnp.array([[-5.0, 0.0, 0.0]]))
    assert np.isfinite(np.asarray(out2)).all()


def test_torch_grid_sample_parity():
    """Our sampler must match torch.nn.functional.grid_sample
    (align_corners=True, border) which the reference uses."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    X, Y, Z, C = 5, 7, 6, 3
    grid_np = rng.randn(X, Y, Z, C).astype(np.float32)
    pts = (rng.rand(50, 3) * 2 - 1).astype(np.float32)
    ours = np.asarray(grid_sample_3d(jnp.asarray(grid_np), jnp.asarray(pts)))
    # torch: input [1, C, D, H, W] with vgrid (x->W, y->H, z->D); reference
    # stores [1, C, Z, Y, X] and passes (x, y, z) so x indexes the X axis.
    t_in = torch.from_numpy(grid_np).permute(3, 2, 1, 0)[None]  # [1, C, Z, Y, X]
    vgrid = torch.from_numpy(pts)[None, :, None, None, :]
    t_out = F.grid_sample(t_in, vgrid, padding_mode="border", align_corners=True, mode="bilinear")
    t_out = t_out[0, :, :, 0, 0].T.numpy()
    np.testing.assert_allclose(ours, t_out, atol=1e-5)


def test_convonet_query_stages():
    model = small_model()
    params = model.init_params(jax.random.PRNGKey(0))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (40, 3), minval=-1.5, maxval=1.5)
    for stage in ("middle", "fine", "color"):
        raw = model.query_raw(params, pts, stage)
        assert raw.shape == (40, 4)
        assert np.isfinite(np.asarray(raw)).all()
    # out-of-bound points get occ 100
    far = jnp.full((3, 3), 10.0)
    raw = model.query_raw(params, far, "fine")
    np.testing.assert_allclose(np.asarray(raw[:, 3]), 100.0)


def test_convonet_render_and_loss_grads():
    model = small_model()
    params = model.init_params(jax.random.PRNGKey(0))
    n = 64
    rays_o = jnp.zeros((n, 3))
    d = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    td = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (n, 1))) + 0.5
    ts = jax.random.uniform(jax.random.PRNGKey(4), (n, 3))

    def loss(p):
        l, _ = model.get_loss(p, jax.random.PRNGKey(5), rays_o, rays_d, ts, td, None, True, "color")
        return l

    l, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in leaves)


def test_frustum_masks_shape_and_content():
    model = small_model()
    ds = SyntheticDataset(n_frames=1, height=48, width=64)
    _, rgb, depth, c2w = ds[0]
    masks = model.frustum_grid_masks(c2w, depth)
    for name, shape in model.grid_shapes.items():
        assert masks[name].shape == (*shape, 1)
        frac = masks[name].mean()
        assert 0.0 < frac < 1.0, f"{name} mask covers {frac}"


def test_decoder_skip_shapes():
    p = mlp_decoder_init(jax.random.PRNGKey(0), c_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
    c = jax.random.normal(jax.random.PRNGKey(2), (10, 32))
    out = mlp_decoder_apply(p, x, c)
    assert out.shape == (10, 1)
    p4 = mlp_decoder_init(jax.random.PRNGKey(0), c_dim=32, color=True)
    assert mlp_decoder_apply(p4, x, c).shape == (10, 4)
