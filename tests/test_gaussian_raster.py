"""Pallas tile rasterizer vs a dense jnp reference (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jax.experimental.pallas as pl


@pytest.fixture()
def gr(monkeypatch):
    import xrdslam_tpu.ops.gaussian_raster as gr_mod
    import xrdslam_tpu.ops.pallas_scatter as ps_mod

    orig = pl.pallas_call
    monkeypatch.setattr(gr_mod.pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(ps_mod.pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    return gr_mod


def _scene(H=32, W=32, G=40, seed=0):
    rng = np.random.RandomState(seed)
    u = rng.rand(G).astype(np.float32) * W
    v = rng.rand(G).astype(np.float32) * H
    depth = rng.rand(G).astype(np.float32) * 3 + 0.5
    sigma = rng.rand(G).astype(np.float32) * 3 + 1.0
    op = rng.rand(G).astype(np.float32) * 0.8 + 0.1
    ch = rng.rand(G, 8).astype(np.float32)
    return u, v, depth, sigma, op, ch


def _dense_ref(u, v, depth, sigma, op, ch, H, W):
    order = np.argsort(depth)
    uu, vv, ss, oo, cc = u[order], v[order], sigma[order], op[order], ch[order]
    px, py = np.meshgrid(np.arange(W) + 0.0, np.arange(H) + 0.0)
    alpha = np.clip(oo[None, None] * np.exp(-(((px[..., None] - uu) ** 2 + (py[..., None] - vv) ** 2) / (2 * ss**2))), 0, 0.99)
    T = np.cumprod(np.concatenate([np.ones((H, W, 1)), 1 - alpha[..., :-1]], -1), -1)
    return ((alpha * T)[..., None] * cc[None, None]).sum(2)


def test_forward_matches_dense(gr):
    H = W = 32
    u, v, depth, sigma, op, ch = _scene(H, W)
    b = gr.bin_gaussians(u, v, depth, 3 * sigma, np.ones(len(u), bool), H, W, k_per_tile=64)
    out = gr.rasterize(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(sigma), jnp.asarray(op), jnp.asarray(ch),
        jnp.asarray(b.tile_ids), jnp.asarray(b.tile_mask), b.n_tiles_x, b.n_tiles_y,
    )
    ref = _dense_ref(u, v, depth, sigma, op, ch, H, W)
    np.testing.assert_allclose(np.asarray(out)[:H, :W], ref, atol=1e-5)


def test_gradients_match_dense_autodiff(gr):
    H = W = 32
    u, v, depth, sigma, op, ch = _scene(H, W)
    b = gr.bin_gaussians(u, v, depth, 3 * sigma, np.ones(len(u), bool), H, W, k_per_tile=64)
    tm = (jnp.asarray(b.tile_ids), jnp.asarray(b.tile_mask))
    rng = np.random.RandomState(1)
    gcot = jnp.asarray(rng.rand(H, W, 8).astype(np.float32))
    px, py = np.meshgrid(np.arange(W) + 0.0, np.arange(H) + 0.0)
    order = jnp.asarray(np.argsort(depth))

    def dense(u_, v_, s_, o_, c_):
        uu, vv, ss, oo, cc = u_[order], v_[order], s_[order], o_[order], c_[order]
        pxj, pyj = jnp.asarray(px), jnp.asarray(py)
        a = jnp.clip(oo[None, None] * jnp.exp(-(((pxj[..., None] - uu) ** 2 + (pyj[..., None] - vv) ** 2) / (2 * ss**2))), 0, 0.99)
        lg = jnp.log1p(-a)
        T = jnp.exp(jnp.concatenate([jnp.zeros((H, W, 1)), jnp.cumsum(lg, -1)[..., :-1]], -1))
        return ((a * T)[..., None] * cc[None, None]).sum(2)

    def loss_p(u_, v_, s_, o_, c_):
        o = gr.rasterize(u_, v_, s_, o_, c_, tm[0], tm[1], b.n_tiles_x, b.n_tiles_y)
        return jnp.sum(o[:H, :W] * gcot)

    def loss_r(u_, v_, s_, o_, c_):
        return jnp.sum(dense(u_, v_, s_, o_, c_) * gcot)

    args = tuple(map(jnp.asarray, (u, v, sigma, op, ch)))
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(*args)
    grf = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(*args)
    for a, r in zip(gp, grf):
        scale = max(float(jnp.abs(r).max()), 1.0)
        assert float(jnp.abs(a - r).max()) / scale < 5e-3  # bf16 scatter rounding


def test_binning_covers_all_pixels(gr):
    H = W = 48
    u, v, depth, sigma, op, ch = _scene(H, W, G=100, seed=2)
    b = gr.bin_gaussians(u, v, depth, 3 * sigma, np.ones(100, bool), H, W, k_per_tile=32)
    assert b.tile_mask.any()
    assert b.tile_ids.shape == (b.n_tiles_x * b.n_tiles_y, 32)
    # depth ordering within a tile
    for t in range(b.tile_ids.shape[0]):
        k = b.tile_mask[t].sum()
        if k > 1:
            d = depth[b.tile_ids[t, :k]]
            assert (np.diff(d) >= 0).all()


def test_tile_block_parity(gr, monkeypatch):
    """TB>1 (multi-tile grid steps, incl. a non-divisible tile count that
    exercises the padding path) is bit-identical to TB=1."""
    H, W = 48, 80  # 3x5 = 15 tiles: not divisible by TB=4
    u, v, depth, sigma, op, ch = _scene(H, W, G=120, seed=3)
    b = gr.bin_gaussians(u, v, depth, 3 * sigma, np.ones(len(u), bool), H, W, k_per_tile=64)
    args = tuple(map(jnp.asarray, (u, v, sigma, op, ch)))
    gcot = jnp.asarray(np.random.RandomState(4).rand(b.n_tiles_y * 16, b.n_tiles_x * 16, 8).astype(np.float32))

    def run():
        def loss(u_, v_, s_, o_, c_):
            out = gr.rasterize(u_, v_, s_, o_, c_, jnp.asarray(b.tile_ids),
                               jnp.asarray(b.tile_mask), b.n_tiles_x, b.n_tiles_y)
            return jnp.sum(out * gcot), out

        (l, out), grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4), has_aux=True)(*args)
        return out, grads

    monkeypatch.setattr(gr, "_TB", 1)
    out1, g1 = run()
    monkeypatch.setattr(gr, "_TB", 4)
    out4, g4 = run()
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out4))
    for a, c in zip(g1, g4):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
