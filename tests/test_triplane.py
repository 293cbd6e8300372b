"""Tri-plane encoder: forward correctness + scatter-free gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from xrdslam_tpu.ops.triplane import (triplane_encode, triplane_init,
                                      triplane_spec)


def _ref_encode(tables, x, spec):
    """Naive bilinear reference."""
    outs = []
    planes_ab = ((0, 1), (0, 2), (1, 2))
    for s, (R, C) in enumerate(zip(spec.resolutions, spec.n_features)):
        P = np.asarray(tables[f"s{s}"])
        for p, (a, b) in enumerate(planes_ab):
            u = np.clip(x[:, a], 0, 1) * (R - 1)
            v = np.clip(x[:, b], 0, 1) * (R - 1)
            u0 = np.clip(np.floor(u).astype(int), 0, R - 2)
            v0 = np.clip(np.floor(v).astype(int), 0, R - 2)
            fu = (u - u0)[:, None]
            fv = (v - v0)[:, None]
            f = (P[p][u0, v0] * (1 - fu) * (1 - fv)
                 + P[p][u0, v0 + 1] * (1 - fu) * fv
                 + P[p][u0 + 1, v0] * fu * (1 - fv)
                 + P[p][u0 + 1, v0 + 1] * fu * fv)
            outs.append(f)
    return np.concatenate(outs, -1)


def test_triplane_forward_matches_reference():
    spec = triplane_spec((16, 32), (4, 8))
    tables = triplane_init(jax.random.PRNGKey(0), spec, std=1.0)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (200, 3)), jnp.float32)
    out = np.asarray(triplane_encode(tables, x, spec))
    ref = _ref_encode(tables, np.asarray(x), spec)
    assert out.shape == (200, spec.out_dim)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_triplane_table_grad_matches_autodiff():
    """The moment-splat gradient must equal autodiff of the naive forward
    (pack is linear, so differentiating through pack+gather is the exact
    reference)."""
    from xrdslam_tpu.ops.triplane import _encode_fwd, triplane_pack

    spec = triplane_spec((16,), (4,))
    tables = triplane_init(jax.random.PRNGKey(1), spec, std=1.0)
    x = jnp.asarray(np.random.default_rng(1).uniform(0.05, 0.95, (64, 3)), jnp.float32)
    w = jnp.asarray(np.random.default_rng(2).normal(size=(64, spec.out_dim)), jnp.float32)

    def loss_custom(t):
        return jnp.sum(triplane_encode(t, x, spec) * w)

    def loss_naive(t):
        return jnp.sum(_encode_fwd(triplane_pack(t, spec), x, spec) * w)

    g_c = jax.grad(loss_custom)(tables)
    g_n = jax.grad(loss_naive)(tables)
    for k in tables:
        a, b = np.asarray(g_c[k]), np.asarray(g_n[k])
        scale = np.abs(b).max() + 1e-9
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5)


def test_triplane_prepacked_matches():
    """encode(packed=triplane_pack(...)) == encode(...) forward and grads."""
    from xrdslam_tpu.ops.triplane import triplane_pack

    spec = triplane_spec((16, 32), (4, 8))
    tables = triplane_init(jax.random.PRNGKey(5), spec, std=1.0)
    x = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (100, 3)), jnp.float32)
    packed = triplane_pack(tables, spec)
    a = np.asarray(triplane_encode(tables, x, spec))
    b = np.asarray(triplane_encode(tables, x, spec, packed=packed))
    np.testing.assert_allclose(a, b, atol=1e-6)
    gx_a = jax.grad(lambda xx: jnp.sum(triplane_encode(tables, xx, spec) ** 2))(x)
    gx_b = jax.grad(lambda xx: jnp.sum(triplane_encode(tables, xx, spec, packed=packed) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b), atol=1e-4)


def test_triplane_position_grad():
    spec = triplane_spec((32,), (4,))
    tables = triplane_init(jax.random.PRNGKey(3), spec, std=1.0)
    x0 = jnp.asarray([[0.31, 0.52, 0.73]], jnp.float32)

    def f(xx):
        return jnp.sum(triplane_encode(tables, xx, spec) ** 2)

    g = jax.grad(f)(x0)
    # finite differences
    eps = 1e-4
    for d in range(3):
        xp = x0.at[0, d].add(eps)
        xm = x0.at[0, d].add(-eps)
        fd = (f(xp) - f(xm)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[0, d], float(fd), rtol=2e-2, atol=1e-3)


def test_joint_encoding_triplane_mode():
    """JointEncoding with encoding='triplane' trains a step end to end."""
    from xrdslam_tpu.common.camera import Camera
    from xrdslam_tpu.models.joint_encoding import (JointEncoding,
                                                   JointEncodingConfig)

    cam = Camera(fx=60.0, fy=60.0, cx=32.0, cy=24.0, height=48, width=64)
    bb = np.array([[-2, 2], [-2, 2], [-2, 2]], np.float32)
    cfg = JointEncodingConfig(encoding="triplane",
                              triplane_resolutions=(32, 64),
                              triplane_features=(4, 8))
    model = JointEncoding(cfg, cam, bb)
    params = model.init_params(jax.random.PRNGKey(0))
    assert "s0" in params["embed_fn"]["table"]
    rng = np.random.default_rng(0)
    rays_o = jnp.zeros((8, 3))
    d = rng.normal(size=(8, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    td = jnp.full((8, 1), 1.5)
    ts = jnp.full((8, 3), 0.5)
    rm = jnp.ones((8,))
    loss, _ = model.get_loss(params, jax.random.PRNGKey(1), rays_o, rays_d,
                             ts, td, rm, True, False)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.get_loss(p, jax.random.PRNGKey(1), rays_o,
                                          rays_d, ts, td, rm, True, False)[0])(params)
    gt = g["embed_fn"]["table"]["s0"]
    assert float(jnp.abs(gt).max()) > 0
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))
