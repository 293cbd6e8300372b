"""Unit tests for encodings, rendering, sampling, and loss ops."""
import jax
import jax.numpy as jnp
import numpy as np

from xrdslam_tpu.common.camera import Camera
from xrdslam_tpu.ops import encodings, losses, rendering, sampling


def test_hashgrid_shapes_and_grad():
    spec = encodings.hashgrid_spec(n_levels=4, n_features=2, log2_table_size=8, base_resolution=4, finest_resolution=32)
    table = encodings.hashgrid_init(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (17, 3))
    out = encodings.hashgrid_encode(table, x, spec)
    assert out.shape == (17, 8)

    def loss(t):
        return jnp.sum(encodings.hashgrid_encode(t, x, spec) ** 2)

    g = jax.grad(loss)(table)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_hashgrid_exact_at_dense_grid_points():
    # One dense level: encoding at a grid vertex must equal the table row.
    spec = encodings.hashgrid_spec(n_levels=1, n_features=2, log2_table_size=10, base_resolution=4, finest_resolution=4)
    assert spec.dense[0]
    table = encodings.hashgrid_init(jax.random.PRNGKey(0), spec) * 1000.0
    res = spec.resolutions[0]
    # vertex (1,2,3) -> dense index with stride res+1
    idx = 1 + (res + 1) * (2 + (res + 1) * 3)
    x = jnp.array([[1.0 / res, 2.0 / res, 3.0 / res]])
    out = encodings.hashgrid_encode(table, x, spec)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(table[0, idx]), atol=1e-4)


def test_hashgrid_continuity():
    spec = encodings.hashgrid_spec(n_levels=8, n_features=2, log2_table_size=10, base_resolution=4, finest_resolution=64)
    table = encodings.hashgrid_init(jax.random.PRNGKey(0), spec)
    x = jnp.array([[0.371, 0.522, 0.613]])
    eps = 1e-5
    a = encodings.hashgrid_encode(table, x, spec)
    b = encodings.hashgrid_encode(table, x + eps, spec)
    assert np.abs(np.asarray(a - b)).max() < 1e-3


def test_oneblob_partition_of_unity():
    x = jax.random.uniform(jax.random.PRNGKey(2), (32, 3))
    out = encodings.oneblob_encode(x, n_bins=16)
    assert out.shape == (32, 48)
    sums = np.asarray(out).reshape(32, 3, 16).sum(-1)
    # mass within [0,1] is <= 1 (kernel can hang over the border) and big
    assert (sums <= 1.0 + 1e-5).all()
    assert (sums > 0.45).all()
    # interior points keep all mass
    mid = encodings.oneblob_encode(jnp.full((1, 1), 0.5), n_bins=16)
    np.testing.assert_allclose(np.asarray(mid).sum(), 1.0, atol=1e-5)


def test_frequency_encode_shape():
    x = jnp.ones((5, 3))
    out = encodings.frequency_encode(x, n_frequencies=4, include_input=True)
    assert out.shape == (5, 3 + 3 * 2 * 4)


def test_sdf2weights_peak_at_surface():
    n, s = 4, 64
    z = jnp.broadcast_to(jnp.linspace(0.0, 2.0, s), (n, s))
    surface = 1.0
    sdf = (surface - z)  # positive before surface, negative after
    w = rendering.sdf2weights(sdf, z, truncation=0.1)
    w = np.asarray(w)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-4)
    peak_z = np.asarray(z)[0, w[0].argmax()]
    assert abs(peak_z - surface) < 0.05


def test_raw2outputs_sdf_depth():
    n, s = 8, 48
    z = jnp.broadcast_to(jnp.linspace(0.0, 3.0, s), (n, s))
    surface = 1.5
    raw = jnp.concatenate([jnp.zeros((n, s, 3)), (surface - z)[..., None]], -1)
    rgb, disp, acc, w, depth, dvar = rendering.raw2outputs_sdf(raw, z, truncation=0.1)
    # The sdf2weights scheme truncates asymmetrically; depth lands slightly
    # in front of the surface (the reference behaves identically).
    np.testing.assert_allclose(np.asarray(depth), surface, atol=0.15)
    w = np.asarray(w)
    peak_z = np.asarray(z)[0, w[0].argmax()]
    assert abs(peak_z - surface) < 0.07
    np.testing.assert_allclose(np.asarray(rgb), 0.5, atol=1e-5)  # sigmoid(0)


def test_raw2outputs_occupancy_opaque_first_sample():
    # alpha = sigmoid(10 * occ) (reference: utils.py:230-232): raw occ of -10
    # is transparent (alpha~0), +10 fully opaque (alpha~1).
    n, s = 2, 16
    z = jnp.broadcast_to(jnp.linspace(0.5, 2.0, s), (n, s))
    occ = jnp.full((n, s), -10.0).at[:, 3].set(10.0)
    rgbs = jnp.ones((n, s, 3)) * 0.25
    raw = jnp.concatenate([rgbs, occ[..., None]], -1)
    depth, dvar, rgb, w = rendering.raw2outputs_occupancy(raw, z)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(z[:, 3]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(w[:, 3]), 1.0, atol=1e-3)
    # gradient survives saturated alphas (log-space transmittance)
    g = jax.grad(lambda r: rendering.raw2outputs_occupancy(r, z)[0].sum())(raw)
    assert np.isfinite(np.asarray(g)).all()


def test_sample_pdf_concentrates():
    n, s = 4, 32
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, s), (n, s))
    weights = jnp.zeros((n, s)).at[:, 16].set(100.0)
    out = sampling.sample_pdf(jax.random.PRNGKey(0), bins, weights, 16, det=True)
    med = np.median(np.asarray(out))
    assert abs(med - float(bins[0, 16])) < 0.1


def test_coslam_z_vals_guided_by_depth():
    key = jax.random.PRNGKey(0)
    td = jnp.array([[2.0], [0.0]])
    z = sampling.coslam_z_vals(key, td, 2, near=0.0, far=5.0, n_samples_d=32, range_d=0.1, n_range_d=11, perturb=False)
    assert z.shape == (2, 43)
    z0 = np.asarray(z[0])
    assert ((z0 > 1.89) & (z0 < 2.11)).sum() >= 11  # guided samples near depth
    assert np.all(np.diff(z0) >= 0)


def test_camera_ray_dirs_center():
    cam = Camera(fx=100.0, fy=100.0, cx=50.0, cy=40.0, height=81, width=101)
    dirs = sampling.camera_ray_dirs(cam)
    np.testing.assert_allclose(np.asarray(dirs[40, 50]), [0.0, 0.0, -1.0], atol=1e-6)


def test_rays_from_uv_identity_pose():
    cam = Camera(fx=100.0, fy=100.0, cx=50.0, cy=40.0, height=81, width=101)
    c2w = jnp.eye(4)
    o, d = sampling.rays_from_uv(jnp.array([50.0]), jnp.array([40.0]), c2w, cam)
    np.testing.assert_allclose(np.asarray(d[0]), [0.0, 0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(o[0]), 0.0, atol=1e-6)


def test_sdf_losses_match_reference_formula():
    rng = np.random.RandomState(0)
    n, s = 16, 24
    z = np.sort(rng.rand(n, s).astype(np.float32) * 3.0, -1)
    td = rng.rand(n, 1).astype(np.float32) * 3.0
    sdf = rng.randn(n, s).astype(np.float32)
    tr = 0.1
    # reference math in numpy
    front = (z < td - tr).astype(np.float32)
    back = (z > td + tr).astype(np.float32)
    dmask = (td > 0).astype(np.float32)
    sdfm = (1 - front) * (1 - back) * dmask
    nfs, nsdf = front.sum(), sdfm.sum()
    fw, sw = 1 - nfs / (nfs + nsdf), 1 - nsdf / (nfs + nsdf)
    fs_ref = np.mean((sdf * front - front) ** 2) * fw
    sdf_ref = np.mean(((z + sdf * tr) * sdfm - td * sdfm) ** 2) * sw
    fs, sd = losses.sdf_losses(jnp.asarray(z), jnp.asarray(td), jnp.asarray(sdf), tr)
    np.testing.assert_allclose(float(fs), fs_ref, rtol=1e-4)
    np.testing.assert_allclose(float(sd), sdf_ref, rtol=1e-4)


def test_rgb_depth_losses_with_padding_mask():
    rng = np.random.RandomState(1)
    n = 32
    rgb = rng.rand(n, 3).astype(np.float32)
    trgb = rng.rand(n, 3).astype(np.float32)
    depth = rng.rand(n).astype(np.float32)
    td = rng.rand(n, 1).astype(np.float32)
    full = losses.rgb_depth_losses(jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(trgb), jnp.asarray(td))
    # Padding with masked-out garbage must not change the result.
    pad = 8
    rgb_p = np.concatenate([rgb, rng.rand(pad, 3).astype(np.float32) * 100])
    trgb_p = np.concatenate([trgb, np.zeros((pad, 3), np.float32)])
    depth_p = np.concatenate([depth, np.full(pad, 50.0, np.float32)])
    td_p = np.concatenate([td, np.ones((pad, 1), np.float32)])
    mask = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    padded = losses.rgb_depth_losses(
        jnp.asarray(rgb_p), jnp.asarray(depth_p), jnp.asarray(trgb_p), jnp.asarray(td_p), ray_mask=jnp.asarray(mask)
    )
    np.testing.assert_allclose(float(full[0]), float(padded[0]), rtol=1e-5)
    np.testing.assert_allclose(float(full[1]), float(padded[1]), rtol=1e-5)


def test_spherical_harmonics_encoding():
    """tcnn-parity SH basis: shape per degree, band-energy rotation
    invariance on unit vectors, exact l=0/1 values."""
    import numpy as np

    from xrdslam_tpu.ops.encodings import spherical_harmonics_encode

    rng = np.random.default_rng(0)
    d = rng.normal(size=(256, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    for degree, n in ((1, 1), (2, 4), (3, 9), (4, 16)):
        out = np.asarray(spherical_harmonics_encode(d, degree))
        assert out.shape == (256, n)
    out = np.asarray(spherical_harmonics_encode(d, 4))
    np.testing.assert_allclose(out[:, 0], 0.28209479177387814)
    np.testing.assert_allclose(out[:, 1], -0.48860251190291987 * np.asarray(d)[:, 1], rtol=1e-5)
    # sum of squares within each band is rotation invariant: (2l+1)/(4 pi)
    for lo, hi, l in ((0, 1, 0), (1, 4, 1), (4, 9, 2), (9, 16, 3)):
        e = (out[:, lo:hi] ** 2).sum(-1)
        np.testing.assert_allclose(e, (2 * l + 1) / (4 * np.pi), rtol=1e-4)
    # unit-cube input convention: [0,1]^3 -> [-1,1]^3
    cube = (d + 1.0) / 2.0
    out2 = np.asarray(spherical_harmonics_encode(cube, 4, from_unit_cube=True))
    np.testing.assert_allclose(out2, out, atol=1e-5)


def test_window_slot_frame_invariants():
    """Static-window slot->frame map (base.Algorithm.window_slot_frame):
    covers every real frame, per-frame counts differ by at most one, the
    map is monotone, and the LAST slot always reads the current frame."""
    import numpy as np

    from xrdslam_tpu.algorithms.base import Algorithm

    for W in (1, 2, 3, 5, 8, 10):
        for n_valid in range(1, W + 1):
            fis = [int(Algorithm.window_slot_frame(f, jnp.asarray(n_valid), W))
                   for f in range(W)]
            assert fis[-1] == n_valid - 1, (W, n_valid, fis)
            assert fis == sorted(fis), (W, n_valid, fis)
            counts = np.bincount(fis, minlength=n_valid)
            assert counts.min() >= 1, (W, n_valid, fis)
            assert counts.max() - counts.min() <= 1, (W, n_valid, fis)
