"""Patch correlation op (altcorr replacement) tests."""
import jax.numpy as jnp
import numpy as np

from xrdslam_tpu.ops.correlation import (bilinear_sample, extract_patches,
                                         patch_correlation)


def test_bilinear_sample_exact_and_interp():
    rng = np.random.default_rng(0)
    fmap = jnp.asarray(rng.normal(size=(4, 9, 11)).astype(np.float32))
    # integer coords reproduce the map exactly
    pts = jnp.asarray([[3.0, 2.0], [0.0, 0.0], [10.0, 8.0]])
    out = bilinear_sample(fmap, pts)
    np.testing.assert_allclose(out[0], fmap[:, 2, 3], atol=1e-6)
    np.testing.assert_allclose(out[1], fmap[:, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[2], fmap[:, 8, 10], atol=1e-6)
    # midpoint is the average of the 4 neighbors
    mid = bilinear_sample(fmap, jnp.asarray([[3.5, 2.5]]))[0]
    ref = 0.25 * (fmap[:, 2, 3] + fmap[:, 2, 4] + fmap[:, 3, 3] + fmap[:, 3, 4])
    np.testing.assert_allclose(mid, ref, atol=1e-6)
    # out of bounds -> 0
    np.testing.assert_allclose(bilinear_sample(fmap, jnp.asarray([[-5.0, -5.0]]))[0], 0.0)


def test_patch_correlation_peak_at_true_offset():
    """Correlating a patch with the map it was extracted from peaks at the
    zero-offset window cell."""
    rng = np.random.default_rng(1)
    C, H, W = 64, 32, 40
    fmaps = jnp.asarray(rng.normal(size=(2, C, H, W)).astype(np.float32))
    centers = jnp.asarray([[12.0, 9.0], [25.0, 20.0], [7.0, 15.0]])
    gp = extract_patches(fmaps[1], centers, p=3)  # [3, C, 3, 3]
    # patch pixel coords around the centers (the true location)
    d = jnp.arange(3, dtype=jnp.float32) - 1.0
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    coords = centers[:, None, None, :] + jnp.stack([dx, dy], -1)[None]
    jj = jnp.asarray([1, 1, 1], jnp.int32)
    corr = patch_correlation(fmaps, gp, coords, jj, radius=2)  # [3,3,3,5,5]
    assert corr.shape == (3, 3, 3, 5, 5)
    c = np.asarray(corr)
    flat = c.reshape(3, 3, 3, -1)
    # argmax over the window must be the center cell (2,2) -> index 12
    assert (flat.argmax(-1) == 12).all()


def test_extract_patches_integer_centers():
    rng = np.random.default_rng(2)
    fmap = jnp.asarray(rng.normal(size=(8, 16, 16)).astype(np.float32))
    pat = extract_patches(fmap, jnp.asarray([[5.0, 6.0]]), p=3)[0]  # [8,3,3]
    np.testing.assert_allclose(pat[:, 1, 1], fmap[:, 6, 5], atol=1e-6)
    np.testing.assert_allclose(pat[:, 0, 0], fmap[:, 5, 4], atol=1e-6)
