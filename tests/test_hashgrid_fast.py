"""Cross-checks for the optimized hash-grid encode (feature-major fwd +
Pallas matmul-scatter bwd) against the reference implementation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jax.experimental.pallas as pl

from xrdslam_tpu.ops import encodings


@pytest.fixture()
def interp_pallas(monkeypatch):
    """Run pallas kernels in interpreter mode (CPU tests)."""
    import xrdslam_tpu.ops.hashgrid_fast as hf

    orig = pl.pallas_call
    monkeypatch.setattr(hf.pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    return hf


def test_forward_matches_reference(interp_pallas):
    hf = interp_pallas
    spec = encodings.hashgrid_spec(6, 2, 10, 8, 100)
    table = encodings.hashgrid_init(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (700, 3))
    ref = encodings.hashgrid_encode(table, x, spec)
    out = hf.hashgrid_encode_opt(table, x, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_gradients_match_reference(interp_pallas):
    hf = interp_pallas
    spec = encodings.hashgrid_spec(6, 2, 10, 8, 100)
    table = encodings.hashgrid_init(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (700, 3))
    g = jax.random.normal(jax.random.PRNGKey(2), (700, 12))
    dt_ref, dx_ref = jax.grad(
        lambda t, x: jnp.sum(encodings.hashgrid_encode(t, x, spec) * g), argnums=(0, 1)
    )(table, x)
    dt, dx = jax.grad(lambda t, x: jnp.sum(hf.hashgrid_encode_opt(t, x, spec) * g), argnums=(0, 1))(table, x)
    # dtable goes through bf16 one-hot matmuls: ~1e-3 relative
    ref_max = float(jnp.abs(dt_ref).max())
    assert float(jnp.abs(dt - dt_ref).max()) < 5e-3 * max(ref_max, 1.0)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-5)


def test_nonblock_sizes_padded(interp_pallas):
    hf = interp_pallas
    spec = encodings.hashgrid_spec(2, 2, 10, 8, 32)
    table = encodings.hashgrid_init(jax.random.PRNGKey(0), spec)
    for n in (1, 511, 513, 1024):
        x = jax.random.uniform(jax.random.PRNGKey(n), (n, 3))
        out = hf.hashgrid_encode_opt(table, x, spec)
        ref = encodings.hashgrid_encode(table, x, spec)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_batch_shape_preserved(interp_pallas):
    hf = interp_pallas
    spec = encodings.hashgrid_spec(2, 2, 10, 8, 32)
    table = encodings.hashgrid_init(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(0), (13, 7, 3))
    out = hf.hashgrid_encode_opt(table, x, spec)
    assert out.shape == (13, 7, 4)
