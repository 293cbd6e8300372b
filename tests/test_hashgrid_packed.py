"""Tests for the packed patch-row hash encoder (ops/hashgrid_packed).

Covers: dense-level exactness vs the reference per-vertex encode, custom
VJP correctness vs plain autodiff of the same forward, packed-arg
consistency, and the widened segment_sum."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrdslam_tpu.ops import encodings
from xrdslam_tpu.ops import hashgrid_packed as hp


def _spec(n_levels=4, base=4, finest=48, log2_table=10):
    return encodings.hashgrid_spec(
        n_levels=n_levels, n_features=2, log2_table_size=log2_table,
        base_resolution=base, finest_resolution=finest)


def _plain_forward(tables, x, spec):
    """Same semantics as packed_hash_encode, no custom_vjp anywhere."""
    packed = hp.pack_gather_tables(tables, spec)
    xc = jnp.clip(x, 0.0, 1.0)
    return hp._lerp(hp._fwd_rows(packed, xc, spec), xc, spec)


def test_dense_levels_exact_vs_reference():
    """All-dense spec: packed encode == reference per-vertex encode when
    the vertex grids hold the same values."""
    spec = _spec(n_levels=3, base=3, finest=7, log2_table=10)
    assert all(spec.dense)
    key = jax.random.PRNGKey(0)
    tables = hp.packed_init(key, spec)
    # mirror vertex grids into the [L, T, F] reference layout
    ref_table = np.zeros((spec.n_levels, spec.table_size, spec.n_features), np.float32)
    for l, r in enumerate(spec.resolutions):
        r1 = r + 1
        v = np.asarray(tables[f"v{l}"]).reshape(r1, r1, r1, spec.n_features)
        gx, gy, gz = np.meshgrid(np.arange(r1), np.arange(r1), np.arange(r1), indexing="ij")
        e = gx + r1 * (gy + r1 * gz)  # reference dense index (encodings.py:78-79)
        ref_table[l, e.reshape(-1)] = v.reshape(-1, spec.n_features)
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3), minval=0.01, maxval=0.99)
    out = hp.packed_hash_encode(tables, x, spec)
    ref = encodings.hashgrid_encode(jnp.asarray(ref_table), x, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_custom_vjp_matches_plain_autodiff():
    spec = _spec()
    assert any(spec.dense) and not all(spec.dense)
    tables = hp.packed_init(jax.random.PRNGKey(0), spec)
    # non-trivial magnitudes so gradients aren't degenerate
    tables = {k: v * 1e3 for k, v in tables.items()}
    x = jax.random.uniform(jax.random.PRNGKey(1), (129, 3), minval=0.05, maxval=0.95)
    g = jax.random.normal(jax.random.PRNGKey(2), (129, spec.out_dim))

    def f_opt(t, xx):
        return jnp.sum(hp.packed_hash_encode(t, xx, spec) * g)

    def f_plain(t, xx):
        return jnp.sum(_plain_forward(t, xx, spec) * g)

    np.testing.assert_allclose(float(f_opt(tables, x)), float(f_plain(tables, x)), rtol=1e-5)
    dt_o, dx_o = jax.grad(f_opt, argnums=(0, 1))(tables, x)
    dt_p, dx_p = jax.grad(f_plain, argnums=(0, 1))(tables, x)
    for k in tables:
        np.testing.assert_allclose(np.asarray(dt_o[k]), np.asarray(dt_p[k]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx_o), np.asarray(dx_p), rtol=1e-4, atol=1e-3)


def test_out_of_range_position_gradient_is_zero():
    spec = _spec()
    tables = hp.packed_init(jax.random.PRNGKey(0), spec)
    x = jnp.asarray([[-0.2, 0.5, 0.5], [0.5, 1.3, 0.5]])
    dx = jax.grad(lambda xx: jnp.sum(hp.packed_hash_encode(tables, xx, spec)))(x)
    assert float(jnp.abs(dx[0, 0])) == 0.0
    assert float(jnp.abs(dx[1, 1])) == 0.0


def test_packed_arg_consistency_and_batch_shapes():
    spec = _spec()
    tables = hp.packed_init(jax.random.PRNGKey(0), spec)
    packed = hp.pack_gather_tables(tables, spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 7, 3))
    a = hp.packed_hash_encode(tables, x, spec)
    b = hp.packed_hash_encode(tables, x, spec, packed=packed)
    assert a.shape == (4, 7, spec.out_dim)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.parametrize("rows", [32768, 65536, 19773 * 3])
def test_widened_segsum(rows):
    n, w = 1000, 16
    key = jax.random.PRNGKey(0)
    vals = jax.random.normal(key, (n, w))
    rid = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, rows)
    ref = jax.ops.segment_sum(vals, rid, num_segments=rows)
    out = hp._widened_segsum(vals, rid, rows)
    assert hp._scatter_k(rows) > 1
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_continuity_within_cell_and_dense_across():
    """Dense levels stay continuous across cell borders (vertex sharing)."""
    spec = _spec(n_levels=2, base=4, finest=8, log2_table=12)
    assert all(spec.dense)
    tables = hp.packed_init(jax.random.PRNGKey(3), spec)
    eps = 1e-6
    # straddle the x = 0.5 cell boundary of the res-4 and res-8 grids
    xa = jnp.asarray([[0.5 - eps, 0.3, 0.7]])
    xb = jnp.asarray([[0.5 + eps, 0.3, 0.7]])
    a = hp.packed_hash_encode(tables, xa, spec)
    b = hp.packed_hash_encode(tables, xb, spec)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
