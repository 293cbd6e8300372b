"""Lie-group identity tests, modeled on the reference's lietorch self-tests
(reference: third_party/dpvo_ext/lietorch/run_tests.py:17-40)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrdslam_tpu.ops import lie


def rand_axis_angle(key, n=64, scale=2.0):
    return scale * jax.random.normal(key, (n, 3))


def test_axis_angle_matrix_roundtrip():
    key = jax.random.PRNGKey(0)
    r = rand_axis_angle(key)
    R = lie.axis_angle_to_matrix(r)
    # orthonormality
    eye = jnp.eye(3)[None].repeat(r.shape[0], 0)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
    # log(exp(r)) == r for |r| < pi
    r_small = 0.9 * np.pi * r / (1e-9 + np.linalg.norm(np.asarray(r), axis=-1, keepdims=True)) * np.random.RandomState(0).rand(r.shape[0], 1)
    r2 = lie.matrix_to_axis_angle(lie.axis_angle_to_matrix(jnp.asarray(r_small)))
    np.testing.assert_allclose(np.asarray(r2), r_small, atol=1e-4)


def test_axis_angle_zero():
    R = lie.axis_angle_to_matrix(jnp.zeros((3,)))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
    # gradient is finite at zero
    g = jax.grad(lambda r: lie.axis_angle_to_matrix(r).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_quaternion_matrix_roundtrip():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (128, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    R = lie.quaternion_to_matrix(q)
    q2 = lie.matrix_to_quaternion(R)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)


def test_quaternion_axis_angle_roundtrip():
    key = jax.random.PRNGKey(2)
    r = 0.99 * np.pi * jax.random.ball(key, 3, shape=(64,))
    q = lie.axis_angle_to_quaternion(r)
    r2 = lie.quaternion_to_axis_angle(q)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=1e-4)


def test_quaternion_rotate_matches_matrix():
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    q = jax.random.normal(k1, (32, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    v = jax.random.normal(k2, (32, 3))
    out1 = lie.quaternion_rotate(q, v)
    out2 = (lie.quaternion_to_matrix(q) @ v[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_pose_vec_matrix_roundtrip_reference_pose():
    # The exact pose used in the reference's own self-check
    # (slam/utils/opt_pose.py:112-124).
    before = jnp.array(
        [
            [-0.955421, 0.119616, -0.269932, 2.655830],
            [0.295248, 0.388339, -0.872939, 2.981598],
            [0.000408, -0.913720, -0.406343, 1.368648],
            [0.000000, 0.000000, 0.000000, 1.000000],
        ]
    )
    for rep in ("axis_angle", "quat"):
        t, r = lie.matrix_to_pose_vec(before, rot_rep=rep)
        after = lie.pose_vec_to_matrix(t, r, rot_rep=rep)
        np.testing.assert_allclose(np.asarray(after), np.asarray(before), atol=1e-3)


def test_se3_exp_log_roundtrip():
    key = jax.random.PRNGKey(4)
    xi = 0.5 * jax.random.normal(key, (32, 6))
    M = lie.se3_exp(xi)
    xi2 = lie.se3_log(M)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_se3_inverse():
    key = jax.random.PRNGKey(5)
    xi = jax.random.normal(key, (16, 6))
    M = lie.se3_exp(xi)
    MI = lie.pose_inverse(M)
    eye = np.tile(np.eye(4), (16, 1, 1))
    np.testing.assert_allclose(np.asarray(M @ MI), eye, atol=1e-5)


def test_matrix_to_quaternion_degenerate_cases():
    # rotations by pi around each axis exercise all pivot branches
    for axis in range(3):
        r = np.zeros(3)
        r[axis] = np.pi
        R = lie.axis_angle_to_matrix(jnp.asarray(r))
        q = lie.matrix_to_quaternion(R)
        R2 = lie.quaternion_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_numpy_lie_matches_jax():
    """ops.lie_np must agree with ops.lie on random poses."""
    from xrdslam_tpu.ops import lie_np

    rng = np.random.RandomState(7)
    for _ in range(20):
        r = rng.randn(3) * 1.5
        t = rng.randn(3)
        for rep in ("axis_angle", "quat"):
            rot = r if rep == "axis_angle" else np.asarray(lie.axis_angle_to_quaternion(jnp.asarray(r, jnp.float32)))
            Mj = np.asarray(lie.pose_vec_to_matrix(jnp.asarray(t, jnp.float32), jnp.asarray(rot, jnp.float32), rot_rep=rep))
            Mn = lie_np.pose_vec_to_matrix(t, rot, rot_rep=rep)
            np.testing.assert_allclose(Mn, Mj, atol=1e-5)
            tj, rj = lie.matrix_to_pose_vec(jnp.asarray(Mj), rot_rep=rep)
            tn, rn = lie_np.matrix_to_pose_vec(Mj, rot_rep=rep)
            np.testing.assert_allclose(tn, np.asarray(tj), atol=1e-5)
            np.testing.assert_allclose(rn, np.asarray(rj), atol=1e-4)
