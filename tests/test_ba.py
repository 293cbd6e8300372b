"""Projective ops + Gauss-Newton bundle adjustment tests (DPVO groundwork)."""
import jax
import jax.numpy as jnp
import numpy as np

from xrdslam_tpu.ops import lie, projective
from xrdslam_tpu.ops.ba import bundle_adjust


def make_scene(n_frames=4, n_patches=24, seed=0):
    """Random 3D points observed from a moving camera; exact targets."""
    rng = np.random.RandomState(seed)
    intr = jnp.asarray([120.0, 120.0, 80.0, 60.0])
    pts_w = rng.rand(n_patches, 3) * np.array([2, 2, 1]) + np.array([-1, -1, 3.0])
    poses_t, poses_q = [], []
    for i in range(n_frames):
        # camera at small offsets, +z forward (w2c close to identity)
        t = np.array([0.1 * i, 0.02 * i, 0.0])
        r = np.array([0.0, 0.01 * i, 0.0])
        R = np.asarray(lie.axis_angle_to_matrix(jnp.asarray(r)))
        w2c_t = -R @ t
        poses_t.append(w2c_t)
        poses_q.append(np.asarray(lie.matrix_to_quaternion(jnp.asarray(R))))
    poses_t = jnp.asarray(np.stack(poses_t), jnp.float32)
    poses_q = jnp.asarray(np.stack(poses_q), jnp.float32)

    # patches hosted in frame 0: project points into frame 0
    def w2c_apply(t, q, p):
        return np.asarray(lie.quaternion_to_matrix(q)) @ p + np.asarray(t)

    patch_list = []
    for p in pts_w:
        pc = w2c_apply(poses_t[0], poses_q[0], p)
        u = float(intr[0] * pc[0] / pc[2] + intr[2])
        v = float(intr[1] * pc[1] / pc[2] + intr[3])
        patch_list.append([u, v, 1.0 / pc[2]])
    patches = jnp.asarray(patch_list, jnp.float32)

    # edges: every patch into every frame
    ii, jj, kk, targets = [], [], [], []
    for f in range(n_frames):
        for k in range(n_patches):
            pc = w2c_apply(poses_t[f], poses_q[f], pts_w[k])
            ii.append(0)
            jj.append(f)
            kk.append(k)
            targets.append([float(intr[0] * pc[0] / pc[2] + intr[2]), float(intr[1] * pc[1] / pc[2] + intr[3])])
    return (
        poses_t, poses_q, patches, jnp.asarray(targets, jnp.float32),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk), intr,
    )


def test_reproject_exact_on_gt():
    poses_t, poses_q, patches, targets, ii, jj, kk, intr = make_scene()
    pred = projective.reproject(poses_t, poses_q, patches[kk], intr, ii, jj)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(targets), atol=1e-2)


def test_ba_recovers_perturbed_poses():
    poses_t, poses_q, patches, targets, ii, jj, kk, intr = make_scene()
    rng = np.random.RandomState(1)
    pt = poses_t + jnp.asarray(np.concatenate([np.zeros((1, 3)), 0.03 * rng.randn(3, 3)]), jnp.float32)
    w = jnp.ones_like(targets)
    new_t, new_q, new_p = bundle_adjust(pt, poses_q, patches, targets, w, ii, jj, kk, intr, t0=1, iterations=6, lm=1e-5, ep=1e-5)
    err_before = float(jnp.abs(pt[1:] - poses_t[1:]).max())
    err_after = float(jnp.abs(new_t[1:] - poses_t[1:]).max())
    assert err_after < 0.25 * err_before, (err_before, err_after)
    # residuals shrink
    r0 = projective.reproject(pt, poses_q, patches[kk], intr, ii, jj) - targets
    r1 = projective.reproject(new_t, new_q, new_p[kk], intr, ii, jj) - targets
    assert float(jnp.abs(r1).mean()) < 0.2 * float(jnp.abs(r0).mean())


def test_ba_recovers_depths():
    poses_t, poses_q, patches, targets, ii, jj, kk, intr = make_scene()
    rng = np.random.RandomState(2)
    pert = patches.at[:, 2].multiply(jnp.asarray(1.0 + 0.2 * rng.randn(patches.shape[0]), jnp.float32))
    w = jnp.ones_like(targets)
    _, _, new_p = bundle_adjust(poses_t, poses_q, pert, targets, w, ii, jj, kk, intr, t0=4, iterations=6, lm=1e-5, ep=1e-5)
    err_before = float(jnp.abs(pert[:, 2] - patches[:, 2]).mean())
    err_after = float(jnp.abs(new_p[:, 2] - patches[:, 2]).mean())
    assert err_after < 0.3 * err_before, (err_before, err_after)


def test_flow_mag_zero_for_same_frame():
    poses_t, poses_q, patches, targets, ii, jj, kk, intr = make_scene()
    fm = projective.flow_mag(poses_t, poses_q, patches[kk[:24]], intr, ii[:24], ii[:24])
    np.testing.assert_allclose(np.asarray(fm), 0.0, atol=1e-3)
