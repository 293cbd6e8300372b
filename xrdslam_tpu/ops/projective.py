"""Projective patch operations for DPVO-style visual odometry.

Pure-JAX rebuild of the reference's projective ops (reference:
slam/model_components/projective_ops_dpvo.py:53-156 + lietorch SE3): patch
inverse/forward projection between frames with SE(3) poses in (t, quat)
form. The reference's analytic-Jacobian CUDA path is unnecessary — the
bundle adjuster differentiates these functions with jax.jacfwd per edge.

Convention: pinhole OpenCV-style (+z forward) like DPVO; poses are
world-to-camera (DPVO convention), stored as t [3] + quat [4] (w,x,y,z).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import lie


def iproj(patch_uvd: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Inverse-project patch pixels (u, v, inv_depth) -> homogeneous 3D.

    patch_uvd [..., 3]; intrinsics [4] (fx, fy, cx, cy).
    Returns [..., 4] (X, Y, Z=1, W=inv_depth) scaled coordinates
    (projective_ops_dpvo.py:9-25).
    """
    fx, fy, cx, cy = intrinsics
    u, v, d = patch_uvd[..., 0], patch_uvd[..., 1], patch_uvd[..., 2]
    x = (u - cx) / fx
    y = (v - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x), d], -1)


def proj(pts: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Project homogeneous points [..., 4] -> pixels [..., 2]."""
    fx, fy, cx, cy = intrinsics
    z = jnp.maximum(pts[..., 2], 1e-4)
    u = fx * (pts[..., 0] / z) + cx
    v = fy * (pts[..., 1] / z) + cy
    return jnp.stack([u, v], -1)


def se3_act(t: jnp.ndarray, q: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply SE3 (t, quat) to homogeneous points [..., 4]:
    X' = R X + W t (lietorch act on (x,y,z,w))."""
    rotated = lie.quaternion_rotate(jnp.broadcast_to(q, pts.shape[:-1] + (4,)), pts[..., :3])
    return jnp.concatenate([rotated + pts[..., 3:4] * t, pts[..., 3:4]], -1)


def se3_inv_act(t: jnp.ndarray, q: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    qc = q * jnp.asarray([1.0, -1.0, -1.0, -1.0])
    shifted = pts[..., :3] - pts[..., 3:4] * t
    rotated = lie.quaternion_rotate(jnp.broadcast_to(qc, pts.shape[:-1] + (4,)), shifted)
    return jnp.concatenate([rotated, pts[..., 3:4]], -1)


def reproject(
    poses_t: jnp.ndarray,
    poses_q: jnp.ndarray,
    patch_uvd: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    tonly: bool = False,
) -> jnp.ndarray:
    """Reproject patches from frame ii into frame jj
    (projective_ops_dpvo.py:53-76 ``transform``).

    poses are world-to-camera: X_cam_j = T_j T_i^{-1} X_cam_i.
    patch_uvd [E, ..., 3] (pixels+invdepth in frame ii).
    ``tonly`` zeroes the relative rotation (transform(..., tonly=True),
    used by flow_mag's translation-only branch).
    Returns pixel coords [E, ..., 2] in frame jj.
    """
    X_i = iproj(patch_uvd, intrinsics)
    ti = jnp.take(poses_t, ii, axis=0)
    qi = jnp.take(poses_q, ii, axis=0)
    tj = jnp.take(poses_t, jj, axis=0)
    qj = jnp.take(poses_q, jj, axis=0)

    def one(ti_, qi_, tj_, qj_, X):
        Xw = se3_inv_act(ti_, qi_, X)
        Xj = se3_act(tj_, qj_, Xw)
        return proj(Xj, intrinsics)

    if tonly:
        # Gij = T_j T_i^{-1} with rotation forced to identity: act on the
        # camera-i points with translation t_ij = t_j - R_j R_i^T t_i ...
        # equivalently compose then strip rotation; do it per edge.
        def one_t(ti_, qi_, tj_, qj_, X):
            # relative SE3 (R_ij, t_ij)
            qc = qi_ * jnp.asarray([1.0, -1.0, -1.0, -1.0])
            q_rel = lie.quaternion_multiply(qj_, qc)
            t_rel = tj_ - lie.quaternion_rotate(q_rel[None], ti_[None])[0]
            Xj = jnp.concatenate(
                [X[..., :3] + X[..., 3:4] * t_rel, X[..., 3:4]], -1)
            return proj(Xj, intrinsics)

        return jax.vmap(one_t)(ti, qi, tj, qj, X_i)

    return jax.vmap(one)(ti, qi, tj, qj, X_i)


def point_cloud(poses_t, poses_q, patch_uvd, intrinsics, ii):
    """World-frame 3D points of patch centers (projective_ops:141-143)."""
    X = iproj(patch_uvd, intrinsics)
    ti = jnp.take(poses_t, ii, axis=0)
    qi = jnp.take(poses_q, ii, axis=0)
    Xw = jax.vmap(lambda t, q, x: se3_inv_act(t, q, x))(ti, qi, X)
    w = jnp.maximum(Xw[..., 3:4], 1e-8)
    return Xw[..., :3] / w


def flow_mag(poses_t, poses_q, patch_uvd, intrinsics, ii, jj,
             beta: float = 0.5) -> jnp.ndarray:
    """Per-edge flow magnitude (projective_ops_dpvo.py:146-156): a beta-mix
    of the full reprojection flow and the translation-only flow, both
    relative to the identity i->i reprojection. Used for DPVO keyframing
    (dpvo.py:268-282, beta=0.5)."""
    coords0 = patch_uvd[..., :2]
    coords1 = reproject(poses_t, poses_q, patch_uvd, intrinsics, ii, jj)
    coords2 = reproject(poses_t, poses_q, patch_uvd, intrinsics, ii, jj,
                        tonly=True)
    flow1 = jnp.linalg.norm(coords1 - coords0, axis=-1)
    flow2 = jnp.linalg.norm(coords2 - coords0, axis=-1)
    mag = beta * flow1 + (1.0 - beta) * flow2
    return mag.mean(axis=tuple(range(1, mag.ndim)))
