"""Pure-JAX Lie-group utilities: SO(3)/SE(3) in quaternion / axis-angle form.

TPU-native replacement for two reference dependencies:
  * the pytorch3d quaternion converters used by ``OptimizablePose``
    (reference: slam/utils/opt_pose.py:8-10), and
  * the ``lietorch_backends`` CUDA extension
    (reference: third_party/dpvo_ext/lietorch/ — se3.h, so3.h, lietorch_gpu.cu).

Everything here is a pure, differentiable function of ``jnp`` arrays with
arbitrary leading batch dimensions; no kernels are required — XLA fuses these
elementwise chains into surrounding computation. Small-angle neighbourhoods
use Taylor expansions selected with ``jnp.where`` so gradients stay finite
(there is no data-dependent branching, keeping everything jit-safe).

Quaternion convention: ``(w, x, y, z)`` scalar-first (pytorch3d convention,
so pose vectors round-trip against the reference's semantics).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# small-angle-safe trig helpers
# ---------------------------------------------------------------------------

def _sinc(theta2):
    """sin(t)/t as a function of t^2, Taylor-guarded near 0."""
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    return jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)


def _cosc(theta2):
    """(1 - cos(t))/t^2 as a function of t^2, Taylor-guarded near 0."""
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    return jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))


def skew(v):
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )


# ---------------------------------------------------------------------------
# axis-angle <-> rotation matrix (SO(3) exp / log)
# ---------------------------------------------------------------------------

def _skew_squared(r):
    """K(r)^2 computed as r r^T - |r|^2 I — elementwise (VPU) instead of a
    3x3 matmul, which would run on the TPU MXU at bf16 precision and cost
    ~5e-3 absolute error near theta=pi."""
    theta2 = jnp.sum(r * r, axis=-1)
    outer = r[..., :, None] * r[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), outer.shape)
    return outer - theta2[..., None, None] * eye


def axis_angle_to_matrix(r):
    """Rodrigues formula. [..., 3] -> [..., 3, 3].

    Matches OptimizablePose.axis_angle_to_rotation_matrix
    (reference: slam/utils/opt_pose.py:77-95) but smooth at the identity.
    """
    theta2 = jnp.sum(r * r, axis=-1)
    K = skew(r)
    KK = _skew_squared(r)
    a = _sinc(theta2)[..., None, None]
    b = _cosc(theta2)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), K.shape)
    return eye + a * K + b * KK


so3_exp = axis_angle_to_matrix


def matrix_to_axis_angle(R):
    """SO(3) log map. [..., 3, 3] -> [..., 3]."""
    return quaternion_to_axis_angle(matrix_to_quaternion(R))


# ---------------------------------------------------------------------------
# quaternion ops
# ---------------------------------------------------------------------------

def quaternion_to_matrix(q):
    """[..., 4] (w,x,y,z) -> [..., 3, 3]. Normalizes the input quaternion."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        -2,
    )


def matrix_to_quaternion(R):
    """[..., 3, 3] -> [..., 4] (w,x,y,z), w >= 0.

    Branch-free variant of Shepperd's method: compute all four candidate
    quaternions and select the numerically best (largest pivot) per element.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four pivot magnitudes (4w^2, 4x^2, 4y^2, 4z^2), all >= 0 up to fp error.
    pw = 1.0 + tr
    px = 1.0 + m00 - m11 - m22
    py = 1.0 - m00 + m11 - m22
    pz = 1.0 - m00 - m11 + m22
    pivots = jnp.stack([pw, px, py, pz], -1)
    best = jnp.argmax(pivots, axis=-1)

    sw = jnp.sqrt(jnp.maximum(pw, _EPS)) * 2.0  # = 4w
    qw_w = 0.25 * sw
    qx_w = (m21 - m12) / sw
    qy_w = (m02 - m20) / sw
    qz_w = (m10 - m01) / sw

    sx = jnp.sqrt(jnp.maximum(px, _EPS)) * 2.0  # = 4x
    qw_x = (m21 - m12) / sx
    qx_x = 0.25 * sx
    qy_x = (m01 + m10) / sx
    qz_x = (m02 + m20) / sx

    sy = jnp.sqrt(jnp.maximum(py, _EPS)) * 2.0  # = 4y
    qw_y = (m02 - m20) / sy
    qx_y = (m01 + m10) / sy
    qy_y = 0.25 * sy
    qz_y = (m12 + m21) / sy

    sz = jnp.sqrt(jnp.maximum(pz, _EPS)) * 2.0  # = 4z
    qw_z = (m10 - m01) / sz
    qx_z = (m02 + m20) / sz
    qy_z = (m12 + m21) / sz
    qz_z = 0.25 * sz

    qs = jnp.stack(
        [
            jnp.stack([qw_w, qx_w, qy_w, qz_w], -1),
            jnp.stack([qw_x, qx_x, qy_x, qz_x], -1),
            jnp.stack([qw_y, qx_y, qy_y, qz_y], -1),
            jnp.stack([qw_z, qx_z, qy_z, qz_z], -1),
        ],
        -2,
    )  # [..., 4 candidates, 4]
    q = jnp.take_along_axis(qs, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def quaternion_to_axis_angle(q):
    """[..., 4] (w,x,y,z) -> [..., 3]."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1)
    half = jnp.arctan2(sin_half, w)
    # theta/sin(theta/2), guarded near zero: -> 2 + theta^2/12 ...
    scale = jnp.where(sin_half < 1e-6, 2.0 + (2.0 / 3.0) * sin_half * sin_half, 2.0 * half / jnp.maximum(sin_half, _EPS))
    return xyz * scale[..., None]


def axis_angle_to_quaternion(r):
    """[..., 3] -> [..., 4] (w,x,y,z)."""
    theta2 = jnp.sum(r * r, -1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    half = 0.5 * theta
    small = theta2 < 1e-8
    # sin(t/2)/t, Taylor: 1/2 - t^2/48
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w[..., None], r * k[..., None]], -1)


def quaternion_multiply(a, b):
    """Hamilton product of (w,x,y,z) quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        -1,
    )


def quaternion_rotate(q, v):
    """Rotate points v [..., 3] by quaternion q [..., 4]."""
    xyz = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


# ---------------------------------------------------------------------------
# pose vectors <-> 4x4 matrices
# ---------------------------------------------------------------------------

def pose_vec_to_matrix(t, r, rot_rep: str = "axis_angle"):
    """(translation [...,3], rotation [...,3|4]) -> [..., 4, 4] c2w matrix."""
    if rot_rep == "axis_angle":
        R = axis_angle_to_matrix(r)
    elif rot_rep == "quat":
        R = quaternion_to_matrix(r)
    else:
        raise ValueError(f"unknown rot_rep {rot_rep}")
    batch = R.shape[:-2]
    M = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    M = M.at[..., :3, :3].set(R)
    M = M.at[..., :3, 3].set(t)
    M = M.at[..., 3, 3].set(1.0)
    return M


def matrix_to_pose_vec(M, rot_rep: str = "axis_angle"):
    """[..., 4, 4] -> (translation [...,3], rotation [...,3|4])."""
    t = M[..., :3, 3]
    q = matrix_to_quaternion(M[..., :3, :3])
    if rot_rep == "axis_angle":
        return t, quaternion_to_axis_angle(q)
    if rot_rep == "quat":
        return t, q
    raise ValueError(f"unknown rot_rep {rot_rep}")


# ---------------------------------------------------------------------------
# SE(3) exp / log (for DPVO-style bundle adjustment)
# ---------------------------------------------------------------------------

def se3_exp(xi):
    """se(3) tangent [..., 6] (v, w) -> [..., 4, 4]."""
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, -1)
    K = skew(w)
    KK = _skew_squared(w)
    a = _sinc(theta2)[..., None, None]
    b = _cosc(theta2)[..., None, None]
    # c = (1 - sinc(t)) / t^2, Taylor: 1/6 - t^2/120
    theta2c = jnp.maximum(theta2, _EPS)
    c = jnp.where(theta2 < 1e-8, 1.0 / 6.0 - theta2 / 120.0, (1.0 - _sinc(theta2)) / theta2c)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    R = eye + a * K + b * KK
    V = eye + b * K + c * KK
    t = jnp.einsum('...ij,...j->...i', V, v, precision=jax.lax.Precision.HIGHEST)
    batch = R.shape[:-2]
    M = jnp.zeros(batch + (4, 4), dtype=xi.dtype)
    M = M.at[..., :3, :3].set(R)
    M = M.at[..., :3, 3].set(t)
    M = M.at[..., 3, 3].set(1.0)
    return M


def se3_log(M):
    """[..., 4, 4] -> se(3) tangent [..., 6] (v, w)."""
    w = matrix_to_axis_angle(M[..., :3, :3])
    theta2 = jnp.sum(w * w, -1)
    K = skew(w)
    KK = _skew_squared(w)
    b = _cosc(theta2)[..., None, None]
    theta2c = jnp.maximum(theta2, _EPS)
    c = jnp.where(theta2 < 1e-8, 1.0 / 6.0 - theta2 / 120.0, (1.0 - _sinc(theta2)) / theta2c)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), K.shape)
    V = eye + b * K + c * KK
    v = jnp.linalg.solve(V, M[..., :3, 3][..., None])[..., 0]
    return jnp.concatenate([v, w], -1)


def pose_inverse(M):
    """Invert [..., 4, 4] rigid transforms."""
    R = M[..., :3, :3]
    t = M[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum('...ij,...j->...i', Rt, t, precision=jax.lax.Precision.HIGHEST)
    out = jnp.zeros_like(M)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out
