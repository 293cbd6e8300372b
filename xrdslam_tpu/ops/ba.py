"""Gauss-Newton bundle adjustment for patch-based VO (the fastba
replacement).

Pure-JAX rebuild of the reference's fused CUDA bundle adjuster (reference:
third_party/dpvo_ext/fastba/ba_cuda.cu — Hessian build, Schur-style solve,
SE3/depth retractions; invoked from slam/algorithms/dpvo.py:324-355).
Design per SURVEY §2.7: per-edge residual Jacobians come from jax.jacfwd of
the reprojection (no hand-derived CUDA Jacobians), blocks accumulate with
segment-sums, the patch-depth blocks are eliminated by a Schur complement
(they are scalars per patch), and the reduced pose system solves with a
damped Cholesky. Everything is static-shape and jit/scan-safe.

State layout: poses (t [N,3], q [N,4], world-to-camera), patch centers
(u, v, inv_depth) [M, 3], edges (ii frame of patch, jj target frame,
kk patch id) with per-edge 2D targets and confidence weights.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import lie
from .projective import iproj, proj, se3_act, se3_inv_act


def _edge_residual(pose_i, pose_j, patch, target, intrinsics):
    """Residual of one edge at the patch center. pose = (t, q); patch
    (u, v, invd); returns r [2]."""
    ti, qi = pose_i[:3], pose_i[3:]
    tj, qj = pose_j[:3], pose_j[3:]
    X = iproj(patch, intrinsics)
    Xw = se3_inv_act(ti, qi, X)
    Xj = se3_act(tj, qj, Xw)
    return target - proj(Xj, intrinsics)


def _edge_linearize(pose_i, pose_j, patch, target, intrinsics):
    """Jacobians on the SE3 tangent (left-perturbation of each pose) and
    inverse depth. Returns (r [2], Ji [2,6], Jj [2,6], Jd [2])."""

    def f(xi_i, xi_j, invd):
        dTi = lie.se3_exp(xi_i)
        dTj = lie.se3_exp(xi_j)
        ti, qi = pose_i[:3], pose_i[3:]
        tj, qj = pose_j[:3], pose_j[3:]
        # left-multiply perturbations: T <- Exp(xi) T
        Ri = lie.quaternion_to_matrix(qi)
        Rj = lie.quaternion_to_matrix(qj)
        Ri_new = dTi[:3, :3] @ Ri
        ti_new = dTi[:3, :3] @ ti + dTi[:3, 3]
        Rj_new = dTj[:3, :3] @ Rj
        tj_new = dTj[:3, :3] @ tj + dTj[:3, 3]
        qi_new = lie.matrix_to_quaternion(Ri_new)
        qj_new = lie.matrix_to_quaternion(Rj_new)
        p = jnp.asarray([patch[0], patch[1], invd])
        X = iproj(p, intrinsics)
        Xw = se3_inv_act(ti_new, qi_new, X)
        Xj = se3_act(tj_new, qj_new, Xw)
        return target - proj(Xj, intrinsics)

    zeros6 = jnp.zeros(6)
    r = f(zeros6, zeros6, patch[2])
    Ji, Jj, Jd = jax.jacfwd(f, argnums=(0, 1, 2))(zeros6, zeros6, patch[2])
    return r, Ji, Jj, Jd


def bundle_adjust(
    poses_t: jnp.ndarray,
    poses_q: jnp.ndarray,
    patches: jnp.ndarray,
    targets: jnp.ndarray,
    weights: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    kk: jnp.ndarray,
    intrinsics: jnp.ndarray,
    t0: int,
    iterations: int = 2,
    lm: float = 1e-4,
    ep: float = 0.1,
    edge_mask: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Joint pose + inverse-depth Gauss-Newton (fastba semantics).

    Args:
        poses_t/q: [N] world-to-camera poses.
        patches: [M, 3] (u, v, inv_depth) in their host frames.
        targets/weights: [E, 2] per-edge target pixels + confidences.
        ii/jj/kk: [E] host frame / target frame / patch index per edge.
        t0: poses with index < t0 are held fixed (gauge).
    Returns:
        (poses_t, poses_q, patches) updated.
    """
    n = poses_t.shape[0]
    m = patches.shape[0]
    if edge_mask is None:
        edge_mask = jnp.ones(targets.shape[0], jnp.float32)

    def gn_iter(state, _):
        poses_t, poses_q, patches = state
        pose_vec = jnp.concatenate([poses_t, poses_q], -1)  # [N, 7]

        def lin(e_ii, e_jj, e_kk, tgt):
            return _edge_linearize(pose_vec[e_ii], pose_vec[e_jj], patches[e_kk], tgt, intrinsics)

        r, Ji, Jj, Jd = jax.vmap(lin)(ii, jj, kk, targets)  # [E,2],[E,2,6],[E,2,6],[E,2]
        w = weights * edge_mask[:, None]  # [E, 2]
        # free only poses >= t0
        free_i = (ii >= t0).astype(jnp.float32)[:, None, None]
        free_j = (jj >= t0).astype(jnp.float32)[:, None, None]
        Ji = Ji * free_i
        Jj = Jj * free_j

        # Hessian blocks: pose system [N*6, N*6] (N is small) assembled dense
        def outer(Ja, Jb):
            return jnp.einsum("eci,ec,ecj->eij", Ja, w, Jb)

        Hii = outer(Ji, Ji)
        Hij = outer(Ji, Jj)
        Hjj = outer(Jj, Jj)
        gi = jnp.einsum("eci,ec,ec->ei", Ji, w, r)
        gj = jnp.einsum("eci,ec,ec->ei", Jj, w, r)

        H = jnp.zeros((n, n, 6, 6))
        H = H.at[ii, ii].add(Hii)
        H = H.at[ii, jj].add(Hij)
        H = H.at[jj, ii].add(jnp.swapaxes(Hij, -1, -2))
        H = H.at[jj, jj].add(Hjj)
        g = jnp.zeros((n, 6)).at[ii].add(gi).at[jj].add(gj)

        # depth blocks (scalar per patch) and cross terms
        C = jnp.zeros(m).at[kk].add(jnp.einsum("ec,ec,ec->e", Jd, w, Jd)) + lm + ep
        gd = jnp.zeros(m).at[kk].add(jnp.einsum("ec,ec,ec->e", Jd, w, r))
        # E-blocks pose x depth: Ep[p, 6] per (pose, patch) pair exists per
        # edge; Schur: H -= E C^-1 E^T, g -= E C^-1 gd
        Eid = jnp.einsum("eci,ec,ec->ei", Ji, w, Jd)  # [E, 6]
        Ejd = jnp.einsum("eci,ec,ec->ei", Jj, w, Jd)
        # pairwise pose-pose corrections via shared patches: edges sharing a
        # patch couple their poses; with DPVO's graph each (edge) has one
        # patch, and patches appear in multiple edges. Accumulate per patch:
        Epi = jnp.zeros((m, n, 6)).at[kk, ii].add(Eid)
        Epj = jnp.zeros((m, n, 6)).at[kk, jj].add(Ejd)
        Ep = Epi + Epj  # [M, N, 6]
        EC = Ep / jnp.maximum(C, 1e-12)[:, None, None]
        H = H - jnp.einsum("mia,mjb->ijab", EC, Ep)
        g = g - jnp.einsum("mia,m->ia", EC, gd)

        # damped solve
        Hd = H.transpose(0, 2, 1, 3).reshape(n * 6, n * 6)
        Hd = Hd + (lm * jnp.diag(jnp.diag(Hd)) + ep * jnp.eye(n * 6))
        # minimize ||r + J dx||^2: dx = -H^{-1} g with g = J^T W r
        dx = -jax.scipy.linalg.solve(Hd, g.reshape(-1), assume_a="pos").reshape(n, 6)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        dx = dx * (jnp.arange(n) >= t0)[:, None]

        # retract poses: T <- Exp(dx) T
        dT = lie.se3_exp(dx)  # [N, 4, 4]
        R = lie.quaternion_to_matrix(poses_q)
        R_new = dT[:, :3, :3] @ R
        t_new = jnp.einsum("nij,nj->ni", dT[:, :3, :3], poses_t) + dT[:, :3, 3]
        q_new = lie.matrix_to_quaternion(R_new)

        # depth update (back-substitution)
        dd = -(gd + jnp.einsum("mia,ia->m", Ep, dx)) / jnp.maximum(C, 1e-12)
        dd = jnp.where(jnp.isfinite(dd), dd, 0.0)
        new_d = jnp.clip(patches[:, 2] + dd, 1e-4, 10.0)
        patches_new = patches.at[:, 2].set(new_d)
        return (t_new, q_new, patches_new), jnp.sum(w * r * r)

    (poses_t, poses_q, patches), costs = jax.lax.scan(
        gn_iter, (poses_t, poses_q, patches), None, length=iterations
    )
    return poses_t, poses_q, patches
