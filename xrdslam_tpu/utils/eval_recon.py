"""3D reconstruction metrics: accuracy / completion / completion ratio + P/R/F1.

NumPy+SciPy rebuild of the reference's mesh evaluation (reference:
scripts/utils/eval_recon.py:93-136 ``calc_3d_metric`` — sample 200k points
on each mesh, nearest-neighbor distances both ways via KDTree; and the
Tanks&Temples-style precision/recall/F-score of
third_party/evaluate_3d_reconstruction_lib). Open3D's ICP refinement is
replaced by a NumPy point-to-point ICP.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from scipy.spatial import cKDTree

from .io import Mesh


def sample_mesh_points(mesh: Mesh, n: int, seed: int = 0) -> np.ndarray:
    """Uniform area-weighted surface sampling (replaces trimesh.sample)."""
    rng = np.random.RandomState(seed)
    v = mesh.vertices
    f = mesh.faces
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    total = areas.sum()
    if total <= 0 or len(f) == 0:
        return v[rng.randint(0, max(len(v), 1), n)]
    probs = areas / total
    tri = rng.choice(len(f), n, p=probs)
    r1 = np.sqrt(rng.rand(n, 1))
    r2 = rng.rand(n, 1)
    return (1 - r1) * a[tri] + r1 * (1 - r2) * b[tri] + r1 * r2 * c[tri]


def icp_align(src: np.ndarray, dst: np.ndarray, iters: int = 20, subsample: int = 20000, seed: int = 0) -> np.ndarray:
    """Point-to-point ICP returning a 4x4 transform aligning src -> dst."""
    rng = np.random.RandomState(seed)
    T = np.eye(4)
    tree = cKDTree(dst)
    cur = src.copy()
    for _ in range(iters):
        idx = rng.randint(0, len(cur), min(subsample, len(cur)))
        s = cur[idx]
        _, nn = tree.query(s, k=1)
        d = dst[nn]
        sc, dc = s.mean(0), d.mean(0)
        W = (d - dc).T @ (s - sc)
        U, _, Vt = np.linalg.svd(W)
        S = np.eye(3)
        if np.linalg.det(U) * np.linalg.det(Vt) < 0:
            S[2, 2] = -1
        R = U @ S @ Vt
        t = dc - R @ sc
        step = np.eye(4)
        step[:3, :3] = R
        step[:3, 3] = t
        cur = cur @ R.T + t
        T = step @ T
    return T


def _viewmatrix(z: np.ndarray, up: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Reference viewmatrix (eval_recon.py:20-27): columns [x, y, z, pos]
    with z the forward direction."""
    vec2 = z / np.linalg.norm(z)
    vec0 = np.cross(up, vec2)
    vec0 /= np.linalg.norm(vec0)
    vec1 = np.cross(vec2, vec0)
    vec1 /= np.linalg.norm(vec1)
    m = np.eye(4)
    m[:3, :3] = np.stack([vec0, vec1, vec2], 1)
    m[:3, 3] = pos
    return m


def _pca_oriented_bounds(points: np.ndarray):
    """PCA-axis oriented bounding box: (to_origin 4x4, extents [3]).
    Approximates trimesh.bounds.oriented_bounds (minimal-volume OBB); for
    room-shaped scenes the PCA box is near-identical."""
    c = points.mean(0)
    cov = np.cov((points - c).T)
    _, vecs = np.linalg.eigh(cov)
    R = vecs[:, ::-1].T  # rows = axes, major first
    if np.linalg.det(R) < 0:
        R[2] *= -1
    local = (points - c) @ R.T
    lo, hi = local.min(0), local.max(0)
    extents = hi - lo
    to_origin = np.eye(4)
    to_origin[:3, :3] = R
    to_origin[:3, 3] = -(R @ c + (lo + hi) / 2)
    return to_origin, extents


def calc_2d_metric(
    rec_mesh: Mesh,
    gt_mesh: Mesh,
    n_imgs: int = 1000,
    align: bool = True,
    pc_unseen: Optional[np.ndarray] = None,
    seed: int = 0,
    height: int = 500,
    width: int = 500,
    focal: float = 300.0,
) -> Dict[str, float]:
    """Unseen-view depth-L1 (reference: scripts/utils/eval_recon.py:169-283).

    Protocol: sample ``n_imgs`` random camera poses inside the GT mesh's
    oriented bounding box (extents scaled [0.3, 0.7, 0.7], origin lifted
    0.4 m, up = -z, random look-at), reject views that would see any
    ``pc_unseen`` point, render 500x500 f=300 depth of both meshes (tile
    rasterizer replaces Open3D offscreen), and average |gt - rec| where the
    reconstruction has surface. Returns depth L1 in cm.
    """
    from ..ops.mesh_raster import render_mesh_depth_np

    rng = np.random.RandomState(seed)
    if align:
        rec_pts = sample_mesh_points(rec_mesh, 50000, seed=0)
        gt_pts = sample_mesh_points(gt_mesh, 50000, seed=1)
        T = icp_align(rec_pts, gt_pts)
        rec_mesh = Mesh(rec_mesh.vertices @ T[:3, :3].T + T[:3, 3],
                        rec_mesh.faces, rec_mesh.vertex_colors)

    to_origin, extents = _pca_oriented_bounds(gt_mesh.vertices)
    extents = extents * np.array([0.3, 0.7, 0.7])
    transform = np.linalg.inv(to_origin)
    transform = transform.copy()
    transform[2, 3] += 0.4

    cx = width / 2.0 - 0.5
    cy = height / 2.0 - 0.5
    n_contaminated = 0
    errors = []
    for _ in range(n_imgs):
        ok_view = False
        for _try in range(100):
            local = (rng.rand(3) - 0.5) * extents
            origin = transform[:3, :3] @ local + transform[:3, 3]
            target = rng.uniform(-10000, 10000, 3) - origin
            c2w = _viewmatrix(target, np.array([0.0, 0.0, -1.0]), origin)
            # convert the z-forward viewmatrix to this package's z-backward
            # convention (the reference flips cols 1,2 the same way,
            # eval_recon.py check_proj:68-69)
            c2w_pkg = c2w.copy()
            c2w_pkg[:3, 1] *= -1.0
            c2w_pkg[:3, 2] *= -1.0
            if pc_unseen is None or len(pc_unseen) == 0:
                ok_view = True
                break
            w2c = np.linalg.inv(c2w_pkg)
            pc = pc_unseen @ w2c[:3, :3].T + w2c[:3, 3]
            z = -pc[:, 2]
            u = cx + focal * pc[:, 0] / np.maximum(z, 1e-6)
            v = cy - focal * pc[:, 1] / np.maximum(z, 1e-6)
            seen = (z > 0) & (u > 0) & (u < width) & (v > 0) & (v < height)
            if not seen.any():
                ok_view = True
                break
        if not ok_view:
            # the protocol requires rejecting views that see unseen points;
            # keeping one would bias the metric against legitimately
            # unobserved regions
            n_contaminated += 1
            continue
        gt_depth = render_mesh_depth_np(
            gt_mesh, c2w_pkg, focal, focal, cx, cy, height, width)
        rec_depth = render_mesh_depth_np(
            rec_mesh, c2w_pkg, focal, focal, cx, cy, height, width)
        valid = rec_depth > 0
        if valid.sum() > 0:
            errors.append(np.abs(gt_depth[valid] - rec_depth[valid]).mean())
    if n_contaminated:
        print(f"[calc_2d_metric] skipped {n_contaminated}/{n_imgs} views "
              f"(unseen-point rejection exhausted)")
    if not errors:
        return {"depth_l1_cm": float("nan")}
    return {"depth_l1_cm": float(np.mean(errors) * 100.0)}


def evaluate_3d_reconstruction(
    rec_mesh: Mesh,
    gt_mesh: Mesh,
    distance_thresh: float = 0.01,
    align: bool = True,
    plot_stretch: int = 5,
    out_dir: Optional[str] = None,
    scene_name: str = "scene",
) -> Dict[str, object]:
    """Tanks&Temples-style full evaluation (reference:
    third_party/evaluate_3d_reconstruction_lib/evaluate_3d_reconstruction.py:
    74-290 + evaluation.py:67-245): ICP-align, equal-density point sets
    (the denser mesh contributes its vertices, the sparser one is
    area-uniformly sampled to the same count), bidirectional nearest
    distances, precision/recall/F at tau, cumulative histograms with bin
    width tau/100 up to tau*plot_stretch, and distance statistics.

    When ``out_dir`` is given, writes the reference's artifacts:
    ``<scene>.precision.txt`` / ``<scene>.recall.txt`` (cumulative curves),
    ``<scene>.prf_tau_plotstr.txt``, the distance-stats txt, and
    error-colored ``<scene>.precision.ply`` / ``<scene>.recall.ply``.
    """
    rec_v, gt_v = rec_mesh.vertices, gt_mesh.vertices
    if len(gt_v) < len(rec_v):
        rec_pts = rec_v
        gt_pts = sample_mesh_points(gt_mesh, len(rec_v), seed=1)
    else:
        gt_pts = gt_v
        rec_pts = sample_mesh_points(rec_mesh, len(gt_v), seed=0)
    T = np.eye(4)
    if align:
        T = icp_align(rec_pts, gt_pts)
        rec_pts = rec_pts @ T[:3, :3].T + T[:3, 3]
    d1 = cKDTree(gt_pts).query(rec_pts, k=1)[0]  # rec -> gt (precision)
    d2 = cKDTree(rec_pts).query(gt_pts, k=1)[0]  # gt -> rec (recall)

    tau = distance_thresh
    precision = float((d1 < tau).mean())
    recall = float((d2 < tau).mean())
    fscore = 2 * precision * recall / max(precision + recall, 1e-12)
    bins = np.arange(0, tau * plot_stretch, tau / 100)
    h1, edges1 = np.histogram(d1, bins)
    cum1 = np.cumsum(h1).astype(float) / len(d1)
    h2, edges2 = np.histogram(d2, bins)
    cum2 = np.cumsum(h2).astype(float) / len(d2)
    out: Dict[str, object] = {
        "precision": precision,
        "recall": recall,
        "fscore": fscore,
        "edges_source": edges1,
        "cum_source": cum1,
        "edges_target": edges2,
        "cum_target": cum2,
        "dist_stats": {
            "min1": float(d1.min()), "min2": float(d2.min()),
            "max1": float(d1.max()), "max2": float(d2.max()),
            "mean1": float(d1.mean()), "mean2": float(d2.mean()),
            "median1": float(np.median(d1)), "median2": float(np.median(d2)),
            "std1": float(d1.std()), "std2": float(d2.std()),
        },
        "transform": T,
    }
    if out_dir is not None:
        import os

        os.makedirs(out_dir, exist_ok=True)
        np.savetxt(os.path.join(out_dir, f"{scene_name}.precision.txt"), cum1)
        np.savetxt(os.path.join(out_dir, f"{scene_name}.recall.txt"), cum2)
        np.savetxt(
            os.path.join(out_dir, f"{scene_name}.prf_tau_plotstr.txt"),
            np.array([precision, recall, fscore, tau, plot_stretch]))
        s = out["dist_stats"]
        np.savetxt(
            os.path.join(out_dir,
                         f"{scene_name}.min12_max12_mean12_median12_std12.txt"),
            np.array([s["min1"], s["min2"], s["max1"], s["max2"], s["mean1"],
                      s["mean2"], s["median1"], s["median2"], s["std1"],
                      s["std2"]]))
        # error-colored meshes (hsv ramp of evaluation.py:51-64)
        rv = rec_mesh.vertices @ T[:3, :3].T + T[:3, 3]
        dv1 = cKDTree(gt_pts).query(rv, k=1)[0]
        Mesh(rv, rec_mesh.faces, _error_colors(dv1, 3 * tau)).export(
            os.path.join(out_dir, f"{scene_name}.precision.ply"))
        dv2 = cKDTree(rec_pts).query(gt_mesh.vertices, k=1)[0]
        Mesh(gt_mesh.vertices, gt_mesh.faces,
             _error_colors(dv2, 3 * tau)).export(
            os.path.join(out_dir, f"{scene_name}.recall.ply"))
    return out


def _error_colors(distances: np.ndarray, max_distance: float) -> np.ndarray:
    """HSV error ramp used by the T&T toolbox (evaluation.py:51-64)."""
    c = np.minimum(distances / max(max_distance, 1e-12), 0.85) + 0.33
    c = np.where(c > 1.0, c - 1.0, c)
    # matplotlib 'hsv' colormap == pure hue wheel at s=v=1
    h = (c * 6.0) % 6.0
    x = 1.0 - np.abs(h % 2.0 - 1.0)
    z, o = np.zeros_like(h), np.ones_like(h)
    sector = np.stack([np.stack([o, x, z], -1), np.stack([x, o, z], -1),
                       np.stack([z, o, x], -1), np.stack([z, x, o], -1),
                       np.stack([x, z, o], -1), np.stack([o, z, x], -1)])
    idx = np.clip(h.astype(np.int64), 0, 5)
    return sector[idx, np.arange(len(h))].astype(np.float32)


def calc_3d_metric(
    rec_mesh: Mesh,
    gt_mesh: Mesh,
    n_points: int = 200000,
    comp_thresh: float = 0.05,
    f1_thresh: float = 0.01,
    align: bool = True,
) -> Dict[str, float]:
    """Accuracy / completion / completion-ratio (+ P/R/F1 at ``f1_thresh``).

    Matches the reference protocol (eval_recon.py:93-136; F-score thresh
    0.01 per docs/benchmark.md:80). Distances in meters; outputs acc/comp
    in cm, ratios in %.
    """
    rec_pts = sample_mesh_points(rec_mesh, n_points, seed=0)
    gt_pts = sample_mesh_points(gt_mesh, n_points, seed=1)
    if align:
        T = icp_align(rec_pts, gt_pts)
        rec_pts = rec_pts @ T[:3, :3].T + T[:3, 3]
    d_rec_to_gt = cKDTree(gt_pts).query(rec_pts, k=1)[0]  # accuracy
    d_gt_to_rec = cKDTree(rec_pts).query(gt_pts, k=1)[0]  # completion
    precision = float((d_rec_to_gt < f1_thresh).mean() * 100)
    recall = float((d_gt_to_rec < f1_thresh).mean() * 100)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    return {
        "accuracy_cm": float(d_rec_to_gt.mean() * 100),
        "completion_cm": float(d_gt_to_rec.mean() * 100),
        "completion_ratio_pct": float((d_gt_to_rec < comp_thresh).mean() * 100),
        "precision_pct": precision,
        "recall_pct": recall,
        "f1_pct": float(f1),
    }
