"""``ds-eval`` entry point: the full offline evaluation surface.

Counterpart of the reference's evaluation CLI (reference:
scripts/eval.py:17-90): ATE RMSE with Horn alignment from the trajectory
archive, then — given a ground-truth mesh — the reconstruction metrics,
pre-aligning the reconstructed mesh with the ATE rotation/translation
exactly like the reference before ICP refinement:

  * ``calc_3d_metric`` — accuracy / completion / completion ratio
    (reference scripts/utils/eval_recon.py:93-136)
  * Tanks&Temples full evaluation — P/R/F at tau + cumulative histogram
    curves + error-colored meshes (reference third_party/
    evaluate_3d_reconstruction_lib)
  * ``calc_2d_metric`` — unseen-view depth-L1 via the tile mesh
    rasterizer (reference scripts/utils/eval_recon.py:169-283); uses
    ``<gt_mesh>_pc_unseen.npy`` when present

The run's own 2D render metrics (eval_2d.json: PSNR/SSIM/MS-SSIM/LPIPS/
depth-L1, written by the pipeline's re-render sweep) are merged so
``eval_result.json`` carries every BASELINE.md column in one artifact.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

from ..utils.eval_ate import evaluate_ate


def load_eval_tar(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def _plot_ate(data: dict, res: dict, path: str) -> None:
    """Aligned-trajectory plot (reference: scripts/utils/eval_ate.py plot
    branch, :150-305): top-down aligned est vs gt with per-frame error
    segments and the RMSE in the title."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        gt = np.stack([np.asarray(p)[:3, 3] for p in data["gt_c2w_list"]])
        est = np.stack([np.asarray(p)[:3, 3] for p in data["estimate_c2w_list"]])
        n = min(len(gt), len(est))
        gt, est = gt[:n], est[:n]
        R = np.asarray(res["rot"])
        t = np.asarray(res["trans"])
        s = res.get("scale", 1.0)
        est_al = s * est @ R.T + t
        fig, ax = plt.subplots(figsize=(7, 6))
        ax.plot(gt[:, 0], gt[:, 2], "k-", lw=1, label="ground truth")
        ax.plot(est_al[:, 0], est_al[:, 2], "b-", lw=1, label="estimated")
        for a, b in zip(gt, est_al):
            ax.plot([a[0], b[0]], [a[2], b[2]], "r-", lw=0.4, alpha=0.5)
        ax.legend()
        ax.set_xlabel("x [m]")
        ax.set_ylabel("z [m]")
        ax.set_aspect("equal", adjustable="datalim")
        ax.set_title(f"ATE RMSE {res['rmse'] * 100:.2f} cm")
        fig.savefig(path, dpi=110)
        plt.close(fig)
    except Exception as e:
        print(f"[ds-eval] ate plot skipped: {e}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="ds-eval", description="Evaluate SLAM outputs")
    p.add_argument("--output", type=str, required=True, help="outputs dir containing eval.tar")
    p.add_argument("--gt-mesh", type=str, default=None, help="ground-truth mesh (ply) for 3D metrics")
    p.add_argument("--correct-scale", action="store_true")
    p.add_argument("--distance-thresh", type=float, default=0.01,
                   help="T&T F-score threshold (m); docs/benchmark.md uses 0.01 (0.05 for NeuralRecon)")
    p.add_argument("--no-eval-2d", action="store_true", help="skip unseen-view depth-L1")
    p.add_argument("--n-imgs-2d", type=int, default=1000, help="unseen views for calc_2d_metric")
    args = p.parse_args(argv)

    data = load_eval_tar(os.path.join(args.output, "eval.tar"))
    res = evaluate_ate(data["gt_c2w_list"], data["estimate_c2w_list"], correct_scale=args.correct_scale)
    print(f"ate rmse: {res['rmse'] * 100:.4f} cm")
    _plot_ate(data, res, os.path.join(args.output, "eval_ate_plot.png"))

    out = {"ate_rmse_cm": res["rmse"] * 100, **{k: v for k, v in res.items()}}

    if args.gt_mesh is not None:
        from ..utils.eval_recon import (calc_2d_metric, calc_3d_metric,
                                        evaluate_3d_reconstruction)
        from ..utils.io import Mesh, read_ply

        from ..utils.eval_recon import sample_mesh_points
        from scipy.spatial import cKDTree

        rec_path = os.path.join(args.output, "mesh", "final_mesh_rec.ply")
        rec = read_ply(rec_path)
        gt = read_ply(args.gt_mesh)
        # pre-align with the trajectory alignment (reference eval.py:59-66).
        # Guard (deviation): on short trajectories Horn's rotation is
        # unconstrained (the pose cloud is nearly a point), and applying a
        # garbage rotation puts the mesh beyond ICP's basin — keep the
        # pre-alignment only if it actually brings the meshes closer.
        R = np.asarray(res["rot"])
        t = np.asarray(res["trans"])
        s = float(res.get("scale", 1.0))  # similarity scale (--correct-scale)
        pre = Mesh(s * (rec.vertices @ R.T) + t, rec.faces, rec.vertex_colors)
        gt_s = sample_mesh_points(gt, 5000, seed=2)
        tree = cKDTree(gt_s)
        d_pre = tree.query(sample_mesh_points(pre, 5000, seed=3), k=1)[0].mean()
        d_id = tree.query(sample_mesh_points(rec, 5000, seed=3), k=1)[0].mean()
        if d_pre <= d_id:
            rec = pre

        m3d = calc_3d_metric(rec, gt)
        for k, v in m3d.items():
            print(f"{k}: {v:.4f}")
        out.update(m3d)

        tnt = evaluate_3d_reconstruction(
            rec, gt, distance_thresh=args.distance_thresh,
            out_dir=os.path.join(args.output, "tnt"), scene_name="scene")
        print(f"tnt precision/recall/fscore @ {args.distance_thresh} m: "
              f"{tnt['precision']:.4f} / {tnt['recall']:.4f} / {tnt['fscore']:.4f}")
        out.update({
            "tnt_precision_pct": tnt["precision"] * 100,
            "tnt_recall_pct": tnt["recall"] * 100,
            "tnt_fscore_pct": tnt["fscore"] * 100,
            "tnt_dist_stats": tnt["dist_stats"],
        })

        if not args.no_eval_2d:
            unseen_path = args.gt_mesh.replace(".ply", "_pc_unseen.npy")
            pc_unseen = np.load(unseen_path) if os.path.exists(unseen_path) else None
            m2d = calc_2d_metric(rec, gt, n_imgs=args.n_imgs_2d, align=True,
                                 pc_unseen=pc_unseen)
            print(f"unseen-view depth l1: {m2d['depth_l1_cm']:.4f} cm")
            out.update({"unseen_depth_l1_cm": m2d["depth_l1_cm"]})

    # merge the run's own render metrics so one artifact has every column
    e2d_path = os.path.join(args.output, "eval_2d.json")
    if os.path.exists(e2d_path):
        with open(e2d_path) as f:
            out["render_metrics"] = json.load(f)

    with open(os.path.join(args.output, "eval_result.json"), "w") as f:
        json.dump(out, f, indent=2)


def entrypoint() -> None:
    main(sys.argv[1:])


if __name__ == "__main__":
    entrypoint()
