"""``ds-eval`` entry point: ATE (+ mesh metrics when available).

Counterpart of the reference's evaluation CLI (reference:
scripts/eval.py:17-90): loads the trajectory archive written by the
pipeline (``outputs/eval.tar``), computes ATE RMSE with Horn alignment, and
— when ground-truth mesh / rec mesh are provided — 3D accuracy/completion
metrics (see utils/eval_recon.py).
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


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="ds-eval", description="Evaluate SLAM outputs")
    p.add_argument("--output", type=str, required=True, help="outputs dir containing eval.tar")
    p.add_argument("--gt-mesh", type=str, default=None, help="ground-truth mesh (ply) for 3D metrics")
    p.add_argument("--correct-scale", action="store_true")
    args = p.parse_args(argv)

    data = load_eval_tar(os.path.join(args.output, "eval.tar"))
    res = evaluate_ate(data["gt_c2w_list"], data["estimate_c2w_list"], correct_scale=args.correct_scale)
    print(f"ate rmse: {res['rmse'] * 100:.4f} cm")

    out = {"ate_rmse_cm": res["rmse"] * 100, **{k: v for k, v in res.items()}}

    if args.gt_mesh is not None:
        from ..utils.eval_recon import calc_3d_metric
        from ..utils.io import read_ply

        rec_path = os.path.join(args.output, "mesh", "final_mesh_rec.ply")
        rec = read_ply(rec_path)
        gt = read_ply(args.gt_mesh)
        m3d = calc_3d_metric(rec, gt)
        for k, v in m3d.items():
            print(f"{k}: {v:.4f}")
        out.update(m3d)

    with open(os.path.join(args.output, "eval_result.json"), "w") as f:
        json.dump(out, f, indent=2)


def entrypoint() -> None:
    main(sys.argv[1:])


if __name__ == "__main__":
    entrypoint()
