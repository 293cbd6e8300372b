"""ds-eval end-to-end: full artifact surface on a fabricated outputs dir.

The reference CLI (scripts/eval.py:17-90) emits ATE + 3D metrics + T&T
F-score + unseen-view depth-L1 in one invocation; this pins our ds-eval
to the same surface without running a full SLAM pipeline."""
import json
import os
import pickle

import numpy as np

from xrdslam_tpu.common.synthetic import SyntheticDataset
from xrdslam_tpu.scripts.eval import main as eval_main


def test_ds_eval_full_surface(tmp_path):
    out = str(tmp_path / "outputs")
    os.makedirs(os.path.join(out, "mesh"))
    # trajectory: gt + slightly noisy estimate
    rng = np.random.default_rng(0)
    gt = []
    est = []
    for i in range(20):
        p = np.eye(4)
        p[:3, 3] = [0.1 * i, 0.02 * i, 1.0]
        gt.append(p)
        q = p.copy()
        q[:3, 3] += rng.normal(0, 0.003, 3)
        est.append(q)
    with open(os.path.join(out, "eval.tar"), "wb") as f:
        pickle.dump({"gt_c2w_list": gt, "estimate_c2w_list": est}, f)

    ds = SyntheticDataset(n_frames=2, height=32, width=32, scene="office")
    gt_mesh = ds.gt_mesh(voxel=0.1)
    gt_path = str(tmp_path / "gt.ply")
    gt_mesh.export(gt_path)
    # "reconstruction": the gt mesh jittered by 5 mm
    rec = gt_mesh
    rec.vertices = rec.vertices + rng.normal(0, 0.002, rec.vertices.shape).astype(np.float32)
    rec.export(os.path.join(out, "mesh", "final_mesh_rec.ply"))
    with open(os.path.join(out, "eval_2d.json"), "w") as f:
        json.dump({"psnr": 30.0, "ssim": 0.9, "ms_ssim": 0.95,
                   "lpips": None, "depth_l1": 1.0, "frames": 2}, f)

    eval_main(["--output", out, "--gt-mesh", gt_path,
               "--distance-thresh", "0.05", "--n-imgs-2d", "3"])

    with open(os.path.join(out, "eval_result.json")) as f:
        res = json.load(f)
    # every BASELINE.md column family is present
    assert os.path.exists(os.path.join(out, "eval_ate_plot.png"))
    assert res["ate_rmse_cm"] < 1.0
    for k in ("accuracy_cm", "completion_cm", "completion_ratio_pct",
              "precision_pct", "recall_pct", "f1_pct",
              "tnt_precision_pct", "tnt_recall_pct", "tnt_fscore_pct",
              "unseen_depth_l1_cm"):
        assert k in res, k
        assert np.isfinite(res[k]), k
    assert res["render_metrics"]["psnr"] == 30.0
    assert res["accuracy_cm"] < 1.6  # 2 mm jitter + 200k-sample spacing floor
    assert res["tnt_fscore_pct"] > 50.0  # tau=5cm vs the coarse test mesh
    # T&T artifacts written
    assert os.path.exists(os.path.join(out, "tnt", "scene.precision.txt"))
    assert os.path.exists(os.path.join(out, "tnt", "scene.recall.ply"))
