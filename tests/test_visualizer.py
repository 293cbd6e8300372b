"""Headless live visualizer + ds-viewer mesh/cloud replay (round-2 item:
the reference's online visualizer subsystem, slam/pipeline/visualizer.py,
rebuilt as live disk artifacts)."""
import glob
import json
import os

import numpy as np

from tests.test_e2e_coslam import tiny_coslam_config
from xrdslam_tpu.common.datasets import SyntheticDataset
from xrdslam_tpu.pipeline.slam import (MapperConfig, SLAMPipelineConfig,
                                       TrackerConfig)


def test_live_visualizer_and_replay(tmp_path):
    out_dir = str(tmp_path)
    ds = SyntheticDataset(n_frames=9, height=48, width=64)
    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=2, render_freq=4,
                              save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=2),
        algorithm=tiny_coslam_config(ds.bounds.tolist()),
        enable_vis=True,
        vis_mesh_freq=6,
    )
    cfg.algorithm.mapping_first_n_iters = 30
    cfg.algorithm.mesher.resolution = 32
    pipeline = cfg.setup(dataset=ds, out_dir=out_dir, verbose=False)
    pipeline.run()

    live = os.path.join(out_dir, "live")
    assert os.path.exists(os.path.join(live, "panel.jpg"))
    assert os.path.exists(os.path.join(live, "live.html"))
    with open(os.path.join(live, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) >= 2  # frames 4, 8 at render_freq=4
    assert all(np.isfinite(m["psnr"]) for m in lines)
    assert all("ms_ssim" in m for m in lines)
    assert os.path.exists(os.path.join(live, "trajectory.png")) or len(lines) > 0
    # mesh snapshot at frame 6
    assert glob.glob(os.path.join(out_dir, "mesh", "live_*.ply"))

    # ds-viewer replay over the artifacts
    from xrdslam_tpu.scripts.viewer import main as viewer_main

    viewer_main(["--output", out_dir, "--replay-mesh", "--replay-cloud"])
    assert glob.glob(os.path.join(out_dir, "mesh_replay", "*.jpg"))
