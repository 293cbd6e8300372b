"""DPVO full pipeline on TRAINED weights — the accuracy-bearing gate.

The reference runs DPVO with a pretrained ``dpvo.pth``
(reference: slam/models/vo_net_model.py:39-50) to ATE 0.31 cm on Replica
(reference README.md:199). That checkpoint is an LFS stub in this
environment, so the update operator is trained in-env on a synthetic
office sequence (tools/dpvo_full_run.py / engine/dpvo_train.py) and the
resulting weights are committed at ``pretrained/dpvo_synth.npz``. This
test gates the full pipeline (patchify -> correlation -> update operator
-> GN BA -> keyframing) on those weights at a scale-corrected ATE bound;
it SKIPS when the weights file is absent (fresh clone without LFS-like
artifacts), mirroring how the other pretrained gates in this suite work.
"""
import os

import numpy as np
import pytest

WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "pretrained",
                       "dpvo_synth.npz")


@pytest.mark.skipif(not os.path.exists(WEIGHTS),
                    reason="trained DPVO weights not present")
def test_dpvo_trained_full_pipeline(tmp_path):
    from xrdslam_tpu.algorithms.dpvo import DPVOConfig
    from xrdslam_tpu.common.synthetic import SyntheticDataset
    from xrdslam_tpu.models.vonet import VONetConfig
    from xrdslam_tpu.pipeline.slam import (MapperConfig, SLAMPipelineConfig,
                                           TrackerConfig)
    from xrdslam_tpu.utils.eval_ate import evaluate_ate

    frames, h, w = 40, 120, 160
    ds = SyntheticDataset(n_frames=frames, height=h, width=w, scene="office")
    cache = f"/tmp/dpvo_cache_{frames}_{w}x{h}.npz"
    if os.path.exists(cache):
        ds.load_cache(cache)
    else:
        ds.prerender(batch=4, verbose=False)
        ds.save_cache(cache)

    cfg = SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=-1, render_freq=-1,
                              save_re_render_result=False),
        mapper=MapperConfig(keyframe_every=10**9),
        algorithm=DPVOConfig(
            patch_per_frame=48, patch_lifetime=13, init_frame_num=8,
            optimization_window=10, removal_window=16, keyframe_index=4,
            keyframe_thresh=0.01, buffer_size=512, mem=24, edge_chunk=2048,
            motion_init_thresh=0.0,
            model=VONetConfig(pretrained_path=os.path.abspath(WEIGHTS)),
        ),
        enable_vis=False,
    )
    pipe = cfg.setup(dataset=ds, out_dir=str(tmp_path), verbose=False)
    pipe.run()
    gt = [np.asarray(p) for p in ds.poses]
    est = [np.asarray(p) for p in pipe.algorithm.estimate_c2w_list]
    assert len(est) == frames
    assert np.isfinite(np.stack(est)).all()
    # monocular VO is scale-free: sim(3)-aligned ATE, like the reference's
    # eval protocol (scripts/utils/eval_ate.py scale flag)
    ate = evaluate_ate(gt, est, correct_scale=True)
    assert ate["rmse"] * 100 < 2.0, f"ATE {ate['rmse']*100:.2f} cm"
