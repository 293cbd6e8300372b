"""Checkpoint/resume: a resumed run continues from identical state."""
import os
import tempfile

import numpy as np

from xrdslam_tpu.common.synthetic import SyntheticDataset
from xrdslam_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
from xrdslam_tpu.engine.optimizers import AdamOptimizerConfig as A
from xrdslam_tpu.pipeline.slam import MapperConfig, SLAMPipelineConfig, TrackerConfig
from tests.test_e2e_coslam import tiny_coslam_config


def _cfg(bound, ckpt_every=-1):
    return SLAMPipelineConfig(
        tracker=TrackerConfig(map_every=2, render_freq=-1, save_re_render_result=False, checkpoint_every=ckpt_every),
        mapper=MapperConfig(keyframe_every=2),
        algorithm=tiny_coslam_config(bound),
    )


def test_checkpoint_roundtrip_continues_run():
    ds = SyntheticDataset(n_frames=8, height=48, width=64)
    bound = ds.bounds.tolist()
    out = tempfile.mkdtemp()

    # full run with checkpoints
    pipe = _cfg(bound, ckpt_every=3).setup(dataset=ds, out_dir=out, verbose=False)
    pipe.run()
    assert os.path.exists(os.path.join(out, "checkpoint.pkl"))
    full_poses = [p.copy() for p in pipe.algorithm.estimate_c2w_list]

    # fresh algorithm, load the final checkpoint: state must match
    pipe2 = _cfg(bound).setup(dataset=ds, out_dir=tempfile.mkdtemp(), verbose=False)
    idx = load_checkpoint(os.path.join(out, "checkpoint.pkl"), pipe2.algorithm)
    assert idx == 7
    assert pipe2.algorithm.kf_count == pipe.algorithm.kf_count
    np.testing.assert_allclose(
        np.asarray(pipe2.algorithm.model_params["decoder"]["sdf"]["w"][0]),
        np.asarray(pipe.algorithm.model_params["decoder"]["sdf"]["w"][0]),
    )
    for a, b in zip(pipe2.algorithm.estimate_c2w_list, full_poses):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_resume_mid_run():
    ds = SyntheticDataset(n_frames=8, height=48, width=64)
    bound = ds.bounds.tolist()
    out = tempfile.mkdtemp()
    # run only frames 0..5 by checkpointing at 5 then truncating
    pipe = _cfg(bound, ckpt_every=5).setup(dataset=ds, out_dir=out, verbose=False)
    pipe.run()
    # simulate restart: new pipeline resumes from frame 6
    pipe2 = _cfg(bound).setup(dataset=ds, out_dir=out, verbose=False)
    pipe2.run(resume=True)
    assert len(pipe2.algorithm.estimate_c2w_list) == len(ds)


def test_segmented_run_matches_continuous():
    """A run split into checkpointed segments (stop_at + resume in a FRESH
    pipeline, as bench_accuracy --segment does across processes) must land
    where the continuous run lands. NICE-SLAM is the target algorithm (its
    office-scale runs are the ones that exceed TPU-worker process
    lifetime), and it exercises the host pose mirror + slot FIFO state."""
    from tests.test_e2e_algorithms import tiny_nice_pipeline_config

    ds = SyntheticDataset(n_frames=8, height=48, width=64)
    out = tempfile.mkdtemp()

    cont = tiny_nice_pipeline_config().setup(dataset=ds, out_dir=tempfile.mkdtemp(), verbose=False)
    cont.run()

    seg1 = tiny_nice_pipeline_config().setup(dataset=ds, out_dir=out, verbose=False)
    seg1.run(stop_at=5)
    assert os.path.exists(os.path.join(out, "checkpoint.pkl"))
    n_done = len(seg1.algorithm.estimate_c2w_list)
    assert 5 <= n_done < 8

    seg2 = tiny_nice_pipeline_config().setup(dataset=ds, out_dir=out, verbose=False)
    seg2.run(resume=True)
    assert len(seg2.algorithm.estimate_c2w_list) == 8
    # frame-time history spans both segments (steady-fps accounting)
    assert len(seg2.frame_times) >= 8
    # the resumed trajectory must match the continuous one closely; the
    # only divergence source is the device-pose-history reseed at the
    # segment boundary (same values through a fetch/re-upload round trip)
    for a, b in zip(seg2.algorithm.estimate_c2w_list, cont.algorithm.estimate_c2w_list):
        np.testing.assert_allclose(a, b, atol=5e-3)
    assert seg2.algorithm.kf_count == cont.algorithm.kf_count


def test_checkpoint_guards(tmp_path):
    """Version/algorithm mismatch fails loudly; unknown attrs are skipped
    (round-2 hardening)."""
    import pickle

    import pytest

    from xrdslam_tpu.engine.checkpoint import (CKPT_VERSION, load_checkpoint,
                                               save_checkpoint)

    class Dummy:
        initialized = False

    d = Dummy()
    path = str(tmp_path / "ck.pkl")
    save_checkpoint(path, d, 3)
    assert not (tmp_path / "ck.pkl.tmp").exists()  # atomic rename
    assert load_checkpoint(path, Dummy()) == 3

    with open(path, "rb") as f:
        state = pickle.load(f)
    state["version"] = CKPT_VERSION + 1
    with open(path, "wb") as f:
        pickle.dump(state, f)
    with pytest.raises(ValueError, match="version"):
        load_checkpoint(path, Dummy())

    state["version"] = CKPT_VERSION
    state["algorithm"] = "SomethingElse"
    with open(path, "wb") as f:
        pickle.dump(state, f)
    with pytest.raises(ValueError, match="SomethingElse"):
        load_checkpoint(path, Dummy())

    state["algorithm"] = "Dummy"
    state["attrs"]["not_an_attr"] = 42
    with open(path, "wb") as f:
        pickle.dump(state, f)
    assert load_checkpoint(path, Dummy()) == 3  # skips, does not crash
