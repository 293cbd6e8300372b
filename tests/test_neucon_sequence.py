"""NeuralRecon sequence-level proof (round-3 VERDICT item 7).

The round-2 overfit test proved one fragment can be fit; this test proves
the TRAINING RECIPE works at sequence level: train the coarse-to-fine
network on a multi-fragment synthetic sequence with threaded GRU hidden
state (utils/neucon_train.py — the in-env stand-in for the reference's
ScanNet-pretrained `model_000047.ckpt`, an LFS stub here), then run the
full incremental algorithm with the LEARNED weights over the sequence and
gate fused-volume reconstruction metrics (accuracy / completion / F-score
vs the analytic GT mesh) — and require a large margin over random weights.

Reference training loss: neucon_network.py:249-300; fragment fusion:
slam/algorithms/neural_recon.py:155-236.
"""
import numpy as np

from xrdslam_tpu.algorithms.neural_recon import NeuralReconConfig
from xrdslam_tpu.common.frame import Frame
from xrdslam_tpu.common.synthetic import SyntheticDataset, scene_sdf
from xrdslam_tpu.models.neucon import NeuConModelConfig
from xrdslam_tpu.utils.eval_recon import calc_3d_metric
from xrdslam_tpu.utils.mesh_ops import cull_mesh
from xrdslam_tpu.utils.neucon_train import collect_fragments, train_sequence


def _cv_frames(ds):
    """Frames with poses in the algorithm's CV convention (the flip
    do_tracking applies to the dataset's OpenGL c2w)."""
    frames = []
    for i in range(len(ds)):
        _, rgb, depth, c2w = ds[i]
        cv = np.asarray(c2w, np.float32).copy()
        cv[:3, 1] *= -1
        cv[:3, 2] *= -1
        frames.append(Frame(fid=i, rgb=rgb, depth=depth,
                            init_pose=cv, gt_pose=c2w))
    return frames


def _run_fused(cfg, ds, frames, params=None):
    """Fresh incremental run over the sequence; returns the fused mesh."""
    algo = cfg.setup(camera=ds.get_camera())
    if params is not None:
        import jax
        algo.params = jax.device_put(params)
    for f in frames:
        algo.do_mapping(f)
    return algo.get_mesh()


def _metrics(ds, mesh, gt_culled):
    if mesh is None:
        return None
    # standard protocol: cull BOTH meshes to the observed frustum region
    # (reference eval_recon; bench_accuracy.py does the same)
    mesh = cull_mesh(ds, mesh)
    if len(mesh.vertices) == 0:
        return None
    # voxels are 15 cm at test scale: evaluate F-score at the voxel size
    return calc_3d_metric(mesh, gt_culled, n_points=30000,
                          comp_thresh=0.3, f1_thresh=0.15, align=False)


def test_neucon_sequence_trains_and_reconstructs():
    ds = SyntheticDataset(n_frames=12, height=48, width=64)
    mc = NeuConModelConfig(n_vox=32, voxel_size=0.15)
    cfg = NeuralReconConfig(
        mapping_window_size=3, min_angle=0.0, min_distance=0.0,
        max_depth=3.0, img_size_w=64, img_size_h=48, model=mc)
    frames = _cv_frames(ds)

    algo = cfg.setup(camera=ds.get_camera())
    frags = collect_fragments(algo, frames)
    assert len(frags) >= 3, f"want a multi-fragment sequence, got {len(frags)}"

    params, losses = train_sequence(
        algo, frags, scene_sdf, epochs=2, steps_per_fragment=25)
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.25 * losses[0], \
        f"sequence loss did not drop: {losses[0]:.3f} -> {losses[-1]:.3f}"

    gt_culled = cull_mesh(ds, ds.gt_mesh())

    trained = _metrics(ds, _run_fused(cfg, ds, frames, params), gt_culled)
    assert trained is not None, "trained run produced no mesh"

    random_m = _metrics(ds, _run_fused(cfg, ds, frames, None), gt_culled)

    # absolute gates: sub-voxel mean surface error, most of the observed
    # surface recovered at the voxel scale
    assert trained["accuracy_cm"] < 15.0, trained
    assert trained["completion_cm"] < 30.0, trained
    assert trained["f1_pct"] > 50.0, trained

    # margin over random weights: random either produces no surface or a
    # much worse one
    if random_m is not None:
        assert (trained["f1_pct"] > 1.5 * random_m["f1_pct"]
                or trained["accuracy_cm"] < 0.5 * random_m["accuracy_cm"]), \
            {"trained": trained, "random": random_m}
