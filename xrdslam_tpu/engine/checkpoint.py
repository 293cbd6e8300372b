"""Mid-run checkpoint / resume.

The reference has NO mid-run resume (SURVEY.md §5: only config.yml +
eval.tar artifacts; its Optimizers.load_* helpers are dead code,
slam/engine/optimizers.py:175-191). Here checkpointing is a first-class
feature: the full SLAM state — model params, optimizer state, keyframe
tables, pose lists, frame index — is saved as a pickled pytree of numpy
arrays and restored into a freshly constructed algorithm.

Every array leaf is converted to numpy at save time (device-agnostic) and
re-uploaded lazily on first use after load. Host-side structures that are
not jnp arrays (VoxelHashMap, PointMap, keyframe Frame lists, counters)
are pickled as-is.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# attributes checkpointed on every algorithm (when present)
_STATE_ATTRS = [
    "model_params",
    "model_opt_state",
    "params",  # splatam
    "dead",  # splatam in-scan prune mask
    "kf_rays",
    "kf_images",
    "kf_depth",  # splatam keyframe depth stack
    "kf_pose",
    "kf_pose_t",
    "kf_pose_r",
    "kf_pose_host",  # nice-slam host mirror (numpy, in-place writes)
    "kf_count",
    "kf_frames",
    "keyframe_fids",
    "vox_map",
    "maps",
    "point_map",
    "_key",
    "estimate_c2w_list",
    "gt_c2w_list",
    "gt_c2w_list_ori",
    "initialized",
]


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jnp.ndarray) else x, tree
    )


def _to_device(tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) and x.dtype != object else x, tree
    )


CKPT_VERSION = 2


def save_checkpoint(path: str, algorithm: Any, frame_idx: int,
                    extra: Dict[str, Any] | None = None) -> None:
    state: Dict[str, Any] = {
        "version": CKPT_VERSION,
        "algorithm": type(algorithm).__name__,
        "frame_idx": frame_idx,
        "attrs": {},
        # pipeline-owned state (relative-pose remap anchors, frame-time
        # history) so a run can be RESUMED IN A NEW PROCESS — the basis of
        # segmented long runs that sidestep TPU-worker lifetime limits
        "extra": dict(extra or {}),
    }
    for attr in _STATE_ATTRS:
        if hasattr(algorithm, attr):
            state["attrs"][attr] = _to_host(getattr(algorithm, attr))
    # model-level host counters (splatam gaussian count, scene radius)
    if hasattr(algorithm, "model"):
        for mattr in ("n_gauss", "scene_radius"):
            if hasattr(algorithm.model, mattr):
                state.setdefault("model_attrs", {})[mattr] = getattr(algorithm.model, mattr)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # atomic write: a crash mid-save must not corrupt the resume file
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    os.replace(tmp, path)


def load_checkpoint(path: str, algorithm: Any, want_extra: bool = False):
    """Restore state into a freshly constructed algorithm; returns the frame
    index to resume from (or ``(frame_idx, extra)`` when ``want_extra``).

    Tolerant partial load: checkpoint attrs the current algorithm lacks are
    skipped with a warning (forward-compatible across attribute renames);
    a version/algorithm mismatch fails loudly instead of restoring
    half-compatible state."""
    with open(path, "rb") as f:
        state = pickle.load(f)
    ver = state.get("version", 1)
    if ver > CKPT_VERSION:
        raise ValueError(
            f"checkpoint {path} is version {ver}; this build supports "
            f"<= {CKPT_VERSION}")
    algo_name = state.get("algorithm")
    if algo_name is not None and algo_name != type(algorithm).__name__:
        raise ValueError(
            f"checkpoint {path} was written by {algo_name}, refusing to "
            f"restore into {type(algorithm).__name__}")
    for attr, val in state["attrs"].items():
        if not hasattr(algorithm, attr):
            print(f"[checkpoint] skipping unknown attr {attr!r}", flush=True)
            continue
        if attr in ("kf_count", "keyframe_fids", "estimate_c2w_list", "gt_c2w_list", "gt_c2w_list_ori",
                    "initialized", "vox_map", "point_map", "kf_frames", "kf_pose_host"):
            setattr(algorithm, attr, val)
        else:
            setattr(algorithm, attr, _to_device(val))
    for mattr, val in state.get("model_attrs", {}).items():
        setattr(algorithm.model, mattr, val)
    # rebuild device mirrors owned by host structures
    if hasattr(algorithm, "vox_map") and hasattr(algorithm, "maps"):
        algorithm.maps = algorithm.vox_map.device_state()
    if hasattr(algorithm, "point_map") and hasattr(algorithm, "maps"):
        algorithm.maps = algorithm.point_map.device_state()
    if want_extra:
        return int(state["frame_idx"]), state.get("extra", {})
    return int(state["frame_idx"])
