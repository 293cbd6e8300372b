"""Algorithm base: host-side driver around jitted tracking/mapping steps.

Counterpart of the reference's ``Algorithm`` ABC (reference:
slam/algorithms/base_algorithm.py:44-302), redesigned for one process and
one device program: instead of a BaseManager proxy + per-iteration Python
optimization loops, each concrete algorithm compiles ``track_step`` /
``map_step`` functions whose inner optimization iterations run as
``lax.scan`` on device (reference's hot loops: base_algorithm.py:255-273).
The host keeps only bookkeeping (pose lists, keyframe metadata) — no locks
are needed because there is exactly one mutator.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Type

import numpy as np

from ..common.camera import Camera
from ..common.frame import Frame
from ..configs.base import InstantiateConfig
from ..engine.optimizers import OptimizerConfig
from ..models.base import ModelConfig


def default_optimizers() -> Dict[str, Any]:
    return {
        "model": {"optimizer": OptimizerConfig(lr=1e-2), "scheduler": None},
        "tracking_pose": {"optimizer": OptimizerConfig(lr=1e-2), "scheduler": None},
        "mapping_pose": {"optimizer": OptimizerConfig(lr=1e-3), "scheduler": None},
    }


@dataclass
class AlgorithmConfig(InstantiateConfig):
    """reference: slam/algorithms/base_algorithm.py:16-41."""

    _target: Type = field(default_factory=lambda: Algorithm)
    model: ModelConfig = field(default_factory=ModelConfig)
    keyframe_selection_method: str = "overlap"
    keyframe_use_ray_sample: bool = True
    tracking_n_iters: int = 10
    # <1.0: exponentially decay the tracking-pose lr inside the per-frame
    # scan down to lr*decay at the last iteration. The reference runs Adam
    # at a constant lr, which leaves lr-scale endpoint jitter in the pose;
    # at protocol motion scales that jitter dominates ATE (round-5: the
    # vox-fusion 200-frame error profile is noise-like, not drift-like).
    tracking_lr_decay: float = 1.0
    mapping_n_iters: int = 60
    mapping_first_n_iters: int = 200
    coarse: bool = False
    mapping_window_size: int = 5
    separate_LR: bool = False
    rot_rep: str = "axis_angle"
    retain_graph: bool = False
    optimizers: Dict[str, Any] = field(default_factory=default_optimizers)
    # >1: shard per-iteration ray batches data-parallel over a `dp` mesh
    # of this many devices (parallel/sharded.py); map parameters
    # replicate, gradients all-reduce over ICI. Multi-chip has no
    # reference counterpart (SURVEY.md §2.8: DataParallel pinned to one
    # GPU) — rays are the TPU-native scaling axis.
    devices: int = 1


class Algorithm:
    def __init__(self, config: AlgorithmConfig, camera: Camera) -> None:
        self.config = config
        self.camera = camera
        self.initialized = False
        self.finished = False
        self.gt_c2w_list: List[np.ndarray] = []
        self.gt_c2w_list_ori: List[np.ndarray] = []
        self.estimate_c2w_list: List[np.ndarray] = []
        self.keyframe_fids: List[int] = []
        self.bundle_adjust = False
        # dp device mesh (None below 2 devices); concrete algorithms call
        # _replicate_params on their map parameters and _shard_rays on
        # per-ray arrays inside their jitted programs
        self.mesh = None
        if getattr(config, "devices", 1) > 1:
            from ..parallel.sharded import make_mesh

            self.mesh = make_mesh(config.devices)

    @staticmethod
    def _finite_guard(loss, g):
        """Zero the grad tree when the loss OR any grad entry is non-finite.

        One bad sample batch inside a lax.scan optimization loop must not
        poison the remaining iterations: a NaN grad entering the Adam moment
        state corrupts the optimized table/grid permanently (round-5
        diagnosis: NICE-SLAM 200-frame collapse, Point-SLAM NaN renders).
        Grads can be non-finite even when the loss is finite (0/0 branches
        inside XLA's fused VJPs), so both are checked. Cost: one elementwise
        isfinite+reduce over the grad tree, negligible next to the VJP."""
        import jax
        import jax.numpy as jnp

        ok = jnp.isfinite(loss)
        for leaf in jax.tree_util.tree_leaves(g):
            ok = ok & jnp.all(jnp.isfinite(leaf))
        return jax.tree_util.tree_map(lambda x: jnp.where(ok, x, 0.0), g)

    def _tracking_lr_schedule(self, lr0: float):
        """Per-frame tracking lr schedule, or None when decay is disabled.

        Full lr for the first half of the tracking scan (cover the
        inter-frame motion), exponential decay to ``lr0 * tracking_lr_decay``
        at the last iteration (kill the constant-lr endpoint jitter the
        reference's torch Adam leaves in the pose — see
        ``AlgorithmConfig.tracking_lr_decay``)."""
        import jax.numpy as jnp

        decay = self.config.tracking_lr_decay
        if decay >= 1.0:
            return None
        n = max(self.config.tracking_n_iters - 1, 1)

        def sched(step, lr0=lr0, n=n, decay=decay):
            frac = jnp.clip(2.0 * step / n - 1.0, 0.0, 1.0)
            return lr0 * decay ** frac

        return sched

    # -- multi-chip ray-DP helpers (parallel/sharded.py) ------------------
    def _replicate_params(self, tree):
        """Replicate a parameter pytree over the mesh (no-op single-chip)."""
        if self.mesh is None:
            return tree
        from ..parallel.sharded import replicate

        return replicate(self.mesh, tree)

    def _shard_rays(self, *arrays):
        """Constrain per-ray arrays to P('dp') when a device mesh is
        configured — downstream per-ray compute shards data-parallel and
        XLA all-reduces parameter gradients (parallel/sharded.py)."""
        if self.mesh is None:
            return arrays if len(arrays) > 1 else arrays[0]
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        s = NamedSharding(self.mesh, P("dp"))
        out = tuple(jax.lax.with_sharding_constraint(a, s) for a in arrays)
        return out if len(out) > 1 else out[0]

    def _round_to_devices(self, n: int) -> int:
        """Round a ray count up to a multiple of the mesh size (sharded
        dims must divide evenly across 'dp')."""
        d = getattr(self.config, "devices", 1)
        return n if d <= 1 else ((n + d - 1) // d) * d

    # -- host bookkeeping (reference: base_algorithm.py:106-158) ----------
    def add_framepose(self, c2w: np.ndarray, gt_c2w: np.ndarray, gt_c2w_ori: np.ndarray) -> None:
        c2w = np.asarray(c2w)
        if not np.isfinite(c2w).all():
            self._on_nonfinite_pose(len(self.estimate_c2w_list), c2w)
            # survivable: substitute the previous pose so downstream
            # SVD/eval math stays defined while the warning flags the run
            if self.estimate_c2w_list:
                c2w = self.estimate_c2w_list[-1]
        self.estimate_c2w_list.append(c2w)
        self.gt_c2w_list.append(np.asarray(gt_c2w))
        self.gt_c2w_list_ori.append(np.asarray(gt_c2w_ori))

    def _on_nonfinite_pose(self, idx: int, c2w: np.ndarray) -> None:
        import os
        import sys

        n = getattr(self, "_nonfinite_poses", 0)
        self._nonfinite_poses = n + 1
        if n < 5:
            print(f"[slam] WARNING: non-finite pose at frame {idx}",
                  file=sys.stderr, flush=True)
        if n == 0 and os.environ.get("XRDSLAM_DEBUG_DUMP"):
            try:
                import jax
                import pickle

                path = os.environ["XRDSLAM_DEBUG_DUMP"]
                params = getattr(self, "model_params", None)
                with open(path, "wb") as f:
                    pickle.dump({"frame": idx,
                                 "params": jax.device_get(params)}, f)
                print(f"[slam] dumped state to {path}", file=sys.stderr, flush=True)
            except Exception as e:  # diagnosis aid only, never fatal
                print(f"[slam] debug dump failed: {e}", file=sys.stderr, flush=True)

    def update_framepose(self, idx: int, c2w: np.ndarray) -> None:
        c2w = np.asarray(c2w)
        if not np.isfinite(c2w).all():
            # same sanitization as add_framepose: a non-finite refinement
            # must not overwrite the (already finite) list entry — the
            # const-velocity predictor reads it next frame
            self._on_nonfinite_pose(idx, c2w)
            return
        self.estimate_c2w_list[idx] = c2w

    def get_estimate_c2w_list(self) -> List[np.ndarray]:
        return self.estimate_c2w_list

    def is_initialized(self) -> bool:
        return self.initialized

    def set_initialized(self) -> None:
        self.initialized = True

    # -- to implement -----------------------------------------------------
    def dispatch_tracking(self, cur_frame: Frame):
        """Optional two-phase tracking: launch the device program and
        return a handle for finish_tracking (lets the pipeline overlap
        host work with tracking compute). Default: NotImplemented ->
        the pipeline calls the synchronous do_tracking."""
        return NotImplemented

    def finish_tracking(self, handle) -> Optional[np.ndarray]:
        return None

    def do_tracking(self, cur_frame: Frame) -> Optional[np.ndarray]:
        """Default: two-phase composition. Algorithms that implement
        dispatch_tracking/finish_tracking get do_tracking for free;
        feed-forward ones (DPVO, NeuralRecon) override this directly."""
        handle = self.dispatch_tracking(cur_frame)
        if handle is NotImplemented:
            raise NotImplementedError
        return self.finish_tracking(handle)

    @staticmethod
    def window_slot_frame(f: int, n_valid, n_slots: int):
        """Static-window slot -> frame index: ((f+1)*n_valid - 1) // n_slots.

        Distributes n_slots ray slots over the n_valid (traced) real frames
        as evenly as possible (per-frame counts differ by at most one), is
        monotone, and ALWAYS pins the last slot to the current frame
        (f = n_slots-1 -> n_valid-1) — so per-frame weighting matches the
        reference's one-batch-per-frame schedule up to the unavoidable
        remainder, with the surplus going to the newest frames."""
        import jax.numpy as jnp

        return ((jnp.asarray(f + 1, jnp.int32)) * n_valid - 1) // n_slots

    @staticmethod
    def pad_window(images, poses, cur_img, cur_pose, pad_to: int):
        """Pad gathered window arrays to the static window size by
        repeating the current frame (padded slots are never read — the
        slot->frame map stays within [0, n_valid))."""
        import jax.numpy as jnp

        if pad_to > images.shape[0]:
            pad = pad_to - images.shape[0]
            images = jnp.concatenate([images, jnp.repeat(cur_img, pad, 0)], 0)
            poses = jnp.concatenate(
                [poses, jnp.repeat(jnp.asarray(cur_pose)[None], pad, 0)], 0)
        return images, poses

    def do_mapping(self, cur_frame: Frame) -> None:
        raise NotImplementedError

    def add_keyframe(self, cur_frame: Frame) -> None:
        raise NotImplementedError

    def render_img(self, c2w: np.ndarray, gt_depth: Optional[np.ndarray] = None, idx: Optional[int] = None):
        return None, None

    def get_mesh(self):
        return None

    def get_cloud(self, c2w_np: np.ndarray, gt_depth_np: Optional[np.ndarray]):
        return None
