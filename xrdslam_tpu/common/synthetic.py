"""Synthetic RGB-D sequence generator (analytic SDF scene, sphere-traced).

The reference has no test data generator; its correctness signal is benchmark
parity on Replica (SURVEY.md §4). For CI without datasets we render a known
box-room scene with an analytic SDF — sphere-traced depth is exact to ~1e-4,
colors are a smooth position-based palette, and poses are exact — so SLAM
end-to-end tests can assert ATE/depth-L1 against ground truth on CPU.

Camera convention matches the framework (OpenGL: -z forward), and generated
c2w poses include no axis flips (they are already in the render convention).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera


def _box_sdf(p: np.ndarray, half: np.ndarray) -> np.ndarray:
    q = np.abs(p) - half
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0.0)
    return outside + inside


def _sphere_sdf(p: np.ndarray, center: np.ndarray, r: float) -> np.ndarray:
    return np.linalg.norm(p - center, axis=-1) - r


ROOM_HALF = np.array([2.0, 2.0, 2.0])
SPHERE_C = np.array([0.7, -0.3, -1.0])
SPHERE_R = 0.45
BOX_C = np.array([-0.9, -0.6, 0.8])
BOX_HALF = np.array([0.45, 0.5, 0.35])


def scene_sdf(p: np.ndarray) -> np.ndarray:
    """Analytic SDF of the test scene (room interior + two objects)."""
    room = -_box_sdf(p, ROOM_HALF)  # inside the room is positive distance to walls
    sphere = _sphere_sdf(p, SPHERE_C, SPHERE_R)
    box = _box_sdf(p - BOX_C, BOX_HALF)
    return np.minimum(room, np.minimum(sphere, box))


def scene_color(p: np.ndarray) -> np.ndarray:
    """Smooth position-based palette in [0,1]."""
    c = 0.5 + 0.45 * np.sin(p * np.array([1.7, 2.3, 1.1]) + np.array([0.0, 2.0, 4.0]))
    return np.clip(c, 0.0, 1.0)


def sphere_trace(origins: np.ndarray, dirs: np.ndarray, n_steps: int = 96, far: float = 8.0) -> np.ndarray:
    """Sphere-trace depth along rays. origins/dirs [..., 3] -> depth [...].

    Implemented as a jitted JAX loop (device-accelerated — pure NumPy is
    ~100x slower at benchmark resolutions on this 1-core host).
    """
    shape = origins.shape[:-1]
    o = jnp.asarray(origins, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(dirs, jnp.float32).reshape(-1, 3)
    t = np.asarray(_sphere_trace_jit(o, d, n_steps, far))
    return t.reshape(shape).astype(np.float32)


def _scene_sdf_jnp(p):
    half = jnp.asarray(ROOM_HALF, jnp.float32)
    q = jnp.abs(p) - half
    room = -(jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1) + jnp.minimum(jnp.max(q, axis=-1), 0.0))
    sphere = jnp.linalg.norm(p - jnp.asarray(SPHERE_C, jnp.float32), axis=-1) - SPHERE_R
    qb = jnp.abs(p - jnp.asarray(BOX_C, jnp.float32)) - jnp.asarray(BOX_HALF, jnp.float32)
    box = jnp.linalg.norm(jnp.maximum(qb, 0.0), axis=-1) + jnp.minimum(jnp.max(qb, axis=-1), 0.0)
    return jnp.minimum(room, jnp.minimum(sphere, box))


@functools.partial(jax.jit, static_argnums=(2, 3))
def _sphere_trace_jit(o, d, n_steps, far):
    def body(_, t):
        p = o + d * t[:, None]
        sd = _scene_sdf_jnp(p)
        return jnp.minimum(t + jnp.maximum(sd, 1e-4) * 0.9, far)

    t = jax.lax.fori_loop(0, n_steps, body, jnp.zeros(o.shape[0], jnp.float32))
    hit = _scene_sdf_jnp(o + d * t[:, None]) < 5e-3
    return jnp.where(hit, t, 0.0)


def orbit_poses(n_frames: int, radius: float = 0.6, height_amp: float = 0.2, deg_per_frame: float = 0.35) -> np.ndarray:
    """Smooth orbit inside the room, camera looking outward. [N, 4, 4] c2w.

    Angular velocity is fixed per frame (0.35°/frame ~ 0.4 cm/frame
    translation at r=0.6) to match Replica-sequence motion statistics —
    per-frame motion must sit inside the tracker's per-frame correction
    budget (10 Adam iters x lr 1e-3), exactly as in the reference's
    benchmark setting.
    """
    poses = np.zeros((n_frames, 4, 4), np.float32)
    for i in range(n_frames):
        a = np.deg2rad(deg_per_frame) * i
        eye = np.array([radius * np.cos(a), height_amp * np.sin(2 * a), radius * np.sin(a)])
        # look outward from the room center through the eye position
        fwd = eye / np.linalg.norm(eye)  # view direction (world)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, fwd)
        # OpenGL camera: x=right, y=up, z=-forward
        R = np.stack([right, true_up, -fwd], axis=1)
        poses[i, :3, :3] = R
        poses[i, :3, 3] = eye
        poses[i, 3, 3] = 1.0
    return poses


@dataclass
class SyntheticConfig:
    n_frames: int = 40
    height: int = 120
    width: int = 160
    fov_deg: float = 70.0


class SyntheticDataset:
    """In-memory synthetic RGB-D dataset with exact poses.

    Interface mirrors the reference's dataset tuple
    (idx, color [H,W,3] float, depth [H,W] float, c2w [4,4]) as numpy
    (reference: slam/common/datasets.py:96-137).
    """

    data_format = "RGBD"

    def __init__(self, data_path: str = "", n_frames: int = 40, height: int = 120, width: int = 160, fov_deg: float = 70.0):
        # data_path may carry generator params as "k=v,k=v"
        # (e.g. ds-run --data "n_frames=16,height=60,width=80").
        if data_path:
            for kv in data_path.split(","):
                if "=" not in kv:
                    continue
                k, v = kv.split("=", 1)
                k = k.strip()
                if k == "n_frames":
                    n_frames = int(v)
                elif k == "height":
                    height = int(v)
                elif k == "width":
                    width = int(v)
                elif k == "fov_deg":
                    fov_deg = float(v)
        self.n_img = n_frames
        f = 0.5 * width / np.tan(0.5 * np.deg2rad(fov_deg))
        self.camera = Camera(fx=f, fy=f, cx=width / 2 - 0.5, cy=height / 2 - 0.5, height=height, width=width)
        self.poses = orbit_poses(n_frames)
        self._cache = {}

    def __len__(self) -> int:
        return self.n_img

    def _dirs(self) -> np.ndarray:
        cam = self.camera
        i, j = np.meshgrid(np.arange(cam.width), np.arange(cam.height))
        dirs = np.stack(
            [(i - cam.cx) / cam.fx, -(j - cam.cy) / cam.fy, -np.ones_like(i, np.float64)], -1
        )
        return dirs

    def render_frame(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        c2w = self.poses[index].astype(np.float64)
        dirs_cam = self._dirs()
        dirs_w = dirs_cam @ c2w[:3, :3].T
        origins = np.broadcast_to(c2w[:3, 3], dirs_w.shape)
        # depth is distance along the (unnormalized) pixel ray, like a
        # z-buffer dataset: trace with normalized dirs then divide by norm.
        norms = np.linalg.norm(dirs_w, axis=-1)
        t = sphere_trace(origins, dirs_w / norms[..., None])
        depth = np.where(t > 0, t / norms, 0.0).astype(np.float32)
        p_hit = origins + dirs_w * depth[..., None]
        color = scene_color(p_hit).astype(np.float32)
        color = np.where(depth[..., None] > 0, color, 0.0)
        return color, depth

    def __getitem__(self, index: int):
        if index not in self._cache:
            self._cache[index] = self.render_frame(index)
        color, depth = self._cache[index]
        return index, color, depth, self.poses[index]

    def get_camera(self) -> Camera:
        return self.camera

    @property
    def bounds(self) -> np.ndarray:
        m = 0.2
        return np.array([[-ROOM_HALF[0] - m, ROOM_HALF[0] + m],
                         [-ROOM_HALF[1] - m, ROOM_HALF[1] + m],
                         [-ROOM_HALF[2] - m, ROOM_HALF[2] + m]], np.float32)
