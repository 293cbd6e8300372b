"""NeuralRecon: real-time incremental TSDF reconstruction from posed RGB.

TPU-native rebuild of the reference algorithm (reference: slam/algorithms/
neural_recon.py:38-276). Poses are not optimized (do_tracking returns the
adjusted ground-truth pose, :130-153); the work is the per-fragment
coarse-to-fine network in models/neucon.py, launched as ONE jitted program
per fragment over fixed-size dense volumes.

Host responsibilities (same split as the reference, which also does these
on host): keyframe selection by relative angle/translation (:263-276),
fragment input assembly — per-scale projection matrices, frustum-derived
volume origin, world-to-aligned-camera rotation (:155-236) — plus the
global hidden/TSDF volumes that the reference keeps as sparse torch maps
(gru_fusion.py) and we keep as growable dense numpy arrays cropped per
fragment.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

from ..common.camera import Camera
from ..models.neucon import OUT_CHANNELS, NeuCon, NeuConModelConfig
from .base import Algorithm, AlgorithmConfig


@dataclass
class NeuralReconConfig(AlgorithmConfig):
    """reference: slam/algorithms/neural_recon.py:20-36."""

    _target: Type = field(default_factory=lambda: NeuralRecon)
    model: NeuConModelConfig = field(default_factory=NeuConModelConfig)
    min_angle: float = 15.0
    min_distance: float = 0.1
    max_depth: float = 3.0
    img_size_w: int = 640
    img_size_h: int = 480
    stride: int = 4
    c2w_offset: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    mesh_use_double: bool = False
    rot_rep: str = "quat"


def _resize_bilinear(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """cv2.INTER_LINEAR stand-in (numpy, align-corners=False)."""
    H, W = img.shape[:2]
    ys = (np.arange(h) + 0.5) * H / h - 0.5
    xs = (np.arange(w) + 0.5) * W / w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None, None]
    fx = np.clip(xs - x0, 0, 1)[None, :, None]
    a = img[y0][:, x0]
    b = img[y0][:, x1]
    c = img[y1][:, x0]
    d = img[y1][:, x1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c * fy * (1 - fx) + d * fy * fx).astype(img.dtype)


def _rotate_view_to_align_xyplane(c2w: np.ndarray) -> np.ndarray:
    """reference utils.py:480-490: rotation aligning the middle camera's
    view so the world z-axis maps to camera [0,-1,0]."""
    z_c = (np.linalg.inv(c2w) @ np.array([0, 0, 1, 0.0]))[:3]
    axis = np.cross(z_c, np.array([0, -1, 0.0]))
    n = np.linalg.norm(axis)
    if n < 1e-8:
        return np.eye(3)
    axis = axis / n
    theta = np.arccos(np.clip(-z_c[1] / np.linalg.norm(z_c), -1, 1))
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


class _GlobalVolume:
    """Growable dense world volume (the reference's sparse global map,
    gru_fusion.py:54-160, as a host array). Units: level voxels."""

    def __init__(self, channels: int, fill: float = 0.0):
        self.channels = channels
        self.fill = fill
        self.data: Optional[np.ndarray] = None
        self.origin = np.zeros(3, np.int64)  # voxel index of data[0,0,0]

    def _ensure(self, lo: np.ndarray, hi: np.ndarray) -> None:
        if self.data is None:
            shape = tuple(hi - lo) + ((self.channels,) if self.channels else ())
            self.data = np.full(shape, self.fill, np.float32)
            self.origin = lo.copy()
            return
        cur_hi = self.origin + np.asarray(self.data.shape[:3])
        pad_lo = np.maximum(self.origin - lo, 0)
        pad_hi = np.maximum(hi - cur_hi, 0)
        if pad_lo.any() or pad_hi.any():
            pads = [(int(pad_lo[k]), int(pad_hi[k])) for k in range(3)]
            if self.channels:
                pads.append((0, 0))
            self.data = np.pad(self.data, pads, constant_values=self.fill)
            self.origin = self.origin - pad_lo

    def crop(self, lo: np.ndarray, dim: int) -> np.ndarray:
        lo = np.asarray(lo, np.int64)
        self._ensure(lo, lo + dim)
        s = lo - self.origin
        return self.data[s[0]:s[0] + dim, s[1]:s[1] + dim, s[2]:s[2] + dim]

    def write(self, lo: np.ndarray, block: np.ndarray,
              mask: Optional[np.ndarray] = None) -> None:
        lo = np.asarray(lo, np.int64)
        dim = block.shape[0]
        self._ensure(lo, lo + dim)
        s = lo - self.origin
        view = self.data[s[0]:s[0] + dim, s[1]:s[1] + dim, s[2]:s[2] + dim]
        if mask is None:
            view[...] = block
        else:
            view[mask] = block[mask]


class NeuralRecon(Algorithm):
    config: NeuralReconConfig

    def __init__(self, config: NeuralReconConfig, camera: Camera) -> None:
        super().__init__(config, camera)
        self.model: NeuCon = config.model.setup()
        mc = self.model.config
        self.frag_frames: List = []
        self.last_mesh = None
        self.fragment_id = 0

        # intrinsics after crop+resize (reference :53-70)
        img_h = max(int(camera.height / config.img_size_h), 1) * config.img_size_h
        img_w = max(int(camera.width / config.img_size_w), 1) * config.img_size_w
        img_h = min(img_h, camera.height)
        img_w = min(img_w, camera.width)
        self.h_crop = (camera.height - img_h) // 2
        self.w_crop = (camera.width - img_w) // 2
        dsh = img_h / config.img_size_h
        dsw = img_w / config.img_size_w
        self.cam_intr = np.array([
            [camera.fx / dsw, 0, (camera.cx - self.w_crop) / dsw],
            [0, camera.fy / dsh, (camera.cy - self.h_crop) / dsh],
            [0, 0, 1.0]], np.float32)

        # global state per scale: hidden volumes + fused tsdf
        self.hidden_vols = [
            _GlobalVolume(OUT_CHANNELS[i]) for i in range(mc.n_layer)]
        self.tsdf_vol = _GlobalVolume(0, fill=1.0)
        self.occ_vol = _GlobalVolume(0, fill=0.0)
        self.params = jax.device_put(self.model.params)
        if self.mesh is not None:
            # view-DP fragment step: the V independent views (2D backbone +
            # back-projection) shard over 'dp'; XLA psums the per-view
            # volume contributions and the 3D U-Net/GRU run replicated.
            # do_mapping zero-pads V to the mesh size (zero projection
            # matrices -> z=0 -> no in-bounds samples, so pad views
            # contribute nothing; backbone norm is per-view, _norm2d).
            from jax.sharding import NamedSharding, PartitionSpec as P

            s_img = NamedSharding(self.mesh, P("dp"))
            s_prj = NamedSharding(self.mesh, P(None, "dp"))
            model = self.model

            def frag(params, imgs, projs, vol_origin, hiddens, aligned_T):
                imgs = jax.lax.with_sharding_constraint(imgs, s_img)
                projs = jax.lax.with_sharding_constraint(projs, s_prj)
                return model.fragment_step(params, imgs, projs, vol_origin,
                                           hiddens, aligned_T)

            self._frag_jit = jax.jit(frag)
        else:
            self._frag_jit = jax.jit(self.model.fragment_step)

    # ------------------------------------------------------------- poses
    def do_tracking(self, cur_frame) -> Optional[np.ndarray]:
        """ScanNet-convention pose passthrough (reference :130-153)."""
        if not self.is_initialized():
            # no bootstrap phase: poses are given, mark initialized so the
            # pipeline applies the adjusted pose from frame 0 onward
            self.set_initialized()
        c2w = np.asarray(cur_frame.gt_pose, np.float32).copy()
        c2w[:3, 1] *= -1
        c2w[:3, 2] *= -1
        c2w[:3, 3] += np.asarray(self.config.c2w_offset, np.float32)
        return c2w

    def check_keyframe(self, cur_frame) -> None:
        """reference :263-276: angle/translation gating."""
        if not self.frag_frames:
            self.frag_frames.append(cur_frame)
            return
        last = self.frag_frames[-1].get_pose()
        cur = cur_frame.get_pose()
        t = ((np.linalg.inv(cur[:3, :3]) @ last[:3, :3]
              @ np.array([0, 0, 1.0])) * np.array([0, 0, 1.0])).sum()
        angle = np.arccos(np.clip(t, -1, 1))
        dis = np.linalg.norm(cur[:3, 3] - last[:3, 3])
        if (angle > self.config.min_angle / 180 * np.pi
                or dis > self.config.min_distance):
            self.frag_frames.append(cur_frame)

    # ------------------------------------------------------------ mapping
    def _fragment_inputs(self, frames):
        """reference get_model_input (:155-236)."""
        cfg = self.config
        mc = self.model.config
        n = len(frames)
        mid_pose = frames[n // 2].get_pose()
        R = _rotate_view_to_align_xyplane(mid_pose)
        aligned_T = np.eye(4, dtype=np.float32)
        aligned_T[:3, :3] = R
        aligned_T = aligned_T @ np.linalg.inv(mid_pose).astype(np.float32)

        imgs, projs = [], []
        bnds = np.stack([np.full(3, np.inf), np.full(3, -np.inf)], -1)
        for f in frames:
            rgb = f.rgb
            if self.h_crop > 0:
                rgb = rgb[self.h_crop:-self.h_crop]
            if self.w_crop > 0:
                rgb = rgb[:, self.w_crop:-self.w_crop]
            rgb = _resize_bilinear(rgb.astype(np.float32),
                                   cfg.img_size_h, cfg.img_size_w)
            imgs.append(rgb * 255.0)
            c2w = f.get_pose()
            # frustum corners (utils.py:398-415)
            zs = np.array([0, 1, 1, 1, 1.0]) * cfg.max_depth
            xs = (np.array([0, 0, 0, cfg.img_size_w, cfg.img_size_w]) -
                  self.cam_intr[0, 2]) * zs / self.cam_intr[0, 0]
            ys = (np.array([0, 0, cfg.img_size_h, 0, cfg.img_size_h]) -
                  self.cam_intr[1, 2]) * zs / self.cam_intr[1, 1]
            pts = c2w[:3, :3] @ np.stack([xs, ys, zs]) + c2w[:3, 3:4]
            bnds[:, 0] = np.minimum(bnds[:, 0], pts.min(1))
            bnds[:, 1] = np.maximum(bnds[:, 1], pts.max(1))
            w2c = np.linalg.inv(c2w)
            view_projs = []
            for s in range(3):
                k = self.cam_intr / cfg.stride / 2 ** s
                k[2, 2] = 1.0
                p = w2c.copy()
                p[:3, :4] = k @ w2c[:3, :4]
                view_projs.append(p)
            projs.append(np.stack(view_projs))

        # volume origin snapped to the coarsest stride (reference :205-222)
        num_layers = 3
        center = (bnds[:, 0] + bnds[:, 1]) / 2 / mc.voxel_size
        center = np.round(center / 2 ** num_layers) * 2 ** num_layers
        origin_vox = center - mc.n_vox // 2
        vol_origin_partial = origin_vox * mc.voxel_size
        return (np.stack(imgs).astype(np.float32),
                np.stack(projs, 1).astype(np.float32),  # [3, V, 4, 4]
                vol_origin_partial.astype(np.float32),
                origin_vox.astype(np.int64),
                aligned_T)

    def do_mapping(self, cur_frame) -> None:
        if not self.is_initialized():
            self.set_initialized()
        self.check_keyframe(cur_frame)
        if len(self.frag_frames) <= self.config.mapping_window_size:
            return
        mc = self.model.config
        imgs, projs, vol_origin, origin_vox, aligned_T = \
            self._fragment_inputs(self.frag_frames)
        # multi-chip: zero-pad the view axis to the mesh size (pad views
        # have zero projections -> zero back-projection contribution)
        vp = self._round_to_devices(imgs.shape[0])
        if vp > imgs.shape[0]:
            pad = vp - imgs.shape[0]
            imgs = np.concatenate(
                [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
            projs = np.concatenate(
                [projs, np.zeros((projs.shape[0], pad) + projs.shape[2:],
                                 projs.dtype)], axis=1)

        # crop per-scale global hidden states
        hiddens = []
        for i in range(mc.n_layer):
            interval = 2 ** (mc.n_layer - 1 - i)
            dim = mc.n_vox // interval
            lo = origin_vox // interval
            hiddens.append(jnp.asarray(self.hidden_vols[i].crop(lo, dim)))

        tsdf, occ, new_hiddens = self._frag_jit(
            self.params, jnp.asarray(imgs), jnp.asarray(projs),
            jnp.asarray(vol_origin), hiddens, jnp.asarray(aligned_T))

        for i in range(mc.n_layer):
            interval = 2 ** (mc.n_layer - 1 - i)
            lo = origin_vox // interval
            self.hidden_vols[i].write(lo, np.asarray(new_hiddens[i]))
        occ_np = np.asarray(occ)
        self.tsdf_vol.write(origin_vox, np.asarray(tsdf), mask=occ_np)
        self.occ_vol.write(origin_vox, occ_np.astype(np.float32),
                           mask=occ_np)
        self.fragment_id += 1
        self.frag_frames.clear()

    # -------------------------------------------------------------- mesh
    def get_mesh(self):
        """tsdf2mesh (utils.py:493-500) via the native marching-tets op."""
        if self.tsdf_vol.data is None:
            return None
        vol = self.tsdf_vol.data
        if (vol >= 1.0).all():
            return None
        from ..ops.marching_tets import marching_tetrahedra

        mc = self.model.config
        mask = self.occ_vol.data > 0 if self.occ_vol.data is not None else None
        origin = tuple(self.tsdf_vol.origin * mc.voxel_size)
        verts, faces = marching_tetrahedra(
            vol, 0.0, origin=origin, spacing=(mc.voxel_size,) * 3, mask=mask)
        if len(verts) == 0:
            return None
        from ..utils.io import Mesh

        self.last_mesh = Mesh(vertices=verts.astype(np.float32),
                              faces=faces.astype(np.int32))
        return self.last_mesh

    def get_cloud(self, c2w_np=None, gt_depth_np=None):
        if self.tsdf_vol.data is None:
            return None
        occ = self.occ_vol.data
        if occ is None or not occ.any():
            return None
        idx = np.argwhere(occ > 0)
        mc = self.model.config
        pts = (idx + self.tsdf_vol.origin) * mc.voxel_size
        return pts.astype(np.float32), np.full_like(pts, 0.5, np.float32)

    def add_keyframe(self, cur_frame) -> None:
        pass

    def render_img(self, c2w, gt_depth=None, idx=None):
        return None, None
