"""DPVO — sparse patch-graph visual odometry (monocular, no mapping).

TPU-native rebuild of the reference DPVO (reference: slam/algorithms/
dpvo.py:40-450). The reference drives three CUDA extensions (altcorr,
fastba, lietorch) from a dynamically-sized torch edge graph; here the edge
graph lives on the host as numpy (it mutates every frame — appends,
removals, frame shifts), and each frame launches ONE jitted device program
over a fixed-capacity padded edge table:

    reproject -> chunked patch correlation -> update operator -> GN bundle
    adjustment over a sliding pose window -> point cloud

Capacities are static: edges pad to power-of-two buckets (few recompiles),
BA runs over a fixed ``W_BA``-frame window remapped to local indices on the
host, and the feature rings (fmap pyramid / gmap / imap) are device-resident
with per-frame slot writes (dynamic_update_slice) — no per-edge host
transfers.

Without the pretrained dpvo.pth the update operator is random; convert
weights with utils/torch_convert.load_dpvo_weights (VONetConfig.
pretrained_path). The graph/BA machinery itself is validated with an
oracle update in tests/test_dpvo.py.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

from ..common.camera import Camera
from ..models.vonet import VONet, VONetConfig
from ..ops import lie_np
from ..ops.ba import bundle_adjust
from ..ops.correlation import (bilinear_sample, extract_patches,
                               patch_correlation_chunked)
from ..ops.projective import flow_mag, point_cloud, reproject
from .base import Algorithm, AlgorithmConfig


@dataclass
class DPVOConfig(AlgorithmConfig):
    """DPVO config (reference dpvo.py:21-37)."""

    _target: Type = field(default_factory=lambda: DPVO)
    patch_per_frame: int = 96
    patch_lifetime: int = 13
    init_frame_num: int = 8
    gradient_bias: bool = False
    optimization_window: int = 10
    keyframe_index: int = 4
    keyframe_thresh: float = 15.0
    removal_window: int = 22
    motion_damping: float = 0.5
    # min median update-delta to accept a frame pre-init (dpvo.py:160's
    # hardcoded 2.0, made configurable)
    motion_init_thresh: float = 2.0
    buffer_size: int = 2048
    mem: int = 32
    edge_chunk: int = 2048
    model: VONetConfig = field(default_factory=VONetConfig)
    rot_rep: str = "quat"


def _round_bucket(n: int, base: int = 1024) -> int:
    """Next power-of-two-ish capacity so edge-count jitter doesn't recompile."""
    c = base
    while c < n:
        c *= 2
    return c


class DPVO(Algorithm):
    config: DPVOConfig

    def __init__(self, config: DPVOConfig, camera: Camera) -> None:
        super().__init__(config, camera)
        self.model = config.model.setup()
        self.P = self.model.P
        self.RES = self.model.RES
        self.DIM = self.model.DIM
        self.M = config.patch_per_frame
        self.N = config.buffer_size
        self.mem = config.mem
        # BA window: edges only reference the last removal_window frames
        # (dpvo.py:321-322), +4 slack for the just-appended frame.
        self.W_BA = config.removal_window + 4

        # crop to /16 like the reference (dpvo.py:400-402)
        self.ht = camera.height - camera.height % 16
        self.wd = camera.width - camera.width % 16
        h4, w4 = self.ht // self.RES, self.wd // self.RES
        self.h4, self.w4 = h4, w4
        self.intrinsics4 = np.array(
            [camera.fx, camera.fy, camera.cx, camera.cy], np.float32) / self.RES

        # ----- host state (mutates every frame; numpy) -----
        self.n = 0  # active frames
        self.m = 0  # active patches
        self.counter = 0  # total frames seen
        self.tlist = []
        self.tstamps = np.zeros(self.N, np.int64)
        self.poses_t = np.zeros((self.N, 3), np.float32)
        self.poses_q = np.zeros((self.N, 4), np.float32)
        self.poses_q[:, 0] = 1.0  # identity (w,x,y,z)
        # patches [N, M, P, P, 3] (u, v, inv_depth) at 1/4 res
        self.patches = np.zeros((self.N, self.M, self.P, self.P, 3), np.float32)
        self.colors = np.zeros((self.N, self.M, 3), np.float32)
        self.points = np.zeros((self.N * self.M, 3), np.float32)
        self.delta: Dict[int, Tuple[int, np.ndarray]] = {}  # skipped frames

        # edge graph (host)
        self.ii = np.zeros(0, np.int64)  # patch's host frame
        self.jj = np.zeros(0, np.int64)  # target frame
        self.kk = np.zeros(0, np.int64)  # global patch id
        self.net = np.zeros((0, self.DIM), np.float32)

        # ----- device-resident feature rings -----
        self.imap_ring = jnp.zeros((self.mem, self.M, self.DIM), jnp.float32)
        self.gmap_ring = jnp.zeros((self.mem, self.M, 128, self.P, self.P),
                                   jnp.float32)
        self.fmap1_ring = jnp.zeros((self.mem, 128, h4, w4), jnp.float32)
        self.fmap2_ring = jnp.zeros((self.mem, 128, h4 // 4, w4 // 4),
                                    jnp.float32)
        self.params = jax.device_put(self.model.params)
        self._rng = np.random.default_rng(3407)

        self._extract = jax.jit(VONet.extract_features)
        self._detect = jax.jit(self._detect_impl)
        self._update_steps: Dict[Tuple[int, int], object] = {}

    # ------------------------------------------------------------ features
    @staticmethod
    def _detect_impl(params, image, centers):
        """Per-frame feature extraction + patch sampling (vonet_dpvo.py
        Patchifier.forward:87-151). image [3,H,W]; centers [M,2] at 1/4 res."""
        fmap, imap_full = VONet.extract_features(params, image)
        gmap = extract_patches(fmap, centers, p=3)  # [M,128,3,3]
        imap = bilinear_sample(imap_full, centers)  # [M,DIM]
        clr = bilinear_sample(image, 4.0 * (centers + 0.5))  # [M,3]
        fmap2 = jax.lax.reduce_window(
            fmap, 0.0, jax.lax.add, (1, 4, 4), (1, 4, 4), "VALID") / 16.0
        return fmap, fmap2, gmap, imap, clr

    def detect_patches(self, cur_frame) -> None:
        """dpvo.py:396-450: extract features, sample patch centers, init
        depths, damped-linear motion model."""
        img = np.ascontiguousarray(
            cur_frame.rgb[: self.ht, : self.wd].transpose(2, 0, 1),
            np.float32)
        if self.config.gradient_bias:
            gray = cur_frame.rgb[: self.ht, : self.wd].sum(-1)
            gx = np.abs(np.diff(gray, axis=1))[:-1]
            gy = np.abs(np.diff(gray, axis=0))[:, :-1]
            g = np.sqrt(gx**2 + gy**2)
            g = g[: self.h4 * 4, : self.w4 * 4].reshape(
                self.h4, 4, self.w4, 4).mean((1, 3))
            x = self._rng.integers(1, self.w4 - 1, 3 * self.M)
            y = self._rng.integers(1, self.h4 - 1, 3 * self.M)
            order = np.argsort(g[y, x])
            x, y = x[order[-self.M:]], y[order[-self.M:]]
        else:
            x = self._rng.integers(1, self.w4 - 1, self.M)
            y = self._rng.integers(1, self.h4 - 1, self.M)
        centers = jnp.asarray(np.stack([x, y], -1).astype(np.float32))

        fmap, fmap2, gmap, imap, clr = self._detect(
            self.params, jnp.asarray(img), centers)
        slot = self.n % self.mem
        self.fmap1_ring = self.fmap1_ring.at[slot].set(fmap)
        self.fmap2_ring = self.fmap2_ring.at[slot].set(fmap2)
        self.gmap_ring = self.gmap_ring.at[slot].set(gmap)
        self.imap_ring = self.imap_ring.at[slot].set(imap)

        self.tlist.append(cur_frame.fid)
        self.tstamps[self.n] = self.counter
        self.colors[self.n] = np.asarray(clr)

        # patch coordinate grids (utils_dpvo.py coords_grid_with_index)
        d = np.arange(self.P, dtype=np.float32) - self.P // 2
        dy, dx = np.meshgrid(d, d, indexing="ij")
        uv = np.stack([x[:, None, None] + dx, y[:, None, None] + dy], -1)
        patches = np.concatenate(
            [uv, np.ones((self.M, self.P, self.P, 1), np.float32)], -1)

        # depth init (dpvo.py:434-438)
        if self.is_initialized():
            s = np.median(self.patches[max(self.n - 3, 0): self.n, ..., 2])
            patches[..., 2] = s
        else:
            patches[..., 2] = np.exp(
                self._rng.uniform(-1.0, 1.0, (self.M, 1, 1)))
        self.patches[self.n] = patches

        # motion model (dpvo.py:422-432, DAMPED_LINEAR)
        if self.n > 1:
            P1 = lie_np.pose_matrix(self.poses_t[self.n - 1],
                                    self.poses_q[self.n - 1])
            P2 = lie_np.pose_matrix(self.poses_t[self.n - 2],
                                    self.poses_q[self.n - 2])
            rel = P1 @ np.linalg.inv(P2)
            xi = self.config.motion_damping * lie_np.se3_log(rel)
            Pn = lie_np.se3_exp(xi) @ P1
            self.poses_t[self.n], self.poses_q[self.n] = lie_np.pose_tq(Pn)
        elif self.n == 1:
            self.poses_t[self.n] = self.poses_t[0]
            self.poses_q[self.n] = self.poses_q[0]

    # ------------------------------------------------------------- graph
    def _ix(self, kk: np.ndarray) -> np.ndarray:
        return kk // self.M

    def edges_forw(self):
        r = self.config.patch_lifetime
        t0 = self.M * max(self.n - r, 0)
        t1 = self.M * max(self.n - 1, 0)
        kk, jj = np.meshgrid(np.arange(t0, t1),
                             np.arange(self.n - 1, self.n), indexing="ij")
        return kk.ravel(), jj.ravel()

    def edges_back(self):
        r = self.config.patch_lifetime
        t0 = self.M * max(self.n - 1, 0)
        t1 = self.M * self.n
        kk, jj = np.meshgrid(np.arange(t0, t1),
                             np.arange(max(self.n - r, 0), self.n),
                             indexing="ij")
        return kk.ravel(), jj.ravel()

    def append_factors(self, kk, jj):
        self.jj = np.concatenate([self.jj, jj])
        self.kk = np.concatenate([self.kk, kk])
        self.ii = np.concatenate([self.ii, self._ix(kk)])
        self.net = np.concatenate(
            [self.net, np.zeros((len(kk), self.DIM), np.float32)])

    def remove_factors(self, m):
        keep = ~m
        self.ii, self.jj, self.kk = self.ii[keep], self.jj[keep], self.kk[keep]
        self.net = self.net[keep]

    def _neighbors(self):
        """fastba.neighbors (dpvo.py:59): for each edge, the edge index with
        the same patch and target jj-1 / jj+1 (-1 if absent)."""
        table = {}
        for e, (k, j) in enumerate(zip(self.kk, self.jj)):
            table[(int(k), int(j))] = e
        ix = np.array([table.get((int(k), int(j) - 1), -1)
                       for k, j in zip(self.kk, self.jj)], np.int64)
        jx = np.array([table.get((int(k), int(j) + 1), -1)
                       for k, j in zip(self.kk, self.jj)], np.int64)
        return ix, jx

    # ------------------------------------------------------------- update
    def _get_update_step(self, E: int, probe: bool):
        key = (E, probe)
        if key not in self._update_steps:
            self._update_steps[key] = jax.jit(
                functools.partial(self._update_impl, E=E, probe=probe,
                                  W=self.W_BA, M=self.M, mem=self.mem,
                                  chunk=self.config.edge_chunk,
                                  iters=2, mesh=self.mesh),
            )
        return self._update_steps[key]

    @staticmethod
    def _update_impl(params, fmap1, fmap2, gmap, imap, net,
                     poses_t, poses_q, patches, intrinsics,
                     ii_l, jj_l, kk_l, kk_mem, jj_mem,
                     seg_kk, seg_ij, ix, jx, mask, t0, *,
                     E, probe, W, M, mem, chunk, iters, mesh=None):
        """One DPVO update on the padded edge table (dpvo.py:324-355).

        All index args are window-local: poses/patches are the W-frame
        window; kk_mem / jj_mem index the device rings.

        Multi-chip (``DPVOConfig(devices=N)``): the E padded edges shard
        over the 'dp' mesh axis — reprojection, two-level correlation and
        the update operator's per-edge MLP/GRU are independent per edge;
        XLA inserts collectives for the cross-edge pieces (SoftAgg segment
        softmax, ix/jx neighbor gathers, BA's segment-summed pose blocks).
        E is a multiple of edge_chunk (2048), so it always divides 'dp'.
        """
        from ..models.vonet import update_apply

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            s_e = NamedSharding(mesh, P("dp"))

            def _se(*xs):
                out = tuple(jax.lax.with_sharding_constraint(x, s_e)
                            for x in xs)
                return out if len(out) > 1 else out[0]

            (net, ii_l, jj_l, kk_l, kk_mem, jj_mem, seg_kk, seg_ij,
             ix, jx, mask) = _se(net, ii_l, jj_l, kk_l, kk_mem, jj_mem,
                                 seg_kk, seg_ij, ix, jx, mask)

        P = patches.shape[2]
        # one (u, v, inv_depth) per patch — the BA's depth variable is the
        # center pixel (ba_cuda.cu optimizes a single depth per patch)
        patch_grid = patches.reshape(W * M, P * P, 3)
        patches_flat = patch_grid[:, (P * P) // 2]

        # reproject full patch grids: [E, P*P, 2]
        coords = reproject(poses_t, poses_q, patch_grid[kk_l],
                           intrinsics, ii_l, jj_l)
        coords_g = coords.reshape(E, P, P, 2)

        # correlation on both pyramid levels (dpvo.py:213-223)
        gp = gmap.reshape(mem * M, 128, P, P)[kk_mem]
        corr1 = patch_correlation_chunked(fmap1, gp, coords_g, jj_mem,
                                          radius=3, chunk=chunk)
        corr2 = patch_correlation_chunked(fmap2, gp, coords_g / 4.0, jj_mem,
                                          radius=3, chunk=chunk)
        corr = jnp.stack([corr1, corr2], -1).reshape(E, -1)

        ctx = imap.reshape(mem * M, -1)[kk_mem]
        net, delta, weight = update_apply(
            params["update"], net, ctx, corr, seg_kk, seg_ij, ix, jx, mask,
            num_segments=E + 1)

        if probe:
            return jnp.median(jnp.linalg.norm(delta, axis=-1))

        # bundle adjustment (dpvo.py:334-344)
        center = coords_g[:, P // 2, P // 2]
        target = center + delta
        weight = weight * mask[:, None]
        new_t, new_q, new_patches = bundle_adjust(
            poses_t, poses_q, patches_flat, target, weight,
            ii_l, jj_l, kk_l, intrinsics, t0=t0, iterations=iters,
            edge_mask=mask.astype(jnp.float32))
        # broadcast the optimized center depth to the whole patch grid
        # (the reference optimizes one depth per patch: ba_cuda.cu)
        depths = new_patches[:, 2].reshape(W, M, 1, 1)
        patches_out = patches.at[..., 2].set(
            jnp.broadcast_to(depths, patches.shape[:-1]))

        # point cloud of patch centers (dpvo.py:351-355)
        ctr = patches_out.reshape(W * M, P, P, 3)[:, P // 2, P // 2]
        pts = point_cloud(new_t, new_q, ctr, intrinsics,
                          jnp.arange(W * M) // M)
        return net, new_t, new_q, patches_out, pts

    def _run_update(self, probe: bool = False):
        E_real = len(self.ii)
        if E_real == 0:
            return None
        E = _round_bucket(E_real, self.config.edge_chunk)
        base = max(0, self.n - self.W_BA)

        def pad(a, fill=0):
            return np.concatenate(
                [a, np.full((E - E_real,) + a.shape[1:], fill, a.dtype)])

        ii_l = pad(self.ii - base).clip(0, self.W_BA - 1)
        jj_l = pad(self.jj - base).clip(0, self.W_BA - 1)
        kk_l = pad(self.kk - base * self.M).clip(0, self.W_BA * self.M - 1)
        kk_mem = pad(self.kk % (self.M * self.mem))
        jj_mem = pad(self.jj % self.mem)
        mask = np.zeros(E, bool)
        mask[:E_real] = True
        # dense segment ids; padded edges -> reserved segment E
        _, seg_kk = np.unique(self.kk, return_inverse=True)
        _, seg_ij = np.unique(self.ii * 100003 + self.jj, return_inverse=True)
        seg_kk, seg_ij = pad(seg_kk, E), pad(seg_ij, E)
        ix, jx = self._neighbors()
        ix, jx = pad(ix, -1), pad(jx, -1)
        net = pad(self.net.astype(np.float32))

        poses_t = self.poses_t[base: base + self.W_BA]
        poses_q = self.poses_q[base: base + self.W_BA]
        patches = self.patches[base: base + self.W_BA]
        if self.is_initialized():
            t0 = max(self.n - self.config.optimization_window, 1)
        else:
            t0 = 1
        t0_l = max(t0 - base, 0 if base > 0 else 1)

        step = self._get_update_step(E, probe)
        out = step(self.params, self.fmap1_ring, self.fmap2_ring,
                   self.gmap_ring, self.imap_ring, jnp.asarray(net),
                   jnp.asarray(poses_t), jnp.asarray(poses_q),
                   jnp.asarray(patches), jnp.asarray(self.intrinsics4),
                   jnp.asarray(ii_l), jnp.asarray(jj_l), jnp.asarray(kk_l),
                   jnp.asarray(kk_mem), jnp.asarray(jj_mem),
                   jnp.asarray(seg_kk), jnp.asarray(seg_ij),
                   jnp.asarray(ix), jnp.asarray(jx), jnp.asarray(mask),
                   jnp.asarray(t0_l))
        if probe:
            return float(out)
        net, new_t, new_q, patches_out, pts = out
        self.net = np.asarray(net)[:E_real]
        self.poses_t[base: base + self.W_BA] = np.asarray(new_t)
        self.poses_q[base: base + self.W_BA] = np.asarray(new_q)
        self.patches[base: base + self.W_BA] = np.asarray(patches_out)
        self.points[base * self.M: (base + self.W_BA) * self.M] = np.asarray(pts)
        return None

    def update(self):
        self._run_update(probe=False)

    def motion_probe(self) -> float:
        """dpvo.py:250-266: would-be update magnitude of the new frame."""
        kk = np.arange(self.m - self.M, self.m)
        jj = np.full_like(kk, self.n)
        saved = (self.ii, self.jj, self.kk, self.net)
        self.kk, self.jj = kk, jj
        self.ii = self._ix(kk)
        self.net = np.zeros((len(kk), self.DIM), np.float32)
        # the probe frame self.n must be inside the window for reprojection
        self.n += 1
        try:
            mag = self._run_update(probe=True)
        finally:
            self.n -= 1
            self.ii, self.jj, self.kk, self.net = saved
        return mag if mag is not None else 0.0

    def motionmag(self, i: int, j: int) -> float:
        k = (self.ii == i) & (self.jj == j)
        if not k.any():
            return 0.0
        ctr = self.patches.reshape(self.N * self.M, self.P, self.P, 3)[
            self.kk[k]][:, self.P // 2, self.P // 2]
        fm = flow_mag(jnp.asarray(self.poses_t[: self.n + 1]),
                      jnp.asarray(self.poses_q[: self.n + 1]),
                      jnp.asarray(ctr)[:, None],
                      jnp.asarray(self.intrinsics4),
                      jnp.asarray(self.ii[k]), jnp.asarray(self.jj[k]),
                      beta=0.5)
        return float(np.mean(np.asarray(fm)))

    def keyframe(self):
        """dpvo.py:284-322: drop a low-motion frame, shift buffers."""
        i = self.n - self.config.keyframe_index - 1
        j = self.n - self.config.keyframe_index + 1
        m = (self.motionmag(i, j) + self.motionmag(j, i)) / 2.0
        if m < self.config.keyframe_thresh:
            k = self.n - self.config.keyframe_index
            t0 = int(self.tstamps[k - 1])
            t1 = int(self.tstamps[k])
            Pk = lie_np.pose_matrix(self.poses_t[k], self.poses_q[k])
            Pk1 = lie_np.pose_matrix(self.poses_t[k - 1], self.poses_q[k - 1])
            self.delta[t1] = (t0, Pk @ np.linalg.inv(Pk1))

            self.remove_factors((self.ii == k) | (self.jj == k))
            self.kk[self.ii > k] -= self.M
            self.ii[self.ii > k] -= 1
            self.jj[self.jj > k] -= 1

            mem = self.mem
            for f in range(k, self.n - 1):
                self.tstamps[f] = self.tstamps[f + 1]
                self.poses_t[f] = self.poses_t[f + 1]
                self.poses_q[f] = self.poses_q[f + 1]
                self.colors[f] = self.colors[f + 1]
                self.patches[f] = self.patches[f + 1]
            # ring shifts (device): one batched roll of the affected slots
            idx = np.arange(k, self.n - 1)
            src = jnp.asarray((idx + 1) % mem)
            dst = jnp.asarray(idx % mem)
            self.imap_ring = self.imap_ring.at[dst].set(self.imap_ring[src])
            self.gmap_ring = self.gmap_ring.at[dst].set(self.gmap_ring[src])
            self.fmap1_ring = self.fmap1_ring.at[dst].set(self.fmap1_ring[src])
            self.fmap2_ring = self.fmap2_ring.at[dst].set(self.fmap2_ring[src])
            self.n -= 1
            self.m -= self.M

        self.remove_factors(
            self._ix(self.kk) < self.n - self.config.removal_window)

    # ----------------------------------------------------------- tracking
    def do_tracking(self, cur_frame) -> Optional[np.ndarray]:
        if self.n + 1 >= self.N:
            raise RuntimeError("DPVO buffer full; raise buffer_size")
        self.detect_patches(cur_frame)
        self.counter += 1

        if self.n > 0 and not self.is_initialized():
            if self.motion_probe() < self.config.motion_init_thresh:
                self.delta[self.counter - 1] = (self.counter - 2, np.eye(4))
                return None

        self.n += 1
        self.m += self.M
        self.append_factors(*self.edges_forw())
        self.append_factors(*self.edges_back())

        if self.n == self.config.init_frame_num and not self.is_initialized():
            self.set_initialized()
            for _ in range(12):
                self.update()
            poses, fids = self.get_all_poses()
            for t in range(self.counter - 1):
                self.update_framepose(int(fids[t]) if t < len(fids) else t,
                                      poses[t])
        elif self.is_initialized():
            self.update()
            self.keyframe()

        # finalize: interpolate skipped/removed frames into the estimate
        # list (the reference does this via get_all_poses consumers)
        if cur_frame.is_final_frame:
            poses, _ = self.get_all_poses()
            for t in range(min(self.counter - 1,
                               len(self.estimate_c2w_list))):
                self.update_framepose(t, poses[t])

        # current c2w = T_{n-1}^{-1} (poses are world-to-camera)
        T = lie_np.pose_matrix(self.poses_t[self.n - 1],
                               self.poses_q[self.n - 1])
        return np.linalg.inv(T).astype(np.float32)

    def get_all_poses(self):
        """dpvo.py:384-394: fill skipped frames from the delta chain."""
        traj = {int(self.tstamps[i]): lie_np.pose_matrix(
            self.poses_t[i], self.poses_q[i]) for i in range(self.n)}

        def get(t):
            if t in traj:
                return traj[t]
            t0, dP = self.delta[t]
            return dP @ get(t0)

        poses = [np.linalg.inv(get(t)) for t in range(self.counter)]
        return np.stack(poses), np.asarray(self.tlist)

    # ---------------------------------------------------------- mapping --
    def do_mapping(self, cur_frame) -> None:  # VO only (dpvo.py:134)
        if cur_frame.is_final_frame:
            poses, fids = self.get_all_poses()
            for t in range(min(self.counter, len(self.estimate_c2w_list))):
                self.update_framepose(t, poses[t])

    def add_keyframe(self, cur_frame) -> None:
        pass

    def render_img(self, c2w, gt_depth=None, idx=None):
        return None, None

    def get_cloud(self, c2w_np=None, gt_depth_np=None):
        """dpvo.py:137-149: filtered point cloud + colors."""
        pos = self.points[: self.m]
        rgb = np.clip(self.colors[: self.n].reshape(-1, 3), 0, 1)
        if len(pos) == 0:
            return pos, rgb
        med = np.median(pos[:, 2])
        keep = (pos[:, 2] <= med * 10) & (pos[:, 2] > 0)
        return pos[keep], rgb[: len(pos)][keep]

    def get_mesh(self):
        return None
