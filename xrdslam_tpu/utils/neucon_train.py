"""NeuralRecon in-env sequence training.

The reference ships a pretrained `model_000047.ckpt` (an LFS stub in this
environment — verified round 1), trained offline on ScanNet with the loss
in neucon_network.py:249-300 (per-level pos-weighted occupancy BCE +
log-L1 TSDF, GRU fusion ON so hidden state threads across fragments of a
sequence). This module reproduces that training recipe in-env on the
analytic synthetic scenes: exact TSDF/occupancy targets come from the
scene SDF, fragments are assembled by the algorithm's own keyframe gating
and input pipeline, and the ConvGRU hidden state is threaded across
fragments exactly as at inference time (gradients stopped at fragment
boundaries, as the reference does between training samples of a scene).

Used by tests/test_neucon_sequence.py (CPU) and tools/tpu_smoke.py
(`neucon-train` mode) to produce the round-3 sequence-level proof: a
model trained on fragments 0..k reconstructs the fused global volume at
gated F-score/acc/comp against the GT mesh.
"""
from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _visibility(pts: np.ndarray, frames: Sequence, cam,
                trunc: float) -> np.ndarray:
    """Depth-fusion visibility: a point is observed if it projects into at
    least one frame's image in front of the camera and lies no deeper than
    the observed depth + truncation. This is what distinguishes real TSDF
    GT (fused from depth maps — the reference's generate_gt pipeline) from
    the raw analytic SDF: voxels behind surfaces or outside every frustum
    must stay EMPTY in the target, otherwise training teaches the network
    to hallucinate geometry it cannot see."""
    vis = np.zeros(pts.shape[0], bool)
    for f in frames:
        c2w = f.get_pose()  # CV convention (+z forward, y down)
        w2c = np.linalg.inv(c2w)
        pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = np.round(cam.fx * pc[:, 0] / z + cam.cx).astype(np.int64)
            v = np.round(cam.fy * pc[:, 1] / z + cam.cy).astype(np.int64)
        inb = (z > 1e-3) & (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
        d = np.zeros_like(z)
        d[inb] = np.asarray(f.depth)[v[inb], u[inb]]
        vis |= inb & (d > 0) & (z < d + trunc)
    return vis


def level_targets(mc, vol_origin: np.ndarray,
                  sdf_fn: Callable[[np.ndarray], np.ndarray],
                  frames: Sequence = None, cam=None):
    """Per-level dense (tsdf, occ) targets from an analytic scene SDF,
    restricted to depth-observed voxels when ``frames``/``cam`` are given
    (matching the reference's depth-fused TSDF GT; unobserved = empty).

    Truncation is a fixed 3 *finest* voxels at every level (NeuralRecon's
    TSDF-GT convention; scaling the band with level spacing would make the
    coarse occupancy target all-ones and zero out its BCE pos-weight).
    """
    tsdf_ts, occ_ts = [], []
    trunc = 3.0 * mc.voxel_size
    for i in range(mc.n_layer):
        interval = 2 ** (mc.n_layer - 1 - i)
        dim = mc.n_vox // interval
        ax = np.arange(dim, dtype=np.float32) * interval
        gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
        pts = (np.stack([gx, gy, gz], -1).reshape(-1, 3) * mc.voxel_size
               + vol_origin)
        sdf = np.asarray(sdf_fn(pts)).reshape(dim, dim, dim)
        tsdf = np.clip(sdf / trunc, -1.0, 1.0).astype(np.float32)
        if frames is not None:
            vis = _visibility(pts, frames, cam, trunc).reshape(dim, dim, dim)
            tsdf = np.where(vis, tsdf, 1.0).astype(np.float32)
        occ = (np.abs(tsdf) < 1.0).astype(np.float32)
        tsdf_ts.append(jnp.asarray(tsdf))
        occ_ts.append(jnp.asarray(occ))
    return tsdf_ts, occ_ts


def collect_fragments(algo, frames: Sequence) -> List[dict]:
    """Run the algorithm's keyframe gating + fragment assembly over posed
    frames WITHOUT touching model params or global volumes. Each returned
    dict holds the jitted fragment_step inputs plus the volume's voxel
    origin (reference fragment assembly: slam/algorithms/neural_recon.py
    :155-236, reproduced by algo._fragment_inputs)."""
    frags = []
    pending: List = []
    for f in frames:
        if not pending:
            pending.append(f)
        else:
            last = pending[-1].get_pose()
            cur = f.get_pose()
            t = ((np.linalg.inv(cur[:3, :3]) @ last[:3, :3]
                  @ np.array([0, 0, 1.0])) * np.array([0, 0, 1.0])).sum()
            angle = np.arccos(np.clip(t, -1, 1))
            dis = np.linalg.norm(cur[:3, 3] - last[:3, 3])
            if (angle > algo.config.min_angle / 180 * np.pi
                    or dis > algo.config.min_distance):
                pending.append(f)
        if len(pending) > algo.config.mapping_window_size:
            imgs, projs, vol_origin, origin_vox, aligned_T = \
                algo._fragment_inputs(pending)
            frags.append({
                "imgs": jnp.asarray(imgs), "projs": jnp.asarray(projs),
                "vol_origin": jnp.asarray(vol_origin),
                "origin_vox": origin_vox,
                "aligned_T": jnp.asarray(aligned_T),
                "frames": list(pending),
            })
            pending = []
    return frags


def train_sequence(algo, frags: List[dict],
                   sdf_fn: Callable[[np.ndarray], np.ndarray],
                   epochs: int = 2, steps_per_fragment: int = 25,
                   lr: float = 1e-3, verbose: bool = False):
    """Train the NeuCon model on a fragment sequence with threaded GRU
    hidden state. Returns (params, losses). Hidden volumes persist across
    fragments within an epoch (stop-gradient at boundaries) and reset at
    epoch starts, matching inference-time fusion."""
    from ..models.neucon import OUT_CHANNELS

    mc = algo.model.config
    model = algo.model
    targets = [level_targets(mc, np.asarray(fr["vol_origin"]), sdf_fn,
                             frames=fr.get("frames"), cam=algo.camera)
               for fr in frags]

    opt = optax.adam(lr)
    params = model.params
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, imgs, projs, org, hiddens, at, tsdf_ts, occ_ts):
        loss, g = jax.value_and_grad(model.loss)(
            params, imgs, projs, org, hiddens, at, tsdf_ts, occ_ts)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    frag_fwd = jax.jit(model.fragment_step)

    losses = []
    for ep in range(epochs):
        # fresh global hidden state each epoch (host mirror, like inference)
        from ..algorithms.neural_recon import _GlobalVolume
        hidden_vols = [_GlobalVolume(OUT_CHANNELS[i])
                       for i in range(mc.n_layer)]
        for fi, fr in enumerate(frags):
            hiddens = []
            for i in range(mc.n_layer):
                interval = 2 ** (mc.n_layer - 1 - i)
                dim = mc.n_vox // interval
                lo = fr["origin_vox"] // interval
                hiddens.append(jnp.asarray(hidden_vols[i].crop(lo, dim)))
            tsdf_ts, occ_ts = targets[fi]
            for _ in range(steps_per_fragment):
                params, opt_state, loss = step(
                    params, opt_state, fr["imgs"], fr["projs"],
                    fr["vol_origin"], hiddens, fr["aligned_T"],
                    tsdf_ts, occ_ts)
                losses.append(float(loss))
            # write back post-update hidden state for the next fragment
            _, _, new_hiddens = frag_fwd(
                params, fr["imgs"], fr["projs"], fr["vol_origin"],
                hiddens, fr["aligned_T"])
            for i in range(mc.n_layer):
                interval = 2 ** (mc.n_layer - 1 - i)
                lo = fr["origin_vox"] // interval
                hidden_vols[i].write(lo, np.asarray(new_hiddens[i]))
            if verbose:
                print(f"[neucon-train] epoch {ep} frag {fi}: "
                      f"loss {losses[-1]:.4f}")
    return params, losses


def save_params(path: str, params) -> None:
    """npz checkpoint of the trained pytree (mirrors the DPVO in-env
    checkpoint format from round 3)."""
    flat, treedef = jax.tree_util.tree_flatten(params)
    np.savez(path, __treedef__=np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8),
        **{f"p{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_params(path: str, like_params):
    """Load an npz checkpoint against a structurally-identical pytree."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten(like_params)
    out = [jnp.asarray(data[f"p{i}"]) for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(treedef, out)
