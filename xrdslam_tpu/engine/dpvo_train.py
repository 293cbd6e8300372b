"""In-env supervised training for the DPVO update operator.

The reference ships pretrained DPVO weights (reference:
slam/models/vo_net_model.py:39-50) that exist only as LFS stubs in this
environment, so the JAX operator (models/vonet.py) starts random. This
module proves the operator LEARNS in-env — the DPVO analogue of the
NeuralRecon overfit proof: synthetic RGB-D frame pairs with exact GT
correspondence supervise the correlation encoder + GRU to regress the
per-patch flow correction ``delta`` and a validity ``weight``
(reference training target: the reprojection-residual regression inside
DPVO's pose+flow loss, vonet_dpvo.py:55-69 / dpvo paper sec. 3.4).

Setup: patch centers with known depth in frame i are reprojected into
frame j with GT poses; the current estimate is the GT target plus noise
(simulating a mid-convergence BA state); the operator sees only the
correlation features at the perturbed coords and must output the
correction. Recurrent for ``n_rec`` steps like inference.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vonet import DIM, P, VONet, update_apply
from ..ops.correlation import extract_patches, patch_correlation_chunked

_GRID = np.stack(np.meshgrid(np.arange(P) - P // 2, np.arange(P) - P // 2,
                             indexing="xy"), -1).astype(np.float32)  # [P,P,2]


def make_batch(ds, rng: np.random.Generator, m: int = 64, max_gap: int = 3,
               noise_px: float = 3.0):
    """One training example from a synthetic RGB-D pair.

    Returns dict of numpy arrays: images [2,3,H,W], centers [M,2] (1/4 res,
    frame i), target [M,2] (GT 1/4-res coords in frame j), valid [M],
    cur0 [M,2] (noisy start)."""
    n = len(ds)
    i = int(rng.integers(0, n))
    j = int(np.clip(i + int(rng.choice([-3, -2, -1, 1, 2, 3][:2 * max_gap])), 0, n - 1))
    if j == i:
        j = min(i + 1, n - 1)
    _, rgb_i, depth_i, c2w_i = ds[i]
    _, rgb_j, depth_j, c2w_j = ds[j]
    H, W = depth_i.shape
    cam = ds.get_camera()
    h4, w4 = H // 4, W // 4

    x4 = rng.integers(1, w4 - 1, m).astype(np.float32)
    y4 = rng.integers(1, h4 - 1, m).astype(np.float32)
    uf = (4.0 * x4 + 2.0).astype(np.int64).clip(0, W - 1)
    vf = (4.0 * y4 + 2.0).astype(np.int64).clip(0, H - 1)
    z = depth_i[vf, uf]
    # dataset camera convention: dirs = [(u-cx)/fx, -(v-cy)/fy, -1]
    dirs = np.stack([(uf - cam.cx) / cam.fx, -(vf - cam.cy) / cam.fy,
                     -np.ones_like(z)], -1)
    pts = c2w_i[:3, 3] + (dirs @ c2w_i[:3, :3].T) * z[:, None]
    w2c_j = np.linalg.inv(np.asarray(c2w_j, np.float64))
    pc = pts @ w2c_j[:3, :3].T + w2c_j[:3, 3]
    zj = -pc[:, 2]
    uj = cam.cx + cam.fx * pc[:, 0] / np.maximum(zj, 1e-6)
    vj = cam.cy - cam.fy * pc[:, 1] / np.maximum(zj, 1e-6)
    tx4 = (uj - 2.0) / 4.0
    ty4 = (vj - 2.0) / 4.0
    # validity: in bounds, in front, unoccluded (depth consistency)
    inb = (zj > 0.05) & (uj >= 2) & (uj < W - 2) & (vj >= 2) & (vj < H - 2) & (z > 0)
    uji = np.clip(uj.astype(np.int64), 0, W - 1)
    vji = np.clip(vj.astype(np.int64), 0, H - 1)
    unocc = np.abs(depth_j[vji, uji] - zj) < 0.05 + 0.05 * zj
    valid = inb & unocc

    imgs = np.stack([
        np.ascontiguousarray(rgb_i.transpose(2, 0, 1), np.float32),
        np.ascontiguousarray(rgb_j.transpose(2, 0, 1), np.float32),
    ])
    target = np.stack([tx4, ty4], -1).astype(np.float32)
    cur0 = target + rng.normal(0, noise_px, (m, 2)).astype(np.float32)
    return {
        "images": imgs,
        "centers": np.stack([x4, y4], -1).astype(np.float32),
        "target": target,
        "cur0": cur0,
        "valid": valid.astype(np.float32),
    }


@functools.partial(jax.jit, static_argnames=("n_rec", "chunk"))
def loss_fn(params, images, centers, target, cur0, valid, n_rec: int = 2,
            chunk: int = 64):
    """Supervised delta/weight loss over n_rec recurrent update steps."""
    fmap_i, imap_i = VONet.extract_features(params, images[0])
    fmap_j, _ = VONet.extract_features(params, images[1])
    gmap = extract_patches(fmap_i, centers, p=P)  # [M,128,P,P]
    from ..ops.correlation import bilinear_sample

    ctx = bilinear_sample(imap_i, centers)  # [M,DIM]
    m = centers.shape[0]
    fring = fmap_j[None]  # [1,128,h,w]
    fring2 = jax.lax.reduce_window(
        fmap_j, 0.0, jax.lax.add, (1, 4, 4), (1, 4, 4), "VALID")[None] / 16.0
    jj = jnp.zeros((m,), jnp.int32)
    seg_kk = jnp.arange(m, dtype=jnp.int32)
    seg_ij = jnp.zeros((m,), jnp.int32)
    ix = jnp.full((m,), -1, jnp.int32)
    jx = jnp.full((m,), -1, jnp.int32)
    mask = jnp.ones((m,), bool)
    grid = jnp.asarray(_GRID)

    net = jnp.zeros((m, DIM), jnp.float32)
    cur = cur0
    total = 0.0
    for _ in range(n_rec):
        coords_g = cur[:, None, None, :] + grid[None]  # [M,P,P,2]
        c1 = patch_correlation_chunked(fring, gmap, coords_g, jj,
                                       radius=3, chunk=chunk)
        c2 = patch_correlation_chunked(fring2, gmap, coords_g / 4.0, jj,
                                       radius=3, chunk=chunk)
        corr = jnp.stack([c1, c2], -1).reshape(m, -1)
        net, delta, weight = update_apply(
            params["update"], net, ctx, corr, seg_kk, seg_ij, ix, jx, mask,
            num_segments=m + 1)
        err = target - cur
        # clip the supervision to the correlation window so far-out
        # targets don't dominate (the operator can only see +-(3+1) px)
        err_c = jnp.clip(err, -4.0, 4.0)
        total = total + jnp.sum(
            jnp.abs(delta - err_c) * valid[:, None]) / (jnp.sum(valid) + 1e-6)
        # weight should predict validity (both channels)
        w = jnp.clip(weight, 1e-5, 1 - 1e-5)
        bce = -(valid[:, None] * jnp.log(w) + (1 - valid[:, None]) * jnp.log(1 - w))
        total = total + 0.05 * jnp.mean(bce)
        cur = jax.lax.stop_gradient(cur + delta)
    return total / n_rec


def train(params, ds, n_iters: int = 400, lr: float = 2e-4, m: int = 64,
          seed: int = 0, noise_px: float = 3.0, log_every: int = 50,
          chunk: int = 64):
    """Adam training loop; returns (params, losses)."""
    import optax

    rng = np.random.default_rng(seed)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(lr))
    opt_state = tx.init(params)

    @functools.partial(jax.jit, static_argnames=("chunk",))
    def step(params, opt_state, images, centers, target, cur0, valid,
             chunk: int = 64):
        loss, g = jax.value_and_grad(loss_fn)(
            params, images, centers, target, cur0, valid, chunk=chunk)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for it in range(n_iters):
        b = make_batch(ds, rng, m=m, noise_px=noise_px)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(b["images"]),
            jnp.asarray(b["centers"]), jnp.asarray(b["target"]),
            jnp.asarray(b["cur0"]), jnp.asarray(b["valid"]), chunk=chunk)
        losses.append(float(loss))
        if log_every and it % log_every == 0:
            print(f"[dpvo-train] iter {it}: loss {losses[-1]:.4f}", flush=True)
    return params, losses


def save_params(path: str, params) -> None:
    """Flat .npz checkpoint (loadable by VONet via load_params)."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    np.savez_compressed(path, **flat)


def load_params(path: str) -> Dict:
    """Inverse of save_params."""
    flat = dict(np.load(path))
    root: Dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)
