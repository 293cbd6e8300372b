"""DPVO update operator CAN LEARN: supervised flow-correction training.

Round-3 item (VERDICT): the JAX update operator (correlation encoder +
GRU, models/vonet.py) previously ran only with random weights in-env
because the reference's pretrained dpvo.pth (reference:
slam/models/vo_net_model.py:39-50) is an LFS stub here. This is the DPVO
analogue of the NeuralRecon overfit proof: synthetic RGB-D pairs with
exact GT correspondence supervise delta/weight regression
(engine/dpvo_train.py; reference operator: vonet_dpvo.py:18-69).

Asserts (1) the training loss drops substantially, and (2) on a held-out
batch the learned operator's delta moves patch coordinates closer to the
GT correspondence than not moving at all — i.e. it extracts real signal
from the correlation features.
"""
import numpy as np
import jax.numpy as jnp

from xrdslam_tpu.common.synthetic import SyntheticDataset
from xrdslam_tpu.engine import dpvo_train as T
from xrdslam_tpu.models.vonet import P, VONet, VONetConfig


def _delta_on_batch(params, b, n_rec=1, chunk=32):
    """Apply one update step on a batch; return (delta [M,2], weight)."""
    import jax

    from xrdslam_tpu.ops.correlation import (bilinear_sample,
                                             extract_patches,
                                             patch_correlation_chunked)
    from xrdslam_tpu.models.vonet import DIM, update_apply

    images = jnp.asarray(b["images"])
    centers = jnp.asarray(b["centers"])
    cur = jnp.asarray(b["cur0"])
    fmap_i, imap_i = VONet.extract_features(params, images[0])
    fmap_j, _ = VONet.extract_features(params, images[1])
    gmap = extract_patches(fmap_i, centers, p=P)
    ctx = bilinear_sample(imap_i, centers)
    m = centers.shape[0]
    fring = fmap_j[None]
    fring2 = jax.lax.reduce_window(
        fmap_j, 0.0, jax.lax.add, (1, 4, 4), (1, 4, 4), "VALID")[None] / 16.0
    grid = jnp.asarray(T._GRID)
    net = jnp.zeros((m, DIM), jnp.float32)
    jj = jnp.zeros((m,), jnp.int32)
    for _ in range(n_rec):
        coords_g = cur[:, None, None, :] + grid[None]
        c1 = patch_correlation_chunked(fring, gmap, coords_g, jj,
                                       radius=3, chunk=chunk)
        c2 = patch_correlation_chunked(fring2, gmap, coords_g / 4.0, jj,
                                       radius=3, chunk=chunk)
        corr = jnp.stack([c1, c2], -1).reshape(m, -1)
        net, delta, weight = update_apply(
            params["update"], net, ctx, corr,
            jnp.arange(m, dtype=jnp.int32), jnp.zeros((m,), jnp.int32),
            jnp.full((m,), -1, jnp.int32), jnp.full((m,), -1, jnp.int32),
            jnp.ones((m,), bool), num_segments=m + 1)
        cur = cur + delta
    return np.asarray(cur), np.asarray(weight)


def test_dpvo_update_operator_learns():
    ds = SyntheticDataset(n_frames=8, height=96, width=128, scene="office")
    ds.prerender(batch=2)
    net = VONet(VONetConfig())

    params, losses = T.train(net.params, ds, n_iters=90, m=32, chunk=32,
                             noise_px=2.0, log_every=30, seed=0)
    first = float(np.mean(losses[:10]))
    last = float(np.mean(losses[-10:]))
    assert last < 0.55 * first, (first, last)

    # held-out batch (fresh rng stream): learned delta must beat the
    # zero-delta baseline by a clear margin
    rng = np.random.default_rng(123)
    b = T.make_batch(ds, rng, m=32, noise_px=2.0)
    v = b["valid"] > 0
    assert v.sum() >= 8
    base_err = np.linalg.norm(b["cur0"] - b["target"], axis=-1)[v].mean()
    cur_rand, _ = _delta_on_batch(net.params, b)
    rand_err = np.linalg.norm(cur_rand - b["target"], axis=-1)[v].mean()
    cur_tr, w_tr = _delta_on_batch(params, b)
    tr_err = np.linalg.norm(cur_tr - b["target"], axis=-1)[v].mean()
    # trained operator recovers a good fraction of the injected noise;
    # random weights don't
    assert tr_err < 0.6 * base_err, (tr_err, base_err)
    assert tr_err < 0.8 * rand_err, (tr_err, rand_err)
    # weights are confidences in (0,1)
    assert 0.0 < float(np.asarray(w_tr).mean()) < 1.0
