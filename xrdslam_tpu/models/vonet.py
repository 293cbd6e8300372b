"""VONet — the DPVO patch-graph network (extractor + update operator).

TPU-native rebuild of the reference's VONet (reference:
slam/model_components/vonet_dpvo.py:18-187, extractor_dpvo.py:114-188,
blocks_dpvo.py:18-69, slam/models/vo_net_model.py). Pure-functional JAX:
params are nested dicts, applies are jittable with static shapes. The
CUDA altcorr/fastba extensions are replaced by ops/correlation.py (XLA
gathers + MXU einsum) and ops/ba.py (jacfwd + Schur); torch_scatter's
scatter_softmax becomes masked jax segment ops (tiny: ~2.5k edges).

Weight parity: the param tree mirrors the torch module names 1:1 so
pretrained ``dpvo.pth`` checkpoints convert mechanically
(utils/torch_convert.py:load_dpvo_weights). Convs are OIHW like torch.

Inference-only: the reference's GradientClip/GradZero autograd hooks are
identity in the forward pass and are omitted (we never backprop through
the update operator — BA consumes its outputs).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.base import InstantiateConfig

DIM = 384  # update-operator width (vonet_dpvo.py:15)
ENC = 32  # encoder stem width (extractor_dpvo.py:137)
P = 3  # patch size


# ---------------------------------------------------------------- layers
def _conv_init(key, cin, cout, k):
    """Kaiming-normal fan_out like the reference (extractor_dpvo.py:151-155)."""
    fan_out = cout * k * k
    std = float(np.sqrt(2.0 / fan_out))
    w = jax.random.normal(key, (cout, cin, k, k), jnp.float32) * std
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _conv(p, x, stride=1):
    """x [B, C, H, W], weight OIHW, SAME-ish padding matching torch pad=k//2."""
    k = p["w"].shape[-1]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["b"][None, :, None, None]


def _linear_init(key, cin, cout):
    bound = float(1.0 / np.sqrt(cin))
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (cout, cin), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def _linear(p, x):
    return x @ p["w"].T + p["b"]


def _ln_init(dim):
    return {"w": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def _layernorm(p, x, eps=1e-3):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["w"] + p["b"]


def _instance_norm(x, eps=1e-5):
    """torch InstanceNorm2d default (affine=False). x [B, C, H, W]."""
    mu = x.mean((2, 3), keepdims=True)
    var = x.var((2, 3), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


# ------------------------------------------------------------- extractor
def _resblock_init(key, cin, planes, stride):
    ks = jax.random.split(key, 3)
    p = {"conv1": _conv_init(ks[0], cin, planes, 3),
         "conv2": _conv_init(ks[1], planes, planes, 3)}
    if stride != 1:
        p["down"] = _conv_init(ks[2], cin, planes, 1)
    return p


def _resblock(p, x, stride, norm):
    f = _instance_norm if norm == "instance" else (lambda v: v)
    y = jax.nn.relu(f(_conv(p["conv1"], x, stride)))
    y = jax.nn.relu(f(_conv(p["conv2"], y)))
    if "down" in p:
        x = f(_conv(p["down"], x, stride))
    return jax.nn.relu(x + y)


def basic_encoder4_init(key, output_dim: int) -> Dict:
    """BasicEncoder4 (extractor_dpvo.py:114-172): 7x7/2 stem, 2+2 residual
    blocks (32 -> 64, second pair stride 2), 1x1 head. Output at 1/4 res."""
    ks = jax.random.split(key, 6)
    return {
        "conv1": _conv_init(ks[0], 3, ENC, 7),
        "layer1": [_resblock_init(ks[1], ENC, ENC, 1),
                   _resblock_init(ks[2], ENC, ENC, 1)],
        "layer2": [_resblock_init(ks[3], ENC, 2 * ENC, 2),
                   _resblock_init(ks[4], 2 * ENC, 2 * ENC, 1)],
        "conv2": _conv_init(ks[5], 2 * ENC, output_dim, 1),
    }


def basic_encoder4_apply(params, x, norm: str):
    """x [B, 3, H, W] -> [B, out, H/4, W/4]."""
    f = _instance_norm if norm == "instance" else (lambda v: v)
    x = jax.nn.relu(f(_conv(params["conv1"], x, stride=2)))
    x = _resblock(params["layer1"][0], x, 1, norm)
    x = _resblock(params["layer1"][1], x, 1, norm)
    x = _resblock(params["layer2"][0], x, 2, norm)
    x = _resblock(params["layer2"][1], x, 1, norm)
    return _conv(params["conv2"], x)


# --------------------------------------------------------------- update
def _softagg_init(key, dim):
    ks = jax.random.split(key, 3)
    return {"f": _linear_init(ks[0], dim, dim),
            "g": _linear_init(ks[1], dim, dim),
            "h": _linear_init(ks[2], dim, dim)}


def _softagg(p, x, seg, mask, num_segments):
    """SoftAgg (blocks_dpvo.py:31-49): per-group softmax-weighted sum,
    broadcast back. seg [E] group ids (already dense, padded edges point at
    the reserved last segment); mask [E]."""
    logits = _linear(p["g"], x)
    logits = jnp.where(mask[:, None], logits, -1e30)
    seg_max = jax.ops.segment_max(logits, seg, num_segments=num_segments)
    ex = jnp.exp(logits - seg_max[seg]) * mask[:, None]
    denom = jax.ops.segment_sum(ex, seg, num_segments=num_segments)
    w = ex / jnp.maximum(denom[seg], 1e-12)
    y = jax.ops.segment_sum(_linear(p["f"], x) * w, seg, num_segments=num_segments)
    return _linear(p["h"], y)[seg]


def _gated_residual_init(key, dim):
    ks = jax.random.split(key, 3)
    return {"gate": _linear_init(ks[0], dim, dim),
            "res1": _linear_init(ks[1], dim, dim),
            "res2": _linear_init(ks[2], dim, dim)}


def _gated_residual(p, x):
    gate = jax.nn.sigmoid(_linear(p["gate"], x))
    res = _linear(p["res2"], jax.nn.relu(_linear(p["res1"], x)))
    return x + gate * res


def update_init(key) -> Dict:
    """Update operator params (vonet_dpvo.py:18-53)."""
    ks = jax.random.split(key, 16)
    corr_dim = 2 * 49 * P * P  # 882
    return {
        "c1": [_linear_init(ks[0], DIM, DIM), _linear_init(ks[1], DIM, DIM)],
        "c2": [_linear_init(ks[2], DIM, DIM), _linear_init(ks[3], DIM, DIM)],
        "norm": _ln_init(DIM),
        "agg_kk": _softagg_init(ks[4], DIM),
        "agg_ij": _softagg_init(ks[5], DIM),
        "gru": {"ln1": _ln_init(DIM), "gr1": _gated_residual_init(ks[6], DIM),
                "ln2": _ln_init(DIM), "gr2": _gated_residual_init(ks[7], DIM)},
        "corr": [_linear_init(ks[8], corr_dim, DIM),
                 _linear_init(ks[9], DIM, DIM),
                 _ln_init(DIM),
                 _linear_init(ks[10], DIM, DIM)],
        "d": _linear_init(ks[11], DIM, 2),
        "w": _linear_init(ks[12], DIM, 2),
    }


def update_apply(params, net, inp, corr, seg_kk, seg_ij, ix, jx, mask,
                 num_segments: int):
    """One update-operator step (vonet_dpvo.py:55-69), padded edge set.

    Args:
        net: [E, DIM] hidden state. inp: [E, DIM] context (imap).
        corr: [E, 882] correlation features.
        seg_kk / seg_ij: [E] dense group ids for the kk and (ii,jj)
            aggregations (host-computed unique-inverse; padded edges must
            point at the reserved segment num_segments-1).
        ix / jx: [E] edge index of the (same patch, jj-1 / jj+1) neighbor,
            -1 if absent (the fastba.neighbors CUDA helper, host-computed).
        mask: [E] bool validity.
    Returns:
        (net', delta [E,2], weight [E,2]).
    """
    c = corr
    c = jax.nn.relu(_linear(params["corr"][0], c))
    c = _linear(params["corr"][1], c)
    c = jax.nn.relu(_layernorm(params["corr"][2], c))
    c = _linear(params["corr"][3], c)
    net = net + inp + c
    net = _layernorm(params["norm"], net)

    m = mask[:, None].astype(net.dtype)
    mask_ix = ((ix >= 0) & mask)[:, None].astype(net.dtype)
    mask_jx = ((jx >= 0) & mask)[:, None].astype(net.dtype)
    net_ix = jnp.take(net, jnp.maximum(ix, 0), axis=0) * mask_ix
    net_jx = jnp.take(net, jnp.maximum(jx, 0), axis=0) * mask_jx
    net = net + _linear(params["c1"][1], jax.nn.relu(_linear(params["c1"][0], net_ix)))
    net = net + _linear(params["c2"][1], jax.nn.relu(_linear(params["c2"][0], net_jx)))
    net = net + _softagg(params["agg_kk"], net, seg_kk, mask, num_segments)
    net = net + _softagg(params["agg_ij"], net, seg_ij, mask, num_segments)

    g = params["gru"]
    net = _gated_residual(g["gr1"], _layernorm(g["ln1"], net))
    net = _gated_residual(g["gr2"], _layernorm(g["ln2"], net))
    net = net * m

    delta = _linear(params["d"], jax.nn.relu(net))
    weight = jax.nn.sigmoid(_linear(params["w"], jax.nn.relu(net)))
    return net, delta, weight * m


# ---------------------------------------------------------------- model
@dataclass
class VONetConfig(InstantiateConfig):
    """VONet config (slam/models/vo_net_model.py:14-24)."""
    _target: Type = field(default_factory=lambda: VONet)
    pretrained_path: str = ""


class VONet:
    """Parameter container + jittable applies (vonet_dpvo.py:168-187)."""

    DIM = DIM
    RES = 4
    P = P

    def __init__(self, config: VONetConfig, seed: int = 0):
        self.config = config
        key = jax.random.PRNGKey(seed)
        kf, ki, ku = jax.random.split(key, 3)
        self.params = {
            "fnet": basic_encoder4_init(kf, 128),
            "inet": basic_encoder4_init(ki, DIM),
            "update": update_init(ku),
        }
        if config.pretrained_path:
            import os
            if str(config.pretrained_path).endswith(".npz") and os.path.exists(str(config.pretrained_path)):
                # in-env trained checkpoint (engine/dpvo_train.save_params)
                from ..engine.dpvo_train import load_params
                self.params = load_params(str(config.pretrained_path))
            elif os.path.exists(str(config.pretrained_path)):
                from ..utils.torch_convert import load_dpvo_weights
                self.params = load_dpvo_weights(str(config.pretrained_path))
            else:
                print(f"[vonet] WARNING: pretrained weights not found at "
                      f"{config.pretrained_path}; using RANDOM weights — "
                      f"tracking accuracy will be poor (mechanics only)",
                      flush=True)

    @staticmethod
    def extract_features(params, image):
        """image [3, H, W] in [0,1] -> (fmap [128,h,w], imap [DIM,h,w]) at
        1/4 res, both scaled by 1/4 (vonet_dpvo.py:94-95). Normalization
        2*rgb - 0.5 matches dpvo.py:399."""
        x = (2.0 * image - 0.5)[None]
        fmap = basic_encoder4_apply(params["fnet"], x, "instance")[0] / 4.0
        imap = basic_encoder4_apply(params["inet"], x, "none")[0] / 4.0
        return fmap, imap
