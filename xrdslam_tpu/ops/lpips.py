"""LPIPS (AlexNet backbone) in JAX — weights-gated.

The reference scores renders with torchmetrics' LPIPS(alex)
(reference: slam/common/common.py:429-542, slam/pipeline/visualizer.py:137-199),
which needs downloaded pretrained weights (no network in some deploys).
This module ships the full architecture + torch-checkpoint converters so
real weights load the day they're available; `common.metrics.lpips` calls
it when weight files exist.

Architecture (richzhang/PerceptualSimilarity, lpips/lpips.py + pretrained
torchvision AlexNet features):
  * input RGB in [0, 1] -> scaled to [-1, 1] -> per-channel shift/scale
  * AlexNet conv stack; taps after each of the 5 ReLUs
  * unit-normalize each tap over channels, squared difference
  * per-tap non-negative 1x1 "lin" weights, spatial mean, sum of taps
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# lpips.py ScalingLayer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)
# torchvision alexnet.features conv indices and shapes
_CONVS = [  # (cin, cout, k, stride, pad), maxpool-after?
    (3, 64, 11, 4, 2, True),
    (64, 192, 5, 1, 2, True),
    (192, 384, 3, 1, 1, False),
    (384, 256, 3, 1, 1, False),
    (256, 256, 3, 1, 1, True),
]
_TAP_CHANNELS = [64, 192, 384, 256, 256]


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b[None, :, None, None]


def _maxpool3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID")


def alexnet_taps(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x [N, 3, H, W] already shift/scale-normalized -> 5 ReLU taps."""
    taps = []
    for i, (_, _, _, stride, pad, pool) in enumerate(_CONVS):
        p = params[f"conv{i}"]
        x = jax.nn.relu(_conv(x, p["w"], p["b"], stride, pad))
        taps.append(x)
        if pool:
            x = _maxpool3s2(x)
    return taps


def lpips_apply(params: Dict, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """img0/img1 [H, W, 3] in [0, 1] -> scalar LPIPS distance."""
    def prep(im):
        x = im.transpose(2, 0, 1)[None] * 2.0 - 1.0
        return (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]

    t0 = alexnet_taps(params, prep(img0))
    t1 = alexnet_taps(params, prep(img1))
    total = 0.0
    for i, (a, b) in enumerate(zip(t0, t1)):
        na = a * jax.lax.rsqrt(jnp.sum(a * a, 1, keepdims=True) + 1e-10)
        nb = b * jax.lax.rsqrt(jnp.sum(b * b, 1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        w = params[f"lin{i}"]["w"]  # [1, C, 1, 1]
        total = total + jnp.mean(jnp.sum(d * w, axis=1), axis=(-2, -1))
    return total[0]


def init_params(seed: int = 0) -> Dict:
    """Random-weight tree (structure/testing only — LPIPS needs pretrained
    weights to be meaningful)."""
    key = jax.random.PRNGKey(seed)
    params: Dict = {}
    for i, (cin, cout, k, _, _, _) in enumerate(_CONVS):
        key, k1 = jax.random.split(key)
        params[f"conv{i}"] = {
            "w": jax.random.normal(k1, (cout, cin, k, k)) * np.sqrt(2.0 / (cin * k * k)),
            "b": jnp.zeros((cout,)),
        }
    for i, c in enumerate(_TAP_CHANNELS):
        key, k1 = jax.random.split(key)
        params[f"lin{i}"] = {"w": jax.random.uniform(k1, (1, c, 1, 1)) * 0.01}
    return params


def load_torch_weights(alexnet_path: str, lin_path: str) -> Dict:
    """Convert torchvision ``alexnet.pth`` (features.0/3/6/8/10 convs) +
    the LPIPS ``alex.pth`` lin weights (lin{0..4}.model.1.weight) into the
    param tree used by :func:`lpips_apply`."""
    import torch

    anet = torch.load(alexnet_path, map_location="cpu", weights_only=False)
    if hasattr(anet, "state_dict"):
        anet = anet.state_dict()
    lins = torch.load(lin_path, map_location="cpu", weights_only=False)
    if hasattr(lins, "state_dict"):
        lins = lins.state_dict()
    feat_idx = [0, 3, 6, 8, 10]
    params: Dict = {}
    for i, fi in enumerate(feat_idx):
        params[f"conv{i}"] = {
            "w": jnp.asarray(np.asarray(anet[f"features.{fi}.weight"], np.float32)),
            "b": jnp.asarray(np.asarray(anet[f"features.{fi}.bias"], np.float32)),
        }
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in lins:  # newer lpips layout
            key = f"lins.{i}.model.1.weight"
        params[f"lin{i}"] = {"w": jnp.asarray(np.asarray(lins[key], np.float32))}
    return params


_CACHED: Optional[Dict] = None


def get_pretrained(weights_dir: Optional[str] = None) -> Optional[Dict]:
    """Load (and cache) pretrained weights from ``weights_dir`` (default
    $XRDSLAM_LPIPS_WEIGHTS) holding ``alexnet.pth`` + ``lpips_alex.pth``.
    Returns None when unavailable — callers fall back to NaN."""
    global _CACHED
    if _CACHED is not None:
        return _CACHED
    d = weights_dir or os.environ.get("XRDSLAM_LPIPS_WEIGHTS", "")
    if not d:
        return None
    a = os.path.join(d, "alexnet.pth")
    l = os.path.join(d, "lpips_alex.pth")
    if not (os.path.exists(a) and os.path.exists(l)):
        return None
    try:
        _CACHED = load_torch_weights(a, l)
    except Exception as e:  # malformed files: warn once, stay gated
        print(f"[lpips] failed to load weights from {d}: {e}", flush=True)
        return None
    return _CACHED
