"""LPIPS(alex) architecture + converter validated against a torch forward.

The real pretrained weights are unavailable offline, so the test crafts
random weights in the exact torch file formats (torchvision alexnet state
dict + LPIPS lin state dict), loads them through ops/lpips.py, and checks
our JAX forward against an independent torch implementation of the LPIPS
definition. That pins the architecture; real weights drop in untouched.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from xrdslam_tpu.ops.lpips import (_CONVS, _SCALE, _SHIFT,  # noqa: E402
                                   _TAP_CHANNELS, load_torch_weights,
                                   lpips_apply)


def _make_torch_files(tmp_path, seed=0):
    g = torch.Generator().manual_seed(seed)
    feat_idx = [0, 3, 6, 8, 10]
    anet = {}
    for fi, (cin, cout, k, _, _, _) in zip(feat_idx, _CONVS):
        anet[f"features.{fi}.weight"] = torch.randn(
            (cout, cin, k, k), generator=g) * 0.05
        anet[f"features.{fi}.bias"] = torch.randn((cout,), generator=g) * 0.05
    lins = {}
    for i, c in enumerate(_TAP_CHANNELS):
        lins[f"lin{i}.model.1.weight"] = torch.rand((1, c, 1, 1), generator=g) * 0.02
    a_path, l_path = str(tmp_path / "alexnet.pth"), str(tmp_path / "lpips_alex.pth")
    torch.save(anet, a_path)
    torch.save(lins, l_path)
    return a_path, l_path, anet, lins


def _torch_lpips(anet, lins, img0, img1):
    import torch.nn.functional as F

    shift = torch.tensor(_SHIFT)[None, :, None, None]
    scale = torch.tensor(_SCALE)[None, :, None, None]

    def taps(im):
        x = torch.from_numpy(im).permute(2, 0, 1)[None] * 2.0 - 1.0
        x = (x - shift) / scale
        out = []
        for fi, (_, _, _, stride, pad, pool) in zip([0, 3, 6, 8, 10], _CONVS):
            x = F.relu(F.conv2d(x, anet[f"features.{fi}.weight"],
                                anet[f"features.{fi}.bias"], stride, pad))
            out.append(x)
            if pool:
                x = F.max_pool2d(x, 3, 2)
        return out

    t0, t1 = taps(img0), taps(img1)
    total = 0.0
    for i, (a, b) in enumerate(zip(t0, t1)):
        na = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        nb = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        d = (na - nb) ** 2
        w = lins[f"lin{i}.model.1.weight"]
        total = total + (d * w).sum(1).mean(dim=(-2, -1))
    return float(total[0])


def test_lpips_matches_torch_reference(tmp_path):
    a_path, l_path, anet, lins = _make_torch_files(tmp_path)
    params = load_torch_weights(a_path, l_path)
    rng = np.random.default_rng(0)
    img0 = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape), 0, 1).astype(np.float32)
    ours = float(lpips_apply(params, jnp.asarray(img0), jnp.asarray(img1)))
    ref = _torch_lpips(anet, lins, img0, img1)
    assert np.isfinite(ours)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)
    # identical inputs -> 0
    zero = float(lpips_apply(params, jnp.asarray(img0), jnp.asarray(img0)))
    assert abs(zero) < 1e-8


def test_metrics_lpips_uses_gated_weights(tmp_path, monkeypatch):
    import xrdslam_tpu.ops.lpips as L
    from xrdslam_tpu.common.metrics import lpips as metric_lpips

    a_path, l_path, _, _ = _make_torch_files(tmp_path)
    monkeypatch.setenv("XRDSLAM_LPIPS_WEIGHTS", str(tmp_path))
    monkeypatch.setattr(L, "_CACHED", None)
    rng = np.random.default_rng(1)
    img0 = rng.uniform(0, 1, (48, 48, 3))
    img1 = rng.uniform(0, 1, (48, 48, 3))
    v = metric_lpips(img0, img1)
    assert np.isfinite(v) and v > 0
    monkeypatch.setattr(L, "_CACHED", None)
