"""2D render metrics: PSNR / SSIM / depth-L1 (host NumPy).

Rebuild of the metric math used by the reference's ``save_render_imgs``
(reference: slam/common/common.py:429-542 — PSNR, ms_ssim, LPIPS(alex),
depth-L1). SSIM here is the standard single-scale 11x11 Gaussian-window
variant (the reference's SplaTAM loss uses the same form,
slam_external_splatam.py:59-96). LPIPS requires pretrained AlexNet weights;
``lpips`` returns NaN when torchvision weights are unavailable offline.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def psnr(pred: np.ndarray, target: np.ndarray, mask: Optional[np.ndarray] = None) -> float:
    p, t = np.asarray(pred, np.float64), np.asarray(target, np.float64)
    if mask is not None:
        mse = ((p - t) ** 2)[mask].mean()
    else:
        mse = ((p - t) ** 2).mean()
    return float(-10.0 * np.log10(max(mse, 1e-12)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


def _filter2d(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """'valid' 2D correlation per channel."""
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(img, k.shape, axis=(0, 1))
    return np.einsum("ij...ab,ab->ij...", win, k)


def _ssim_cs(p: np.ndarray, t: np.ndarray, data_range: float) -> tuple:
    """(mean SSIM, mean contrast-structure) over an 11x11 Gaussian window."""
    k = _gaussian_window()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_p = _filter2d(p, k)
    mu_t = _filter2d(t, k)
    mu_pp = _filter2d(p * p, k)
    mu_tt = _filter2d(t * t, k)
    mu_pt = _filter2d(p * t, k)
    var_p = mu_pp - mu_p**2
    var_t = mu_tt - mu_t**2
    cov = mu_pt - mu_p * mu_t
    cs = (2 * cov + c2) / (var_p + var_t + c2)
    s = ((2 * mu_p * mu_t + c1) / (mu_p**2 + mu_t**2 + c1)) * cs
    return float(s.mean()), float(cs.mean())


def ssim(pred: np.ndarray, target: np.ndarray, data_range: float = 1.0) -> float:
    """Single-scale SSIM, 11x11 Gaussian window, C1/C2 per Wang et al."""
    p = np.asarray(pred, np.float64)
    t = np.asarray(target, np.float64)
    if p.ndim == 2:
        p, t = p[..., None], t[..., None]
    return _ssim_cs(p, t, data_range)[0]


def _avg_pool2(x: np.ndarray) -> np.ndarray:
    h, w = (x.shape[0] // 2) * 2, (x.shape[1] // 2) * 2
    x = x[:h, :w]
    return 0.25 * (x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2] + x[1::2, 1::2])


def ms_ssim(pred: np.ndarray, target: np.ndarray, data_range: float = 1.0) -> float:
    """Multi-scale SSIM (Wang et al. 2003), 5 scales, standard weights —
    the reference's 2D metric uses pytorch_msssim.ms_ssim
    (slam/common/common.py:475-480). Contrast-structure terms at the 4
    coarser-to-finer scales, full SSIM (with luminance) only at the
    coarsest; 2x2 average-pool downsampling between scales. Falls back to
    fewer scales when the image is too small for 5 halvings."""
    weights = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])
    p = np.asarray(pred, np.float64)
    t = np.asarray(target, np.float64)
    if p.ndim == 2:
        p, t = p[..., None], t[..., None]
    levels = int(len(weights))
    while levels > 1 and min(p.shape[0], p.shape[1]) // 2 ** (levels - 1) < 11:
        levels -= 1
    w = weights[:levels] / weights[:levels].sum() if levels < len(weights) else weights
    vals = []
    for i in range(levels):
        s, cs = _ssim_cs(p, t, data_range)
        vals.append(s if i == levels - 1 else cs)
        if i != levels - 1:
            p, t = _avg_pool2(p), _avg_pool2(t)
    vals = np.clip(np.asarray(vals), 1e-6, None)
    return float(np.prod(vals ** w))


def depth_l1(pred: np.ndarray, target: np.ndarray, mask: Optional[np.ndarray] = None) -> float:
    """Mean |pred-target| over valid depth, in the input unit (meters)."""
    p, t = np.asarray(pred, np.float64), np.asarray(target, np.float64)
    if mask is None:
        mask = t > 0
    if mask.sum() == 0:
        return float("nan")
    return float(np.abs(p - t)[mask].mean())


def lpips(pred: np.ndarray, target: np.ndarray) -> float:
    """LPIPS(alex) if pretrained weights are available locally, else NaN.

    Preferred path: the in-package JAX architecture (ops/lpips.py) fed by
    converted torch weights ($XRDSLAM_LPIPS_WEIGHTS); falls back to
    torchmetrics (which downloads weights when networked)."""
    try:
        from ..ops.lpips import get_pretrained, lpips_apply

        params = get_pretrained()
        if params is not None:
            import jax.numpy as jnp

            return float(lpips_apply(
                params,
                jnp.clip(jnp.asarray(pred, jnp.float32), 0, 1),
                jnp.clip(jnp.asarray(target, jnp.float32), 0, 1)))
    except Exception:
        pass
    try:
        import torch
        from torchmetrics.image.lpip import LearnedPerceptualImagePatchSimilarity

        metric = LearnedPerceptualImagePatchSimilarity(net_type="alex", normalize=True)
        p = torch.from_numpy(np.asarray(pred, np.float32)).permute(2, 0, 1)[None]
        t = torch.from_numpy(np.asarray(target, np.float32)).permute(2, 0, 1)[None]
        with torch.no_grad():
            return float(metric(p.clamp(0, 1), t.clamp(0, 1)))
    except Exception:
        return float("nan")
