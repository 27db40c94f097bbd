"""Image losses/metrics in jnp: L1, SSIM, PSNR.

Numerical contract matches the reference exactly: ssim uses an 11×11
Gaussian window, σ=1.5, same-padding depthwise convolution, C1=0.01²,
C2=0.03² (utils/loss_utils.py:18-63); psnr is 20·log10(1/√mse) over the
flattened image (utils/image_utils.py:17-19). Images here are channels-last
(H, W, C) or batched (..., H, W, C).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def psnr(img, gt):
    mse = jnp.mean((img - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


@functools.lru_cache(maxsize=None)
def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    w = np.outer(g, g)
    return w.astype(np.float32)


def _filter2d(img, win):
    """Depthwise same-padded 2-D convolution; img (H, W, C)."""
    C = img.shape[-1]
    k = jnp.asarray(win)[:, :, None, None]              # (kh, kw, 1, 1)
    k = jnp.tile(k, (1, 1, 1, C))                       # depthwise
    x = img[None]                                       # (1, H, W, C)
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)
    return out[0]


def ssim_map(img, gt, window_size: int = 11, sigma: float = 1.5):
    """Per-pixel SSIM map with the reference's SAME/zero-pad conv semantics
    (loss_utils.py:33-63: 11×11 σ1.5 window, padding=window//2)."""
    win = _gaussian_window(window_size, sigma)
    mu1 = _filter2d(img, win)
    mu2 = _filter2d(gt, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(img * img, win) - mu1_sq
    sigma2_sq = _filter2d(gt * gt, win) - mu2_sq
    sigma12 = _filter2d(img * gt, win) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    return ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))


def ssim(img, gt, window_size: int = 11, sigma: float = 1.5):
    return jnp.mean(ssim_map(img, gt, window_size, sigma))


def photometric_loss(img, gt, lambda_dssim: float = 0.2):
    """(1−λ)·L1 + λ·(1−SSIM) — the reference training loss
    (train.py:209-215)."""
    return ((1.0 - lambda_dssim) * l1_loss(img, gt)
            + lambda_dssim * (1.0 - ssim(img, gt)))
