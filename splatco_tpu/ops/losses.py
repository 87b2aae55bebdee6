"""Photometric losses and image metrics.

Parity targets:
  l1_loss / ssim — /root/reference/utils/loss_utils.py:17,33-63
    (11x11 Gaussian window, sigma 1.5, C1=0.01^2, C2=0.03^2, zero-padded SAME
     depthwise convolution)
  psnr — /root/reference/utils/image_utils.py:17-19 (per-leading-dim MSE, so a
    [3,H,W] image yields per-channel PSNR; callers .mean() it)

All functions take channel-first images [C,H,W] (or batched [B,C,H,W] for
ssim) with values in [0,1], matching the reference conventions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred, target):
    return jnp.abs(pred - target).mean()


def l2_loss(pred, target):
    return ((pred - target) ** 2).mean()


def mse(img1, img2):
    flat = (img1 - img2).reshape(img1.shape[0], -1)
    return (flat ** 2).mean(axis=1, keepdims=True)


def psnr(img1, img2):
    """Per-leading-dim PSNR (reference semantics: [3,H,W] -> per-channel)."""
    m = mse(img1, img2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))


def psnr_scalar(img1, img2):
    """Whole-image PSNR (single scalar over all pixels/channels)."""
    m = ((img1 - img2) ** 2).mean()
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    gauss = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma**2)
    )
    gauss = gauss / gauss.sum()
    w2d = np.outer(gauss, gauss).astype(np.float32)
    return w2d / w2d.sum()


def _depthwise_same_conv(img, kernel2d, channels):
    """Zero-padded SAME depthwise conv, img [B,C,H,W].

    precision=HIGHEST is load-bearing: XLA:TPU lowers f32 convs to bf16
    passes by default, and the sigma = conv(x^2) - mu^2 cancellation then
    carries ~1e-3 error — larger than C2 = 9e-4 — so the SSIM denominator
    can cross zero on flat image regions and the map explodes past 1
    (observed: ssim 5.6 on TPU, driving the training loss negative as the
    optimizer maximized the blow-up).  f32 window sums make the error
    ~1e-7, restoring the mathematical ssim <= 1 bound."""
    k = jnp.asarray(kernel2d)[None, None]  # [1,1,ks,ks]
    k = jnp.tile(k, (channels, 1, 1, 1))   # [C,1,ks,ks]
    return jax.lax.conv_general_dilated(
        img, k,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=channels,
        precision=jax.lax.Precision.HIGHEST,
    )


def _ssim_map(img1, img2, window_size: int = 11):
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    channels = img1.shape[1]
    window = _gaussian_window(window_size, 1.5)
    conv = functools.partial(_depthwise_same_conv, kernel2d=window,
                             channels=channels)

    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )


def ssim(img1, img2, window_size: int = 11, size_average: bool = True):
    """Windowed SSIM identical to the reference implementation."""
    ssim_map = _ssim_map(img1, img2, window_size)
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))


def masked_ssim(img1, img2, mask, window_size: int = 11):
    """SSIM over a validity mask [H, W] — the padded-batch (mixed
    resolution) path of the sharded SVC step.  Both inputs are zeroed
    outside the mask (identical pads add no distortion; windows crossing
    the crop edge see matching zeros), and the map is averaged over valid
    pixels only."""
    m = mask.astype(img1.dtype)
    mm = m if img1.ndim == 3 else m[None]
    ssim_map = _ssim_map(img1 * mm, img2 * mm, window_size)
    denom = jnp.maximum(m.sum() * ssim_map.shape[1], 1.0)
    return jnp.sum(ssim_map * m[None, None]) / denom
