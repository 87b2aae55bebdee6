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
def _gaussian_1d(window_size: int, sigma: float) -> np.ndarray:
    gauss = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma**2)
    )
    return (gauss / gauss.sum()).astype(np.float32)


def _sep_gauss_blur(img, g1d):
    """Zero-padded SAME Gaussian blur, img [B,C,H,W], as two SEPARABLE
    shift-add passes (the reference's 2D window is outer(g, g), so this is
    the same operator, 11+11 taps instead of 121).

    Deliberately NOT lax.conv: XLA:TPU lowers a [C,1,11,11] depthwise f32
    conv with precision=HIGHEST to a ~76 ms/frame program at 1600x1088 —
    it never reaches the MXU (3-channel depthwise) and the HIGHEST-
    precision path splits every pass into 3 bf16 products.  The shifted
    slice-multiply-adds below are native f32 VPU work XLA fuses into ~one
    pass per axis: ~0.8 ms/frame, numerically identical accumulation in
    f32 (bf16 convs are NOT safe here: the sigma = E[x^2] - mu^2
    cancellation carries ~1e-3 error, larger than C2 = 9e-4, and the SSIM
    map can blow past 1 on flat regions — observed ssim 5.6 on TPU)."""
    b, c, h, w = img.shape
    ks = int(g1d.shape[0])
    r = ks // 2
    x = jnp.pad(img, ((0, 0), (0, 0), (r, r), (0, 0)))
    out = g1d[0] * x[:, :, 0:h, :]
    for i in range(1, ks):
        out = out + g1d[i] * x[:, :, i:i + h, :]
    x = jnp.pad(out, ((0, 0), (0, 0), (0, 0), (r, r)))
    out = g1d[0] * x[:, :, :, 0:w]
    for i in range(1, ks):
        out = out + g1d[i] * x[:, :, :, i:i + w]
    return out


@jax.custom_vjp
def sep_gauss_blur(img, g1d):
    """`_sep_gauss_blur` with a hand-written transpose: the blur is a
    self-adjoint linear map (symmetric kernel, zero-padded SAME), so its
    VJP is the SAME blur applied to the cotangent — one blur instead of
    the ~3x program XLA autodiff builds from the 22 shifted-slice adds
    (measured 12 -> ~5 ms/frame fwd+bwd at 1600x1088 on v5e).

    CONSTRAINT: the custom VJP returns a ZERO cotangent for `g1d` — the
    window is treated as a non-differentiable constant (it always is: a
    fixed Gaussian).  Differentiating w.r.t. g1d would silently yield
    zeros, and custom_vjp also disables forward-mode (jvp) for this op."""
    return _sep_gauss_blur(img, g1d)


def _sep_blur_fwd(img, g1d):
    return _sep_gauss_blur(img, g1d), g1d


def _sep_blur_bwd(g1d, ct):
    return _sep_gauss_blur(ct, g1d), jnp.zeros_like(g1d)


sep_gauss_blur.defvjp(_sep_blur_fwd, _sep_blur_bwd)


def _ssim_map(img1, img2, window_size: int = 11):
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    # cast BEFORE forming the second-moment products: a bf16 img would
    # otherwise poison E[x^2] with exactly the cancellation error the
    # blur docstring warns about (sigma = E[x^2] - mu^2, C2 = 9e-4)
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    g1d = jnp.asarray(_gaussian_1d(window_size, 1.5))

    # one stacked blur over [5B, C, H, W] so XLA fuses all five windowed
    # moments into a single pair of shift-add passes
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0)
    blurred = sep_gauss_blur(stacked, g1d)
    b = img1.shape[0]
    mu1, mu2, e11, e22, e12 = (blurred[i * b:(i + 1) * b]
                               for i in range(5))
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = e11 - mu1_sq
    sigma2_sq = e22 - mu2_sq
    sigma12 = e12 - mu1_mu2

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
