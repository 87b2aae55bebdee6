"""LPIPS (VGG16 backbone) in pure JAX.

Reference: /root/reference/lpipsPyTorch/ (modules/lpips.py,
modules/networks.py) — VGG16 relu1_2..relu5_3 features, unit-normalized per
channel, 1x1 "lin" weights, spatially averaged and summed over stages.

This environment has zero egress and no cached torchvision/richzhang
weights, so weights must be supplied as an .npz via `load_weights(path)`
(convert once with tools/export_lpips_weights.py on a connected machine).
Without weights the metric reports None and the metrics driver records
lpips=null — explicitly, never silently wrong.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, layers-per-block); stages after relu of
# last conv in each block slice used by LPIPS: relu1_2, relu2_2, relu3_3,
# relu4_3, relu5_3
VGG_PLAN = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
STAGE_CHANNELS = [64, 128, 256, 512, 512]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

WEIGHTS_ENV = "SPLATCO_LPIPS_WEIGHTS"


def load_weights(path: Optional[str] = None) -> Optional[Dict]:
    path = path or os.environ.get(WEIGHTS_ENV, "")
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    return {k: jnp.asarray(v) for k, v in data.items()}


def _vgg_features(weights, x):
    """x: [3,H,W] normalized; returns the 5 stage activations."""
    feats = []
    h = x[None]  # NCHW
    li = 0
    for stage, (ch, n_layers) in enumerate(VGG_PLAN):
        for _ in range(n_layers):
            w = weights[f"conv{li}_w"]  # [out,in,3,3]
            b = weights[f"conv{li}_b"]
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                precision=jax.lax.Precision.HIGHEST)  # f32 on TPU (metric)
            h = jax.nn.relu(h + b[None, :, None, None])
            li += 1
        feats.append(h[0])
        if stage < len(VGG_PLAN) - 1:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID")
    return feats


def lpips(weights: Dict, img1, img2, rescale: bool = False) -> jax.Array:
    """LPIPS distance between two [3,H,W] images in [0,1].

    rescale=False reproduces the reference harness as-shipped: lpipsPyTorch
    z-scores the raw input (modules/networks.py:52-55) and metrics.py:80
    feeds [0,1] images straight in — NO [-1,1] rescale (the richzhang
    convention).  rescale=True applies x*2-1 first (richzhang-correct)."""
    def norm_input(x):
        if rescale:
            x = x * 2.0 - 1.0
        return (x - jnp.asarray(_SHIFT)[:, None, None]) / jnp.asarray(
            _SCALE)[:, None, None]

    f1 = _vgg_features(weights, norm_input(img1))
    f2 = _vgg_features(weights, norm_input(img2))
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=0, keepdims=True),
                            1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=0, keepdims=True),
                            1e-10)
        d = (a - b) ** 2
        lin = weights[f"lin{i}"]  # [C]
        total = total + (d * lin[:, None, None]).sum(axis=0).mean()
    return total
