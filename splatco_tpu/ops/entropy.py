"""Entropy / rate models for compression-aware training.

Reference: /root/reference/utils/entropy_models.py (Entropy_gaussian :31,
Entropy_factorized :68, Low_bound :142, UniverseQuant :160).  Latent in the
shipped reference (constructed at gaussian_model.py:201, never added to a
loss — SURVEY Q6) but part of the declared compression design; provided
here as jit-friendly functions so a rate term can be enabled via
`datarate_lambda`.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

LOW_BOUND = 1e-6


@jax.custom_vjp
def low_bound(x):
    return jnp.maximum(x, LOW_BOUND)


def _lb_fwd(x):
    return low_bound(x), x


def _lb_bwd(x, g):
    # pass gradients through unless they would push x further below the
    # bound (reference Low_bound.backward semantics)
    pass_through = (x >= LOW_BOUND) | (g < 0)
    return (jnp.where(pass_through, g, 0.0),)


low_bound.defvjp(_lb_fwd, _lb_bwd)


def gaussian_bits(x, mean, scale, q: float = 1.0):
    """Estimated bits under a quantized gaussian prior: -log2 P(x in the
    Q-bin) (Entropy_gaussian.forward)."""
    scale = low_bound(jnp.abs(scale))
    upper = jax.scipy.stats.norm.cdf(x + 0.5 * q, mean, scale)
    lower = jax.scipy.stats.norm.cdf(x - 0.5 * q, mean, scale)
    p = low_bound(upper - lower)
    return -jnp.log2(p)


def universe_quant(key, x):
    """Universal quantization: round with a per-element uniform dither and
    a straight-through gradient (UniverseQuant: round(x+u)-u, backward
    passes g unchanged)."""
    u = jax.random.uniform(key, x.shape, minval=-0.5, maxval=0.5)
    quant = jnp.round(x + u) - u
    return x + jax.lax.stop_gradient(quant - x)


def init_factorized(key, channels: int, filters=(3, 3, 3)):
    """Fully-factorized entropy model parameters
    (Entropy_factorized.__init__)."""
    dims = (1,) + tuple(filters) + (1,)
    params = {"matrices": [], "biases": [], "factors": []}
    scale = 10.0
    for i in range(len(dims) - 1):
        key, k1, k2, k3 = jax.random.split(key, 4)
        init = jnp.log(jnp.expm1(1.0 / scale / dims[i + 1]))
        params["matrices"].append(
            jnp.full((channels, dims[i + 1], dims[i]), init))
        params["biases"].append(
            jax.random.uniform(k2, (channels, dims[i + 1], 1), minval=-0.5,
                               maxval=0.5))
        if i < len(dims) - 2:
            params["factors"].append(
                jnp.zeros((channels, dims[i + 1], 1)))
    return params


def _factorized_logits(params, x):
    """x: [C, 1, N] -> logits [C, 1, N] of the cumulative."""
    h = x
    n = len(params["matrices"])
    for i in range(n):
        m = jax.nn.softplus(params["matrices"][i])
        h = jnp.einsum("cij,cjn->cin", m, h) + params["biases"][i]
        if i < n - 1:
            h = h + jnp.tanh(params["factors"][i]) * jnp.tanh(h)
    return h


def factorized_bits(params, x, q: float = 1.0):
    """x: [N, C] -> estimated bits [N, C] under the factorized prior."""
    xt = x.T[:, None, :]  # [C,1,N]
    upper = jax.nn.sigmoid(_factorized_logits(params, xt + 0.5 * q))
    lower = jax.nn.sigmoid(_factorized_logits(params, xt - 0.5 * q))
    p = low_bound(upper - lower)
    return (-jnp.log2(p))[:, 0, :].T
