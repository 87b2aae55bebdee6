"""Functional MLP / BatchNorm primitives (plain param pytrees).

The decoders and fusion heads in the reference are tiny torch Sequentials
(/root/reference/scene/gaussian_model.py:307-339, 139-147).  Here they are
pure functions over dicts of arrays so they jit/shard/vmap cleanly.

Masked BatchNorm: the reference's fusion MLPs use nn.BatchNorm1d that stays
in TRAIN mode even at eval (SURVEY Q16) — i.e. activations are always
normalized by the CURRENT batch statistics.  Our batches are fixed-capacity
padded arrays, so the statistics must be computed over the valid-row mask
only; `masked_batchnorm` reproduces train-mode BN (biased variance,
eps=1e-5) over the masked rows.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _kaiming_uniform(key, fan_in, shape):
    # torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
    # bias, kaiming_uniform(a=sqrt(5)) for weight == U(-b, b), b=sqrt(6/
    # ((1+5)*fan_in)) = 1/sqrt(fan_in)
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_linear(key, in_dim: int, out_dim: int):
    kw, kb = jax.random.split(key)
    return {
        "w": _kaiming_uniform(kw, in_dim, (in_dim, out_dim)),
        "b": _kaiming_uniform(kb, in_dim, (out_dim,)),
    }


def linear(params, x):
    return x @ params["w"] + params["b"]


def init_batchnorm(dim: int):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def masked_batchnorm(params, x, mask, eps: float = 1e-5, axis_name=None):
    """Train-mode BN over masked rows of x [N, D]; mask [N] bool/float.

    With `axis_name`, the statistics are psummed over that mesh axis so a
    gauss-sharded batch normalizes with GLOBAL batch statistics (matching
    the single-device result bit-for-bit up to reduction order)."""
    m = mask.astype(x.dtype)[:, None]
    cnt = m.sum()
    s1 = (x * m).sum(axis=0)
    s2 = ((x * x) * m).sum(axis=0)
    if axis_name is not None:
        cnt = jax.lax.psum(cnt, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
    cnt = jnp.maximum(cnt, 1.0)
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"]


def init_mlp(key, dims: Sequence[int]):
    keys = jax.random.split(key, len(dims) - 1)
    return [init_linear(k, i, o) for k, i, o in zip(keys, dims[:-1], dims[1:])]


def mlp(params, x, final_act=None):
    """ReLU between layers, optional final activation
    (None | 'tanh' | 'sigmoid' | 'softmax')."""
    for i, layer in enumerate(params):
        x = linear(layer, x)
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    if final_act == "tanh":
        x = jnp.tanh(x)
    elif final_act == "sigmoid":
        x = jax.nn.sigmoid(x)
    elif final_act == "softmax":
        x = jax.nn.softmax(x, axis=-1)
    return x
