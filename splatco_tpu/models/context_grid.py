"""Spatial context grids — TPU equivalents of the gridcreater/gridencoder
CUDA extensions (SURVEY §2.2 N3/N4).

Reference API (reconstructed from /root/reference/utils/grid_utils.py and
Spatial_CTX, /root/reference/scene/gaussian_model.py:40-62):
  * grid_creater: scatter point features INTO multi-resolution dense grids
    as per-cell weighted means (outputs/(weights+1e-9)); a deterministic
    fixed-point accumulation variant exists because CUDA float atomics are
    non-deterministic — TPU segment sums are deterministic by construction,
  * grid_encoder: multi-level d-linear interpolation OUT of the grids,
  * Spatial_CTX composes one 3D grid stack and three 2D projections
    (xy/xz/yz) per level and concatenates the interpolations.

NOTE: the shipped reference constructs Spatial_CTX but never invokes it in
the forward path (SURVEY Q5) — the CSCM "local context" branch it ships is
the 71-d anchor-context MLP.  This module provides the paper-faithful
path behind `ModelConfig.use_spatial_ctx` for capability parity.

Resolutions follow the reference wiring: 2D [300,400,500], 3D [60,80,100]
with prefix-sum offsets (gaussian_model.py:98-128).
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

RESOLUTIONS_2D = (300, 400, 500)
RESOLUTIONS_3D = (60, 80, 100)


def normalize_xyz(xyz, lo, hi):
    """Map world coords into [0,1]^d (reference utils/grid_utils.py
    normalize_xyz)."""
    return (xyz - lo) / jnp.maximum(hi - lo, 1e-9)


def _cell_ids(xyz01, resolution: int):
    """Nearest-cell index per point for one level; xyz01 in [0,1]^d."""
    d = xyz01.shape[-1]
    q = jnp.clip((xyz01 * resolution).astype(jnp.int32), 0, resolution - 1)
    idx = q[..., 0]
    for a in range(1, d):
        idx = idx * resolution + q[..., a]
    return idx


def grid_create(xyz01, features, resolution: int, mask=None):
    """Per-cell masked mean of point features: the grid_creater forward
    (weighted average accumulate, utils/grid_utils.py:58-72).

    Returns table [resolution**d, F].  Uses segment_sum (deterministic)."""
    d = xyz01.shape[-1]
    n_cells = resolution**d
    ids = _cell_ids(xyz01, resolution)
    w = jnp.ones((xyz01.shape[0],), features.dtype)
    if mask is not None:
        w = w * mask.astype(features.dtype)
    sums = jax.ops.segment_sum(features * w[:, None], ids,
                               num_segments=n_cells)
    counts = jax.ops.segment_sum(w, ids, num_segments=n_cells)
    return sums / (counts[:, None] + 1e-9)


def grid_encode(xyz01, table, resolution: int):
    """d-linear interpolation out of one level's table (grid_encoder
    forward).  xyz01 [N,d], table [resolution**d, F] -> [N, F]."""
    d = xyz01.shape[-1]
    pos = jnp.clip(xyz01, 0.0, 1.0) * (resolution - 1)
    p0 = jnp.floor(pos)
    frac = pos - p0
    p0 = p0.astype(jnp.int32)
    out = 0.0
    for corner in range(2**d):
        offs = [(corner >> a) & 1 for a in range(d)]
        q = jnp.stack([jnp.clip(p0[:, a] + offs[a], 0, resolution - 1)
                       for a in range(d)], axis=-1)
        idx = q[:, 0]
        for a in range(1, d):
            idx = idx * resolution + q[:, a]
        wgt = jnp.ones((xyz01.shape[0],), table.dtype)
        for a in range(d):
            wgt = wgt * jnp.where(offs[a] == 1, frac[:, a],
                                  1.0 - frac[:, a])
        out = out + table[idx] * wgt[:, None]
    return out


@functools.partial(jax.jit, static_argnames=("level",))
def spatial_ctx(xyz, features, lo, hi, level: int = 0, mask=None):
    """One level of Spatial_CTX: 3D grid + xy/xz/yz 2D grids, scatter then
    interpolate, concatenated -> [N, 4F]."""
    xyz01 = normalize_xyz(xyz, lo, hi)
    r3 = RESOLUTIONS_3D[level]
    r2 = RESOLUTIONS_2D[level]
    planes = [xyz01, xyz01[:, 0:2], xyz01[:, 0::2], xyz01[:, 1:3]]
    resos = [r3, r2, r2, r2]
    outs = []
    for coords, reso in zip(planes, resos):
        table = grid_create(coords, features, reso, mask=mask)
        outs.append(grid_encode(coords, table, reso))
    return jnp.concatenate(outs, axis=-1)
