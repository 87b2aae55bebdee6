"""Spatial stats for anchor initialization.

`mean_knn_sq_dist` is the TPU equivalent of the reference's CUDA
`simple_knn._C.distCUDA2(points) -> dist[N]` (mean SQUARED distance to the 3
nearest neighbors), used once at init for the voxel size (median) and the
initial log-scales (/root/reference/scene/gaussian_model.py:476-495).

TPU-native approach: Morton-order the points (one payload sort) and take
exact top-3 within a +-`window` rank window — O(N * window) vectorized
compute instead of an O(N^2) pairwise matrix or a CUDA spatial tree.  With
window=64 this is near-exact for the dense, roughly uniform point clouds
COLMAP produces; it only feeds init-time statistics.

`voxelize` reproduces GaussianModel.voxelize_sample
(/root/reference/scene/gaussian_model.py:447-451): round to the voxel grid
and keep one representative per cell (sort-unique instead of np.unique).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _morton_bits(x: jax.Array) -> jax.Array:
    """Interleave 10 bits of each of 3 coords into a 30-bit Morton code.
    x: [N,3] int32 in [0, 1024)."""
    def spread(v):
        v = v & 0x3FF
        v = (v | (v << 16)) & jnp.int32(0x030000FF)
        v = (v | (v << 8)) & jnp.int32(0x0300F00F)
        v = (v | (v << 4)) & jnp.int32(0x030C30C3)
        v = (v | (v << 2)) & jnp.int32(0x09249249)
        return v

    return (spread(x[:, 0]) | (spread(x[:, 1]) << 1)
            | (spread(x[:, 2]) << 2))


@functools.partial(jax.jit, static_argnames=("k", "window"))
def mean_knn_sq_dist(points: jax.Array, k: int = 3, window: int = 64
                     ) -> jax.Array:
    """Mean squared distance from each point to its k nearest neighbors,
    searched within a +-window rank window of the Morton ordering."""
    n = points.shape[0]
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    q = ((points - lo) / jnp.maximum(hi - lo, 1e-9) * 1023.0).astype(jnp.int32)
    code = _morton_bits(q)
    order = jnp.argsort(code)
    sorted_pts = points[order]

    # distances to the +-window neighbors in morton order
    idx = jnp.arange(n)
    offs = jnp.concatenate([jnp.arange(-window, 0), jnp.arange(1, window + 1)])
    nbr = jnp.clip(idx[:, None] + offs[None, :], 0, n - 1)     # [N, 2w]
    diffs = sorted_pts[nbr] - sorted_pts[:, None, :]            # [N, 2w, 3]
    d2 = jnp.sum(diffs * diffs, axis=-1)
    same = nbr == idx[:, None]
    d2 = jnp.where(same, jnp.inf, d2)
    top = -jax.lax.top_k(-d2, k)[0]                             # k smallest
    top = jnp.where(jnp.isfinite(top), top, 0.0)
    mean_sorted = top.mean(axis=-1)
    # un-sort without scatter: sort (order, mean) by order
    _, mean_orig = jax.lax.sort((order.astype(jnp.int32), mean_sorted),
                                num_keys=1)
    return mean_orig


def voxelize(points: np.ndarray, voxel_size: float, seed: int = 0
             ) -> np.ndarray:
    """Shuffle, snap to the voxel grid, unique — reference
    voxelize_sample semantics (one representative per occupied voxel)."""
    pts = np.array(points, dtype=np.float64)
    rng = np.random.default_rng(seed)
    rng.shuffle(pts)
    snapped = np.unique(np.round(pts / voxel_size), axis=0) * voxel_size
    return snapped.astype(np.float32)
