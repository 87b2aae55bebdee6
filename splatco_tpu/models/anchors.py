"""Anchor state — the Scaffold-GS-style learnable scene representation.

Reference: GaussianModel tensors (/root/reference/scene/gaussian_model.py:
286-296, create_from_pcd :472-508).  The torch version grows/shrinks dense
tensors with optimizer surgery; the TPU version is a FIXED-CAPACITY padded
pytree with an `active` mask so every training step keeps a static shape
under jit.  Densification/pruning (train/densify.py) rewrites rows in place
and flips mask bits; capacity regrowth is a host-side bucketed re-pad.

Per-anchor attributes (semantics identical to the reference):
  anchor   [C,3]  position
  feat     [C,F]  learned feature (F = feat_dim = 32)
  offsets  [C,K,3] K = n_offsets learned offsets (gaussian centers =
                   anchor + offset * scaling[:, :3])
  scaling  [C,6]  log-scales: cols 0-2 scale offsets, 3-5 base gaussian
                   scale (SURVEY Q14)
  rotation [C,4]  anchor quat — consumed only by the frustum prefilter
                   (Q13); per-gaussian rotation comes from mlp_cov
  opacity  [C,1]  anchor opacity logit (unused by the decode path; kept for
                   PLY parity)
  active   [C]    liveness mask (not a parameter)
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from splatco_tpu.ops.knn import mean_knn_sq_dist, voxelize
from splatco_tpu.utils.math import inverse_sigmoid, round_up


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AnchorState:
    anchor: jax.Array
    feat: jax.Array
    offsets: jax.Array
    scaling: jax.Array
    rotation: jax.Array
    opacity: jax.Array
    active: jax.Array

    @property
    def capacity(self) -> int:
        return self.anchor.shape[0]

    @property
    def n_offsets(self) -> int:
        return self.offsets.shape[1]

    def num_active(self) -> jax.Array:
        return jnp.sum(self.active.astype(jnp.int32))


def trainable_fields() -> Tuple[str, ...]:
    return ("anchor", "offsets", "feat", "opacity", "scaling", "rotation")


def init_anchor_state(
    points: np.ndarray,
    feat_dim: int,
    n_offsets: int,
    voxel_size: float,
    capacity: int = 0,
    ratio: int = 1,
    pad_multiple: int = 256,
) -> Tuple[AnchorState, float]:
    """create_from_pcd equivalent.  Returns (state, resolved_voxel_size)."""
    pts = np.asarray(points, np.float32)[::ratio]
    if voxel_size <= 0:
        d2 = np.asarray(mean_knn_sq_dist(jnp.asarray(pts)))
        voxel_size = float(np.median(d2))
        print(f"Initial voxel_size: {voxel_size}")
    vox = voxelize(pts, voxel_size)
    n = vox.shape[0]
    print(f"Number of anchors at initialisation: {n}")
    if capacity <= 0:
        capacity = round_up(max(4 * n, 2 * pad_multiple), pad_multiple)
    assert capacity >= n, (capacity, n)

    d2 = np.asarray(mean_knn_sq_dist(jnp.asarray(vox)))
    d2 = np.clip(d2, 1e-7, None)
    log_scales = np.log(np.sqrt(d2))[:, None].repeat(6, axis=1)

    def pad(a, fill=0.0):
        out = np.full((capacity,) + a.shape[1:], fill, a.dtype)
        out[:n] = a
        return out

    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    opac = np.full((n, 1), float(inverse_sigmoid(jnp.float32(0.1))),
                   np.float32)
    active = np.zeros((capacity,), bool)
    active[:n] = True
    state = AnchorState(
        anchor=jnp.asarray(pad(vox)),
        feat=jnp.asarray(pad(np.zeros((n, feat_dim), np.float32))),
        offsets=jnp.asarray(pad(np.zeros((n, n_offsets, 3), np.float32))),
        scaling=jnp.asarray(pad(log_scales.astype(np.float32))),
        rotation=jnp.asarray(pad(rots)),
        opacity=jnp.asarray(pad(opac)),
        active=jnp.asarray(active),
    )
    return state, voxel_size


def grow_capacity(state: AnchorState, new_capacity: int) -> AnchorState:
    """Host-side re-pad to a larger capacity (densification overflow)."""
    assert new_capacity >= state.capacity

    def pad(a, fill=0.0):
        widths = [(0, new_capacity - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=fill)

    return AnchorState(
        anchor=pad(state.anchor), feat=pad(state.feat),
        offsets=pad(state.offsets), scaling=pad(state.scaling),
        rotation=pad(state.rotation), opacity=pad(state.opacity),
        active=pad(state.active, False),
    )
