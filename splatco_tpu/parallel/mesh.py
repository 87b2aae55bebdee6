"""Device mesh + sharding layout for multi-chip SplatCo training.

The reference is strictly single-GPU (SURVEY §2.3); the TPU build's
first-class parallel axes are:

  view  — SVC data parallelism: the mv collaborative views of one step are
          rendered on different devices; the single aggregated backward of
          the reference (train.py:240) becomes a psum over `view`.
  gauss — scene-scale parallelism (the context/sequence-parallel analogue):
          anchors are sharded over `gauss`; the decode MLPs run on local
          shards, decoded gaussians are all-gathered over ICI for
          rasterization, and each `gauss` device rasterizes a horizontal
          strip of its view's image.

Tri-plane + decoder parameters are replicated; their gradients are psummed
over both axes (riding ICI).
"""
from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_view: int, n_gauss: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_view * n_gauss, (
        f"need {n_view * n_gauss} devices, have {len(devices)}")
    arr = np.array(devices[: n_view * n_gauss]).reshape(n_view, n_gauss)
    return Mesh(arr, ("view", "gauss"))


def param_shardings(mesh: Mesh, params) -> Tuple:
    """Anchors sharded on `gauss`, everything else replicated."""
    def spec_for(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "anchors" in keys:
            return NamedSharding(mesh, P("gauss"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def view_sharding(mesh: Mesh):
    """Leading axis = view (stacked per-view arrays)."""
    return NamedSharding(mesh, P("view"))
