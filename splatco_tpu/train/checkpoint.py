"""Checkpointing: anchor PLY (reference-schema interop) + pytree archives.

The reference writes three artifact families (SURVEY §5):
  (a) anchor PLY with all per-anchor attributes — save_ply /
      load_ply_sparse_gaussian (/root/reference/scene/gaussian_model.py:
      640-712); we keep that exact schema so models interop both ways,
  (b) decoder MLP checkpoints ('checkpoints.pth') — ours is a .npz pytree
      archive (torch-free),
  (c) chkpnt{iter} = (feat_planes, contractor) — folded into the same
      archive.
Unlike the reference (whose restore() unpacks a tuple that capture() never
produced — SURVEY Q8), save/load here round-trips the FULL training state:
params, active mask, optimizer state, densify statistics and step.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from splatco_tpu.data.ply import read_ply, write_ply


# ----------------------------------------------------------------------
# (a) anchor PLY, reference schema
# ----------------------------------------------------------------------

def save_anchor_ply(path: str, anchors: Dict[str, jax.Array],
                    active: np.ndarray) -> None:
    act = np.asarray(active)
    n = int(act.sum())
    sel = np.flatnonzero(act)  # contiguous prefix in practice
    anchor = np.asarray(anchors["anchor"])[sel]
    feat = np.asarray(anchors["feat"])[sel]
    # [N,K,3] -> transpose(1,2) -> [N,3,K] -> flatten (reference :659)
    offsets = np.asarray(anchors["offsets"])[sel].transpose(0, 2, 1
                                                            ).reshape(n, -1)
    opacity = np.asarray(anchors["opacity"])[sel]
    scaling = np.asarray(anchors["scaling"])[sel]
    rotation = np.asarray(anchors["rotation"])[sel]

    cols = {}
    for i, name in enumerate("xyz"):
        cols[name] = anchor[:, i].astype(np.float32)
    for i, name in enumerate(("nx", "ny", "nz")):
        cols[name] = np.zeros(n, np.float32)
    for i in range(offsets.shape[1]):
        cols[f"f_offset_{i}"] = offsets[:, i].astype(np.float32)
    for i in range(feat.shape[1]):
        cols[f"f_anchor_feat_{i}"] = feat[:, i].astype(np.float32)
    cols["opacity"] = opacity[:, 0].astype(np.float32)
    for i in range(scaling.shape[1]):
        cols[f"scale_{i}"] = scaling[:, i].astype(np.float32)
    for i in range(rotation.shape[1]):
        cols[f"rot_{i}"] = rotation[:, i].astype(np.float32)
    write_ply(path, cols)


def load_anchor_ply(path: str, capacity: int = 0, pad_multiple: int = 256
                    ) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    v = read_ply(path)
    n = len(v["x"])
    if capacity <= 0:
        capacity = ((max(n, 1) + pad_multiple - 1)
                    // pad_multiple) * pad_multiple

    def group(prefix):
        names = sorted((k for k in v if k.startswith(prefix)),
                       key=lambda s: int(s.split("_")[-1]))
        return np.stack([v[k] for k in names], axis=1).astype(np.float32)

    offsets = group("f_offset_")
    k = offsets.shape[1] // 3
    offsets = offsets.reshape(n, 3, k).transpose(0, 2, 1)  # -> [N,K,3]

    def pad(a):
        out = np.zeros((capacity,) + a.shape[1:], np.float32)
        out[:n] = a
        return out

    anchors = {
        "anchor": pad(np.stack([v["x"], v["y"], v["z"]], 1
                               ).astype(np.float32)),
        "feat": pad(group("f_anchor_feat_")),
        "offsets": pad(offsets),
        "scaling": pad(group("scale_")),
        "rotation": pad(group("rot_")),
        "opacity": pad(np.asarray(v["opacity"], np.float32)[:, None]),
    }
    active = np.zeros(capacity, bool)
    active[:n] = True
    return anchors, active


# ----------------------------------------------------------------------
# (b/c) pytree archives
# ----------------------------------------------------------------------

def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[jax.tree_util.keystr(path)] = np.asarray(leaf)
    return flat


def save_pytree(path: str, tree) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **_flatten(tree))


def load_pytree_like(path: str, template):
    """Load an archive into the structure of `template` (same treedef)."""
    archive = np.load(path, allow_pickle=False)
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    flat_paths = jax.tree_util.tree_flatten_with_path(template)[0]
    leaves = []
    for (path_t, leaf_t) in flat_paths:
        key = jax.tree_util.keystr(path_t)
        arr = archive[key]
        assert arr.shape == leaf_t.shape, (key, arr.shape, leaf_t.shape)
        leaves.append(jnp.asarray(arr, dtype=leaf_t.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_model_checkpoint(model_path: str, iteration: int,
                          params: Dict[str, Any], active,
                          meta: Optional[dict] = None) -> None:
    """Reference Scene.save layout: point_cloud/iteration_N/point_cloud.ply
    + checkpoints archive (scene/__init__.py:98-101)."""
    pc_dir = os.path.join(model_path, "point_cloud",
                          f"iteration_{iteration}")
    os.makedirs(pc_dir, exist_ok=True)
    save_anchor_ply(os.path.join(pc_dir, "point_cloud.ply"),
                    params["anchors"], active)
    save_pytree(os.path.join(pc_dir, "checkpoints.npz"),
                {"decoders": params["decoders"],
                 "planes": params["planes"]})
    if meta is not None:
        with open(os.path.join(pc_dir, "meta.json"), "w") as fh:
            json.dump(meta, fh)


def save_train_state(model_path: str, iteration: int, tree,
                     meta: dict) -> None:
    """Full-state training checkpoint — the working version of the
    reference's chkpnt{iter}.pth (whose restore is broken, SURVEY Q8:
    capture() returns a 2-tuple, restore() unpacks 10,
    /root/reference/scene/gaussian_model.py:368-388).  `tree` carries
    params + optimizer state + densify statistics + active mask + RNG key
    data; `meta` carries the scalar trainer state (iteration, level,
    kmax_pack, schedules...)."""
    base = os.path.join(model_path, f"chkpnt{iteration}")
    save_pytree(base + ".npz", tree)
    with open(base + ".json", "w") as fh:
        json.dump(meta, fh)


def load_train_state(model_path: str, iteration: int, template):
    base = os.path.join(model_path, f"chkpnt{iteration}")
    tree = load_pytree_like(base + ".npz", template)
    with open(base + ".json") as fh:
        meta = json.load(fh)
    return tree, meta


def latest_train_checkpoint(model_path: str) -> Optional[int]:
    its = []
    if not os.path.isdir(model_path):
        return None
    for name in os.listdir(model_path):
        if name.startswith("chkpnt") and name.endswith(".json"):
            try:
                its.append(int(name[len("chkpnt"):-len(".json")]))
            except ValueError:
                pass
    return max(its) if its else None


def latest_iteration(model_path: str) -> Optional[int]:
    pc = os.path.join(model_path, "point_cloud")
    if not os.path.isdir(pc):
        return None
    its = [int(d.split("_")[-1]) for d in os.listdir(pc)
           if d.startswith("iteration_")]
    return max(its) if its else None


def load_model_checkpoint(model_path: str, iteration: int,
                          params_template: Dict[str, Any],
                          capacity: int = 0):
    pc_dir = os.path.join(model_path, "point_cloud",
                          f"iteration_{iteration}")
    anchors, active = load_anchor_ply(
        os.path.join(pc_dir, "point_cloud.ply"), capacity=capacity)
    rest = load_pytree_like(
        os.path.join(pc_dir, "checkpoints.npz"),
        {"decoders": params_template["decoders"],
         "planes": params_template["planes"]})
    params = {"anchors": {k: jnp.asarray(v) for k, v in anchors.items()},
              "decoders": rest["decoders"], "planes": rest["planes"]}
    meta = None
    meta_path = os.path.join(pc_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
    return params, jnp.asarray(active), meta
