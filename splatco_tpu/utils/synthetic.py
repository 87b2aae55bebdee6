"""Synthetic scene generator — writes a miniature Blender-format dataset.

Renders ground-truth views of a procedural colored-gaussian cloud with the
dense oracle compositor, so the full data + training stack can be exercised
end-to-end (and benchmarked) without external datasets.
"""
from __future__ import annotations

import json
import math
import os
from typing import Tuple

import numpy as np

from splatco_tpu.data.cameras import Camera, look_at_camera
from splatco_tpu.data.ply import store_point_cloud


def make_cloud(n: int = 400, seed: int = 0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.45
    colors = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    return pts, colors


def orbit_camera(i: int, total: int, radius: float = 3.0,
                 height: float = 0.6, width: int = 96, height_px: int = 64,
                 fovx: float = 1.0) -> Camera:
    th = 2 * math.pi * i / total
    eye = [radius * math.cos(th), height, radius * math.sin(th)]
    return look_at_camera(eye, [0, 0, 0], [0, -1, 0], fovx,
                          fovx * height_px / width, width, height_px, uid=i)


def render_gt(pts, colors, cam: Camera, scale: float = 0.04):
    import jax.numpy as jnp

    from splatco_tpu.ops.projection import project_from_camera
    from splatco_tpu.ops.rasterize_reference import rasterize_dense
    from splatco_tpu.utils.math import build_covariance

    n = pts.shape[0]
    scales = np.full((n, 3), scale, np.float32)
    quats = np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (n, 1))
    opac = np.full((n,), 0.8, np.float32)
    cov3d = build_covariance(jnp.asarray(scales), jnp.asarray(quats))
    proj = project_from_camera(jnp.asarray(pts), cov3d, cam)
    img, _ = rasterize_dense(proj, jnp.asarray(colors), jnp.asarray(opac),
                             jnp.ones(3, jnp.float32), cam.image_height,
                             cam.image_width)
    return np.clip(np.asarray(img), 0.0, 1.0)


def write_blender_dataset(path: str, n_views: int = 12, n_pts: int = 400,
                          width: int = 96, height: int = 64,
                          seed: int = 0) -> None:
    """Write transforms_{train,test}.json + renders + points3d.ply."""
    from PIL import Image

    os.makedirs(path, exist_ok=True)
    pts, colors = make_cloud(n_pts, seed)
    fovx = 1.0

    def dump(split: str, idxs):
        frames = []
        for i in idxs:
            cam = orbit_camera(i, n_views, width=width, height_px=height,
                               fovx=fovx)
            img = render_gt(pts, colors, cam)
            fname = f"r_{i}"
            os.makedirs(os.path.join(path, split), exist_ok=True)
            Image.fromarray(
                (img.transpose(1, 2, 0) * 255).astype(np.uint8)
            ).save(os.path.join(path, split, fname + ".png"))
            # camera-to-world in OpenGL axes (the reader flips them back)
            w2v = np.asarray(cam.world_view_transform).T  # [4,4] true W2C
            c2w = np.linalg.inv(w2v)
            c2w[:3, 1:3] *= -1
            frames.append({"file_path": f"{split}/{fname}",
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(path, f"transforms_{split}.json"),
                  "w") as fh:
            json.dump({"camera_angle_x": fovx, "frames": frames}, fh)

    dump("train", [i for i in range(n_views) if i % 4 != 0])
    dump("test", [i for i in range(n_views) if i % 4 == 0])
    # noisy init cloud (so training has something to correct)
    rng = np.random.default_rng(seed + 1)
    noisy = pts + rng.normal(size=pts.shape).astype(np.float32) * 0.02
    store_point_cloud(os.path.join(path, "points3d.ply"), noisy,
                      colors * 255)
