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


# inner-arc rig constants shared by hard_camera (stations) and
# make_hard_cloud (the bead string lying on the stations' chords):
# station k sits at angle ARC_TH0 + ARC_DTH*k, radius ARC_R, height
# ARC_Y0 + ARC_DY*k, looking through the origin
ARC_TH0, ARC_DTH = 0.9, 0.06
ARC_R = 0.45
ARC_Y0, ARC_DY = 0.10, 0.006
ARC_STATIONS = 9        # stations for the default 28-view rig (i%3==2)


def make_hard_cloud(n: int = 3500, seed: int = 0):
    """High-frequency structured content for the HARD quality protocol:
    a checkerboard-textured sphere shell + a striped torus + a dense core
    cluster + a few far outliers.  Unlike make_cloud's soft blob, this
    scene has sharp sub-voxel color detail everywhere, so a sparse init
    leaves large reconstruction gradients -> densification actually fires
    (round-4 verdict: growth/CVPM never triggered on the easy scene)."""
    rng = np.random.default_rng(seed)
    n_shell = int(n * 0.5)
    n_torus = int(n * 0.35)
    n_core = n - n_shell - n_torus - 8

    # sphere shell r=0.8, checkerboard color in spherical coords
    u = rng.uniform(-1.0, 1.0, n_shell)
    th = rng.uniform(0, 2 * math.pi, n_shell)
    sq = np.sqrt(1 - u * u)
    shell = 0.8 * np.stack([sq * np.cos(th), sq * np.sin(th), u], axis=1)
    check = ((np.floor(th / (2 * math.pi) * 16)
              + np.floor((u + 1) * 8)) % 2)
    shell_col = np.stack([0.85 * check + 0.1,
                          0.85 * (1 - check) + 0.1,
                          0.25 + 0.5 * (np.sin(3 * th) * 0.5 + 0.5)],
                         axis=1)

    # torus R=1.4 r=0.22, azimuthal stripes
    a = rng.uniform(0, 2 * math.pi, n_torus)
    b = rng.uniform(0, 2 * math.pi, n_torus)
    torus = np.stack([(1.4 + 0.22 * np.cos(b)) * np.cos(a),
                      0.22 * np.sin(b),
                      (1.4 + 0.22 * np.cos(b)) * np.sin(a)], axis=1)
    stripe = (np.floor(a / (2 * math.pi) * 24) % 2)
    torus_col = np.stack([0.2 + 0.7 * stripe,
                          0.3 + 0.4 * (np.cos(5 * b) * 0.5 + 0.5),
                          0.9 - 0.7 * stripe], axis=1)

    # dense core cluster (fine detail near the origin)
    core = rng.normal(size=(n_core, 3)) * 0.12
    core_col = rng.uniform(0.15, 0.95, size=(n_core, 3))

    # far outliers: junk structure at radius ~3.4-4.2, safely past 3
    # sigma of the anchor cloud (std ~0.9) so CVPM's statistical-outlier
    # branch can actually classify them (at <=2.6 they were inliers —
    # the round-4 scene's CVPM was structurally unable to fire)
    od = rng.normal(size=(8, 3))
    od /= np.linalg.norm(od, axis=1, keepdims=True)
    outl = od * rng.uniform(3.4, 4.2, size=(8, 1))
    outl_col = rng.uniform(0.3, 0.8, size=(8, 3))

    # bead string ON the inner-arc camera track: real scene content lying
    # within voxel_size of the chords between consecutive arc stations
    # (sagitta at ARC_DTH is ~2e-4 << 0.01), <0.5 from those cameras.
    # These are exactly the anchors CVPM's criterion
    # (gaussian_model.py:1182-1214: near the pair baseline AND too_close)
    # marks — without on-track content the valid-cylinder (radius
    # voxel_size around the baseline) is empty almost surely and CVPM is
    # structurally a no-op on ANY orbit scene (round-4: delta exactly 0)
    n_beads = 64
    tb = rng.uniform(0.0, ARC_DTH * (ARC_STATIONS - 1), n_beads)
    rb = ARC_R * (1.0 - rng.uniform(0.0, 0.004, n_beads))
    yb = (ARC_Y0 + ARC_DY * (tb / ARC_DTH)
          + rng.uniform(-0.003, 0.003, n_beads))
    beads = np.stack([rb * np.cos(ARC_TH0 + tb), yb,
                      rb * np.sin(ARC_TH0 + tb)], axis=1)
    bead_col = np.stack([0.9 * np.ones(n_beads),
                         rng.uniform(0.1, 0.9, n_beads),
                         0.1 * np.ones(n_beads)], axis=1)

    pts = np.concatenate([shell, torus, core, outl, beads]
                         ).astype(np.float32)
    cols = np.concatenate([shell_col, torus_col, core_col, outl_col,
                           bead_col]).astype(np.float32)
    return pts, cols


def hard_camera(i: int, total: int, width: int, height_px: int,
                fovx: float = 1.0, arc_period: int = 3) -> Camera:
    """Mixed rig engineered so CVPM's preconditions
    (/root/reference/scene/gaussian_model.py:1182-1214) actually occur:

      * every third view sits on a TIGHT inner arc (radius 0.45, ~6 deg
        steps) looking through the dense core cluster: the views are
        similar (pairwise GT SSIM > 0.6 passes the gate), anchors near
        the core sit within 0.5 of the cameras (too_close), and the
        pair baselines cross the core so anchors fall within voxel_size
        of them,
      * the rest orbit at radius 3.0 for surround coverage.

    `arc_period` P puts every P-th view (i % P == P-1) on the arc —
    P=2 doubles the arc density for short ablation runs where the
    random mv batch must contain an eligible arc pair within a handful
    of densify events."""
    n_arc = total // arc_period
    if i % arc_period == arc_period - 1:
        k = i // arc_period
        th = ARC_TH0 + ARC_DTH * k       # tight arc, ~3.4 degree steps
        eye = [ARC_R * math.cos(th), ARC_Y0 + ARC_DY * k,
               ARC_R * math.sin(th)]
        return look_at_camera(eye, [0, 0, 0], [0, -1, 0], fovx,
                              fovx * height_px / width, width, height_px,
                              uid=i)
    j = i - i // arc_period - (1 if i % arc_period == arc_period - 1
                               else 0)
    th = 2 * math.pi * j / max(total - n_arc, 1)
    eye = [3.0 * math.cos(th), 0.7 * math.sin(2.3 * th), 3.0 * math.sin(th)]
    return look_at_camera(eye, [0, 0, 0], [0, -1, 0], fovx,
                          fovx * height_px / width, width, height_px, uid=i)


def write_hard_dataset(path: str, n_views: int = 30, n_pts: int = 3500,
                       width: int = 320, height: int = 224,
                       seed: int = 0, init_frac: float = 0.12,
                       n_junk: int = 40, arc_period: int = 3) -> None:
    """The HARD quality-protocol scene: high-frequency content, SPARSE
    noisy init (init_frac of the true points + n_junk spurious points),
    mixed close/far cameras.  Written so the dynamic machinery — anchor
    growing, opacity pruning, CVPM, capacity regrowth — has real work to
    do over a 30k-iteration run."""
    from PIL import Image

    os.makedirs(path, exist_ok=True)
    pts, colors = make_hard_cloud(n_pts, seed)
    fovx = 1.0

    def dump(split: str, idxs):
        frames = []
        for i in idxs:
            cam = hard_camera(i, n_views, width, height, fovx,
                              arc_period=arc_period)
            img = render_gt(pts, colors, cam, scale=0.012)
            fname = f"r_{i}"
            os.makedirs(os.path.join(path, split), exist_ok=True)
            Image.fromarray(
                (img.transpose(1, 2, 0) * 255).astype(np.uint8)
            ).save(os.path.join(path, split, fname + ".png"))
            w2v = np.asarray(cam.world_view_transform).T
            c2w = np.linalg.inv(w2v)
            c2w[:3, 1:3] *= -1
            frames.append({"file_path": f"{split}/{fname}",
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(path, f"transforms_{split}.json"),
                  "w") as fh:
            json.dump({"camera_angle_x": fovx, "frames": frames}, fh)

    dump("train", [i for i in range(n_views) if i % 4 != 0])
    dump("test", [i for i in range(n_views) if i % 4 == 0])

    # SPARSE noisy init: a small random subset, displaced, plus junk
    # points off the surfaces (targets for opacity pruning / CVPM)
    rng = np.random.default_rng(seed + 1)
    keep = rng.choice(n_pts, size=max(int(n_pts * init_frac), 16),
                      replace=False)
    noisy = (pts[keep]
             + rng.normal(size=(keep.size, 3)).astype(np.float32) * 0.04)
    jd = rng.normal(size=(n_junk, 3)).astype(np.float32)
    jd /= np.linalg.norm(jd, axis=1, keepdims=True)
    junk = jd * rng.uniform(3.2, 4.0, size=(n_junk, 1)).astype(np.float32)
    # the bead string (last 64 cloud points) always seeds init anchors:
    # CVPM's on-baseline candidates must exist from iteration 1, not only
    # after densification happens to grow them
    beads = (pts[-64:]
             + rng.normal(size=(64, 3)).astype(np.float32) * 0.005)
    init_pts = np.concatenate([noisy, junk, beads])
    init_col = np.concatenate([colors[keep],
                               rng.uniform(0.2, 0.8, size=(n_junk, 3))
                               .astype(np.float32), colors[-64:]])
    store_point_cloud(os.path.join(path, "points3d.ply"), init_pts,
                      init_col * 255)


def write_colmap_dataset(path: str, n_views: int = 12, n_pts: int = 300,
                         width: int = 96, height: int = 64,
                         seed: int = 0) -> None:
    """Write a synthetic scene in COLMAP BINARY layout — the reference's
    PRIMARY workflow (/root/reference/scene/dataset_readers.py:132-177):
    <path>/images/*.png + <path>/sparse/0/{cameras,images,points3D}.bin.
    Exercises the full COLMAP pipeline end-to-end: binary parsers, PINHOLE
    intrinsics, qvec/tvec extrinsics, NeRF++ normalization, llffhold=8
    split, PLY conversion of points3D.bin.
    """
    import struct

    from PIL import Image

    from splatco_tpu.data.cameras import fov2focal
    from splatco_tpu.data.colmap import (CAMERA_MODEL_IDS, rotmat2qvec)

    img_dir = os.path.join(path, "images")
    sparse = os.path.join(path, "sparse", "0")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(sparse, exist_ok=True)
    pts, colors = make_cloud(n_pts, seed)
    fovx = 1.0
    fy = fov2focal(fovx * height / width, height)
    fx = fov2focal(fovx, width)

    # cameras.bin: ONE shared PINHOLE camera
    with open(os.path.join(sparse, "cameras.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", 1))
        fh.write(struct.pack("<iiQQ", 1, CAMERA_MODEL_IDS["PINHOLE"],
                             width, height))
        fh.write(struct.pack("<dddd", fx, fy, width / 2.0, height / 2.0))

    # images.bin: per-view qvec/tvec in COLMAP's W2C convention
    with open(os.path.join(sparse, "images.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", n_views))
        for i in range(n_views):
            cam = orbit_camera(i, n_views, width=width, height_px=height,
                               fovx=fovx)
            img = render_gt(pts, colors, cam)
            name = f"frame_{i:04d}.png"
            Image.fromarray(
                (img.transpose(1, 2, 0) * 255).astype(np.uint8)
            ).save(os.path.join(img_dir, name))
            w2c = np.asarray(cam.world_view_transform).T  # [4,4] true W2C
            qvec = rotmat2qvec(w2c[:3, :3])
            tvec = w2c[:3, 3]
            fh.write(struct.pack("<i", i + 1))
            fh.write(struct.pack("<dddd", *qvec))
            fh.write(struct.pack("<ddd", *tvec))
            fh.write(struct.pack("<i", 1))
            fh.write(name.encode() + b"\x00")
            fh.write(struct.pack("<Q", 0))  # no 2D points

    # points3D.bin: noisy init cloud, empty tracks
    rng = np.random.default_rng(seed + 1)
    noisy = pts + rng.normal(size=pts.shape).astype(np.float32) * 0.02
    rgb8 = (colors * 255).astype(np.uint8)
    with open(os.path.join(sparse, "points3D.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            fh.write(struct.pack("<QdddBBBd", i + 1, *noisy[i].tolist(),
                                 *rgb8[i].tolist(), 0.5))
            fh.write(struct.pack("<Q", 0))  # track length


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
