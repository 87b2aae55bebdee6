"""Scene dataset readers: COLMAP and Blender (NeRF-synthetic).

Reference: /root/reference/scene/dataset_readers.py (readColmapSceneInfo
:132, readNerfSyntheticInfo :221, getNerfppNorm :45, llffhold=8 split
:148-153) and the resolution policy of loadCam
(/root/reference/utils/camera_utils.py:24-57): -1 = auto-cap width at 1.6K.
"""
from __future__ import annotations

import json
import math
import os
from typing import List, NamedTuple, Optional

import numpy as np

from splatco_tpu.data import colmap
from splatco_tpu.data.cameras import Camera, focal2fov, fov2focal, make_camera
from splatco_tpu.data.ply import fetch_point_cloud, store_point_cloud
from splatco_tpu.ops.sh import sh_to_rgb


class CameraInfo(NamedTuple):
    uid: int
    R: np.ndarray
    T: np.ndarray
    fovy: float
    fovx: float
    image_path: str
    image_name: str
    width: int
    height: int
    blender_white_bg: Optional[bool] = None  # None = plain RGB load


class SceneInfo(NamedTuple):
    points: np.ndarray
    colors: np.ndarray
    train_cameras: List[CameraInfo]
    test_cameras: List[CameraInfo]
    nerf_normalization: dict
    ply_path: str


def nerfpp_norm(cam_infos: List[CameraInfo]) -> dict:
    centers = []
    for cam in cam_infos:
        rt = np.zeros((4, 4))
        rt[:3, :3] = cam.R.transpose()
        rt[:3, 3] = cam.T
        rt[3, 3] = 1.0
        centers.append(np.linalg.inv(rt)[:3, 3:4])
    centers = np.hstack(centers)
    avg = centers.mean(axis=1, keepdims=True)
    diagonal = np.max(np.linalg.norm(centers - avg, axis=0))
    return {"translate": -avg.flatten(), "radius": diagonal * 1.1}


def read_colmap_scene(path: str, images_dir: str = "images",
                      eval_split: bool = True, llffhold: int = 8
                      ) -> SceneInfo:
    from splatco_tpu.data import native_io

    sparse = os.path.join(path, "sparse/0")
    try:
        extr = native_io.read_images(os.path.join(sparse, "images.bin"))
        intr = colmap.read_cameras_binary(os.path.join(sparse,
                                                       "cameras.bin"))
    except FileNotFoundError:
        extr = colmap.read_images_text(os.path.join(sparse, "images.txt"))
        intr = colmap.read_cameras_text(os.path.join(sparse, "cameras.txt"))

    infos = []
    for key in extr:
        im = extr[key]
        cam = intr[im.camera_id]
        r = np.transpose(colmap.qvec2rotmat(im.qvec))
        t = np.array(im.tvec)
        if cam.model == "SIMPLE_PINHOLE":
            fovy = focal2fov(cam.params[0], cam.height)
            fovx = focal2fov(cam.params[0], cam.width)
        elif cam.model == "PINHOLE":
            fovy = focal2fov(cam.params[1], cam.height)
            fovx = focal2fov(cam.params[0], cam.width)
        else:
            raise ValueError(
                f"unsupported COLMAP camera model {cam.model}; run "
                "convert.py to undistort")
        image_path = os.path.join(path, images_dir,
                                  os.path.basename(im.name))
        infos.append(CameraInfo(
            uid=cam.id, R=r, T=t, fovy=fovy, fovx=fovx,
            image_path=image_path,
            image_name=os.path.basename(image_path).split(".")[0],
            width=cam.width, height=cam.height))
    infos.sort(key=lambda c: c.image_name)

    if eval_split:
        train = [c for i, c in enumerate(infos) if i % llffhold != 0]
        test = [c for i, c in enumerate(infos) if i % llffhold == 0]
    else:
        train, test = infos, []

    ply_path = os.path.join(sparse, "points3D.ply")
    if not os.path.exists(ply_path):
        try:
            xyz, rgb, _ = native_io.read_points3d(
                os.path.join(sparse, "points3D.bin"))
        except FileNotFoundError:
            xyz, rgb, _ = colmap.read_points3d_text(
                os.path.join(sparse, "points3D.txt"))
        store_point_cloud(ply_path, xyz, rgb)
    points, colors, _ = fetch_point_cloud(ply_path)

    return SceneInfo(points=points, colors=colors, train_cameras=train,
                     test_cameras=test,
                     nerf_normalization=nerfpp_norm(train),
                     ply_path=ply_path)


def read_blender_scene(path: str, white_background: bool = True,
                       eval_split: bool = True, extension: str = ".png"
                       ) -> SceneInfo:
    def read_transforms(fname):
        with open(os.path.join(path, fname)) as fh:
            contents = json.load(fh)
        fovx = contents["camera_angle_x"]
        infos = []
        for idx, frame in enumerate(contents["frames"]):
            img_path = os.path.join(path, frame["file_path"] + extension)
            c2w = np.array(frame["transform_matrix"])
            c2w[:3, 1:3] *= -1  # OpenGL -> COLMAP axes
            w2c = np.linalg.inv(c2w)
            r = np.transpose(w2c[:3, :3])
            t = w2c[:3, 3]
            from PIL import Image
            with Image.open(img_path) as im:
                w, h = im.size
            fovy = focal2fov(fov2focal(fovx, w), h)
            infos.append(CameraInfo(
                uid=idx, R=r, T=t, fovy=fovy, fovx=fovx,
                image_path=img_path,
                image_name=os.path.splitext(os.path.basename(img_path))[0],
                width=w, height=h, blender_white_bg=white_background))
        return infos

    train = read_transforms("transforms_train.json")
    test = read_transforms("transforms_test.json")
    if not eval_split:
        train = train + test
        test = []

    ply_path = os.path.join(path, "points3d.ply")
    if not os.path.exists(ply_path):
        num_pts = 100_000
        xyz = np.random.random((num_pts, 3)) * 2.6 - 1.3
        shs = np.random.random((num_pts, 3)) / 255.0
        store_point_cloud(ply_path, xyz,
                          np.asarray(sh_to_rgb(shs)) * 255)
    points, colors, _ = fetch_point_cloud(ply_path)
    return SceneInfo(points=points, colors=colors, train_cameras=train,
                     test_cameras=test,
                     nerf_normalization=nerfpp_norm(train),
                     ply_path=ply_path)


def target_resolution(orig_w: int, orig_h: int, resolution: int,
                      resolution_scale: float = 1.0):
    """loadCam resolution policy (camera_utils.py:27-44)."""
    if resolution in (1, 2, 4, 8):
        return (round(orig_w / (resolution_scale * resolution)),
                round(orig_h / (resolution_scale * resolution)))
    if resolution == -1:
        global_down = orig_w / 1600 if orig_w > 1600 else 1
    else:
        global_down = orig_w / resolution
    scale = float(global_down) * float(resolution_scale)
    return int(orig_w / scale), int(orig_h / scale)


def load_camera(info: CameraInfo, uid: int, resolution: int = -1,
                resolution_scale: float = 1.0, with_image: bool = True
                ) -> Camera:
    from PIL import Image
    image = None
    if with_image:
        with Image.open(info.image_path) as im:
            w, h = target_resolution(*im.size, resolution, resolution_scale)
            if info.blender_white_bg is not None:
                rgba = np.asarray(im.convert("RGBA")).astype(np.float32) / 255.0
                bg = 1.0 if info.blender_white_bg else 0.0
                rgb = rgba[..., :3] * rgba[..., 3:] + bg * (1 - rgba[..., 3:])
                im = Image.fromarray((rgb * 255).astype(np.uint8))
            im = im.resize((w, h), Image.Resampling.BICUBIC)
            arr = np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0
        image = arr.transpose(2, 0, 1)
    else:
        w, h = target_resolution(info.width, info.height, resolution,
                                 resolution_scale)
    return make_camera(info.R, info.T, info.fovx, info.fovy, image, w, h,
                       uid=uid, image_name=info.image_name)
