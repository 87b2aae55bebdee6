"""Camera model: world/view/projection matrices and a jit-friendly pytree.

Parity targets in the reference:
  getWorld2View2 / getProjectionMatrix — /root/reference/utils/graphics_utils.py:38-71
  Camera (matrices, K, camera_center)  — /root/reference/scene/cameras.py:17-86

Design notes (TPU-first):
  * `Camera` is a frozen dataclass registered as a JAX pytree whose leaves are
    the arrays a jitted render step needs (matrices, center, image).  All
    static ints (H, W) are aux data so cameras with equal resolution share one
    compiled executable.
  * The reference follows the original 3DGS row-vector convention:
    `world_view_transform` and `full_proj_transform` are stored TRANSPOSED, and
    points transform as  p_hom = [p, 1] @ M.  We keep that convention so the
    rasterizer math (and any imported checkpoints) line up exactly.
  * The reference's K double-converts FoV (cameras.py:68-69, SURVEY Q10); we
    compute the correct K.  K is only consumed by our CVPM, which (like the
    reference) uses R/T only, so parity is unaffected.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import numpy as np


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate=np.array([0.0, 0.0, 0.0]), scale: float = 1.0
                  ) -> np.ndarray:
    """4x4 world->camera matrix. R is the COLMAP cam-to-world rotation
    (stored transposed by the readers), t the world->cam translation."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + translate) * scale
    C2W[:3, 3] = cam_center
    return np.float32(np.linalg.inv(C2W))


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float
                      ) -> np.ndarray:
    """OpenGL-style perspective matrix in the 3DGS convention (z in [0,1],
    +z forward, no y-flip)."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4))
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return np.float32(P)


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """One view. Array fields are pytree leaves; H/W/FoV are static."""
    # leaves
    world_view_transform: jax.Array  # [4,4], transposed (row-vector conv.)
    full_proj_transform: jax.Array   # [4,4], world_view @ proj, transposed
    camera_center: jax.Array         # [3]
    image: Optional[jax.Array]       # [3,H,W] float in [0,1], or None
    R: jax.Array                     # [3,3] cam-to-world rotation (readers' conv.)
    T: jax.Array                     # [3] world->cam translation
    # static (NOTE: keep anything that varies per-camera OUT of the static
    # fields, or every camera combination re-specializes the jitted step —
    # uid is therefore a leaf, and image_name must be stripped before
    # passing cameras into jit; see strip_static())
    image_height: int = dataclasses.field(metadata=dict(static=True))
    image_width: int = dataclasses.field(metadata=dict(static=True))
    fovx: float = dataclasses.field(metadata=dict(static=True))
    fovy: float = dataclasses.field(metadata=dict(static=True))
    uid: jax.Array = dataclasses.field(default=None)  # [] int32 leaf
    znear: float = dataclasses.field(metadata=dict(static=True), default=0.01)
    zfar: float = dataclasses.field(metadata=dict(static=True), default=100.0)
    image_name: str = dataclasses.field(metadata=dict(static=True), default="")

    @property
    def tan_fovx(self) -> float:
        return math.tan(self.fovx * 0.5)

    @property
    def tan_fovy(self) -> float:
        return math.tan(self.fovy * 0.5)

    @property
    def focal_x(self) -> float:
        return self.image_width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self) -> float:
        return self.image_height / (2.0 * self.tan_fovy)

    @property
    def K(self) -> np.ndarray:
        return np.array(
            [[self.focal_x, 0.0, self.image_width / 2.0],
             [0.0, self.focal_y, self.image_height / 2.0],
             [0.0, 0.0, 1.0]], dtype=np.float32)


def make_camera(R: np.ndarray, T: np.ndarray, fovx: float, fovy: float,
                image: Optional[np.ndarray], width: int, height: int,
                uid: int = 0, image_name: str = "",
                znear: float = 0.01, zfar: float = 100.0,
                trans=np.array([0.0, 0.0, 0.0]), scale: float = 1.0
                ) -> Camera:
    w2v = world_to_view(R, T, trans, scale).transpose()  # store transposed
    proj = projection_matrix(znear, zfar, fovx, fovy).transpose()
    full = (w2v @ proj).astype(np.float32)
    cam_center = np.linalg.inv(w2v)[3, :3].astype(np.float32)
    if image is not None:
        image = np.clip(np.asarray(image, dtype=np.float32), 0.0, 1.0)
        assert image.shape == (3, height, width), image.shape
    return Camera(
        world_view_transform=w2v.astype(np.float32),
        full_proj_transform=full,
        camera_center=cam_center,
        image=image,
        R=np.asarray(R, dtype=np.float32),
        T=np.asarray(T, dtype=np.float32),
        image_height=height,
        image_width=width,
        fovx=float(fovx),
        fovy=float(fovy),
        znear=float(znear),
        zfar=float(zfar),
        uid=np.int32(uid),
        image_name=image_name,
    )


def strip_static(cam: Camera) -> Camera:
    """Clear per-camera static metadata (image_name) so a batch of cameras
    shares one jit specialization."""
    return dataclasses.replace(cam, image_name="")


def look_at_camera(eye, target, up, fovx, fovy, width, height,
                   image=None, uid=0) -> Camera:
    """Build a camera from an eye/target/up triple (test + viewer helper)."""
    eye = np.asarray(eye, dtype=np.float64)
    fwd = np.asarray(target, dtype=np.float64) - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, dtype=np.float64))
    right = right / np.linalg.norm(right)
    dn = np.cross(fwd, right)
    # camera-to-world rotation with columns (right, down, forward): the 3DGS
    # convention has +x right, +y down, +z forward in camera space.
    Rc2w = np.stack([right, dn, fwd], axis=1)
    T = -Rc2w.T @ eye  # world->cam translation
    return make_camera(Rc2w, T, fovx, fovy, image, width, height, uid=uid)


def pad_camera_image(cam: Camera, height: int, width: int) -> Camera:
    """Zero-pad a camera's image to a common (height, width) so a batch of
    views shares one jit specialization (SVC view batching)."""
    if cam.image is None or (cam.image_height == height
                             and cam.image_width == width):
        return cam
    img = np.zeros((3, height, width), dtype=np.float32)
    img[:, : cam.image_height, : cam.image_width] = np.asarray(cam.image)
    return dataclasses.replace(cam, image=img)
