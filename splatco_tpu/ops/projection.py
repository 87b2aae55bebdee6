"""EWA projection / preprocess stage of the Gaussian rasterizer.

This is the differentiable front-end shared by the dense reference
compositor (ops/rasterize_reference.py) and the Pallas tile rasterizer
(ops/rasterize_pallas.py).  It reproduces the preprocess semantics of the
reference's CUDA `diff-gaussian-rasterization` (called from
/root/reference/gaussian_renderer/__init__.py:160-171, API per SURVEY §2.2 N1),
which follow the original INRIA 3DGS kernels:

  * row-vector convention: p_hom = [p,1] @ full_proj (matrices stored
    transposed, see data/cameras.py),
  * near-plane cull at p_view.z <= 0.2,
  * EWA: cov2D = (J W Sigma W^T J^T)[:2,:2] with the +-1.3*tan(fov) frustum
    clamp on t.x/t.z, t.y/t.z before building J,
  * low-pass dilation cov2D += 0.3 * I,
  * radius = ceil(3 * sqrt(lambda_max)),  lambda_max = mid + sqrt(max(0.1,
    mid^2 - det)),
  * ndc2Pix(v, S) = ((v + 1) * S - 1) / 2.

`visible_filter` (the Scaffold-GS fork's frustum prefilter,
gaussian_renderer/__init__.py:239-242) is the same preprocess with the
radius > 0 test and no shading.

All functions are pure JAX (vectorized over N) so `jax.grad` flows to means,
scales and quaternions; XLA fuses the whole stage into a handful of kernels.
Only the per-pixel blend needs Pallas.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from splatco_tpu.utils.math import build_covariance

NEAR_CLIP = 0.2
LOWPASS = 0.3


class ProjectedGaussians(NamedTuple):
    """Per-gaussian screen-space quantities (all [N, ...]).  AoS layout —
    used by the dense oracle and tests; the hot path uses ProjectedCols
    (on TPU a materialized [N, 2..3] f32 array pads its minor dim to 128
    lanes, a 40-60x memory blow-up per intermediate)."""
    means2d: jax.Array   # [N,2] pixel coords
    depths: jax.Array    # [N] view-space z
    conics: jax.Array    # [N,3] upper-tri of inverse cov2d (a, b, c)
    radii: jax.Array     # [N] int32, 0 => culled
    p_view_z: jax.Array  # [N] raw view z (pre near-cull)


class ProjectedCols(NamedTuple):
    """SoA screen-space quantities: seven independent [N] f32 columns.
    The TPU-native layout — every column tiles (8,128) with zero padding
    waste, and XLA fuses the columnwise EWA math into a couple of
    elementwise kernels (the AoS path measured ~39 ms vs ~3 ms at 512k
    gaussians on v5e purely from padded-layout traffic)."""
    mx: jax.Array      # [N] pixel x
    my: jax.Array      # [N] pixel y
    depth: jax.Array   # [N] view z
    ca: jax.Array      # [N] conic a
    cb: jax.Array      # [N] conic b
    cc: jax.Array      # [N] conic c
    radius: jax.Array  # [N] f32, 0 => culled


def cols_of(proj: ProjectedGaussians) -> ProjectedCols:
    return ProjectedCols(
        mx=proj.means2d[:, 0], my=proj.means2d[:, 1], depth=proj.depths,
        ca=proj.conics[:, 0], cb=proj.conics[:, 1], cc=proj.conics[:, 2],
        radius=proj.radii.astype(jnp.float32))


def aos_of(cols: ProjectedCols) -> ProjectedGaussians:
    return ProjectedGaussians(
        means2d=jnp.stack([cols.mx, cols.my], axis=1),
        depths=cols.depth,
        conics=jnp.stack([cols.ca, cols.cb, cols.cc], axis=1),
        radii=cols.radius.astype(jnp.int32),
        p_view_z=cols.depth)


def project(means3d, cov3d, viewmatrix, projmatrix, image_width: int,
            image_height: int, tan_fovx: float, tan_fovy: float
            ) -> ProjectedGaussians:
    """EWA-project 3D gaussians to screen space.

    Args:
      means3d: [N,3] world positions.
      cov3d:   [N,3,3] world-space covariance (Sigma = R S^2 R^T).
      viewmatrix / projmatrix: [4,4] transposed world->view / full (view@proj).
    """
    n = means3d.shape[0]
    focal_x = image_width / (2.0 * tan_fovx)
    focal_y = image_height / (2.0 * tan_fovy)

    hi = "highest"  # TPU default matmul precision (bf16) is too coarse here
    ones = jnp.ones((n, 1), dtype=means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=-1)

    p_view = jnp.matmul(hom, viewmatrix, precision=hi)  # [N,4]
    tz = p_view[:, 2]
    in_front = tz > NEAR_CLIP

    p_hom = jnp.matmul(hom, projmatrix, precision=hi)
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]

    # EWA with frustum clamp on the view-space point used for the Jacobian.
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    safe_z = jnp.where(jnp.abs(tz) < 1e-8, 1e-8, tz)
    txtz = p_view[:, 0] / safe_z
    tytz = p_view[:, 1] / safe_z
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    inv_z = 1.0 / safe_z
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            jnp.stack([focal_x * inv_z, zeros, -focal_x * tx * inv_z2], -1),
            jnp.stack([zeros, focal_y * inv_z, -focal_y * ty * inv_z2], -1),
            jnp.stack([zeros, zeros, zeros], -1),
        ],
        axis=-2,
    )  # [N,3,3]
    W = viewmatrix[:3, :3].T  # world->cam rotation (v_cam = W @ v_world)
    T = jnp.matmul(J, W[None], precision=hi)
    cov2d = jnp.matmul(
        jnp.matmul(T, cov3d, precision=hi),
        jnp.swapaxes(T, -1, -2), precision=hi)[:, :2, :2]
    cov00 = cov2d[:, 0, 0] + LOWPASS
    cov01 = cov2d[:, 0, 1]
    cov11 = cov2d[:, 1, 1] + LOWPASS

    det = cov00 * cov11 - cov01 * cov01
    det_ok = det != 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conics = jnp.stack([cov11 * inv_det, -cov01 * inv_det, cov00 * inv_det],
                       axis=-1)

    mid = 0.5 * (cov00 + cov11)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    means2d = jnp.stack(
        [((p_proj[:, 0] + 1.0) * image_width - 1.0) * 0.5,
         ((p_proj[:, 1] + 1.0) * image_height - 1.0) * 0.5],
        axis=-1,
    )

    # On-screen test: does the radius-r square overlap the image at all?
    on_screen = (
        (means2d[:, 0] + radius_f > 0)
        & (means2d[:, 0] - radius_f < image_width)
        & (means2d[:, 1] + radius_f > 0)
        & (means2d[:, 1] - radius_f < image_height)
    )

    visible = in_front & det_ok & on_screen
    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    return ProjectedGaussians(
        means2d=means2d, depths=tz, conics=conics, radii=radii, p_view_z=tz
    )


def covariance_cols(scales, quats):
    """Sigma = R diag(s^2) R^T as 6 column arrays (xx,xy,xz,yy,yz,zz),
    computed entirely on [N] columns — [N,3,3] batched matmuls force
    pathological padded layouts on TPU (~30ms at 500k vs ~1ms this way)."""
    s0, s1, s2 = scales[:, 0], scales[:, 1], scales[:, 2]
    n = jnp.sqrt(quats[:, 0] ** 2 + quats[:, 1] ** 2 + quats[:, 2] ** 2
                 + quats[:, 3] ** 2)
    n = jnp.maximum(n, 1e-12)
    w, x, y, z = (quats[:, i] / n for i in range(4))
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    v0, v1, v2 = s0 * s0, s1 * s1, s2 * s2

    def sig(ra, rb, rc, qa, qb, qc):
        return v0 * ra * qa + v1 * rb * qb + v2 * rc * qc

    xx = sig(r00, r01, r02, r00, r01, r02)
    xy = sig(r00, r01, r02, r10, r11, r12)
    xz = sig(r00, r01, r02, r20, r21, r22)
    yy = sig(r10, r11, r12, r10, r11, r12)
    yz = sig(r10, r11, r12, r20, r21, r22)
    zz = sig(r20, r21, r22, r20, r21, r22)
    return xx, xy, xz, yy, yz, zz


def project_cols(means3d, cov6, viewmatrix, projmatrix, image_width: int,
                 image_height: int, tan_fovx: float, tan_fovy: float
                 ) -> ProjectedCols:
    """Columnwise EWA projection — identical math to `project` but with no
    [N,3,3] or [N,small] intermediates (TPU layout friendly).  `cov6` is
    the 6-column covariance from covariance_cols.  Returns SoA columns."""
    px_, py_, pz_ = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    focal_x = image_width / (2.0 * tan_fovx)
    focal_y = image_height / (2.0 * tan_fovy)
    vm = viewmatrix
    pm = projmatrix

    def xform(m, col):
        return (px_ * m[0, col] + py_ * m[1, col] + pz_ * m[2, col]
                + m[3, col])

    tx_v = xform(vm, 0)
    ty_v = xform(vm, 1)
    tz = xform(vm, 2)
    in_front = tz > NEAR_CLIP

    hx = xform(pm, 0)
    hy = xform(pm, 1)
    hw = xform(pm, 3)
    p_w = 1.0 / (hw + 1e-7)

    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    safe_z = jnp.where(jnp.abs(tz) < 1e-8, 1e-8, tz)
    tx = jnp.clip(tx_v / safe_z, -limx, limx) * tz
    ty = jnp.clip(ty_v / safe_z, -limy, limy) * tz
    inv_z = 1.0 / safe_z
    inv_z2 = inv_z * inv_z

    # M = J @ W rows (W = world->cam rotation = viewmatrix[:3,:3]^T, i.e.
    # W[r][c] = vm[c, r]):  M0 = (fx/z) W0 - (fx tx/z^2) W2,
    #                       M1 = (fy/z) W1 - (fy ty/z^2) W2
    a0 = focal_x * inv_z
    a2 = -focal_x * tx * inv_z2
    b1 = focal_y * inv_z
    b2 = -focal_y * ty * inv_z2
    m00 = a0 * vm[0, 0] + a2 * vm[0, 2]
    m01 = a0 * vm[1, 0] + a2 * vm[1, 2]
    m02 = a0 * vm[2, 0] + a2 * vm[2, 2]
    m10 = b1 * vm[0, 1] + b2 * vm[0, 2]
    m11 = b1 * vm[1, 1] + b2 * vm[1, 2]
    m12 = b1 * vm[2, 1] + b2 * vm[2, 2]

    xx, xy, xz, yy, yz, zz = cov6

    def quad(u0, u1, u2, w0, w1, w2):
        return (u0 * (xx * w0 + xy * w1 + xz * w2)
                + u1 * (xy * w0 + yy * w1 + yz * w2)
                + u2 * (xz * w0 + yz * w1 + zz * w2))

    cov00 = quad(m00, m01, m02, m00, m01, m02) + LOWPASS
    cov01 = quad(m00, m01, m02, m10, m11, m12)
    cov11 = quad(m10, m11, m12, m10, m11, m12) + LOWPASS

    det = cov00 * cov11 - cov01 * cov01
    det_ok = det != 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic_a = cov11 * inv_det
    conic_b = -cov01 * inv_det
    conic_c = cov00 * inv_det

    mid = 0.5 * (cov00 + cov11)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    mx = ((hx * p_w + 1.0) * image_width - 1.0) * 0.5
    my = ((hy * p_w + 1.0) * image_height - 1.0) * 0.5
    on_screen = ((mx + radius_f > 0) & (mx - radius_f < image_width)
                 & (my + radius_f > 0) & (my - radius_f < image_height))
    visible = in_front & det_ok & on_screen
    radius = jnp.where(visible, radius_f, 0.0)
    return ProjectedCols(mx=mx, my=my, depth=tz, ca=conic_a, cb=conic_b,
                         cc=conic_c, radius=radius)


def project_from_camera(means3d, cov3d, camera) -> ProjectedGaussians:
    return project(
        means3d, cov3d,
        camera.world_view_transform, camera.full_proj_transform,
        camera.image_width, camera.image_height,
        camera.tan_fovx, camera.tan_fovy,
    )


def project_gaussians_cols(means3d, scales, quats, camera
                           ) -> ProjectedCols:
    """Fast path: scales/quats -> covariance columns -> columnwise EWA."""
    cov6 = covariance_cols(scales, quats)
    return project_cols(
        means3d, cov6,
        camera.world_view_transform, camera.full_proj_transform,
        camera.image_width, camera.image_height,
        camera.tan_fovx, camera.tan_fovy,
    )


def visible_filter(means3d, scales, quats, camera) -> jax.Array:
    """Frustum/extent cull without shading — the fork-only
    `rasterizer.visible_filter` (prefilter_voxel).  Returns bool [N]."""
    proj = jax.lax.stop_gradient(
        project_gaussians_cols(means3d, scales, quats, camera))
    return proj.radius > 0


def tile_rect(means2d, radii, tile_size: int, tiles_x: int, tiles_y: int):
    """Per-gaussian tile-rect [N,4] = (x0, y0, x1, y1), exclusive upper, in
    tile units.  Mirrors CUDA getRect: clamped to the grid; an empty rect
    (x0>=x1 or y0>=y1) means the gaussian touches no tile."""
    r = radii.astype(means2d.dtype)[:, None]
    lo = means2d - r
    hi = means2d + r
    x0 = jnp.clip(jnp.floor(lo[:, 0] / tile_size), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(lo[:, 1] / tile_size), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(hi[:, 0] / tile_size), 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil(hi[:, 1] / tile_size), 0, tiles_y).astype(jnp.int32)
    return jnp.stack([x0, y0, x1, y1], axis=-1)
