"""Validate the chunked dense compositor against a literal per-pixel loop."""
import jax
import jax.numpy as jnp
import numpy as np

from splatco_tpu.data.cameras import look_at_camera
from splatco_tpu.ops.projection import project_from_camera, tile_rect
from splatco_tpu.ops.rasterize_reference import rasterize_dense
from splatco_tpu.utils.math import build_covariance


def make_scene(n=60, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    scales = (0.02 + 0.12 * rng.uniform(size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)
    return means, scales, quats, colors, opac


def make_cam(h=33, w=47):
    return look_at_camera(
        eye=[0, 0, -3.0], target=[0, 0, 0], up=[0, -1, 0],
        fovx=1.0, fovy=1.0 * h / w, width=w, height=h)


def brute_force(proj, colors, opac, bg, h, w, tile_size=None):
    """Direct translation of the CUDA per-pixel loop (numpy, slow)."""
    means2d = np.asarray(proj.means2d)
    conics = np.asarray(proj.conics)
    depths = np.asarray(proj.depths)
    radii = np.asarray(proj.radii)
    colors = np.asarray(colors)
    opac = np.asarray(opac)
    order = np.argsort(np.where(radii > 0, depths, np.inf), kind="stable")
    img = np.zeros((3, h, w), np.float32)
    if tile_size is not None:
        tx = -(-w // tile_size)
        ty = -(-h // tile_size)
        rects = np.asarray(tile_rect(jnp.asarray(means2d),
                                     jnp.asarray(radii), tile_size, tx, ty))
    for py in range(h):
        for px in range(w):
            T = 1.0
            C = np.zeros(3, np.float32)
            for gi in order:
                if radii[gi] <= 0:
                    continue
                if tile_size is not None:
                    r = rects[gi]
                    if not (r[0] <= px // tile_size < r[2]
                            and r[1] <= py // tile_size < r[3]):
                        continue
                dx = means2d[gi, 0] - px
                dy = means2d[gi, 1] - py
                a, b, c = conics[gi]
                power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                if power > 0:
                    continue
                alpha = min(0.99, opac[gi] * np.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                test_T = T * (1 - alpha)
                if test_T < 1e-4:
                    break
                C += colors[gi] * alpha * T
                T = test_T
            img[:, py, px] = C + bg * T
    return img


def test_dense_matches_brute_force():
    means, scales, quats, colors, opac = make_scene()
    cam = make_cam()
    cov3d = build_covariance(jnp.asarray(scales), jnp.asarray(quats))
    proj = project_from_camera(jnp.asarray(means), cov3d, cam)
    bg = np.array([1.0, 1.0, 1.0], np.float32)
    img, final_t = rasterize_dense(
        proj, jnp.asarray(colors), jnp.asarray(opac), jnp.asarray(bg),
        cam.image_height, cam.image_width, chunk=16)
    ref = brute_force(proj, colors, opac, bg, cam.image_height,
                      cam.image_width)
    np.testing.assert_allclose(np.asarray(img), ref, atol=2e-5)
    assert np.all(np.asarray(final_t) <= 1.0)


def test_dense_matches_brute_force_tiled():
    means, scales, quats, colors, opac = make_scene(seed=3)
    cam = make_cam(h=32, w=64)
    cov3d = build_covariance(jnp.asarray(scales), jnp.asarray(quats))
    proj = project_from_camera(jnp.asarray(means), cov3d, cam)
    bg = np.zeros(3, np.float32)
    img, _ = rasterize_dense(
        proj, jnp.asarray(colors), jnp.asarray(opac), jnp.asarray(bg),
        cam.image_height, cam.image_width, chunk=32, tile_size=16)
    ref = brute_force(proj, colors, opac, bg, cam.image_height,
                      cam.image_width, tile_size=16)
    np.testing.assert_allclose(np.asarray(img), ref, atol=2e-5)


def test_dense_grad_flows():
    means, scales, quats, colors, opac = make_scene(n=20, seed=1)
    cam = make_cam(h=16, w=16)
    bg = jnp.zeros(3)

    def loss_fn(means, scales, quats, colors, opac):
        cov3d = build_covariance(scales, quats)
        proj = project_from_camera(means, cov3d, cam)
        img, _ = rasterize_dense(proj, colors, opac, bg, 16, 16, chunk=8)
        return jnp.sum(img**2)

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(colors), jnp.asarray(opac))
    total = sum(float(jnp.sum(jnp.abs(g))) for g in grads)
    assert np.isfinite(total) and total > 0
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
