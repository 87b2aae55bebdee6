"""v3 rasterizer (16x16 subtiles, element-granular segments) vs the dense
oracle — image + full gradient set, interpret mode on CPU (hardware
exactness is tools/verify_tpu.py --v3)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from splatco_tpu.data.cameras import look_at_camera
from splatco_tpu.ops.projection import project_from_camera
from splatco_tpu.ops.rasterize import rasterize
from splatco_tpu.ops.rasterize_reference import rasterize_dense
from splatco_tpu.utils.math import build_covariance


def _scene(n=512, h=96, w=128, seed=3):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.8)
    scales = jnp.asarray(
        (0.01 + 0.25 * rng.uniform(size=(n, 3)) ** 4).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    colors = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    opac = jnp.asarray(
        rng.uniform(0.2, 0.99, size=(n,)).astype(np.float32))
    bg = jnp.asarray([0.15, 0.25, 0.35], jnp.float32)
    cam = look_at_camera([0, 0, -3.0], [0, 0, 0], [0, -1, 0],
                         1.1, 1.1 * h / w, w, h)
    cov3d = build_covariance(scales, quats)
    proj = project_from_camera(means, cov3d, cam)
    return proj, colors, opac, bg, cam


@pytest.mark.parametrize("h,w", [(96, 128), (80, 112)])
def test_v3_image_matches_dense(h, w):
    proj, colors, opac, bg, _ = _scene(h=h, w=w)
    # kmax=32: the scene's largest splats span up to ~25 16px tiles in
    # their bounding rect; a smaller budget trips rect clipping (fringe
    # drop the dense oracle doesn't model — the trainer auto-escalates)
    img_v3 = rasterize(proj, colors, opac, bg, h, w, kmax=32,
                       tile16=True)
    # tile_size=16: v3 adopts the reference CUDA block size (16x16), so
    # fringe membership (radius-rect x tile intersection) is compared at
    # the SAME granularity
    img_d, _ = rasterize_dense(proj, colors, opac, bg, h, w,
                               tile_size=16)
    err = float(jnp.abs(img_v3 - img_d).max())
    assert err < 1e-4, err


def test_v3_grads_match_dense():
    h, w = 96, 128
    proj, colors, opac, bg, _ = _scene(h=h, w=w)
    gimg = jnp.asarray(
        np.random.default_rng(5).normal(size=(3, h, w)), jnp.float32)

    def loss_v3(m2d, con, col, op, bgv):
        p = proj._replace(means2d=m2d, conics=con)
        return jnp.sum(rasterize(p, col, op, bgv, h, w, kmax=32,
                                 tile16=True) * gimg)

    def loss_d(m2d, con, col, op, bgv):
        p = proj._replace(means2d=m2d, conics=con)
        img, _ = rasterize_dense(p, col, op, bgv, h, w, tile_size=16)
        return jnp.sum(img * gimg)

    args = (proj.means2d, proj.conics, colors, opac, bg)
    gv = jax.grad(loss_v3, argnums=(0, 1, 2, 3, 4))(*args)
    gd = jax.grad(loss_d, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(("means2d", "conics", "colors", "opac", "bg"),
                          gv, gd):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        err = np.abs(a - b).max() / scale
        assert err < 5e-4, (name, err)


def test_v3_classed_spec_matches_measuring():
    """A tight class_spec must reproduce the measuring path exactly."""
    h, w = 96, 128
    proj, colors, opac, bg, _ = _scene(h=h, w=w)
    img_m, aux = rasterize(proj, colors, opac, bg, h, w, kmax=16,
                           tile16=True, return_aux=True)
    from splatco_tpu.ops.binning import KPS_DEFAULT, spec_from_counts

    kmax16 = 16  # v3 kmax is the literal 16px tile budget
    kps = tuple(k for k in KPS_DEFAULT if k < kmax16) + (kmax16,)
    n = colors.shape[0]
    spec = spec_from_counts(np.asarray(aux["class_counts"]), kps, n, 1.2)
    img_c, aux_c = rasterize(proj, colors, opac, bg, h, w, kmax=16,
                             tile16=True, class_spec=spec,
                             return_aux=True)
    assert int(aux_c["num_overflow"]) == 0
    err = float(jnp.abs(img_c - img_m).max())
    assert err < 1e-6, err
