"""Pallas rasterizer vs dense oracle — runs in interpret mode on CPU.

The same comparison runs against the real TPU in bench/verify scripts; this
keeps the correctness contract in CI on any host.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from splatco_tpu.data.cameras import look_at_camera
from splatco_tpu.ops.projection import project_from_camera
from splatco_tpu.ops.rasterize import rasterize
from splatco_tpu.ops.rasterize_reference import rasterize_dense
from splatco_tpu.utils.math import build_covariance


def make_scene(n=128, seed=0, h=64, w=96):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32) * 0.6
    scales = (0.02 + 0.1 * rng.uniform(size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    colors = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32))
    cam = look_at_camera([0, 0, -3.0], [0, 0, 0], [0, -1, 0],
                         1.0, 1.0 * h / w, w, h)
    cov3d = build_covariance(jnp.asarray(scales), jnp.asarray(quats))
    proj = project_from_camera(jnp.asarray(means), cov3d, cam)
    return proj, colors, opac, cam


def test_pallas_forward_matches_oracle():
    h, w = 64, 96
    proj, colors, opac, cam = make_scene(h=h, w=w)
    bg = jnp.asarray([0.2, 0.3, 0.4], jnp.float32)
    img_ref, _ = rasterize_dense(proj, colors, opac, bg, h, w,
                                 chunk=64, tile_size=32)
    with pltpu.force_tpu_interpret_mode():
        img_pal = rasterize(proj, colors, opac, bg, h, w)
    np.testing.assert_allclose(np.asarray(img_pal), np.asarray(img_ref),
                               atol=1e-5)


def test_pallas_backward_matches_oracle():
    h, w = 32, 64
    proj, colors, opac, cam = make_scene(n=96, seed=1, h=h, w=w)
    bg = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    rng = np.random.default_rng(2)
    gimg = jnp.asarray(rng.normal(size=(3, h, w)), jnp.float32)

    def loss_dense(m2d, con, col, op, bgv):
        p = proj._replace(means2d=m2d, conics=con)
        img, _ = rasterize_dense(p, col, op, bgv, h, w, chunk=64,
                                 tile_size=32)
        return jnp.sum(img * gimg)

    def loss_pal(m2d, con, col, op, bgv):
        p = proj._replace(means2d=m2d, conics=con)
        img = rasterize(p, col, op, bgv, h, w)
        return jnp.sum(img * gimg)

    args = (proj.means2d, proj.conics, colors, opac, bg)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(*args)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(["means2d", "conics", "colors", "opac", "bg"],
                          gd, gp):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        err = np.abs(a - b).max() / scale
        assert err < 5e-4, (name, err)


def _suggest_spec(proj, colors, opac, h, w, **kw):
    from splatco_tpu.ops.rasterize import suggest_class_spec

    return suggest_class_spec(proj, colors, opac, h, w, **kw)


def test_classed_forward_matches_oracle():
    """Class-packed binning path: same image as the dense oracle."""
    h, w = 64, 96
    proj, colors, opac, cam = make_scene(h=h, w=w)
    bg = jnp.asarray([0.2, 0.3, 0.4], jnp.float32)
    img_ref, _ = rasterize_dense(proj, colors, opac, bg, h, w,
                                 chunk=64, tile_size=32)
    spec = _suggest_spec(proj, colors, opac, h, w)
    with pltpu.force_tpu_interpret_mode():
        img_cls, aux = rasterize(proj, colors, opac, bg, h, w,
                                 class_spec=spec, return_aux=True)
    assert int(aux["num_overflow"]) == 0
    assert int(aux["class_counts"].sum()) == proj.means2d.shape[0]
    np.testing.assert_allclose(np.asarray(img_cls), np.asarray(img_ref),
                               atol=1e-5)


def test_classed_backward_matches_oracle():
    h, w = 32, 64
    proj, colors, opac, cam = make_scene(n=96, seed=1, h=h, w=w)
    bg = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    rng = np.random.default_rng(2)
    gimg = jnp.asarray(rng.normal(size=(3, h, w)), jnp.float32)
    spec = _suggest_spec(proj, colors, opac, h, w)

    def loss_dense(m2d, con, col, op, bgv):
        p = proj._replace(means2d=m2d, conics=con)
        img, _ = rasterize_dense(p, col, op, bgv, h, w, chunk=64,
                                 tile_size=32)
        return jnp.sum(img * gimg)

    def loss_cls(m2d, con, col, op, bgv):
        p = proj._replace(means2d=m2d, conics=con)
        img = rasterize(p, col, op, bgv, h, w, class_spec=spec)
        return jnp.sum(img * gimg)

    args = (proj.means2d, proj.conics, colors, opac, bg)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(*args)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_cls, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(["means2d", "conics", "colors", "opac", "bg"],
                          gd, gp):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        err = np.abs(a - b).max() / scale
        assert err < 5e-4, (name, err)


def test_classed_overflow_counts_and_gates():
    """Deliberately undersized class budgets: overflow counter fires and
    the backward gates (no NaNs, grads finite)."""
    h, w = 32, 64
    proj, colors, opac, cam = make_scene(n=96, seed=3, h=h, w=w)
    bg = jnp.zeros(3, jnp.float32)
    n = proj.means2d.shape[0]
    # tiny mid-class budgets force drops, but sum(B) >= N stays satisfied
    spec = ((1, 8), (2, 8), (12, n))
    gimg = jnp.ones((3, h, w), jnp.float32)

    def loss(m2d, col):
        p = proj._replace(means2d=m2d)
        img = rasterize(p, col, opac, bg, h, w, class_spec=spec)
        return jnp.sum(img * gimg)

    with pltpu.force_tpu_interpret_mode():
        _, aux = rasterize(proj, colors, opac, bg, h, w, class_spec=spec,
                           return_aux=True)
        g = jax.grad(loss, argnums=(0, 1))(proj.means2d, colors)
    assert int(aux["num_overflow"]) > 0
    for arr in g:
        assert np.isfinite(np.asarray(arr)).all()
