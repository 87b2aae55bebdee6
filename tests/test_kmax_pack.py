"""kmax_pack slot-budget coverage (ADVICE r01): packed vs unpacked
equivalence, overflow counting, suggestion rounding, and the default-config
(appearance_dim=32) render path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from splatco_tpu.data.cameras import look_at_camera
from splatco_tpu.ops.projection import project_from_camera
from splatco_tpu.ops.rasterize import (rasterize, round_kmax_pack,
                                       suggest_kmax_pack)
from splatco_tpu.ops.rasterize_reference import rasterize_dense
from splatco_tpu.utils.math import build_covariance


def make_scene(n=128, seed=0, h=64, w=96, spread=0.6, smin=0.02, smax=0.12):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32) * spread
    scales = (smin + (smax - smin)
              * rng.uniform(size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    colors = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32))
    cam = look_at_camera([0, 0, -3.0], [0, 0, 0], [0, -1, 0],
                         1.0, 1.0 * h / w, w, h)
    cov3d = build_covariance(jnp.asarray(scales), jnp.asarray(quats))
    proj = project_from_camera(jnp.asarray(means), cov3d, cam)
    return proj, colors, opac, cam


@pytest.mark.parametrize("kmax_pack", [None, 4, 8])
def test_packed_matches_unpacked_no_overflow(kmax_pack):
    """With a sufficient pack budget the image AND gradients are identical
    to the unpacked path (the left-pack sort preserves tile order)."""
    h, w = 64, 96
    # small gaussians -> few tiles each, so kp=4 is already safe
    proj, colors, opac, cam = make_scene(h=h, w=w, smax=0.05)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    gimg = jnp.asarray(
        np.random.default_rng(5).normal(size=(3, h, w)), jnp.float32)

    def loss(m2d, col, op, kp):
        p = proj._replace(means2d=m2d)
        img, aux = rasterize(p, col, op, bg, h, w, kmax_pack=kp,
                             return_aux=True)
        return jnp.sum(img * gimg), aux

    with pltpu.force_tpu_interpret_mode():
        (l_ref, aux_ref), g_ref = jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True)(
            proj.means2d, colors, opac, None)
        (l_p, aux_p), g_p = jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True)(
            proj.means2d, colors, opac, kmax_pack)
    assert int(aux_p["num_overflow"]) == 0
    np.testing.assert_allclose(float(l_p), float(l_ref), rtol=1e-6)
    for a, b in zip(g_p, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_overflow_counter_fires_and_image_close():
    """A pack budget below max_slots trips num_overflow; the packed image
    drops the overflowed tails but stays finite."""
    h, w = 64, 96
    # big gaussians covering many tiles
    proj, colors, opac, cam = make_scene(n=64, h=h, w=w, smin=0.2, smax=0.5)
    bg = jnp.zeros(3, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        img_full, aux_full = rasterize(proj, colors, opac, bg, h, w,
                                       return_aux=True)
        img_p, aux_p = rasterize(proj, colors, opac, bg, h, w, kmax_pack=1,
                                 return_aux=True)
    assert int(aux_full["num_overflow"]) == 0
    assert int(aux_full["max_slots"]) > 1
    assert int(aux_p["num_overflow"]) > 0
    assert np.all(np.isfinite(np.asarray(img_p)))


def test_round_kmax_pack_alignment():
    # n=96: 96*kp % 64 == 0 requires kp multiple of 2 (96*2=192 -> 192%64=0)
    assert round_kmax_pack(96, 1, 12, chunk=64) == 2
    assert round_kmax_pack(96, 3, 12, chunk=64) == 4
    # n multiple of chunk: any kp valid
    assert round_kmax_pack(128, 5, 12, chunk=64) == 5
    # cap at kmax
    assert round_kmax_pack(96, 11, 12, chunk=64) == 12


def test_suggest_kmax_pack_usable():
    """The suggested value must satisfy the binner's alignment assert on
    first use (ADVICE low #2)."""
    h, w = 64, 96
    proj, colors, opac, cam = make_scene(n=96, h=h, w=w)
    kp = suggest_kmax_pack(proj, colors, opac, h, w)
    n = proj.means2d.shape[0]
    if kp < 12:
        assert (n * kp) % 64 == 0
    bg = jnp.zeros(3, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        img, aux = rasterize(proj, colors, opac, bg, h, w, kmax_pack=kp,
                             return_aux=True)
    assert int(aux["num_overflow"]) == 0
    assert np.all(np.isfinite(np.asarray(img)))


def test_default_config_render_with_appearance():
    """ModelConfig() defaults (appearance_dim=32) must decode and render
    (VERDICT r01 missing #3; reference scene/embedding.py:53-81)."""
    from splatco_tpu.config import ModelConfig
    from splatco_tpu.models.renderer import prefilter_voxel, render
    from splatco_tpu.models.splatco import decode_kwargs, init_model

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(128, 3)).astype(np.float32) * 0.4
    cfg = ModelConfig(feat_dim=8, n_offsets=4, voxel_size=0.05,
                      plane_size=32, num_channels=9)  # appearance_dim=32
    assert cfg.appearance_dim == 32
    params, state = init_model(jax.random.key(0), cfg, pts, num_cameras=3)
    assert "appearance" in params["decoders"]
    cam = look_at_camera([0, 0, -3.0], [0, 0, 0], [0, -1, 0], 1.0, 0.75,
                         96, 64, uid=1)
    bg = jnp.zeros(3, jnp.float32)
    vis = prefilter_voxel(params["anchors"], state.active, cam)
    out = render(params, state.active, state.contractor, cam, bg,
                 visible_mask=vis, activate_level=0, is_training=False,
                 backend="dense", **decode_kwargs(cfg))
    assert np.all(np.isfinite(np.asarray(out.image)))
