"""Tile-rect clipping safety net (ops/binning.py _rects): when a gaussian
covers more than kmax tiles its rect is shrunk to the central kmax —
these tests fire that path deliberately, bound the image error against
the unclipped dense oracle, and check the counter surfaces."""
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


def clipping_scene(h=128, w=192, n_small=61):
    """A few huge gaussians (rects >> kmax tiles) over a bed of small
    ones."""
    rng = np.random.default_rng(7)
    means = rng.normal(size=(n_small + 3, 3)).astype(np.float32) * 0.5
    scales = (0.02 + 0.05 * rng.uniform(size=(n_small + 3, 3))
              ).astype(np.float32)
    # the big three: sigma large enough that the 3-sigma rect spans the
    # whole image (4x3 tiles > kmax=12 after the reach test at high op)
    means[:3] = [[0, 0, 0], [0.3, 0.2, 0.4], [-0.4, -0.1, 0.2]]
    scales[:3] = 0.9
    quats = rng.normal(size=(n_small + 3, 4)).astype(np.float32)
    colors = jnp.asarray(rng.uniform(size=(n_small + 3, 3)
                                     ).astype(np.float32))
    opac = np.full((n_small + 3,), 0.6, np.float32)
    opac[:3] = 0.95
    cam = look_at_camera([0, 0, -3.0], [0, 0, 0], [0, -1, 0],
                         1.0, 1.0 * h / w, w, h)
    cov3d = build_covariance(jnp.asarray(scales), jnp.asarray(quats))
    proj = project_from_camera(jnp.asarray(means), cov3d, cam)
    return proj, colors, jnp.asarray(opac), h, w


def test_clipping_fires_and_error_is_bounded():
    proj, colors, opac, h, w = clipping_scene()
    bg = jnp.asarray([0.1, 0.1, 0.1], jnp.float32)
    img_ref, _ = rasterize_dense(proj, colors, opac, bg, h, w,
                                 chunk=64, tile_size=32)
    with pltpu.force_tpu_interpret_mode():
        img, aux = rasterize(proj, colors, opac, bg, h, w,
                             return_aux=True)
    assert int(aux["num_clipped"]) >= 1, "scene must exercise clipping"
    err = np.abs(np.asarray(img) - np.asarray(img_ref))
    # image-filling 0.95-opacity splats are the worst case: the clipped
    # fringe diverges, but the error stays bounded and the central
    # kmax-tile window of each splat is exact
    assert err.mean() < 0.25, err.mean()
    assert err.max() <= 1.0 + 1e-6
    assert (err < 1e-4).mean() > 0.2, (err < 1e-4).mean()

    # raising kmax (the knob the trainer's num_clipped warning points at)
    # removes the clipping and restores exactness
    with pltpu.force_tpu_interpret_mode():
        img24, aux24 = rasterize(proj, colors, opac, bg, h, w, kmax=24,
                                 return_aux=True)
    assert int(aux24["num_clipped"]) == 0
    np.testing.assert_allclose(np.asarray(img24), np.asarray(img_ref),
                               atol=1e-5)


def test_clipping_gradients_stay_finite():
    proj, colors, opac, h, w = clipping_scene()
    bg = jnp.zeros(3, jnp.float32)
    gimg = jnp.ones((3, h, w), jnp.float32)

    def loss(m2d, col, op):
        p = proj._replace(means2d=m2d)
        img = rasterize(p, col, op, bg, h, w)
        return jnp.sum(img * gimg)

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss, argnums=(0, 1, 2))(proj.means2d, colors, opac)
    for arr in g:
        assert np.isfinite(np.asarray(arr)).all()


@pytest.mark.slow
def test_num_clipped_reaches_train_metrics():
    """The clip counter must surface in the training step metrics (the
    trainer warns off it)."""
    from splatco_tpu.config import ModelConfig, OptimizationConfig
    from splatco_tpu.data.cameras import look_at_camera, strip_static
    from splatco_tpu.models.splatco import init_model
    from splatco_tpu.train.optimizer import make_optimizer
    from splatco_tpu.train.step import init_stats, make_train_step

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(128, 3)).astype(np.float32) * 0.4
    cfg = ModelConfig(feat_dim=8, n_offsets=4, voxel_size=0.05,
                      plane_size=32, num_channels=9, appearance_dim=0,
                      contractor=True, scene_center=[0, 0, 0],
                      scene_length=[2, 2, 2])
    params, state = init_model(jax.random.key(0), cfg, pts)
    opt = OptimizationConfig()
    tx = make_optimizer(opt, params, 1.0, 0)
    opt_state = tx.init(params)
    stats = init_stats(params["anchors"]["anchor"].shape[0], cfg.n_offsets)
    h, w = 32, 64
    cams = [strip_static(look_at_camera(
        [np.sin(i), 0.3, -2.0], [0, 0, 0], [0, -1, 0], 1.0,
        1.0 * h / w, w, h, uid=i)) for i in range(2)]
    gts = jnp.asarray(rng.uniform(size=(2, 3, h, w)), jnp.float32)
    step = make_train_step(cfg, opt, mv=2, activate_level=0, tx=tx,
                           backend="pallas")
    with pltpu.force_tpu_interpret_mode():
        _, _, _, metrics = step(
            params, opt_state, state.active, state.contractor, stats,
            tuple(cams), gts, jnp.zeros(3), jax.random.key(1),
            jnp.int32(1), jnp.float32(0.0), jnp.float32(0.0),
            jnp.float32(0.0))
    assert "num_clipped" in metrics
    assert int(metrics["num_clipped"]) >= 0
