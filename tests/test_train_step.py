"""Training-step integration: loss must decrease on a toy scene."""
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from splatco_tpu.config import ModelConfig, OptimizationConfig
from splatco_tpu.data.cameras import look_at_camera
from splatco_tpu.models.renderer import prefilter_voxel, render
from splatco_tpu.models.splatco import decode_kwargs, init_model
from splatco_tpu.train.optimizer import make_optimizer
from splatco_tpu.train.step import init_stats, make_train_step


def build_toy():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(300, 3)).astype(np.float32) * 0.4
    cfg = ModelConfig(feat_dim=16, n_offsets=4, voxel_size=0.05,
                      plane_size=64, num_channels=9, appearance_dim=0,
                      contractor=True, scene_center=[0, 0, 0],
                      scene_length=[2, 2, 2])
    params, state = init_model(jax.random.key(0), cfg, pts)
    h, w = 48, 64
    cams = [
        look_at_camera(eye, [0, 0, 0], [0, -1, 0], 1.0, 1.0 * h / w, w, h,
                       uid=i)
        for i, eye in enumerate([[0, 0, -3], [0.5, 0.3, -2.8]])
    ]
    # ground truth = render of the INITIAL model with shifted colors, so a
    # few steps of fitting is achievable; simpler: constant-color targets
    gts = jnp.stack([jnp.full((3, h, w), 0.6), jnp.full((3, h, w), 0.4)])
    return cfg, params, state, cams, gts


@pytest.mark.slow
def test_loss_decreases():
    cfg, params, state, cams, gts = build_toy()
    opt = OptimizationConfig()
    tx = make_optimizer(opt, params, spatial_lr_scale=1.0, activate_level=0)
    opt_state = tx.init(params)
    stats = init_stats(params["anchors"]["anchor"].shape[0], cfg.n_offsets)
    step = make_train_step(cfg, opt, mv=2, activate_level=0, tx=tx,
                           backend="dense")
    bg = jnp.zeros(3)
    losses = []
    key = jax.random.key(1)
    for it in range(8):
        key, sub = jax.random.split(key)
        params, opt_state, stats, metrics = step(
            params, opt_state, state.active, state.contractor, stats,
            tuple(cams), gts, bg, sub, jnp.int32(it), jnp.float32(0.0),
            jnp.float32(0.0), jnp.float32(1.0))
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    # stats accumulated
    assert float(stats.anchor_demon.sum()) > 0
    assert float(stats.offset_denom.sum()) > 0


def test_consistency_and_tv_terms_finite():
    cfg, params, state, cams, gts = build_toy()
    opt = OptimizationConfig()
    tx = make_optimizer(opt, params, 1.0, 0)
    opt_state = tx.init(params)
    stats = init_stats(params["anchors"]["anchor"].shape[0], cfg.n_offsets)
    step = make_train_step(cfg, opt, mv=2, activate_level=0, tx=tx,
                           backend="dense")
    bg = jnp.zeros(3)
    params, opt_state, stats, metrics = step(
        params, opt_state, state.active, state.contractor, stats,
        tuple(cams), gts, bg, jax.random.key(2), jnp.int32(100),
        jnp.float32(1.0), jnp.float32(4e-7), jnp.float32(1.0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["con"]))


@pytest.mark.slow
def test_mixed_resolution_views():
    """Two views of different resolutions in one SVC step: the reference
    crop-aligns unequal views for the consistency loss (align_images,
    train.py:79-96); here each view renders at its native size and the
    consistency pairs crop to the common window."""
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(200, 3)).astype(np.float32) * 0.4
    cfg = ModelConfig(feat_dim=8, n_offsets=4, voxel_size=0.05,
                      plane_size=32, num_channels=9, appearance_dim=0,
                      contractor=True, scene_center=[0, 0, 0],
                      scene_length=[2, 2, 2])
    params, state = init_model(jax.random.key(0), cfg, pts)
    cams = [
        look_at_camera([0, 0, -3], [0, 0, 0], [0, -1, 0], 1.0, 0.75,
                       64, 48, uid=0),
        look_at_camera([0.5, 0.3, -2.8], [0, 0, 0], [0, -1, 0], 1.0, 1.0,
                       96, 96, uid=1),
    ]
    gts = (jnp.full((3, 48, 64), 0.6), jnp.full((3, 96, 96), 0.4))
    opt = OptimizationConfig()
    tx = make_optimizer(opt, params, spatial_lr_scale=1.0, activate_level=0)
    opt_state = tx.init(params)
    stats = init_stats(params["anchors"]["anchor"].shape[0], cfg.n_offsets)
    step = make_train_step(cfg, opt, mv=2, activate_level=0, tx=tx,
                           backend="dense")
    p, o, s, metrics = step(
        params, opt_state, state.active, state.contractor, stats,
        tuple(cams), gts, jnp.zeros(3), jax.random.key(1), jnp.int32(1),
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["con"]))
    # stats flowed for the (last) 96x96 view
    assert float(jnp.sum(s.anchor_demon)) > 0
