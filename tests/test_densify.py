"""Densification / pruning / CVPM unit tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from splatco_tpu.config import ModelConfig, OptimizationConfig
from splatco_tpu.models.splatco import init_model
from splatco_tpu.train.cvpm import cvpm_pair_mask, knn_curvature
from splatco_tpu.train.densify import adjust_anchor
from splatco_tpu.train.optimizer import make_optimizer
from splatco_tpu.train.step import init_stats


def build(n_pts=200):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n_pts, 3)).astype(np.float32) * 0.5
    cfg = ModelConfig(feat_dim=8, n_offsets=4, voxel_size=0.05,
                      plane_size=32, num_channels=9, appearance_dim=0)
    params, state = init_model(jax.random.key(0), cfg, pts)
    opt = OptimizationConfig()
    tx = make_optimizer(opt, params, 1.0, 0)
    opt_state = tx.init(params)
    return cfg, params, state, opt_state


def test_grow_adds_contiguous_anchors():
    cfg, params, state, opt_state = build()
    c = params["anchors"]["anchor"].shape[0]
    k = cfg.n_offsets
    stats = init_stats(c, k)
    n0 = int(state.active.sum())
    # spread offsets so candidate gaussians land in unoccupied voxels
    rng = np.random.default_rng(3)
    params["anchors"]["offsets"] = jnp.asarray(
        rng.normal(size=(c, k, 3)).astype(np.float32) * 8.0)
    # pretend high gradients on active slots -> growth
    stats = dataclasses.replace(
        stats,
        offset_gradient_accum=jnp.full((c * k, 1), 1.0),
        offset_denom=jnp.full((c * k, 1), 100.0),
    )
    res = adjust_anchor(
        params, opt_state, state.active, stats, jax.random.key(1),
        voxel_size=0.05, grad_threshold=jnp.float32(2e-4),
        extra_offset_mask=jnp.zeros((c * k,), bool),
        cvpm_prune=jnp.zeros((c,), bool))
    n1 = int(res.num_active)
    assert int(res.num_grown) > 0
    assert n1 == n0 + int(res.num_grown) - int(res.num_pruned)
    act = np.asarray(res.active)
    # contiguity invariant
    assert act[:n1].all() and not act[n1:].any()
    # new anchors land on voxel-grid positions and are finite
    anc = np.asarray(res.params["anchors"]["anchor"])[:n1]
    assert np.all(np.isfinite(anc))


def test_prune_via_opacity_stats():
    cfg, params, state, opt_state = build()
    c = params["anchors"]["anchor"].shape[0]
    k = cfg.n_offsets
    stats = init_stats(c, k)
    n0 = int(state.active.sum())
    # all anchors well-observed but low opacity -> all pruned
    stats = dataclasses.replace(
        stats,
        opacity_accum=jnp.zeros((c, 1)),
        anchor_demon=jnp.full((c, 1), 1000.0),
    )
    res = adjust_anchor(
        params, opt_state, state.active, stats, jax.random.key(1),
        voxel_size=0.05, grad_threshold=jnp.float32(1e9),
        extra_offset_mask=jnp.zeros((c * k,), bool),
        cvpm_prune=jnp.zeros((c,), bool))
    assert int(res.num_pruned) == n0
    assert int(res.num_active) == 0


def test_scaling_clamped_on_adjust():
    cfg, params, state, opt_state = build()
    c = params["anchors"]["anchor"].shape[0]
    k = cfg.n_offsets
    params["anchors"]["scaling"] = params["anchors"]["scaling"].at[:, 3:].set(
        1.0)
    stats = init_stats(c, k)
    res = adjust_anchor(
        params, opt_state, state.active, stats, jax.random.key(1),
        voxel_size=0.05, grad_threshold=jnp.float32(1e9),
        extra_offset_mask=jnp.zeros((c * k,), bool),
        cvpm_prune=jnp.zeros((c,), bool))
    sc = np.asarray(res.params["anchors"]["scaling"])
    assert sc[:, 3:].max() <= 0.05 + 1e-6


def test_cvpm_prunes_baseline_points():
    anchor = jnp.asarray([[0.0, 0.0, 0.3],    # close to cam1, on baseline
                          [0.0, 0.0, 5.0],    # on baseline, far from cams
                          [3.0, 3.0, 3.0]])   # off-baseline
    active = jnp.ones(3, bool)
    c1 = jnp.asarray([0.0, 0.0, 0.0])
    c2 = jnp.asarray([0.0, 0.0, 10.0])
    m = np.asarray(cvpm_pair_mask(anchor, active, c1, c2,
                                  distance_threshold=0.05))
    assert m[0]          # on both rays & too close to cam1
    assert not m[1]      # on rays but not close/outlier
    assert not m[2]      # off rays


def test_curvature_flat_vs_noise():
    rng = np.random.default_rng(0)
    flat = np.zeros((256, 3), np.float32)
    flat[:, :2] = rng.uniform(-1, 1, size=(256, 2))
    blob = rng.normal(size=(256, 3)).astype(np.float32)
    pts = np.concatenate([flat, blob])
    active = jnp.ones((512,), bool)
    curv = np.asarray(knn_curvature(jnp.asarray(pts), active))
    assert curv[:256].mean() < 0.02      # planar -> near zero curvature
    assert curv[256:].mean() > 0.05      # isotropic blob -> high


def test_segment_run_max_matches_numpy_scatter_max():
    """_segment_run_max vs a numpy scatter_max reference (the reference's
    torch_scatter.scatter_max dedup, gaussian_model.py:897)."""
    from splatco_tpu.train.densify import _segment_run_max

    rng = np.random.default_rng(7)
    s, d = 257, 5
    # random contiguous runs
    first = np.zeros(s, bool)
    first[0] = True
    first[np.sort(rng.choice(np.arange(1, s), size=40, replace=False))] = True
    vals = rng.normal(size=(s, d)).astype(np.float32)

    out = np.asarray(_segment_run_max(jnp.asarray(vals), jnp.asarray(first)))

    seg = np.cumsum(first) - 1
    ref = np.full((seg[-1] + 1, d), -np.inf, np.float32)
    np.maximum.at(ref, seg, vals)  # scatter_max
    starts = np.flatnonzero(first)
    np.testing.assert_allclose(out[starts], ref, rtol=1e-6)


def test_dedup_max_vs_first_mode():
    """dedup_mode='max' (faithful scatter_max representative) grows the
    same anchors as 'first' but with elementwise >= features."""
    cfg, params, state, opt_state = build()
    c = params["anchors"]["anchor"].shape[0]
    k = cfg.n_offsets
    stats = init_stats(c, k)
    rng = np.random.default_rng(3)
    params["anchors"]["offsets"] = jnp.asarray(
        rng.normal(size=(c, k, 3)).astype(np.float32) * 8.0)
    stats = dataclasses.replace(
        stats,
        offset_gradient_accum=jnp.full((c * k, 1), 1.0),
        offset_denom=jnp.full((c * k, 1), 100.0),
    )
    kwargs = dict(voxel_size=0.05, grad_threshold=jnp.float32(2e-4),
                  extra_offset_mask=jnp.zeros((c * k,), bool),
                  cvpm_prune=jnp.zeros((c,), bool))
    res_max = adjust_anchor(params, opt_state, state.active, stats,
                            jax.random.key(1), dedup_mode="max", **kwargs)
    res_first = adjust_anchor(params, opt_state, state.active, stats,
                              jax.random.key(1), dedup_mode="first",
                              **kwargs)
    assert int(res_max.num_grown) == int(res_first.num_grown) > 0
    np.testing.assert_allclose(
        np.asarray(res_max.params["anchors"]["anchor"]),
        np.asarray(res_first.params["anchors"]["anchor"]), atol=1e-6)
    fm = np.asarray(res_max.params["anchors"]["feat"])
    ff = np.asarray(res_first.params["anchors"]["feat"])
    act = np.asarray(res_max.active)
    assert np.all(fm[act] >= ff[act] - 1e-6)
    assert np.any(fm[act] > ff[act] + 1e-6) or np.allclose(fm[act], ff[act])
