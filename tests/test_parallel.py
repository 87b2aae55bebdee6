"""Sharded train step on the 8-device CPU mesh: runs + matches single-dev,
including densification statistics and the Pallas backend (interpret)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

pytestmark = pytest.mark.slow  # 8-virtual-device shard_map compiles
from jax.sharding import NamedSharding, PartitionSpec as P

from splatco_tpu.config import ModelConfig, OptimizationConfig
from splatco_tpu.data.cameras import look_at_camera, strip_static
from splatco_tpu.models.splatco import init_model
from splatco_tpu.parallel.mesh import make_mesh, param_shardings
from splatco_tpu.parallel.train_step import (make_sharded_train_step,
                                             stack_cameras)
from splatco_tpu.train.optimizer import make_optimizer
from splatco_tpu.train.step import init_stats, make_train_step


def build(n_view, n_gauss, h=32, w=64):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(200, 3)).astype(np.float32) * 0.4
    cfg = ModelConfig(feat_dim=16, n_offsets=4, voxel_size=0.05,
                      plane_size=64, num_channels=9, appearance_dim=0,
                      contractor=True, scene_center=[0, 0, 0],
                      scene_length=[2, 2, 2], white_background=False)
    params, state = init_model(jax.random.key(0), cfg, pts)
    opt = OptimizationConfig()
    tx = make_optimizer(opt, params, 1.0, 0)
    opt_state = tx.init(params)
    cams = [strip_static(look_at_camera(
        [np.sin(i), 0.3, -3.0], [0, 0, 0], [0, -1, 0], 1.0,
        1.0 * h / w, w, h, uid=i)) for i in range(n_view)]
    gts = jnp.asarray(rng.uniform(size=(n_view, 3, h, w)), jnp.float32)
    return cfg, opt, params, state, tx, opt_state, cams, gts


def place(mesh, params, state, cfg):
    params_s = jax.device_put(params, param_shardings(mesh, params))
    active = jax.device_put(state.active, NamedSharding(mesh, P("gauss")))
    stats = init_stats(params["anchors"]["anchor"].shape[0], cfg.n_offsets)
    stats_s = jax.device_put(stats, jax.tree.map(
        lambda _: NamedSharding(mesh, P("gauss")), stats))
    return params_s, active, stats_s


@pytest.mark.parametrize("n_view,n_gauss,backend",
                         [(4, 2, "dense"), (2, 4, "dense"),
                          (2, 2, "pallas")])
def test_sharded_step_runs(n_view, n_gauss, backend):
    cfg, opt, params, state, tx, opt_state, cams, gts = build(
        n_view, n_gauss)
    mesh = make_mesh(n_view, n_gauss)
    params_s, active, stats_s = place(mesh, params, state, cfg)
    step = make_sharded_train_step(cfg, opt, mesh, tx, backend=backend)

    def run():
        return step(params_s, opt_state, active, state.contractor,
                    stats_s, stack_cameras(cams), gts, jax.random.key(1),
                    jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0))

    if backend == "pallas":
        with pltpu.force_tpu_interpret_mode():
            p2, o2, st2, metrics = run()
    else:
        p2, o2, st2, metrics = run()
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["l1"]))
    # params actually changed
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, p2)
    flat = jax.tree_util.tree_leaves(d)
    assert max(flat) > 0
    # densification statistics flowed
    assert float(jnp.sum(st2.anchor_demon)) > 0
    assert float(jnp.sum(st2.offset_denom)) > 0


def test_sharded_loss_and_stats_match_single_device():
    """The sharded decomposition must reproduce the single-device loss AND
    densification statistics (q-noise keys differ between the paths, so
    loss compares within a noise-dominated tolerance; the stats masks are
    noise-robust and must agree exactly in their support)."""
    n_view, n_gauss = 2, 2
    cfg, opt, params, state, tx, opt_state, cams, gts = build(
        n_view, n_gauss)
    mesh = make_mesh(n_view, n_gauss)
    params_s, active, stats_s = place(mesh, params, state, cfg)
    sstep = make_sharded_train_step(cfg, opt, mesh, tx, backend="dense")
    _, _, st_sh, m_sh = sstep(
        params_s, opt_state, active, state.contractor, stats_s,
        stack_cameras(cams), gts, jax.random.key(1), jnp.float32(1.0),
        jnp.float32(0.0), jnp.float32(1.0))

    dstep = make_train_step(cfg, opt, mv=n_view, activate_level=0, tx=tx,
                            backend="dense")
    stats = init_stats(params["anchors"]["anchor"].shape[0], cfg.n_offsets)
    _, _, st_sd, metrics = dstep(
        params, opt_state, state.active, state.contractor, stats,
        tuple(cams), gts, jnp.zeros(3), jax.random.key(1), jnp.int32(1),
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0))
    a, b = float(m_sh["loss"]), float(metrics["loss"])
    assert abs(a - b) / max(abs(b), 1e-6) < 0.05, (a, b)

    # anchor_demon (visibility counts) must agree exactly: same prefilter
    np.testing.assert_array_equal(np.asarray(st_sh.anchor_demon),
                                  np.asarray(st_sd.anchor_demon))
    # opacity_accum / offset stats depend on q-noise draws -> compare
    # support and magnitude
    sh_d = np.asarray(st_sh.offset_denom)[:, 0]
    sd_d = np.asarray(st_sd.offset_denom)[:, 0]
    assert (sh_d > 0).sum() > 0
    agree = ((sh_d > 0) == (sd_d > 0)).mean()
    assert agree > 0.95, agree
    sh_g = np.asarray(st_sh.offset_gradient_accum)[:, 0]
    assert np.all(np.isfinite(sh_g)) and sh_g.max() > 0


def test_sharded_step_mixed_resolutions():
    """Real-capture shape robustness: a 65x96 / 64x96 view pair trains on
    a 2x2 mesh via pad_view_batch (padded canvas + masked losses)."""
    from splatco_tpu.parallel.train_step import pad_view_batch

    n_view, n_gauss = 2, 2
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(200, 3)).astype(np.float32) * 0.4
    cfg = ModelConfig(feat_dim=16, n_offsets=4, voxel_size=0.05,
                      plane_size=64, num_channels=9, appearance_dim=0,
                      contractor=True, scene_center=[0, 0, 0],
                      scene_length=[2, 2, 2], white_background=False)
    params, state = init_model(jax.random.key(0), cfg, pts)
    opt = OptimizationConfig()
    tx = make_optimizer(opt, params, 1.0, 0)
    opt_state = tx.init(params)
    dims = [(65, 96), (64, 96)]
    cams = [strip_static(look_at_camera(
        [np.sin(i), 0.3, -3.0], [0, 0, 0], [0, -1, 0], 1.0,
        1.0 * h / w, w, h, uid=i)) for i, (h, w) in enumerate(dims)]
    gts = [jnp.asarray(rng.uniform(size=(3, h, w)), jnp.float32)
           for h, w in dims]

    mesh = make_mesh(n_view, n_gauss)
    params_s, active, stats_s = place(mesh, params, state, cfg)
    cam_stack, gts_p, view_geom = pad_view_batch(cams, gts, n_gauss)
    assert gts_p.shape[-2] % (n_gauss * 32) == 0
    step = make_sharded_train_step(cfg, opt, mesh, tx, backend="dense")
    p2, o2, st2, metrics = step(
        params_s, opt_state, active, state.contractor, stats_s, cam_stack,
        gts_p, jax.random.key(1), jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1.0), view_geom)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["l1"]))
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, p2)
    assert max(jax.tree_util.tree_leaves(d)) > 0
    assert float(jnp.sum(st2.anchor_demon)) > 0


def test_sharded_pallas_matches_sharded_dense_exactly():
    """Exactness check for the production (Pallas) backend under
    shard_map: identical inputs and q-noise keys through the SAME sharded
    decomposition, only the rasterizer backend differs — so the strip
    rasterization, proxy gradients and collectives of the Pallas path
    must reproduce the dense compositor's loss, params and stats to float
    tolerance.  (The full 8-device interpret run deadlocks on 2 host
    cores — XLA CPU collective rendezvous vs GIL-holding interpret
    callbacks — so the equality runs on the 1x2 submesh, matching
    __graft_entry__.)"""
    n_view, n_gauss = 1, 2
    cfg, opt, params, state, tx, opt_state, cams, gts = build(
        n_view, n_gauss, h=64, w=64)
    mesh = make_mesh(n_view, n_gauss)
    params_s, active, stats_s = place(mesh, params, state, cfg)

    outs = {}
    for backend in ("dense", "pallas"):
        step = make_sharded_train_step(cfg, opt, mesh, tx,
                                       backend=backend)
        with pltpu.force_tpu_interpret_mode():
            outs[backend] = step(
                params_s, opt_state, active, state.contractor, stats_s,
                stack_cameras(cams), gts, jax.random.key(1),
                jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0))

    pd, po, psd, md = outs["dense"]
    pp, _, psp, mp = outs["pallas"]
    np.testing.assert_allclose(float(mp["loss"]), float(md["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(mp["l1"]), float(md["l1"]),
                               rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(pd),
            jax.tree_util.tree_leaves_with_path(pp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=jax.tree_util.keystr(path))
    for name in ("opacity_accum", "anchor_demon", "offset_gradient_accum",
                 "offset_denom"):
        np.testing.assert_allclose(
            np.asarray(getattr(psp, name)), np.asarray(getattr(psd, name)),
            atol=1e-4, rtol=1e-3, err_msg=name)
