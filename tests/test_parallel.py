"""Sharded train step on the 8-device CPU mesh: runs + matches single-dev."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
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


@pytest.mark.parametrize("n_view,n_gauss", [(4, 2), (2, 4)])
def test_sharded_step_runs(n_view, n_gauss):
    cfg, opt, params, state, tx, opt_state, cams, gts = build(
        n_view, n_gauss)
    mesh = make_mesh(n_view, n_gauss)
    params_s = jax.device_put(params, param_shardings(mesh, params))
    active = jax.device_put(state.active,
                            NamedSharding(mesh, P("gauss")))
    step = make_sharded_train_step(cfg, opt, mesh, tx, backend="dense")
    p2, o2, loss, ll1 = step(params_s, opt_state, active,
                             state.contractor, stack_cameras(cams), gts,
                             jax.random.key(1), jnp.float32(1.0),
                             jnp.float32(0.0))
    assert np.isfinite(float(loss))
    assert np.isfinite(float(ll1))
    # params actually changed
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, p2)
    flat = jax.tree_util.tree_leaves(d)
    assert max(flat) > 0


def test_sharded_loss_matches_single_device():
    """The sharded decomposition must reproduce the single-device loss
    (q_noise paths keyed differently, so compare with consistency on but
    the same deterministic q via q=0.03 noise — we instead compare a
    noise-free configuration by zeroing tv and using the same fold-in
    structure; tolerance covers reduction-order drift)."""
    n_view, n_gauss = 2, 2
    cfg, opt, params, state, tx, opt_state, cams, gts = build(
        n_view, n_gauss)
    mesh = make_mesh(n_view, n_gauss)
    params_s = jax.device_put(params, param_shardings(mesh, params))
    active = jax.device_put(state.active, NamedSharding(mesh, P("gauss")))
    sstep = make_sharded_train_step(cfg, opt, mesh, tx, backend="dense")
    _, _, loss_sharded, _ = sstep(
        params_s, opt_state, active, state.contractor,
        stack_cameras(cams), gts, jax.random.key(1), jnp.float32(1.0),
        jnp.float32(0.0))

    # single-device reference: same loss structure via make_train_step.
    # q-noise keys differ between the two paths, so compare within a
    # tolerance dominated by the noise amplitude (0.03 on plane feats).
    dstep = make_train_step(cfg, opt, mv=n_view, activate_level=0, tx=tx,
                            backend="dense")
    stats = init_stats(params["anchors"]["anchor"].shape[0], cfg.n_offsets)
    _, _, _, metrics = dstep(
        params, opt_state, state.active, state.contractor, stats,
        tuple(cams), gts, jnp.zeros(3), jax.random.key(1), jnp.int32(1),
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0))
    a, b = float(loss_sharded), float(metrics["loss"])
    assert abs(a - b) / max(abs(b), 1e-6) < 0.05, (a, b)
