#!/usr/bin/env python
"""Run `make_sharded_train_step` on the REAL TPU chip (1x1 mesh) and check
it matches the single-device step numerically — hardware evidence that the
shard_map + collectives + Pallas-in-shard_map program compiles and executes
on TPU (VERDICT r03 weak #5; the CPU exactness test is
tests/test_parallel.py::test_sharded_pallas_matches_sharded_dense_exactly).

Writes SHARDED_TPU.json: {"ok": bool, "mesh": [v, g], "backend": ...,
"loss_sharded": x, "loss_single": y, "rel_diff": d, "device": kind}.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from splatco_tpu.config import ModelConfig, OptimizationConfig
    from splatco_tpu.data.cameras import look_at_camera, strip_static
    from splatco_tpu.models.splatco import init_model
    from splatco_tpu.parallel.train_step import (make_sharded_train_step,
                                                 stack_cameras)
    from splatco_tpu.train.optimizer import make_optimizer
    from splatco_tpu.train.step import init_stats, make_train_step

    dev = jax.devices()[0]
    n_view, n_gauss = 1, 1
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("view", "gauss"))

    rng = np.random.default_rng(0)
    capacity = 1024
    h, w = 64, 128
    pts = rng.normal(size=(capacity, 3)).astype(np.float32) * 1.2
    cfg = ModelConfig(feat_dim=16, n_offsets=4, voxel_size=0.05,
                      plane_size=64, num_channels=9, appearance_dim=0,
                      contractor=True, scene_center=[0, 0, 0],
                      scene_length=[4, 4, 4], capacity=capacity)
    params, state = init_model(jax.random.key(0), cfg, pts)
    opt = OptimizationConfig()
    tx = make_optimizer(opt, params, 1.0, 0)
    opt_state = tx.init(params)
    stats = init_stats(capacity, cfg.n_offsets)
    cams = [strip_static(look_at_camera(
        [3.0 * np.sin(i), 0.4, -3.0 * np.cos(i)], [0, 0, 0], [0, -1, 0],
        1.0, 1.0 * h / w, w, h, uid=i)) for i in range(n_view)]
    gts = jnp.asarray(rng.uniform(size=(n_view, 3, h, w)), jnp.float32)
    key = jax.random.key(3)

    sstep = make_sharded_train_step(cfg, opt, mesh, tx, activate_level=0,
                                    backend="pallas", kmax_pack=6)
    cam_stack = stack_cameras(cams)
    p1, o1, s1, m1 = sstep(params, opt_state, state.active,
                           state.contractor, stats, cam_stack, gts, key,
                           jnp.float32(0.0), jnp.float32(0.0),
                           jnp.float32(1.0))
    loss_sharded = float(m1["loss"])

    # single-device reference step with the same views.  NOTE exact
    # equality is not expected: the sharded step uses masked_ssim on the
    # padded canvas and a slightly different loss assembly order; the CPU
    # suite pins the exact-match variants.  Here the point is that the
    # hardware program RUNS and lands in the same numeric neighborhood.
    dstep = make_train_step(cfg, opt, mv=n_view, activate_level=0, tx=tx,
                            backend="pallas", kmax_pack=6)
    p2, o2, s2, m2 = dstep(params, opt_state, state.active,
                           state.contractor, stats, tuple(cams), gts,
                           jnp.zeros(3, jnp.float32), key, jnp.int32(1),
                           jnp.float32(0.0), jnp.float32(0.0),
                           jnp.float32(1.0))
    loss_single = float(m2["loss"])
    rel = abs(loss_sharded - loss_single) / max(abs(loss_single), 1e-9)

    ok = bool(np.isfinite(loss_sharded) and rel < 5e-2)
    out = {
        "ok": ok,
        "mesh": [n_view, n_gauss],
        "backend": "pallas",
        "loss_sharded": loss_sharded,
        "loss_single": loss_single,
        "rel_diff": rel,
        "device": getattr(dev, "device_kind", str(dev)),
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SHARDED_TPU.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
