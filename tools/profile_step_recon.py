#!/usr/bin/env python
"""Reconcile the fused SVC train step's wall time (VERDICT r04 #5).

BENCH_r04 measured 537 ms/step while the per-stage probes summed to only
~379 ms.  Part of the gap is a probe-scale mismatch (the raster probe
runs 524k gaussians; the step renders capacity*n_offsets = 655k), the
rest is real fused-program content no probe isolated.  This tool times
the SAME fused step with individual blocks statically removed
(make_train_step(disable=...)) and attributes the step by differencing —
every millisecond is a measured delta of the production program, not a
separately-jitted approximation.

    python tools/profile_step_recon.py
    SPLATCO_BENCH_SMOKE=1 python tools/profile_step_recon.py   # CPU
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from splatco_tpu.config import ModelConfig, OptimizationConfig
    from splatco_tpu.data.cameras import look_at_camera, strip_static
    from splatco_tpu.models.splatco import init_model
    from splatco_tpu.ops.binning import KPS_DEFAULT, spec_from_counts
    from splatco_tpu.train.optimizer import make_optimizer
    from splatco_tpu.train.step import init_stats, make_train_step

    smoke = os.environ.get("SPLATCO_BENCH_SMOKE") == "1"
    capacity = 512 if smoke else 65536
    n_offsets = 4 if smoke else 10
    h, w = (64, 96) if smoke else (1088, 1600)
    mv = 4
    iters = 2 if smoke else 4

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(capacity, 3)).astype(np.float32) * 1.2
    cfg = ModelConfig(feat_dim=32, n_offsets=n_offsets, voxel_size=0.01,
                      plane_size=64 if smoke else 1024, num_channels=9,
                      appearance_dim=0, contractor=True,
                      scene_center=[0, 0, 0], scene_length=[4, 4, 4],
                      capacity=capacity)
    params, state = init_model(jax.random.key(0), cfg, pts)
    opt = OptimizationConfig()
    tx = make_optimizer(opt, params, 1.0, 0)
    opt_state = tx.init(params)
    stats = init_stats(capacity, n_offsets)
    cams = [strip_static(look_at_camera(
        [3.5 * np.sin(i), 0.4, -3.5 * np.cos(i)], [0, 0, 0], [0, -1, 0],
        1.2, 1.2 * h / w, w, h, uid=i)) for i in range(mv)]
    gts = jnp.asarray(rng.uniform(size=(mv, 3, h, w)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    n_pairs = mv * (mv - 1) // 2
    gates = jnp.full((n_pairs,), 0.9, jnp.float32)

    # measured class budgets (the Trainer's controller), once
    step0 = make_train_step(cfg, opt, mv=mv, activate_level=0, tx=tx,
                            backend="pallas", kmax_pack=6)
    args = (params, opt_state, state.active, state.contractor, stats,
            tuple(cams), gts, bg, jax.random.key(1), jnp.int32(1000),
            jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0), gates)
    _, _, _, m0 = step0(*args)
    counts = np.asarray(m0["class_counts"])
    kps = tuple(k for k in KPS_DEFAULT if k < cfg.kmax) + (cfg.kmax,)
    spec = spec_from_counts(counts, kps, capacity * n_offsets, 1.15)

    def time_step(disable):
        step = make_train_step(cfg, opt, mv=mv, activate_level=0, tx=tx,
                               backend="pallas", class_spec=spec,
                               disable=frozenset(disable))
        p, o, s, m = step(*args)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            p, o, s, m = step(params, o, state.active, state.contractor,
                              s, tuple(cams), gts, bg, jax.random.key(1),
                              jnp.int32(1000), jnp.float32(1.0),
                              jnp.float32(0.0), jnp.float32(1.0), gates)
        float(m["loss"])
        return (time.perf_counter() - t0) / iters * 1e3

    variants = {
        "full": (),
        "-ssim": ("ssim",),
        "-consistency": ("consistency",),
        "-tv": ("tv",),
        "-sreg": ("sreg",),
        "-stats": ("stats",),
        "-optimizer": ("optimizer",),
        "-all_aux": ("ssim", "consistency", "tv", "sreg", "stats",
                     "optimizer"),
    }
    out = {}
    for name, dis in variants.items():
        ms = time_step(dis)
        out[name] = round(ms, 1)
        if name == "full":
            print(f"{name:14s} {ms:8.1f} ms")
        else:
            print(f"{name:14s} {ms:8.1f} ms   (block costs "
                  f"{out['full'] - ms:+.1f})")
    # "-all_aux" leaves: 4x prefilter + plane precompute + 4x (decode +
    # projection + rasterize fwd/bwd) + L1 + grad accumulation — the
    # irreducible render core of the step
    print(json.dumps(out))


if __name__ == "__main__":
    main()
