#!/usr/bin/env python
"""Stage-split profile of one production-scale SVC train step.

Times each pipeline stage as its own jitted program (relay-safe sync via
scalar fetch, like bench.py) so the non-rasterizer 770ms of
train_step_mv4 (BENCH_r02) can be attributed: decode (MLPs+CSCM), TV
loss, SSIM/L1, projection, binning, kernels, unsort, optimizer.

    python tools/profile_train.py            # production scale
    SPLATCO_BENCH_SMOKE=1 python tools/profile_train.py   # CPU smoke
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
    from splatco_tpu.models.renderer import (generate_neural_gaussians,
                                             prefilter_voxel, render)
    from splatco_tpu.models.splatco import decode_kwargs, init_model
    from splatco_tpu.models.triplane import tv_loss
    from splatco_tpu.ops.losses import l1_loss, ssim
    from splatco_tpu.ops.projection import project_gaussians_cols
    from splatco_tpu.train.optimizer import make_optimizer
    from splatco_tpu.train.step import init_stats, make_train_step

    smoke = os.environ.get("SPLATCO_BENCH_SMOKE") == "1"
    capacity = 512 if smoke else 65536
    n_offsets = 4 if smoke else 10
    h, w = (64, 96) if smoke else (1088, 1600)

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(jnp.ravel(leaf)[:8]))

    def timeit(fn, *args, iters=4):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        sync(outs[-1])
        return (time.perf_counter() - t0) / iters * 1e3

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
    cam = strip_static(look_at_camera(
        [0.0, 0.4, -3.5], [0, 0, 0], [0, -1, 0], 1.2, 1.2 * h / w, w, h,
        uid=0))
    gt = jnp.asarray(rng.uniform(size=(3, h, w)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    dkw = decode_kwargs(cfg)
    key = jax.random.key(1)

    r = {}
    # ---- decode (MLPs + CSCM triplane query) -------------------------
    vis = prefilter_voxel(params["anchors"], state.active, cam)

    @jax.jit
    def decode(params):
        return generate_neural_gaussians(
            params, state.active, state.contractor, cam, vis,
            activate_level=0, q_noise=0.03, key=key, **dkw)

    r["decode_fwd_ms"] = timeit(decode, params)

    @jax.jit
    def decode_bwd(params):
        def f(p):
            g = generate_neural_gaussians(
                p, state.active, state.contractor, cam, vis,
                activate_level=0, q_noise=0.03, key=key, **dkw)
            return (g["xyz"].sum() + g["color"].sum() + g["opacity"].sum()
                    + g["scaling"].sum())
        return jax.grad(f)(params)

    r["decode_fwd_bwd_ms"] = timeit(decode_bwd, params)

    # ---- prefilter ---------------------------------------------------
    pf = jax.jit(lambda p: prefilter_voxel(p["anchors"], state.active,
                                           cam))
    r["prefilter_ms"] = timeit(pf, params)

    # ---- losses on a full frame --------------------------------------
    img = jnp.asarray(rng.uniform(size=(3, h, w)), jnp.float32)
    lf = jax.jit(lambda a, b: (1 - 0.2) * l1_loss(a, b)
                 + 0.2 * (1.0 - ssim(a, b)))
    r["l1_ssim_fwd_ms"] = timeit(lf, img, gt)
    lg = jax.jit(jax.grad(lambda a, b: (1 - 0.2) * l1_loss(a, b)
                          + 0.2 * (1.0 - ssim(a, b))))
    r["l1_ssim_fwd_bwd_ms"] = timeit(lg, img, gt)

    # ---- tv loss -----------------------------------------------------
    tvf = jax.jit(jax.grad(lambda pl: tv_loss(pl, 1.0, 0)))
    r["tv_grad_ms"] = timeit(tvf, params["planes"])

    # ---- full render fwd+bwd through the production path -------------
    # seed tight class-packed budgets first with a cheap binning-only
    # probe (the Trainer's controller pattern) so this measures the
    # production path, not the unpacked measuring path
    from splatco_tpu.ops.rasterize import suggest_class_spec

    g = generate_neural_gaussians(
        params, state.active, state.contractor, cam, vis,
        activate_level=0, q_noise=0.0, key=None, **dkw)
    pr = project_gaussians_cols(g["xyz"], g["scaling"], g["rot"], cam)
    pr = pr._replace(radius=jnp.where(g["opacity"] > 0.0, pr.radius, 0.0))
    spec = suggest_class_spec(pr, g["color"], g["opacity"], h, w,
                              kmax=cfg.kmax, headroom=1.3)

    @jax.jit
    def render_full(params):
        def f(p):
            out = render(p, state.active, state.contractor, cam, bg,
                         visible_mask=vis, activate_level=0,
                         is_training=True, key=key, kmax=cfg.kmax,
                         class_spec=spec, backend="pallas", **dkw)
            return l1_loss(out.image, gt)
        return jax.grad(f)(params)

    r["render_fwd_bwd_ms"] = timeit(render_full, params)

    # ---- optimizer update alone --------------------------------------
    zeros_grads = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def upd(g, o, p):
        u, o2 = tx.update(g, o, p)
        return jax.tree.map(lambda a, b: a + b, p, u), o2

    r["optimizer_ms"] = timeit(upd, zeros_grads, opt_state, params)

    # ---- the full mv=4 step for reference ----------------------------
    mv = 2 if smoke else 4
    cams = [strip_static(look_at_camera(
        [3.5 * np.sin(i), 0.4, -3.5 * np.cos(i)], [0, 0, 0], [0, -1, 0],
        1.2, 1.2 * h / w, w, h, uid=i)) for i in range(mv)]
    gts = jnp.asarray(rng.uniform(size=(mv, 3, h, w)), jnp.float32)
    step = make_train_step(cfg, opt, mv=mv, activate_level=0, tx=tx,
                           backend="pallas", class_spec=spec)
    gates = jnp.full((mv * (mv - 1) // 2,), 0.9, jnp.float32)
    args = (params, opt_state, state.active, state.contractor, stats,
            tuple(cams), gts, bg, jax.random.key(1), jnp.int32(1000),
            jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0), gates)
    p, o, s, m = step(*args)
    sync(m["loss"])
    t0 = time.perf_counter()
    for _ in range(3):
        p, o, s, m = step(*args)
    sync(m["loss"])
    r[f"train_step_mv{mv}_ms"] = round(
        (time.perf_counter() - t0) / 3 * 1e3, 1)

    print(json.dumps({k: round(v, 2) for k, v in r.items()}, indent=1))


if __name__ == "__main__":
    main()
