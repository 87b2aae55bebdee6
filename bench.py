#!/usr/bin/env python
"""Benchmark: Pallas rasterizer forward+backward at production scale.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

The metric is the end-to-end differentiable render time (columnwise EWA
projection + sort-based binning + Pallas blend fwd, then full backward to
all gaussian attributes) for a 1600x1088 frame over 524k gaussians — the
hot path of SplatCo training (mv=4 such renders + one aggregated backward
per step).  The reference publishes no numeric tables (BASELINE.md), so
vs_baseline is the ratio against this repo's round-1 recorded value
(214.42 ms, BENCH_r01.json), i.e. >1.0 means faster than round 1.

`extra` carries the evidence the headline number rests on:
  stages_ms        — projection / binning / fwd kernel / bwd kernel /
                     grad unsort split (each jitted separately; stage
                     timings include ~2 ms dispatch overhead through the
                     axon relay, so they over-count slightly)
  kmax_pack        — measured slot budget used (auto-suggested)
  pairs            — (gaussian, tile) slots blended
  pairs_per_s      — slot throughput of the full fwd+bwd
  roofline_ms      — single-pass HBM traffic lower bound at the device's
                     peak bandwidth (sorts are multi-pass, so this bound
                     is NOT achievable; it anchors how much headroom
                     remains)
  pct_of_roofline  — roofline_ms / measured
  train_step_mv4_ms — one full SVC training step (4 views, aggregated
                     backward, optimizer update) on a production-scale
                     anchor model
"""
import json
import os
import time

import numpy as np

ROUND1_MS = 214.42

# peak HBM bandwidth by device kind (GB/s)
HBM_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5": 2765.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1638.0,
}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from splatco_tpu.data.cameras import look_at_camera
    from splatco_tpu.ops import rasterize_pallas as rp
    from splatco_tpu.ops.binning import bin_gaussians, meta_block_bits
    from splatco_tpu.ops.projection import project_gaussians_cols
    from splatco_tpu.ops.binning import bin_gaussians_classed
    from splatco_tpu.ops.rasterize import (rasterize, suggest_class_spec,
                                           suggest_kmax_pack)

    dev = jax.devices()[0]
    hbm = HBM_GBPS.get(getattr(dev, "device_kind", ""), 819.0)

    rng = np.random.default_rng(0)
    # SPLATCO_BENCH_SMOKE=1: tiny sizes for a CPU smoke run of the full
    # bench code path (the driver runs the real sizes on TPU)
    smoke = os.environ.get("SPLATCO_BENCH_SMOKE") == "1"
    n = 4096 if smoke else 1 << 19
    h, w = (64, 96) if smoke else (1088, 1600)
    means = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 1.2)
    scales = jnp.asarray((0.001 + 0.004 * rng.uniform(size=(n, 3))
                          ).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    colors = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.95, size=(n,)).astype(np.float32))
    bg = jnp.zeros(3, jnp.float32)
    cam = look_at_camera([0, 0, -4.0], [0, 0, 0], [0, -1, 0],
                         1.2, 1.2 * h / w, w, h)
    gimg = jnp.asarray(rng.normal(size=(3, h, w)), jnp.float32)

    def timeit(fn, *args, iters=8):
        # async-dispatch all iterations, sync once via a scalar fetch:
        # keeps host<->device round-trip latency (large through the axon
        # tunnel) out of the number
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.ravel()[:8]))
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        leaf = jax.tree_util.tree_leaves(outs[-1])[0]
        float(jnp.sum(leaf.ravel()[:8]))
        return (time.perf_counter() - t0) / iters * 1e3, out

    proj = jax.jit(
        lambda m, s, q: project_gaussians_cols(m, s, q, cam))(
        means, scales, quats)
    kp = suggest_kmax_pack(proj, colors, opac, h, w)
    kp_used = None if kp >= 12 else kp
    kp_eff = 12 if kp_used is None else kp_used
    spec = suggest_class_spec(proj, colors, opac, h, w)

    # ---- headline: full differentiable render (class-packed binner) --
    def make(spec_v):
        @jax.jit
        def fwdbwd(means, scales, quats, colors, opac):
            def loss(means, scales, quats, colors, opac):
                proj = project_gaussians_cols(means, scales, quats, cam)
                img = rasterize(proj, colors, opac, bg, h, w,
                                class_spec=spec_v)
                return jnp.sum(img * gimg)

            l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
                means, scales, quats, colors, opac)
            return l + sum(x.sum() for x in g)

        return fwdbwd

    dt_ms, _ = timeit(make(spec), means, scales, quats, colors, opac)

    # ---- stage split --------------------------------------------------
    tile = rp.TILE
    tiles_x, tiles_y = -(-w // tile), -(-h // tile)
    num_tiles = tiles_x * tiles_y
    stages = {}
    ms, proj2 = timeit(jax.jit(
        lambda m, s, q: project_gaussians_cols(m, s, q, cam)),
        means, scales, quats)
    stages["projection"] = round(ms, 2)

    binf = jax.jit(lambda p, c, o: bin_gaussians_classed(
        p, c, o, tile, tiles_x, tiles_y, kmax=12, chunk=rp.CHUNK,
        class_spec=spec))
    ms, binned = timeit(binf, proj2, colors, opac)
    stages["binning"] = round(ms, 2)
    s_pairs = int(binned.packed.shape[1])
    bb = max((s_pairs // rp.CHUNK).bit_length(), 1)

    fwd = jax.jit(lambda b: rp.forward_pallas(b, num_tiles, tiles_x, bb))
    ms, out = timeit(fwd, binned)
    stages["fwd_kernel"] = round(ms, 2)

    gio = jnp.concatenate([
        jnp.ones((num_tiles, 3, 8, 128), jnp.float32),
        out[:, :3], out[:, 3:4],
        jnp.zeros((num_tiles, 1, 8, 128), jnp.float32)], axis=1)
    bwd = jax.jit(lambda b, g: rp.backward_pallas(b, g, bg, num_tiles,
                                                  tiles_x, bb))
    ms, _ = timeit(bwd, binned, gio)
    stages["bwd_kernel"] = round(ms, 2)

    from splatco_tpu.ops.binning import class_layout

    offs, _ = class_layout(spec)

    @jax.jit
    def unsort(grads, slot_key, rank_orig):
        cols = jax.lax.sort(
            (slot_key,) + tuple(grads[i] for i in range(9)),
            num_keys=1, is_stable=False)[1:]
        per_rank = []
        for (kp_c, b_c), off in zip(spec, offs):
            per_rank.append([
                c[off:off + kp_c * b_c].reshape(kp_c, b_c).sum(axis=0)
                for c in cols])
        cols_rank = [jnp.concatenate([p[i] for p in per_rank])
                     for i in range(9)]
        final = jax.lax.sort((rank_orig, *cols_rank), num_keys=1,
                             is_stable=False)
        return [c[:n] for c in final[1:]]

    gr = bwd(binned, gio)
    ms, _ = timeit(unsort, gr, binned.slot_key, binned.rank_orig)
    stages["grad_unsort"] = round(ms, 2)

    # ---- roofline lower bound -----------------------------------------
    # single-pass HBM traffic: depth sort (12 cols over N, r+w), tile sort
    # (12 cols over S, r+w), fwd kernel (packed read + out write), bwd
    # kernel (packed read + gio read + grads write), unsort (10 cols r+w)
    bytes_lb = (2 * n * 12 * 4
                + 2 * s_pairs * 12 * 4
                + s_pairs * 16 * 4 + num_tiles * 4 * 1024 * 4
                + s_pairs * 32 * 4 + num_tiles * 8 * 1024 * 4
                + 2 * s_pairs * 10 * 4)
    roofline_ms = bytes_lb / (hbm * 1e6)

    # ---- full SVC training step (mv=4) ---------------------------------
    train_ms = None
    train_stages = None
    try:
        train_ms, train_stages = bench_train_step(
            **({"capacity": 512, "h": 64, "w": 96} if smoke else {}))
    except Exception as e:  # pragma: no cover - keep headline alive
        train_ms = f"failed: {type(e).__name__}"

    print(json.dumps({
        "metric": "rasterize_fwd_bwd_ms_1600x1088_524k",
        "value": round(dt_ms, 2),
        "unit": "ms/frame",
        "vs_baseline": round(ROUND1_MS / dt_ms, 3),
        "extra": {
            "device": getattr(dev, "device_kind", str(dev)),
            "kmax_pack": kp_eff,
            "class_spec": [list(p) for p in spec],
            "stages_ms": stages,
            "pairs": s_pairs,
            "pairs_per_s": round(s_pairs / (dt_ms / 1e3)),
            "roofline_ms": round(roofline_ms, 2),
            "pct_of_roofline": round(100 * roofline_ms / dt_ms, 1),
            "train_step_mv4_ms": train_ms,
            # non-raster stage split of the step (VERDICT r03 #4): each
            # jitted separately; per-VIEW stages run mv=4 times per step,
            # plane sampling and optimizer once
            "train_stages_ms": train_stages,
        },
    }))


def bench_train_step(capacity=65536, n_offsets=10, h=1088, w=1600, mv=4):
    """One full SVC training step (4 views, consistency loss, aggregated
    backward, optimizer update) at production anchor count."""
    import jax
    import jax.numpy as jnp

    from splatco_tpu.config import ModelConfig, OptimizationConfig
    from splatco_tpu.data.cameras import look_at_camera, strip_static
    from splatco_tpu.models.splatco import init_model
    from splatco_tpu.train.optimizer import make_optimizer
    from splatco_tpu.train.step import init_stats, make_train_step

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(capacity, 3)).astype(np.float32) * 1.2
    cfg = ModelConfig(feat_dim=32, n_offsets=n_offsets, voxel_size=0.01,
                      plane_size=1024, num_channels=9, appearance_dim=0,
                      contractor=True, scene_center=[0, 0, 0],
                      scene_length=[4, 4, 4], capacity=capacity)
    params, state = init_model(jax.random.key(0), cfg, pts)
    opt = OptimizationConfig()
    tx = make_optimizer(opt, params, 1.0, 0)
    opt_state = tx.init(params)
    c = params["anchors"]["anchor"].shape[0]
    stats = init_stats(c, n_offsets)
    cams = [strip_static(look_at_camera(
        [3.5 * np.sin(i), 0.4, -3.5 * np.cos(i)], [0, 0, 0], [0, -1, 0],
        1.2, 1.2 * h / w, w, h, uid=i)) for i in range(mv)]
    gts = jnp.asarray(rng.uniform(size=(mv, 3, h, w)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    step = make_train_step(cfg, opt, mv=mv, activate_level=0, tx=tx,
                           backend="pallas", kmax_pack=6)
    # measuring step on the uniform path seeds the classed budgets,
    # mirroring the Trainer's controller
    # pair gates precomputed once per camera set (the Trainer caches them
    # by uid pair — computing 6 full-frame SSIMs per step costs ~25 ms)
    n_pairs = mv * (mv - 1) // 2
    gates = jnp.full((n_pairs,), 0.9, jnp.float32)
    args0 = (params, opt_state, state.active, state.contractor, stats,
             tuple(cams), gts, bg, jax.random.key(1), jnp.int32(1000),
             jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0), gates)
    _, _, _, m0 = step(*args0)
    from splatco_tpu.ops.binning import KPS_DEFAULT, spec_from_counts
    counts = np.asarray(m0["class_counts"])
    kps = tuple(k for k in KPS_DEFAULT if k < cfg.kmax) + (cfg.kmax,)
    spec = spec_from_counts(counts, kps, capacity * n_offsets, 1.15)
    step = make_train_step(cfg, opt, mv=mv, activate_level=0, tx=tx,
                           backend="pallas", class_spec=spec)
    args = lambda p, o, s: (p, o, state.active, state.contractor, s,
                            tuple(cams), gts, bg, jax.random.key(1),
                            jnp.int32(1000), jnp.float32(1.0),
                            jnp.float32(0.0), jnp.float32(1.0), gates)
    p, o, s, m = step(*args(params, opt_state, stats))
    float(m["loss"])
    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, s, m = step(*args(p, o, s))
    float(m["loss"])
    step_ms = round((time.perf_counter() - t0) / iters * 1e3, 1)

    # ---- non-raster stage split (per-view unless noted) ---------------
    from splatco_tpu.models.renderer import (generate_neural_gaussians,
                                             precompute_plane_feats,
                                             prefilter_voxel)
    from splatco_tpu.models.splatco import decode_kwargs
    from splatco_tpu.models.triplane import sample_level_feats
    from splatco_tpu.ops.losses import l1_loss, ssim
    from splatco_tpu.models.renderer import anchor_plane_coords

    def t4(fn, *a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.ravel()[:8]))
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(4)]
        leaf = jax.tree_util.tree_leaves(outs[-1])[0]
        float(jnp.sum(leaf.ravel()[:8]))
        return round((time.perf_counter() - t0) / 4 * 1e3, 2)

    st = {}
    dkw = decode_kwargs(cfg)
    cam0 = cams[0]
    key = jax.random.key(2)
    vis = prefilter_voxel(params["anchors"], state.active, cam0)
    xyz_norm = anchor_plane_coords(params, state.contractor, False)

    @jax.jit
    def plane_bwd(planes):
        def f(pl):
            out = sample_level_feats(pl, xyz_norm, 0)
            return sum(jnp.sum(x) for lvl in out for x in lvl[0]) + sum(
                jnp.sum(x) for lvl in out if lvl[1] is not None
                for x in lvl[1])
        return jax.grad(f)(planes)

    st["plane_sample_fwd_bwd_once"] = t4(plane_bwd, params["planes"])
    pf = sample_level_feats(params["planes"], xyz_norm, 0)

    @jax.jit
    def decode_bwd(params):
        def f(p):
            g = generate_neural_gaussians(
                p, state.active, state.contractor, cam0, vis,
                activate_level=0, q_noise=0.03, key=key, plane_feats=pf,
                **dkw)
            return (g["xyz"].sum() + g["color"].sum()
                    + g["opacity"].sum() + g["scaling"].sum())
        return jax.grad(f)(params)

    st["decode_fwd_bwd_per_view"] = t4(decode_bwd, params)
    st["prefilter_per_view"] = t4(
        jax.jit(lambda p: prefilter_voxel(p["anchors"], state.active,
                                          cam0)), params)
    img = gts[0]
    gt0 = gts[1 % mv]
    st["l1_ssim_fwd_bwd_per_view"] = t4(
        jax.jit(jax.grad(lambda a: 0.8 * l1_loss(a, gt0)
                         + 0.2 * (1.0 - ssim(a, gt0)))), img)

    @jax.jit
    def upd(g, o, p):
        u, o2 = tx.update(g, o, p)
        return jax.tree.map(lambda a, b: a + b, p, u), o2

    st["optimizer_once"] = t4(upd, jax.tree.map(jnp.zeros_like, params),
                              opt_state, params)
    return step_ms, st


if __name__ == "__main__":
    main()
