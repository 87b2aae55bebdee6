#!/usr/bin/env python
"""Ablation timing of the v3 forward kernel internals at bench scale:
which part of the per-chunk math costs — window extraction (roll),
alpha eval, the log-depth blend scan, or the color accumulation."""
import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from splatco_tpu.data.cameras import look_at_camera
    from splatco_tpu.ops import raster_v3 as r3
    from splatco_tpu.ops.binning import KPS_DEFAULT, spec_from_counts, \
        REC_SIZE
    from splatco_tpu.ops.projection import project_gaussians_cols
    from splatco_tpu.ops.rasterize import rasterize

    K, P = r3.K, r3.P
    rng = np.random.default_rng(0)
    n = 1 << 19
    h, w = 1088, 1600
    means = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 1.2)
    scales = jnp.asarray((0.001 + 0.004 * rng.uniform(size=(n, 3))
                          ).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    colors = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.95, size=(n,)).astype(np.float32))
    bg = jnp.zeros(3, jnp.float32)
    cam = look_at_camera([0, 0, -4.0], [0, 0, 0], [0, -1, 0],
                         1.2, 1.2 * h / w, w, h)
    proj = jax.jit(
        lambda m, s, q: project_gaussians_cols(m, s, q, cam))(
        means, scales, quats)
    kmax = 24
    _, aux = rasterize(proj, colors, opac, bg, h, w, kmax=12,
                       tile16=True, return_aux=True)
    kps = tuple(k for k in KPS_DEFAULT if k < kmax) + (kmax,)
    spec = spec_from_counts(np.asarray(aux["class_counts"]), kps, n, 1.15)
    parents_x, parents_y = r3.parent_grid(h, w)
    num_parents = parents_x * parents_y
    tiles_x, tiles_y = 2 * parents_x, 2 * parents_y
    binned = jax.jit(lambda p, c, o: r3.bin_gaussians_v3(
        p, c, o, tiles_x, tiles_y, kmax=kmax, class_spec=spec))(
        proj, colors, opac)
    print(f"chunks={int(binned['num_chunks'])} K={K}")

    def make_kernel(variant):
        def kern(tile_ref, p_ref, tend_ref, fop_ref, in1, in2, out_ref,
                 state, *, parents_x):
            c = pl.program_id(0)
            nc = pl.num_programs(0)
            t = tile_ref[c]
            sub = t & 3
            prev_t = jnp.where(c > 0, tile_ref[jnp.maximum(c - 1, 0)], -1)
            next_t = jnp.where(c + 1 < nc,
                               tile_ref[jnp.minimum(c + 1, nc - 1)], -1)
            is_first = prev_t != t
            is_last = next_t != t
            p = p_ref[c]
            r = p % K
            nrows = tend_ref[t] - p

            @pl.when(is_first)
            def _():
                state[0:3] = jnp.zeros((3, 1, P), jnp.float32)
                state[3] = jnp.ones((1, P), jnp.float32)
                state[4] = jnp.zeros((1, P), jnp.float32)

            any_alive = jnp.any(state[4] < 0.5)

            @pl.when(any_alive)
            def _():
                px, py = r3._pixel_coords_v3(t, parents_x)
                if variant == "noroll":
                    rec = in1[:].T
                else:
                    rec = r3._extract_window(in1, in2, r)
                alpha, _, _ = r3._chunk_alphas_v3(rec, px, py, nrows)
                if variant in ("full", "noroll", "noaccum"):
                    wgt, _, T_out, done_out = r3._blend_v3(
                        alpha, state[3], state[4])
                    state[3] = T_out
                    state[4] = done_out
                elif variant == "noscan":
                    wgt = alpha * state[3]
                    state[4] = jnp.maximum(
                        state[4], jnp.max((alpha > 0.97).astype(
                            jnp.float32), axis=0, keepdims=True))
                if variant != "noaccum":
                    col = lambda i: rec[:, i:i + 1]
                    state[0] = state[0] + jnp.sum(col(6) * wgt, axis=0,
                                                  keepdims=True)
                    state[1] = state[1] + jnp.sum(col(7) * wgt, axis=0,
                                                  keepdims=True)
                    state[2] = state[2] + jnp.sum(col(8) * wgt, axis=0,
                                                  keepdims=True)

            @pl.when(is_last)
            def _():
                fw = fop_ref[t] == 1
                cur = out_ref[0]
                mine = jnp.concatenate(
                    [state[0], state[1], state[2], state[3]], axis=0
                ).reshape(4, 2, r3.PIX_LANE)
                deflt = jnp.concatenate(
                    [jnp.zeros((3, 8, 128), jnp.float32),
                     jnp.ones((1, 8, 128), jnp.float32)], axis=0)
                other = jnp.where(fw, deflt, cur)
                rows8 = jax.lax.broadcasted_iota(jnp.int32, (4, 8, 128), 1)
                m0 = jnp.broadcast_to(mine[:, 0:1], (4, 8, 128))
                m1 = jnp.broadcast_to(mine[:, 1:2], (4, 8, 128))
                out_ref[0] = jnp.where(rows8 == 2 * sub, m0,
                                       jnp.where(rows8 == 2 * sub + 1,
                                                 m1, other))

        return kern

    def run(variant):
        kernel = functools.partial(make_kernel(variant),
                                   parents_x=parents_x)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(binned["num_chunks"],),
            in_specs=[
                pl.BlockSpec((REC_SIZE, K),
                             lambda c, t, p, te, fp: (0, p[c] // K)),
                pl.BlockSpec((REC_SIZE, K),
                             lambda c, t, p, te, fp: (0, p[c] // K + 1)),
            ],
            out_specs=pl.BlockSpec((1, 4, 8, 128),
                                   lambda c, t, p, te, fp: (t[c] >> 2, 0,
                                                            0, 0)),
            scratch_shapes=[pltpu.VMEM((5, 1, P), jnp.float32)],
        )
        fn = jax.jit(lambda b: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((num_parents, 4, 8, 128),
                                           jnp.float32),
            grid_spec=grid_spec,
        )(b["tile_of_chunk"], b["p_of_chunk"], b["t_end"],
          b["first_of_parent"], b["packed"], b["packed"]))
        out = fn(binned)
        float(jnp.sum(out[0]))
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn(binned)
        float(jnp.sum(out[0]))
        dt = (time.perf_counter() - t0) / 8 * 1e3
        us = dt / int(binned["num_chunks"]) * 1e3
        print(f"fwd[{variant:8s}] {dt:8.2f} ms   ({us:.3f} us/chunk)")

    for variant in ("full", "noroll", "noscan", "noaccum"):
        run(variant)


if __name__ == "__main__":
    main()
