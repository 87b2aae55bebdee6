#!/usr/bin/env python
"""Sub-stage timing of bin_gaussians_v3 at production scale — where do
its ~20 ms go?  Each piece jitted separately, scalar-fetch synced."""
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

    from splatco_tpu.data.cameras import look_at_camera
    from splatco_tpu.ops import binning as b2
    from splatco_tpu.ops import raster_v3 as r3
    from splatco_tpu.ops.binning import KPS_DEFAULT, spec_from_counts
    from splatco_tpu.ops.projection import project_gaussians_cols
    from splatco_tpu.ops.rasterize import rasterize

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
    tiles_x, tiles_y = 2 * parents_x, 2 * parents_y
    num_tiles = tiles_x * tiles_y
    offs, s_pack = b2.class_layout(spec)
    s_pad = -(-s_pack // r3.K) * r3.K

    def timed(tag, fn, *args, iters=8):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(jnp.ravel(leaf)[:8]))
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        leaf = jax.tree_util.tree_leaves(outs[-1])[0]
        float(jnp.sum(jnp.ravel(leaf)[:8]))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{tag:34s} {dt:8.2f} ms")
        return out

    @jax.jit
    def full(proj, colors, opac):
        b = r3.bin_gaussians_v3(proj, colors, opac, tiles_x, tiles_y,
                                kmax=kmax, class_spec=spec)
        return jnp.sum(b["packed"][0, ::4096]) + jnp.sum(
            b["slot_key"][::4096])

    timed("FULL v3 binning", full, proj, colors, opac)

    # s1: rects + slot grid + class keys + hist
    @jax.jit
    def s1(proj, opac):
        op = opac.astype(jnp.float32)
        rad = proj.radius.astype(jnp.float32)
        x0, y0, sx_c, counts, _ = b2._rects(
            proj.mx, proj.my, rad, op, 16, tiles_x, tiles_y, kmax)
        grid = b2._slot_grid(proj.mx, proj.my, proj.ca, proj.cb, proj.cc,
                             op, x0, y0, sx_c, counts, 16, tiles_x,
                             tiles_y, kmax, num_tiles)
        n_valid = jnp.sum(grid < num_tiles, axis=0).astype(jnp.int32)
        return b2._class_keys(n_valid, tuple(kp for kp, _ in spec))

    timed("  s1 rects+grid(kmax=24)+keys", s1, proj, opac)

    # s2: 13-op class sort over N
    dk = jnp.where(proj.radius > 0, proj.depth, jnp.inf)
    oidx = jnp.arange(n, dtype=jnp.int32)
    ck = s1(proj, opac)

    @jax.jit
    def s2(ck, proj, colors, opac):
        outs = jax.lax.sort(
            (ck, proj.mx, proj.my, proj.ca, proj.cb, proj.cc,
             opac.astype(jnp.float32), colors[:, 0], colors[:, 1],
             colors[:, 2], dk, proj.radius.astype(jnp.float32), oidx),
            num_keys=1, is_stable=True)
        return sum(jnp.sum(o[::4096]) for o in outs[1:3])

    timed("  s2 class sort (13 ops, N)", s2, ck, proj, colors, opac)

    # s3: per-class regrid + leftpack + record broadcasts
    @jax.jit
    def s3(proj, opac):
        op = opac.astype(jnp.float32)
        acc = jnp.float32(0)
        for kp_c, b_c in spec:
            if b_c == 0:
                continue
            mxc, myc = proj.mx[:b_c], proj.my[:b_c]
            radc = proj.radius.astype(jnp.float32)[:b_c]
            opc = op[:b_c]
            x0, y0, sx_c, counts, _ = b2._rects(
                mxc, myc, radc, opc, 16, tiles_x, tiles_y, kmax)
            grid = b2._slot_grid(mxc, myc, proj.ca[:b_c], proj.cb[:b_c],
                                 proj.cc[:b_c], opc, x0, y0, sx_c,
                                 counts, 16, tiles_x, tiles_y, kmax,
                                 num_tiles)
            grid = r3.remap_rowmajor_to_parent(grid, tiles_x, num_tiles)
            (grid,) = jax.lax.sort((grid,), dimension=0, num_keys=1,
                                   is_stable=False)
            acc = acc + jnp.sum(grid[:kp_c][::8, ::512]
                                .astype(jnp.float32))
        return acc

    timed("  s3 per-class regrid+leftpack", s3, proj, opac)

    # s4: global 12-op sort over s_pad, stable vs unstable
    key1 = jnp.asarray(
        rng.integers(0, num_tiles + 1, size=s_pad, dtype=np.int32))
    key2 = jnp.asarray(rng.normal(size=s_pad).astype(np.float32))
    cols10 = tuple(jnp.asarray(rng.normal(size=s_pad).astype(np.float32))
                   for _ in range(9)) + (
        jnp.asarray(rng.integers(0, s_pad, size=s_pad, dtype=np.int32)),)

    @jax.jit
    def s4(key1, key2, cols):
        outs = jax.lax.sort((key1, key2) + cols, num_keys=2,
                            is_stable=True)
        return sum(jnp.sum(o[::4096]) for o in outs[2:4])

    timed("  s4 global sort stable", s4, key1, key2, cols10)

    @jax.jit
    def s4u(key1, key2, cols):
        outs = jax.lax.sort((key1, key2) + cols, num_keys=2,
                            is_stable=False)
        return sum(jnp.sum(o[::4096]) for o in outs[2:4])

    timed("  s4 global sort UNSTABLE", s4u, key1, key2, cols10)

    # s5: bounds + chunk maps + parent flags
    st = jnp.sort(key1)

    @jax.jit
    def s5(sorted_tile):
        trange = jnp.arange(num_tiles + 1, dtype=jnp.int32)
        t_bounds = jnp.searchsorted(sorted_tile, trange, side="left"
                                    ).astype(jnp.int32)
        t_end = jnp.concatenate(
            [t_bounds[1:], jnp.full((1,), s_pad, jnp.int32)])
        seg_len = jnp.maximum(t_end[:num_tiles] - t_bounds[:num_tiles], 0)
        nchunk = -(-seg_len // r3.K)
        ccum = jnp.cumsum(nchunk)
        c_max = s_pad // r3.K + num_tiles + 2
        cidx = jnp.arange(c_max, dtype=jnp.int32)
        toc = jnp.searchsorted(ccum, cidx, side="right").astype(jnp.int32)
        toc = jnp.minimum(toc, num_tiles)
        cit = cidx - jnp.where(toc > 0, ccum[jnp.maximum(toc - 1, 0)], 0)
        ne4 = (seg_len > 0).reshape(num_tiles // 4, 4)
        fi = jnp.argmax(ne4, axis=1)
        return (jnp.sum(toc[::64]) + jnp.sum(cit[::64])
                + jnp.sum(fi[::64]))

    timed("  s5 bounds+chunkmaps+flags", s5, st)


if __name__ == "__main__":
    main()
