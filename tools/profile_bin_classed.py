#!/usr/bin/env python
"""Sub-stage timing of bin_gaussians_classed at the production bench scale.

The round-4 bench reports 16.3 ms for the classed binning stage while a
2M-row 12-operand payload sort costs ~3 ms — this profiler breaks the
binning graph into its component sorts/maps to find where the rest goes.
Each piece is jitted separately with scalar-fetch sync (axon relay).
"""
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from splatco_tpu.data.cameras import look_at_camera
    from splatco_tpu.ops import binning as B
    from splatco_tpu.ops import rasterize_pallas as rp
    from splatco_tpu.ops.projection import project_gaussians_cols
    from splatco_tpu.ops.rasterize import suggest_class_spec

    rng = np.random.default_rng(0)
    n = 1 << 19
    h, w = 1088, 1600
    means = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 1.2)
    scales = jnp.asarray((0.001 + 0.004 * rng.uniform(size=(n, 3))
                          ).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    colors = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.95, size=(n,)).astype(np.float32))
    cam = look_at_camera([0, 0, -4.0], [0, 0, 0], [0, -1, 0],
                         1.2, 1.2 * h / w, w, h)

    tile = 32
    tiles_x, tiles_y = -(-w // tile), -(-h // tile)
    num_tiles = tiles_x * tiles_y
    kmax, chunk = 12, rp.CHUNK

    proj = jax.jit(lambda m, s, q: project_gaussians_cols(m, s, q, cam))(
        means, scales, quats)
    spec = suggest_class_spec(proj, colors, opac, h, w)
    print("class_spec:", spec)
    offs, s_pack = B.class_layout(spec)
    s_pad = -(-s_pack // chunk) * chunk
    s_total = s_pad + num_tiles * chunk
    print(f"s_pack={s_pack} s_total={s_total} num_tiles={num_tiles}")

    def timed(tag, fn, *args, iters=8):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.ravel()[:8]))
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        leaf = jax.tree_util.tree_leaves(outs[-1])[0]
        float(jnp.sum(leaf.ravel()[:8]))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{tag:36s} {dt:8.2f} ms")
        return out

    # ---- full classed binning, synced --------------------------------
    @jax.jit
    def full(proj, colors, opac):
        b = B.bin_gaussians_classed(proj, colors, opac, tile, tiles_x,
                                    tiles_y, kmax=kmax, chunk=chunk,
                                    class_spec=spec)
        return jnp.sum(b.packed[0]) + jnp.sum(b.slot_key[::1024])

    timed("FULL classed binning", full, proj, colors, opac)

    # ---- stage 1: rects + slot grid + class keys over N --------------
    @jax.jit
    def s1(proj, opac):
        op = opac.astype(jnp.float32)
        rad = proj.radius.astype(jnp.float32)
        x0, y0, sx_c, counts, clipped = B._rects(
            proj.mx, proj.my, rad, op, tile, tiles_x, tiles_y, kmax)
        grid = B._slot_grid(proj.mx, proj.my, proj.ca, proj.cb, proj.cc,
                            op, x0, y0, sx_c, counts, tile, tiles_x,
                            tiles_y, kmax, num_tiles)
        n_valid = jnp.sum(grid < num_tiles, axis=0).astype(jnp.int32)
        return B._class_keys(n_valid, tuple(kp for kp, _ in spec))

    class_key = timed("  s1 rects+grid+classkeys (N)", s1, proj, opac)

    # ---- stage 2: 13-operand class sort over N -----------------------
    depth_key = jnp.where(proj.radius > 0, proj.depth, jnp.inf)
    oidx = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def s2(class_key, proj, colors, opac):
        outs = jax.lax.sort(
            (class_key, proj.mx, proj.my, proj.ca, proj.cb, proj.cc,
             opac.astype(jnp.float32), colors[:, 0], colors[:, 1],
             colors[:, 2], depth_key, proj.radius.astype(jnp.float32),
             oidx), num_keys=1, is_stable=True)
        return sum(jnp.sum(o[::4096]) for o in outs[1:3])

    timed("  s2 class sort (13 ops, N)", s2, class_key, proj, colors, opac)

    # ---- stage 3: per-class regrid + left-pack -----------------------
    @jax.jit
    def s3(proj, opac):
        op = opac.astype(jnp.float32)
        acc = jnp.float32(0)
        for kp_c, b_c in spec:
            if b_c == 0:
                continue
            mxc = proj.mx[:b_c]
            myc = proj.my[:b_c]
            radc = proj.radius.astype(jnp.float32)[:b_c]
            opc = op[:b_c]
            x0, y0, sx_c, counts, _ = B._rects(
                mxc, myc, radc, opc, tile, tiles_x, tiles_y, kmax)
            grid = B._slot_grid(mxc, myc, proj.ca[:b_c], proj.cb[:b_c],
                                proj.cc[:b_c], opc, x0, y0, sx_c, counts,
                                tile, tiles_x, tiles_y, kmax, num_tiles)
            (grid,) = jax.lax.sort((grid,), dimension=0, num_keys=1,
                                   is_stable=False)
            acc = acc + jnp.sum(grid[:kp_c][::8, ::512].astype(jnp.float32))
        return acc

    timed("  s3 per-class regrid+leftpack", s3, proj, opac)

    # ---- stage 4: tile_only pre-sort + filler construction -----------
    tf = jnp.asarray(
        rng.integers(0, num_tiles + 1, size=s_pad, dtype=np.int32))

    @jax.jit
    def s4(tile_flat):
        (tile_only,) = jax.lax.sort((tile_flat,), num_keys=1,
                                    is_stable=False)
        trange = jnp.arange(num_tiles + 1, dtype=jnp.int32)
        c0 = jnp.searchsorted(tile_only, trange[:num_tiles], side="left")
        c1 = jnp.searchsorted(tile_only, trange[:num_tiles] + 1,
                              side="left")
        tpad = (-(c1 - c0).astype(jnp.int32)) % chunk
        jj = jnp.arange(chunk, dtype=jnp.int32)[None, :]
        fill_tile = jnp.where(jj < tpad[:, None], trange[:num_tiles, None],
                              num_tiles).reshape(num_tiles * chunk)
        return jnp.sum(fill_tile[::1024])

    timed("  s4 tile pre-sort + fillers", s4, tf)

    # ---- stage 5: global 12-operand payload sort over s_total --------
    key1 = jnp.asarray(
        rng.integers(0, num_tiles + 1, size=s_total, dtype=np.int32))
    key2 = jnp.asarray(rng.normal(size=s_total).astype(np.float32))
    cols10 = tuple(jnp.asarray(rng.normal(size=s_total).astype(np.float32))
                   for _ in range(9)) + (
        jnp.asarray(rng.integers(0, s_total, size=s_total, dtype=np.int32)),)

    @jax.jit
    def s5(key1, key2, cols):
        outs = jax.lax.sort((key1, key2) + cols, num_keys=2, is_stable=True)
        return sum(jnp.sum(o[::4096]) for o in outs[2:4])

    timed("  s5 global sort stable (12 ops)", s5, key1, key2, cols10)

    @jax.jit
    def s5u(key1, key2, cols):
        outs = jax.lax.sort((key1, key2) + cols, num_keys=2,
                            is_stable=False)
        return sum(jnp.sum(o[::4096]) for o in outs[2:4])

    timed("  s5 global sort UNSTABLE", s5u, key1, key2, cols10)

    # single fused key variant: tile * 2^20 | depth-rank would need a rank
    # pass; instead time a 1-key i32 sort for the comparison floor
    @jax.jit
    def s5one(key1, cols):
        outs = jax.lax.sort((key1,) + cols, num_keys=1, is_stable=False)
        return sum(jnp.sum(o[::4096]) for o in outs[1:3])

    timed("  s5 1-key unstable (11 ops)", s5one, key1, cols10)

    @jax.jit
    def s5key(key1, key2):
        outs = jax.lax.sort((key1, key2), num_keys=2, is_stable=True)
        return jnp.sum(outs[0][::4096])

    timed("  s5 keys only (no payload)", s5key, key1, key2)

    # ---- stage 6: searchsorted + chunk maps --------------------------
    c_max = s_total // chunk + num_tiles + 2
    sorted_tile = jnp.sort(key1)

    @jax.jit
    def s6(sorted_tile):
        trange = jnp.arange(num_tiles + 1, dtype=jnp.int32)
        t_start = jnp.searchsorted(sorted_tile, trange, side="left"
                                   ).astype(jnp.int32)
        t_end = jnp.searchsorted(sorted_tile, trange + 1, side="left"
                                 ).astype(jnp.int32)
        b0 = t_start // chunk
        b1 = -(-(t_end) // chunk)
        nchunk = jnp.maximum(jnp.where(t_end > t_start, b1 - b0, 0), 1)
        nchunk = nchunk.at[num_tiles].set(0)
        ccum = jnp.cumsum(nchunk)
        cidx = jnp.arange(c_max, dtype=jnp.int32)
        tile_of_chunk = jnp.sum(
            (cidx[:, None] >= ccum[None, :]).astype(jnp.int32), axis=1)
        return jnp.sum(tile_of_chunk[::64])

    timed("  s6 ranges + chunk maps", s6, sorted_tile)

    # ---- stage 7: the packed concat/stack materialization ------------
    @jax.jit
    def s7(cols):
        packed = jnp.concatenate(
            [jnp.stack(cols[:9], axis=0),
             jnp.zeros((B.REC_SIZE - 9, s_total), jnp.float32)], axis=0)
        return jnp.sum(packed[0, ::4096])

    timed("  s7 packed stack+concat", s7, cols10)

    # ---- broadcast/reshape record emission (stage-3 tail) ------------
    @jax.jit
    def s8(proj):
        acc = jnp.float32(0)
        for kp_c, b_c in spec:
            if b_c == 0:
                continue
            col = proj.mx[:b_c]
            acc = acc + jnp.sum(jnp.broadcast_to(
                col[None, :], (kp_c, b_c)).reshape(kp_c * b_c)[::4096])
        return acc

    timed("  s8 record broadcast emission x1", s8, proj)


if __name__ == "__main__":
    main()
