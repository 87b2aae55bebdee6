#!/usr/bin/env python
"""Pin down the true cost of bin_gaussians inside a fused graph, with
scalar-extraction sync (float()) to defeat any async/lazy artifacts."""
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from splatco_tpu.data.cameras import look_at_camera
    from splatco_tpu.ops.binning import bin_gaussians, meta_block_bits
    from splatco_tpu.ops.projection import (cols_of,
        project_from_camera)
    from splatco_tpu.ops.rasterize_pallas import forward_pallas
    from splatco_tpu.utils.math import build_covariance

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
    tiles_x = -(-w // tile)
    tiles_y = -(-h // tile)
    num_tiles = tiles_x * tiles_y
    kmax, chunk = 12, 128
    bb = meta_block_bits(n, kmax, chunk)

    cov3d = build_covariance(scales, quats)
    proj = jax.jit(lambda m, c: cols_of(project_from_camera(m, c, cam)))(means, cov3d)
    jax.block_until_ready(proj)

    def timed(tag, fn, *args, iters=8):
        v = float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        v = float(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{tag:28s} {dt:8.2f} ms")

    @jax.jit
    def bin_only(proj, colors, opac, salt):
        p = proj._replace(mx=proj.mx + salt * 0.0)
        b = bin_gaussians(p, colors, opac, tile, tiles_x, tiles_y,
                          kmax=kmax, chunk=chunk)
        return jnp.sum(b.packed[0]) + jnp.sum(b.slot_key) * 1e-9

    timed("bin only (synced)", bin_only, proj, colors, opac,
          jnp.float32(1.0))

    @jax.jit
    def bin_fwd(proj, colors, opac):
        b = bin_gaussians(proj, colors, opac, tile, tiles_x, tiles_y,
                          kmax=kmax, chunk=chunk)
        out = forward_pallas(b, num_tiles, tiles_x, bb)
        return jnp.sum(out[:, 0:3])

    timed("bin + pallas fwd (synced)", bin_fwd, proj, colors, opac)

    # component sorts, synced
    @jax.jit
    def sort_s_11col(key, cols):
        outs = jax.lax.sort((key,) + tuple(cols), num_keys=1,
                            is_stable=True)
        return sum(jnp.sum(o[::1024]) for o in outs[1:])

    s = n * kmax
    key = jnp.asarray(rng.integers(0, 1700, size=s, dtype=np.int32))
    cols10 = tuple(jnp.asarray(rng.normal(size=s).astype(np.float32))
                   for _ in range(10))
    timed("S=6.3M sort, 10 payload", sort_s_11col, key, cols10)

    @jax.jit
    def sort_s_1col(key, col):
        outs = jax.lax.sort((key, col), num_keys=1, is_stable=True)
        return jnp.sum(outs[1][::1024])

    timed("S=6.3M sort, 1 payload", sort_s_1col, key,
          jnp.asarray(rng.integers(0, s, size=s, dtype=np.int32)))

    @jax.jit
    def gather_9(idx, cols):
        return sum(jnp.sum(c[idx][::1024]) for c in cols)

    idx = jnp.asarray(rng.integers(0, n, size=s, dtype=np.int32))
    cols9 = tuple(jnp.asarray(rng.normal(size=n).astype(np.float32))
                  for _ in range(9))
    timed("9x gather 6.3M from 524k", gather_9, idx, cols9)


if __name__ == "__main__":
    main()
