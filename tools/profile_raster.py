#!/usr/bin/env python
"""Stage-level timing of the rasterize fwd+bwd pipeline on the live device.

Breaks the bench.py workload into: projection, binning (depth sort + slot
sort + chunk maps), Pallas forward, Pallas backward, gradient unsort+reduce.
Each stage is jitted separately and timed with async dispatch.
"""
import time

import numpy as np


def timeit(fn, *args, iters=8):
    """Times with a scalar fetch per final output — block_until_ready is
    unreliable through the axon relay, so fns must return something a
    float() can be taken of (or a pytree whose first leaf is summed)."""
    import jax
    import jax.numpy as jnp

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf[::1024] if leaf.ndim == 1 else leaf))

    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from splatco_tpu.data.cameras import look_at_camera
    from splatco_tpu.ops import rasterize as rz
    from splatco_tpu.ops.binning import bin_gaussians, meta_block_bits
    from splatco_tpu.ops.projection import project_gaussians_cols
    from splatco_tpu.ops.rasterize_pallas import (backward_pallas,
                                                  forward_pallas)

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

    @jax.jit
    def stage_proj(means, scales, quats):
        return project_gaussians_cols(means, scales, quats, cam)

    ms, proj = timeit(stage_proj, means, scales, quats)
    print(f"projection            {ms:8.2f} ms")

    @jax.jit
    def stage_bin(proj, colors, opac):
        return bin_gaussians(proj, colors, opac, tile, tiles_x, tiles_y,
                             kmax=kmax, chunk=chunk)

    ms, binned = timeit(stage_bin, proj, colors, opac)
    print(f"binning               {ms:8.2f} ms   (S={binned.packed.shape[1]},"
          f" chunks={int(binned.num_chunks)})")

    fwd = jax.jit(lambda b: forward_pallas(b, num_tiles, tiles_x, bb))
    ms, out = timeit(fwd, binned)
    print(f"pallas forward        {ms:8.2f} ms")

    gio = jnp.concatenate([
        jnp.ones((num_tiles, 3, 8, 128), jnp.float32),
        out[:, :3], out[:, 3:4],
        jnp.zeros((num_tiles, 1, 8, 128), jnp.float32)], axis=1)
    bg = jnp.zeros(3, jnp.float32)
    bwd = jax.jit(lambda b, g: backward_pallas(b, g, bg, num_tiles,
                                               tiles_x, bb))
    ms, gr = timeit(bwd, binned, gio)
    print(f"pallas backward       {ms:8.2f} ms")

    @jax.jit
    def stage_unsort(grads, slot_key):
        _, *cols = jax.lax.sort(
            (slot_key,) + tuple(grads[i] for i in range(9)),
            num_keys=1, is_stable=False)
        g = jnp.stack(cols, axis=0).reshape(9, kmax, n)
        return jnp.sum(g, axis=1)

    ms, _ = timeit(stage_unsort, gr, binned.slot_key)
    print(f"grad unsort+reduce    {ms:8.2f} ms")

    # whole thing via the public custom-VJP op, for reference
    bgc = jnp.zeros(3, jnp.float32)
    gimg = jnp.asarray(rng.normal(size=(3, h, w)), jnp.float32)

    @jax.jit
    def fwdbwd(means, scales, quats, colors, opac):
        def loss(means, scales, quats, colors, opac):
            proj = project_gaussians_cols(means, scales, quats, cam)
            img = rz.rasterize(proj, colors, opac, bgc, h, w)
            return jnp.sum(img * gimg)
        l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
            means, scales, quats, colors, opac)
        return l + sum(x.sum() for x in g)

    ms, _ = timeit(fwdbwd, means, scales, quats, colors, opac)
    print(f"TOTAL fwd+bwd         {ms:8.2f} ms")


if __name__ == "__main__":
    main()
