#!/usr/bin/env python
"""v3 rasterizer timing at the production bench scale (1600x1088, 524k),
stage split + full differentiable render, for A/B against the v2 numbers
in BENCH_r04 (projection 3.6 / binning 16.3 / fwd 15.9 / bwd 26.2 /
unsort 11.6 = 58.7 ms/frame)."""
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
    gimg = jnp.asarray(rng.normal(size=(3, h, w)), jnp.float32)

    def timeit(fn, *args, iters=8):
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

    # measure the 16px slot histogram -> spec
    kmax16 = 24
    _, aux = rasterize(proj, colors, opac, bg, h, w, kmax=kmax16,
                       tile16=True, return_aux=True)
    kps = tuple(k for k in KPS_DEFAULT if k < kmax16) + (kmax16,)
    counts = np.asarray(aux["class_counts"])
    spec = spec_from_counts(counts, kps, n, 1.15)
    print("v3 class_spec:", spec, " (counts:", counts.tolist(), ")")
    print("max_slots:", int(aux["max_slots"]),
          "clipped:", int(aux["num_clipped"]))

    parents_x, parents_y = r3.parent_grid(h, w)
    num_parents = parents_x * parents_y
    tiles_x, tiles_y = 2 * parents_x, 2 * parents_y

    binf = jax.jit(lambda p, c, o: r3.bin_gaussians_v3(
        p, c, o, tiles_x, tiles_y, kmax=kmax16, class_spec=spec))
    ms, binned = timeit(binf, proj, colors, opac)
    s_pad = binned['packed'].shape[1] - r3.K
    n_steps = int(binned['num_steps'])
    print(f"binning v3            {ms:8.2f} ms  "
          f"(s_pad={s_pad}, steps={n_steps})")

    fwd = jax.jit(lambda b: r3.forward_pallas_v3(b, num_parents,
                                                 parents_x))
    ms, out = timeit(fwd, binned)
    print(f"pallas fwd v3         {ms:8.2f} ms")

    gio = jnp.concatenate([
        jnp.ones((num_parents, 3, 8, 128), jnp.float32),
        out[:, :3], out[:, 3:4],
        jnp.zeros((num_parents, 1, 8, 128), jnp.float32)], axis=1)
    cap = int(n_steps * 1.2) + 8
    print(f"steps_cap={cap} -> walk rows {4 * cap * r3.K}")
    bwd = jax.jit(lambda b, g: r3.backward_pallas_v3(b, g, bg,
                                                     num_parents,
                                                     parents_x,
                                                     steps_cap=cap))
    ms, _ = timeit(bwd, binned, gio)
    print(f"pallas bwd v3         {ms:8.2f} ms")

    @jax.jit
    def fwdbwd(means, scales, quats, colors, opac):
        def loss(means, scales, quats, colors, opac):
            proj = project_gaussians_cols(means, scales, quats, cam)
            img = rasterize(proj, colors, opac, bg, h, w, kmax=kmax16,
                            class_spec=spec, tile16=True,
                            steps_cap=cap)
            return jnp.sum(img * gimg)
        l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
            means, scales, quats, colors, opac)
        return l + sum(x.sum() for x in g)

    ms, _ = timeit(fwdbwd, means, scales, quats, colors, opac)
    print(f"TOTAL v3 fwd+bwd      {ms:8.2f} ms   (v2: 58.3)")


if __name__ == "__main__":
    main()
