#!/usr/bin/env python
"""Benchmark: Pallas rasterizer forward+backward at production scale.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is the end-to-end differentiable render time (projection +
sort-based binning + Pallas blend fwd, then full backward to all gaussian
attributes) for a 1600x1088 frame over ~400k visible gaussians — the hot
path of SplatCo training (4 such renders + one aggregated backward per
step).  The reference publishes no numeric tables (BASELINE.md), so
vs_baseline is the ratio against this repo's round-1 recorded value
(294.8 ms), i.e. >1.0 means faster than round 1.
"""
import json
import sys
import time

import numpy as np

ROUND1_MS = 294.8


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from splatco_tpu.data.cameras import look_at_camera
    from splatco_tpu.ops.projection import project_gaussians_cols
    from splatco_tpu.ops.rasterize import rasterize

    rng = np.random.default_rng(0)
    n = 1 << 19
    h, w = 1088, 1600
    means = rng.normal(size=(n, 3)).astype(np.float32) * 1.2
    scales = (0.001 + 0.004 * rng.uniform(size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    colors = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 0.95, size=(n,)).astype(np.float32))
    bg = jnp.zeros(3, jnp.float32)
    cam = look_at_camera([0, 0, -4.0], [0, 0, 0], [0, -1, 0],
                         1.2, 1.2 * h / w, w, h)
    gimg = jnp.asarray(rng.normal(size=(3, h, w)), jnp.float32)

    @jax.jit
    def fwdbwd(means, scales, quats, colors, opac):
        def loss(means, scales, quats, colors, opac):
            # columnwise EWA projection — the trainer's hot path
            # (parallel/train_step.py uses the same project_cols route)
            proj = project_gaussians_cols(means, scales, quats, cam)
            img = rasterize(proj, colors, opac, bg, h, w)
            return jnp.sum(img * gimg)

        l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
            means, scales, quats, colors, opac)
        return l + sum(x.sum() for x in g)

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            colors, opac)
    v = float(fwdbwd(*args))  # compile + warm
    # async-dispatch all iterations, sync once: keeps host<->device
    # round-trip latency (large through the axon tunnel) out of the number
    iters = 8
    t0 = time.perf_counter()
    outs = [fwdbwd(*args) for _ in range(iters)]
    v = float(outs[-1])
    dt_ms = (time.perf_counter() - t0) / iters * 1e3
    assert np.isfinite(v)

    print(json.dumps({
        "metric": "rasterize_fwd_bwd_ms_1600x1088_524k",
        "value": round(dt_ms, 2),
        "unit": "ms/frame",
        "vs_baseline": round(ROUND1_MS / dt_ms, 3),
    }))


if __name__ == "__main__":
    main()
