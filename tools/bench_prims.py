"""Microbenchmarks for the rasterizer's data-movement primitives on TPU.

Measures the candidate designs for killing the binning/unsort sort tax
(VERDICT r2 item 1): wide payload sorts vs narrow key sorts + gather
reconstruction, at several slot-array sizes.

Timing methodology (required through the axon relay, where
block_until_ready does NOT block): async-dispatch `iters` calls, then one
scalar-sum fetch on the last output — matches bench.py.

WARNING — gathers: a 1D XLA gather with ~1.5M indices WEDGED the v5e
device executor for hours (observed 2026-08-20: the program never
completed and the chip stopped granting claims).  Gather benchmarks are
therefore gated behind --gathers and capped at 64k indices.  The hot
rasterizer path must stay sort-based (it does).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.ravel()[:8]))


def timeit(fn, *args, iters=8):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    sync(outs[-1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    n = 524288
    print("device:", jax.devices()[0].device_kind, flush=True)

    sort12 = jax.jit(lambda t, d, *c: jax.lax.sort(
        (t, d) + c, num_keys=2, is_stable=True))
    sort3 = jax.jit(lambda t, d, sk: jax.lax.sort(
        (t, d, sk), num_keys=2, is_stable=True))
    sort2 = jax.jit(lambda sk, i: jax.lax.sort(
        (sk, i), num_keys=1, is_stable=False))
    sort10 = jax.jit(lambda sk, *c: jax.lax.sort(
        (sk,) + c, num_keys=1, is_stable=False))
    gather1 = jax.jit(lambda t, i: t[i])
    gather9 = jax.jit(lambda t, i: tuple(t[k][i] for k in range(9)))
    gather_rows = jax.jit(lambda t, i: t[i, :])
    seg_sum = jax.jit(lambda v, sid: jax.ops.segment_sum(
        v, sid, num_segments=n, indices_are_sorted=True))

    for s in (1_572_864, 2_621_440, 5_767_168):
        ks = jax.random.split(jax.random.fold_in(key, s), 16)
        tile = jax.random.randint(ks[0], (s,), 0, 1700, jnp.int32)
        depth = jax.random.uniform(ks[1], (s,), jnp.float32)
        cols = tuple(jax.random.uniform(ks[2 + i], (s,), jnp.float32)
                     for i in range(10))
        slot_key = jax.random.permutation(ks[11], s).astype(jnp.int32)
        idx = jax.random.randint(ks[12], (s,), 0, n, jnp.int32)
        tbl9 = tuple(jax.random.uniform(ks[13], (n,), jnp.float32)
                     for _ in range(9))
        tbl_rows = jax.random.uniform(ks[13], (n, 8), jnp.float32)
        sids = jnp.sort(idx)
        iota = jnp.arange(s, dtype=jnp.int32)

        bench = [
            ("sort12_2key", sort12, (tile, depth) + cols[:10]),
            ("sort3_2key", sort3, (tile, depth, slot_key)),
            ("sort2_1key", sort2, (slot_key, iota)),
            ("sort10_1key", sort10, (slot_key,) + cols[:9]),
        ]
        import sys
        if "--gathers" in sys.argv:
            # DANGER: megascale gathers have wedged the chip; keep tiny
            cap = 65536
            bench += [
                ("gather_1col_64k", gather1, (tbl9[0], idx[:cap])),
                ("gather_rows8_64k", gather_rows, (tbl_rows, idx[:cap])),
                ("segsum_1col_64k", seg_sum, (cols[0][:cap], sids[:cap])),
            ]
        for name, fn, args in bench:
            ms = timeit(fn, *args)
            print(f"S={s} {name}: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
