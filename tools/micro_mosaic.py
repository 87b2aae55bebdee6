#!/usr/bin/env python
"""Micro-tests of the Mosaic mechanics the v3 rasterizer rests on:

  1. dynamic lane-axis extraction of a [REC, 128] window at arbitrary
     element offset r from two adjacent 128-blocks — three candidate
     mechanisms (matmul-shift, pltpu.roll, lax.dynamic_slice),
  2. input_output_aliasing to pre-zero a pallas output,
  3. per-chunk cost of the extraction at kernel scale.

Run on the real chip: python tools/micro_mosaic.py
CPU interpret check:   python tools/micro_mosaic.py --device cpu
"""
import argparse
import contextlib
import functools
import time

import numpy as np

REC = 16
K = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="")
    args = ap.parse_args()
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def interp():
        return (pltpu.force_tpu_interpret_mode()
                if jax.default_backend() == "cpu"
                else contextlib.nullcontext())

    rng = np.random.default_rng(0)
    n_chunks = 64
    s = n_chunks * K
    data = jnp.asarray(rng.normal(size=(REC, s + K)).astype(np.float32))
    # per-chunk window starts: arbitrary element offsets
    starts = jnp.asarray(
        np.sort(rng.integers(0, s - 1, size=n_chunks)).astype(np.int32))

    def expected():
        out = np.zeros((n_chunks, REC), np.float32)
        d = np.asarray(data)
        for c in range(n_chunks):
            p = int(starts[c])
            win = d[:, p:p + K]          # [REC, K]
            out[c] = win.sum(axis=1)
        return out

    exp = expected()

    def make_kernel(mode):
        def kernel(p_ref, in1, in2, out_ref):
            c = pl.program_id(0)
            r = p_ref[c] % K
            full = jnp.concatenate([in1[:], in2[:]], axis=1)  # [REC, 2K]
            if mode == "matmul":
                rows = jax.lax.broadcasted_iota(jnp.int32, (2 * K, K), 0)
                cols = jax.lax.broadcasted_iota(jnp.int32, (2 * K, K), 1)
                sel = (rows == cols + r).astype(jnp.float32)
                win = jax.lax.dot_general(
                    full, sel, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
            elif mode == "roll":
                win = pltpu.roll(full, -r, 1)[:, :K]
            elif mode == "dynslice":
                win = jax.lax.dynamic_slice(full, (0, r), (REC, K))
            s16 = jnp.sum(win, axis=1)                     # [REC]
            out_ref[0] = jnp.concatenate(
                [s16[None, :], jnp.zeros((7, REC), jnp.float32)], axis=0)

        return kernel

    # cumsum-as-matmul exactness probe: L @ x vs doubling scan
    try:
        def cs_kernel(x_ref, out_ref, *, prec):
            xk = x_ref[:]
            kk = xk.shape[0]
            rows = jax.lax.broadcasted_iota(jnp.int32, (kk, kk), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (kk, kk), 1)
            L = (rows >= cols).astype(jnp.float32)   # inclusive cumsum
            out_ref[:] = jax.lax.dot_general(
                L.T, xk, (((0,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)

        xs = jnp.asarray(rng.normal(size=(128, 256)).astype(np.float32))
        ref = np.cumsum(np.asarray(xs), axis=0)
        for prec in (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST):
            with interp():
                got = pl.pallas_call(
                    functools.partial(cs_kernel, prec=prec),
                    out_shape=jax.ShapeDtypeStruct((128, 256),
                                                   jnp.float32),
                )(xs)
            rel = float(np.abs(np.asarray(got) - ref).max()
                        / (np.abs(ref).max() + 1e-9))
            print(f"cumsum-matmul prec={str(prec):20s} rel_err={rel:.2e}")
    except Exception as e:
        print("cumsum-matmul ERROR:", type(e).__name__, str(e)[:150])

    for mode in ("matmul", "roll", "dynslice"):
        try:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_chunks,),
                in_specs=[
                    pl.BlockSpec((REC, K), lambda c, p: (0, p[c] // K)),
                    pl.BlockSpec((REC, K), lambda c, p: (0, p[c] // K + 1)),
                ],
                out_specs=pl.BlockSpec((1, 8, REC), lambda c, p: (c, 0, 0)),
            )
            with interp():
                out = pl.pallas_call(
                    make_kernel(mode),
                    out_shape=jax.ShapeDtypeStruct((n_chunks, 8, REC),
                                                   jnp.float32),
                    grid_spec=grid_spec,
                )(starts, data, data)
            err = float(np.abs(np.asarray(out)[:, 0] - exp).max())
            print(f"extract[{mode:8s}]  max_err={err:.2e}  "
                  f"{'OK' if err < 1e-4 else 'FAIL'}")
        except Exception as e:
            print(f"extract[{mode:8s}]  ERROR: {type(e).__name__}: "
                  f"{str(e)[:200]}")

    # ---- 2. input_output_aliasing zero-init ---------------------------
    try:
        def acc_kernel(in_ref, _alias_ref, out_ref):
            i = pl.program_id(0)

            @pl.when(i % 2 == 0)
            def _():
                out_ref[:] = out_ref[:] + in_ref[:]

        zeros = jnp.zeros((8, 128), jnp.float32)
        ones = jnp.ones((8, 128), jnp.float32)
        with interp():
            out = pl.pallas_call(
                acc_kernel,
                grid=(4,),
                in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0)),
                          pl.BlockSpec((8, 128), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                input_output_aliases={1: 0},
            )(ones, zeros)
        got = float(out[0, 0])
        print(f"io-alias zero-init  out={got}  "
              f"{'OK' if got == 2.0 else 'FAIL'}")
    except Exception as e:
        print(f"io-alias zero-init  ERROR: {type(e).__name__}: "
              f"{str(e)[:200]}")

    # ---- 3. extraction cost at kernel scale ---------------------------
    if jax.default_backend() != "cpu":
        P = 256
        n_big = 8192

        def blend_kernel(p_ref, in1, in2, out_ref, *, extract):
            c = pl.program_id(0)
            r = p_ref[c] % K
            if extract:
                full = jnp.concatenate([in1[:], in2[:]], axis=1)
                rows = jax.lax.broadcasted_iota(jnp.int32, (2 * K, K), 0)
                cols = jax.lax.broadcasted_iota(jnp.int32, (2 * K, K), 1)
                sel = (rows == cols + r).astype(jnp.float32)
                win = jax.lax.dot_general(
                    full, sel, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                win = in1[:]
            rec = win.T  # [K, REC]
            px = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1
                                          ).astype(jnp.float32)
            dx = rec[:, 0:1] - px
            a = rec[:, 5:6] * jnp.exp(-0.5 * rec[:, 2:3] * dx * dx)
            out_ref[0] = jnp.sum(a, axis=0, keepdims=True).reshape(2, 128)

        big = jnp.asarray(
            rng.normal(size=(REC, n_big * K + K)).astype(np.float32))
        st2 = jnp.asarray((np.arange(n_big) * K + 7).astype(np.int32))
        for extract in (False, True):
            kern = functools.partial(blend_kernel, extract=extract)
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_big,),
                in_specs=[
                    pl.BlockSpec((REC, K), lambda c, p: (0, p[c] // K)),
                    pl.BlockSpec((REC, K), lambda c, p: (0, p[c] // K + 1)),
                ],
                out_specs=pl.BlockSpec((1, 2, 128), lambda c, p: (c, 0, 0)),
            )
            fn = jax.jit(lambda s_, d: pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((n_big, 2, 128),
                                                     jnp.float32),
                grid_spec=gs)(s_, d, d))
            out = fn(st2, big)
            float(jnp.sum(out[0]))
            t0 = time.perf_counter()
            for _ in range(8):
                out = fn(st2, big)
            float(jnp.sum(out[0]))
            dt = (time.perf_counter() - t0) / 8 * 1e3
            print(f"blend-kernel extract={extract}:  {dt:7.2f} ms "
                  f"({dt / n_big * 1e3:.3f} us/chunk)")


if __name__ == "__main__":
    main()
