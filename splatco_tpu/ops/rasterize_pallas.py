"""Pallas TPU tile rasterizer: forward + analytic backward.

The hot kernel of the framework — the TPU-native replacement for the
reference's CUDA `diff-gaussian-rasterization` (SURVEY §2.2 N1, consumed at
/root/reference/gaussian_renderer/__init__.py:160-171), with identical blend
semantics (see ops/rasterize_reference.py for the contract) and analytic
gradients to means2d / conics / colors / opacities.

Architecture (see ops/binning.py for the sort-based binning):
  * image carved into 32x32 pixel tiles; a tile's 1024 pixels live on the
    128-lane axis as [*, 1024] rows (8 native lane tiles) — all per-chunk
    math is 2D [K, P] with per-record columns [K, 1] and per-pixel rows
    [1, P], the layout Mosaic compiles tightest (measured ~25-40% faster
    than the [K, 8, 128] 3D form),
  * grid = one step per CHUNK of K=128 depth-ordered gaussian records;
    chunks of the same tile are consecutive, so the output block (indexed
    by tile) and the blend state (VMEM scratch, kept in [1, P] row layout
    so no per-chunk relayouts happen) stay resident across a tile's chunks,
  * grid size is DYNAMIC — only real chunks execute,
  * per chunk: batched alpha evaluation [K, P] on the VPU; the
    transmittance recurrence is NOT serial — because T is monotonically
    non-increasing, the CUDA early-termination gate is exactly a prefix
    mask on the running product, so blending is a log-depth exclusive
    cumprod (see _blend); color accumulation and all gradient math are
    batched over the chunk.  Per-step overhead measured 0.56 us — the
    kernels are VPU-math-bound, not grid/DMA-bound,
  * early-out: once every pixel of a tile is terminated, remaining chunks
    only pay their (pipelined) block DMA,
  * `exact_segments` template flag (the class-packed binning path): every
    tile's segment is chunk-aligned and exclusive (ops/binning.py filler
    records), so the kernels skip row-validity masks entirely and the
    backward streams full grad blocks with no read-modify-write.  The
    uniform path keeps the row masks and masked RMW writes (aligned block
    windows overlap at tile boundaries there),
  * backward replays the forward per tile, computes dL/dalpha via the
    "suffix = total - prefix" identity (algebraically identical to the CUDA
    back-to-front traversal; prefix over the chunk is a log-depth doubling
    cumsum), and emits PER-SLOT gradients in packed order — the caller
    un-sorts them with one payload sort and reduces with reshape+sum, so
    there is no scatter-add anywhere.  The per-tile constant of the suffix
    term (grad.acc_total + (bg.grad) * T_final) is hoisted into scratch
    once per tile.

All state is f32.  VMEM footprint ~1.5 MB forward / ~3 MB backward.
"""
from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splatco_tpu.ops.binning import REC_SIZE


def _interpret_if_cpu():
    """Mosaic kernels only lower for TPU; on the CPU backend (tests, the
    --device cpu CLI path, virtual meshes) run in interpret mode
    automatically so callers don't need to wrap every entry point."""
    if jax.default_backend() == "cpu":
        return pltpu.force_tpu_interpret_mode()
    return contextlib.nullcontext()

TILE = 32          # pixel tile is TILE x TILE
PIX_SUB = 8        # the (8, 128) register tile of the HBM out/gio blocks
PIX_LANE = 128
P = TILE * TILE    # pixels per tile, flat row-major on the lane axis
# gaussians per grid step (= lane width of the transposed record blocks).
CHUNK = int(os.environ.get("SPLATCO_CHUNK", "128"))
# the [REC_SIZE, CHUNK] record blocks put CHUNK on the 128-lane axis and
# the doubling cumprod/cumsum assume a power of two; a non-multiple would
# mis-tile under Mosaic.  NOTE: module-import-time env constant — all
# processes sharing jit caches/goldens must agree on it.
assert CHUNK >= 128 and CHUNK % 128 == 0 and (CHUNK & (CHUNK - 1)) == 0, (
    f"SPLATCO_CHUNK must be a power-of-two multiple of 128, got {CHUNK}")
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def _pixel_coords(t, tiles_x):
    """Pixel centers of tile `t` as (1, P) f32 rows (row-major TILE x TILE:
    y = i // TILE, x = i % TILE)."""
    tx = t % tiles_x
    ty = t // tiles_x
    i1 = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    yl = i1 // TILE
    xl = i1 % TILE
    px = (tx * TILE + xl).astype(jnp.float32)
    py = (ty * TILE + yl).astype(jnp.float32)
    return px, py


def _col(rec, i):
    return rec[:, i:i + 1]  # [K, 1] per-record column


def _chunk_alphas(rec, px, py, row0, start, end, exact_segments):
    """Batched alpha evaluation for a [K, REC] record block.

    Returns (alpha_eff [K, P], dx, dy): zero where the gaussian is skipped
    (power>0, alpha<1/255) or — uniform path only — the row lies outside
    [start, end).  On the classed path segment rows are exact and filler
    records self-mask (opacity 0)."""
    dx = _col(rec, 0) - px
    dy = _col(rec, 1) - py
    ca, cb, cc = _col(rec, 2), _col(rec, 3), _col(rec, 4)
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, _col(rec, 5) * jnp.exp(power))
    live = (power <= 0.0) & (alpha >= ALPHA_MIN)
    if not exact_segments:
        kidx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        live = live & (row0 + kidx >= start) & (row0 + kidx < end)
    return jnp.where(live, alpha, 0.0), dx, dy


def _cumprod_excl_dim0(y):
    """EXCLUSIVE cumprod along dim0 of [K, P] via log-depth doubling
    (identity-padded static shifts; no sequential dependency chain)."""
    ones1 = jnp.ones((1, P), jnp.float32)
    x = jnp.concatenate([ones1, y[:-1]], axis=0)
    sh = 1
    while sh < CHUNK:
        pad = jnp.ones((sh, P), jnp.float32)
        x = x * jnp.concatenate([pad, x[:-sh]], axis=0)
        sh *= 2
    return x


def _blend(alpha, T_in, done_in):
    """Blend weights for one chunk, fully batched over K (no recurrence).

    The CUDA per-gaussian loop gates each contribution on
    `test_T = T*(1-a) >= eps` with sticky termination.  Because T is
    monotonically non-increasing, that recurrence is EXACTLY a prefix mask
    on the running product P_k = T_in * prod_{j<=k}(1-a_j): gaussian k
    contributes iff a_k > 0, P_k >= eps and the pixel was not already done
    (skipped gaussians have a=0 and multiply P by 1, so they neither
    terminate nor contribute — identical to the serial semantics).

    T_in/done_in are [1, P] rows; returns (w [K,P], t_excl [K,P],
    T_out [1,P], done_out [1,P])."""
    y = 1.0 - alpha
    p_excl = T_in * _cumprod_excl_dim0(y)
    p_incl = p_excl * y
    not_done = done_in < 0.5
    contrib = (alpha > 0.0) & (p_incl >= T_EPS) & not_done
    w = jnp.where(contrib, alpha * p_excl, 0.0)
    # final T = P at the last contributing slot (P is non-increasing and
    # T_in >= every contributing P, so a plain min does it)
    T_out = jnp.min(jnp.where(contrib, p_incl, T_in), axis=0,
                    keepdims=True)
    terminated = (alpha > 0.0) & (p_incl < T_EPS) & not_done
    done_out = jnp.maximum(
        done_in, jnp.max(terminated.astype(jnp.float32), axis=0,
                         keepdims=True))
    return w, p_excl, T_out, done_out


def _cumsum_dim0(x):
    """Inclusive cumsum along dim0 of [K, P] via log-depth doubling
    (static shifts only; jnp.cumsum is unsupported in Mosaic)."""
    sh = 1
    while sh < CHUNK:
        pad = jnp.zeros((sh, P), jnp.float32)
        x = x + jnp.concatenate([pad, x[:-sh]], axis=0)
        sh *= 2
    return x


# ----------------------------------------------------------------------
# forward kernel
# ----------------------------------------------------------------------
# scratch `state` is [5, 1, P]: rows 0-2 accumulated rgb, 3 T, 4 done —
# [1, P] row layout so the per-chunk math never relayouts; the one
# (PIX_SUB, PIX_LANE) reshape happens per TILE at the output write.

def _fwd_kernel(meta_ref, tstart_ref, tend_ref,   # scalar prefetch
                packed_ref,                        # [REC, K] VMEM block
                out_ref,                           # [1, 4, 8, 128] block
                state,                             # scratch [5, 1, P]
                *, tiles_x, block_bits, exact_segments):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    meta = meta_ref[c]
    t = meta >> block_bits
    blk = meta & ((1 << block_bits) - 1)
    prev_t = jnp.where(c > 0, meta_ref[jnp.maximum(c - 1, 0)] >> block_bits,
                       -1)
    next_t = jnp.where(c + 1 < nc,
                       meta_ref[jnp.minimum(c + 1, nc - 1)] >> block_bits, -1)
    is_first = prev_t != t
    is_last = next_t != t
    start = tstart_ref[t]
    end = tend_ref[t]
    row0 = blk * CHUNK

    @pl.when(is_first)
    def _():
        state[0:3] = jnp.zeros((3, 1, P), jnp.float32)
        state[3] = jnp.ones((1, P), jnp.float32)
        state[4] = jnp.zeros((1, P), jnp.float32)

    any_alive = jnp.any(state[4] < 0.5)

    @pl.when(any_alive & (end > start))
    def _():
        px, py = _pixel_coords(t, tiles_x)
        rec = packed_ref[:].T  # [REC, K] block -> [K, REC]
        alpha, _, _ = _chunk_alphas(rec, px, py, row0, start, end,
                                    exact_segments)
        w, _, T_out, done_out = _blend(alpha, state[3], state[4])
        state[0] = state[0] + jnp.sum(_col(rec, 6) * w, axis=0,
                                      keepdims=True)
        state[1] = state[1] + jnp.sum(_col(rec, 7) * w, axis=0,
                                      keepdims=True)
        state[2] = state[2] + jnp.sum(_col(rec, 8) * w, axis=0,
                                      keepdims=True)
        state[3] = T_out
        state[4] = done_out

    @pl.when(is_last)
    def _():
        out_ref[0, 0] = state[0].reshape(PIX_SUB, PIX_LANE)
        out_ref[0, 1] = state[1].reshape(PIX_SUB, PIX_LANE)
        out_ref[0, 2] = state[2].reshape(PIX_SUB, PIX_LANE)
        out_ref[0, 3] = state[3].reshape(PIX_SUB, PIX_LANE)


# ----------------------------------------------------------------------
# backward kernel
# ----------------------------------------------------------------------
# scratch `state` is [8, 1, P]: 0 carried gcw prefix, 1 T, 2 done,
# 3 gtot = grad.acc_total + (bg.grad)*T_fin (per-tile constant),
# 4-6 the grad image rows g0/g1/g2 (reshaped once per tile).

def _bwd_kernel(meta_ref, tstart_ref, tend_ref, bg_ref,  # scalar prefetch
                packed_ref,                 # [REC, K] block (same as fwd)
                gio_ref,                    # [1, 8, 8, 128]: rows 0-2 grad
                                            #  rgb, 3-5 acc_total, 6 T_fin
                grad_ref,                   # [REC, K] out block, packed order
                state,                      # scratch [8, 1, P]
                *, tiles_x, block_bits, exact_segments):
    c = pl.program_id(0)
    meta = meta_ref[c]
    t = meta >> block_bits
    blk = meta & ((1 << block_bits) - 1)
    prev_t = jnp.where(c > 0, meta_ref[jnp.maximum(c - 1, 0)] >> block_bits,
                       -1)
    is_first = prev_t != t
    start = tstart_ref[t]
    end = tend_ref[t]
    row0 = blk * CHUNK

    @pl.when(is_first)
    def _():
        state[0] = jnp.zeros((1, P), jnp.float32)
        state[1] = jnp.ones((1, P), jnp.float32)
        state[2] = jnp.zeros((1, P), jnp.float32)
        g0 = gio_ref[0, 0].reshape(1, P)
        g1 = gio_ref[0, 1].reshape(1, P)
        g2 = gio_ref[0, 2].reshape(1, P)
        state[4] = g0
        state[5] = g1
        state[6] = g2
        state[3] = ((gio_ref[0, 3].reshape(1, P) * g0
                     + gio_ref[0, 4].reshape(1, P) * g1
                     + gio_ref[0, 5].reshape(1, P) * g2)
                    + (bg_ref[0] * g0 + bg_ref[1] * g1 + bg_ref[2] * g2)
                    * gio_ref[0, 6].reshape(1, P))

    any_alive = jnp.any(state[2] < 0.5)
    do_work = any_alive & (end > start)

    if not exact_segments:
        # boundary blocks are shared between tiles on the uniform path:
        # only this tile's rows may be written (masked RMW)
        kidx16 = jax.lax.broadcasted_iota(jnp.int32, (REC_SIZE, CHUNK), 1)
        rowv16 = (row0 + kidx16 >= start) & (row0 + kidx16 < end)

    @pl.when(jnp.logical_not(do_work))
    def _():
        # saturated/empty: these rows' gradients are exactly zero
        if exact_segments:
            grad_ref[:] = jnp.zeros((REC_SIZE, CHUNK), jnp.float32)
        else:
            grad_ref[:] = jnp.where(rowv16, 0.0, grad_ref[:])

    @pl.when(do_work)
    def _():
        px, py = _pixel_coords(t, tiles_x)
        rec = packed_ref[:].T
        alpha, dx, dy = _chunk_alphas(rec, px, py, row0, start, end,
                                      exact_segments)
        w, t_before, T_out, done_out = _blend(alpha, state[1], state[2])
        state[1] = T_out
        state[2] = done_out

        g0 = state[4]
        g1 = state[5]
        g2 = state[6]

        gc = (_col(rec, 6) * g0 + _col(rec, 7) * g1
              + _col(rec, 8) * g2)                           # [K, P]
        gcw = gc * w
        prefix_incl = state[0] + _cumsum_dim0(gcw)
        state[0] = prefix_incl[CHUNK - 1:CHUNK]

        contrib = w > 0.0
        suffix_g = state[3] - prefix_incl
        one_m = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
        d_alpha = jnp.where(contrib, gc * t_before - suffix_g / one_m, 0.0)
        not_clamped = alpha < ALPHA_MAX
        d_power = jnp.where(not_clamped, d_alpha * alpha, 0.0)
        # the position/conic/opacity gradients all factor through six
        # pixel-reduced moments of d_power (the per-slot coefficients
        # ca/cb/cc/op are constants over the pixel tile), so reduce the
        # moments and finish with [K,1]-sized algebra — ~9 fewer
        # full-[K,P] elementwise passes than forming each gradient
        # field before reduction
        dpx = d_power * dx
        dpy = d_power * dy

        def red(x):  # [K, P] -> [K, 1]
            return jnp.sum(x, axis=1, keepdims=True)

        r0 = red(d_power)
        rx = red(dpx)
        ry = red(dpy)
        rxx = red(dpx * dx)
        rxy = red(dpx * dy)
        ryy = red(dpy * dy)
        rcr = red(g0 * w)
        rcg = red(g1 * w)
        rcb = red(g2 * w)

        ca1, cb1, cc1 = rec[:, 2:3], rec[:, 3:4], rec[:, 4:5]  # [K,1]
        op1 = rec[:, 5:6]
        grads = jnp.concatenate(
            [-(ca1 * rx + cb1 * ry), -(cb1 * rx + cc1 * ry),
             -0.5 * rxx, -rxy, -0.5 * ryy,
             r0 / jnp.maximum(op1, 1e-12), rcr, rcg, rcb,
             jnp.zeros((CHUNK, REC_SIZE - 9), jnp.float32)],
            axis=1)
        if exact_segments:
            grad_ref[:] = grads.T
        else:
            grad_ref[:] = jnp.where(rowv16, grads.T, grad_ref[:])


# ----------------------------------------------------------------------
# host-side pallas_call wrappers
# ----------------------------------------------------------------------

def forward_pallas(binned, num_tiles: int, tiles_x: int, block_bits: int,
                   exact_segments: bool = False):
    """Run the forward kernel.  Returns out [num_tiles, 4, 8, 128]:
    rows 0-2 accumulated RGB (no background), row 3 final transmittance.
    exact_segments=True (class-packed binning): segments are chunk-aligned
    and exclusive, so row-validity masks are skipped."""
    kernel = functools.partial(_fwd_kernel, tiles_x=tiles_x,
                               block_bits=block_bits,
                               exact_segments=exact_segments)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(binned.num_chunks,),
        in_specs=[
            pl.BlockSpec((REC_SIZE, CHUNK),
                         lambda c, meta, ts, te:
                         (0, meta[c] & ((1 << block_bits) - 1))),
        ],
        out_specs=pl.BlockSpec((1, 4, PIX_SUB, PIX_LANE),
                               lambda c, meta, ts, te:
                               (meta[c] >> block_bits, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((5, 1, P), jnp.float32),
        ],
    )
    with _interpret_if_cpu():
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((num_tiles, 4, PIX_SUB, PIX_LANE),
                                           jnp.float32),
            grid_spec=grid_spec,
        )(binned.chunk_meta, binned.tile_start, binned.tile_end,
          binned.packed)


def backward_pallas(binned, gio, bg, num_tiles: int, tiles_x: int,
                    block_bits: int, exact_segments: bool = False):
    """Run the backward kernel.  `gio` is [num_tiles, 8, 8, 128] (grad rgb,
    acc_total rgb, T_fin, unused).  Returns per-slot grads
    [REC_SIZE, S] (transposed, packed order; rows: mx my ca cb cc op
    r g b)."""
    s = binned.packed.shape[1]
    kernel = functools.partial(_bwd_kernel, tiles_x=tiles_x,
                               block_bits=block_bits,
                               exact_segments=exact_segments)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(binned.num_chunks,),
        in_specs=[
            pl.BlockSpec((REC_SIZE, CHUNK),
                         lambda c, meta, ts, te, bg_:
                         (0, meta[c] & ((1 << block_bits) - 1))),
            pl.BlockSpec((1, 8, PIX_SUB, PIX_LANE),
                         lambda c, meta, ts, te, bg_:
                         (meta[c] >> block_bits, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((REC_SIZE, CHUNK),
                               lambda c, meta, ts, te, bg_:
                               (0, meta[c] & ((1 << block_bits) - 1))),
        scratch_shapes=[
            pltpu.VMEM((8, 1, P), jnp.float32),
        ],
    )
    with _interpret_if_cpu():
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((REC_SIZE, s), jnp.float32),
            grid_spec=grid_spec,
        )(binned.chunk_meta, binned.tile_start, binned.tile_end, bg,
          binned.packed, gio)
