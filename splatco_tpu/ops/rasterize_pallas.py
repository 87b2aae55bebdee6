"""Pallas TPU tile rasterizer: forward + analytic backward.

The hot kernel of the framework — the TPU-native replacement for the
reference's CUDA `diff-gaussian-rasterization` (SURVEY §2.2 N1, consumed at
/root/reference/gaussian_renderer/__init__.py:160-171), with identical blend
semantics (see ops/rasterize_reference.py for the contract) and analytic
gradients to means2d / conics / colors / opacities.

Architecture (see ops/binning.py for the sort-based binning):
  * image carved into 32x32 pixel tiles; a tile's 1024 pixels live in one
    native (8, 128) VPU register tile,
  * grid = one step per CHUNK of K=64 depth-ordered gaussian records; chunks
    of the same tile are consecutive, so the output block (indexed by tile)
    and the blend state (VMEM scratch) stay resident across a tile's chunks
    — the classic revisited-block accumulation pattern,
  * grid size is DYNAMIC — only real chunks execute,
  * per chunk: batched alpha evaluation [K, 8, 128] on the VPU; the
    transmittance recurrence is NOT serial — because T is monotonically
    non-increasing, the CUDA early-termination gate is exactly a prefix
    mask on the running product, so blending is a log-depth exclusive
    cumprod (see _blend_chunk); color accumulation and all gradient math
    are batched over the chunk,
  * early-out: once every pixel of a tile is terminated, remaining chunks
    only pay their (pipelined) 4KB block DMA,
  * backward replays the forward per tile, computes dL/dalpha via the
    "suffix = total - prefix" identity (algebraically identical to the CUDA
    back-to-front traversal; prefix over the chunk is a log-depth doubling
    cumsum), and emits PER-SLOT gradients in packed order — the caller
    un-sorts them with one payload sort and reduces with reshape+sum, so
    there is no scatter-add anywhere.

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
PIX_SUB = 8        # (8, 128) register tile holds the 1024 pixels
PIX_LANE = 128
# gaussians per grid step (= lane width of the transposed record blocks).
# Smaller chunks waste fewer rows at tile-segment boundaries (the aligned
# block windows over-cover by ~CHUNK/2 rows per boundary) but pay more
# per-step grid overhead; 128 measured best on v5e, env knob for A/B.
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
    """Pixel centers of tile `t` as (8,128) f32 (row-major 32x32 layout:
    lin = i0*128 + i1, y = lin // 32, x = lin % 32)."""
    tx = t % tiles_x
    ty = t // tiles_x
    i0 = jax.lax.broadcasted_iota(jnp.int32, (PIX_SUB, PIX_LANE), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (PIX_SUB, PIX_LANE), 1)
    yl = i0 * 4 + i1 // TILE
    xl = i1 % TILE
    px = (tx * TILE + xl).astype(jnp.float32)
    py = (ty * TILE + yl).astype(jnp.float32)
    return px, py


def _col(rec, i):
    # keep every intermediate >= 2D (Mosaic cannot lay out 1D vectors)
    return rec[:, i:i + 1].reshape(CHUNK, 1, 1)


def _chunk_alphas(rec, px, py, row0, start, end):
    """Batched alpha evaluation for a (K, REC_SIZE) record block.

    Returns alpha_eff [K,8,128]: zero where the gaussian is skipped
    (power>0, alpha<1/255) or the row lies outside [start, end)."""
    dx = _col(rec, 0) - px[None]
    dy = _col(rec, 1) - py[None]
    ca, cb, cc = _col(rec, 2), _col(rec, 3), _col(rec, 4)
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, _col(rec, 5) * jnp.exp(power))
    kidx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1, 1), 0)
    rowv = (row0 + kidx >= start) & (row0 + kidx < end)
    live = rowv & (power <= 0.0) & (alpha >= ALPHA_MIN)
    return jnp.where(live, alpha, 0.0)


def _cumprod_excl_dim0(y):
    """EXCLUSIVE cumprod along dim0 of [K,8,128] via log-depth doubling
    (identity-padded static shifts; no sequential dependency chain)."""
    ones1 = jnp.ones((1, PIX_SUB, PIX_LANE), jnp.float32)
    x = jnp.concatenate([ones1, y[:-1]], axis=0)
    sh = 1
    while sh < CHUNK:
        pad = jnp.ones((sh, PIX_SUB, PIX_LANE), jnp.float32)
        x = x * jnp.concatenate([pad, x[:-sh]], axis=0)
        sh *= 2
    return x


def _blend_chunk(alpha, state):
    """Blend weights for one chunk, fully batched over K (no recurrence).

    The CUDA per-gaussian loop gates each contribution on
    `test_T = T*(1-a) >= eps` with sticky termination.  Because T is
    monotonically non-increasing, that recurrence is EXACTLY a prefix mask
    on the running product P_k = T_in * prod_{j<=k}(1-a_j): gaussian k
    contributes iff a_k > 0, P_k >= eps and the pixel was not already done
    (skipped gaussians have a=0 and multiply P by 1, so they neither
    terminate nor contribute — identical to the serial semantics).

    Returns (w [K,8,128] blend weights a*T_before, t_excl [K,8,128] the
    per-slot T_before) and updates state rows 3 (T) / 4 (done)."""
    T_in = state[3]
    done_in = state[4]
    y = 1.0 - alpha
    p_excl = T_in[None] * _cumprod_excl_dim0(y)
    p_incl = p_excl * y
    not_done = done_in[None] < 0.5
    contrib = (alpha > 0.0) & (p_incl >= T_EPS) & not_done
    w = jnp.where(contrib, alpha * p_excl, 0.0)
    # final T = P at the last contributing slot (P is non-increasing and
    # T_in >= every contributing P, so a plain min does it)
    state[3] = jnp.min(jnp.where(contrib, p_incl, T_in[None]), axis=0)
    terminated = (alpha > 0.0) & (p_incl < T_EPS) & not_done
    state[4] = jnp.maximum(done_in,
                           jnp.max(terminated.astype(jnp.float32), axis=0))
    return w, p_excl


def _cumsum_dim0(x):
    """Inclusive cumsum along dim0 of [K,8,128] via log-depth doubling
    (static shifts only; jnp.cumsum is unsupported in Mosaic)."""
    sh = 1
    while sh < CHUNK:
        pad = jnp.zeros((sh, PIX_SUB, PIX_LANE), jnp.float32)
        x = x + jnp.concatenate([pad, x[:-sh]], axis=0)
        sh *= 2
    return x


# ----------------------------------------------------------------------
# forward kernel
# ----------------------------------------------------------------------

def _fwd_kernel(meta_ref, tstart_ref, tend_ref,   # scalar prefetch
                packed_ref,                        # [K, REC] VMEM block
                out_ref,                           # [1, 4, 8, 128] block
                state,                             # scratch
                *, tiles_x, block_bits):
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
        state[0:3] = jnp.zeros((3, PIX_SUB, PIX_LANE), jnp.float32)
        state[3] = jnp.ones((PIX_SUB, PIX_LANE), jnp.float32)
        state[4] = jnp.zeros((PIX_SUB, PIX_LANE), jnp.float32)

    any_alive = jnp.any(state[4] < 0.5)

    @pl.when(any_alive & (end > start))
    def _():
        px, py = _pixel_coords(t, tiles_x)
        rec = packed_ref[:].T  # [REC,K] block -> [K,REC]
        alpha = _chunk_alphas(rec, px, py, row0, start, end)
        w, _ = _blend_chunk(alpha, state)
        state[0] = state[0] + jnp.sum(_col(rec, 6) * w, axis=0)
        state[1] = state[1] + jnp.sum(_col(rec, 7) * w, axis=0)
        state[2] = state[2] + jnp.sum(_col(rec, 8) * w, axis=0)

    @pl.when(is_last)
    def _():
        out_ref[0, 0] = state[0]
        out_ref[0, 1] = state[1]
        out_ref[0, 2] = state[2]
        out_ref[0, 3] = state[3]


# ----------------------------------------------------------------------
# backward kernel
# ----------------------------------------------------------------------

def _bwd_kernel(meta_ref, tstart_ref, tend_ref, bg_ref,  # scalar prefetch
                packed_ref,                 # [K, REC] block (same as fwd)
                gio_ref,                    # [1, 8, 8, 128]: rows 0-2 grad
                                            #  rgb, 3-5 acc_total, 6 T_fin
                grad_ref,                   # [K, REC] out block, packed order
                state,                      # scratch
                *, tiles_x, block_bits):
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
        # rows: 0 = carried g.partial, 3 = T, 4 = done
        state[0] = jnp.zeros((PIX_SUB, PIX_LANE), jnp.float32)
        state[3] = jnp.ones((PIX_SUB, PIX_LANE), jnp.float32)
        state[4] = jnp.zeros((PIX_SUB, PIX_LANE), jnp.float32)

    # grad block is transposed [REC_SIZE, CHUNK]: pair index on lanes
    kidx16 = jax.lax.broadcasted_iota(jnp.int32, (REC_SIZE, CHUNK), 1)
    rowv16 = (row0 + kidx16 >= start) & (row0 + kidx16 < end)
    any_alive = jnp.any(state[4] < 0.5)
    do_work = any_alive & (end > start)

    @pl.when(jnp.logical_not(do_work))
    def _():
        # saturated/empty: these rows' gradients are exactly zero
        grad_ref[:] = jnp.where(rowv16, 0.0, grad_ref[:])

    @pl.when(do_work)
    def _():
        px, py = _pixel_coords(t, tiles_x)
        rec = packed_ref[:].T
        alpha = _chunk_alphas(rec, px, py, row0, start, end)
        carry_in = state[0]
        w, t_before = _blend_chunk(alpha, state)

        g0 = gio_ref[0, 0]
        g1 = gio_ref[0, 1]
        g2 = gio_ref[0, 2]
        g_acc_tot = (gio_ref[0, 3] * g0 + gio_ref[0, 4] * g1
                     + gio_ref[0, 5] * g2)
        T_fin = gio_ref[0, 6]
        bg_dot_g = bg_ref[0] * g0 + bg_ref[1] * g1 + bg_ref[2] * g2

        gc = (_col(rec, 6) * g0[None] + _col(rec, 7) * g1[None]
              + _col(rec, 8) * g2[None])                    # [K,8,128]
        gcw = gc * w
        prefix_incl = carry_in[None] + _cumsum_dim0(gcw)
        state[0] = prefix_incl[CHUNK - 1]

        contrib = w > 0.0
        suffix_g = g_acc_tot[None] - prefix_incl
        one_m = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
        d_alpha = jnp.where(
            contrib,
            gc * t_before - (suffix_g + bg_dot_g[None] * T_fin[None]) / one_m,
            0.0)
        not_clamped = alpha < ALPHA_MAX
        d_power = jnp.where(not_clamped, d_alpha * alpha, 0.0)
        dx = _col(rec, 0) - px[None]
        dy = _col(rec, 1) - py[None]
        # the position/conic/opacity gradients all factor through six
        # pixel-reduced moments of d_power (the per-slot coefficients
        # ca/cb/cc/op are constants over the pixel tile), so reduce the
        # moments and finish with [K,1]-sized algebra — ~9 fewer
        # full-[K,8,128] elementwise passes than forming each gradient
        # field before reduction
        dpx = d_power * dx
        dpy = d_power * dy

        def red(x):  # [K,8,128] -> [K,1], keeping all intermediates 2D
            return jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)

        r0 = red(d_power)
        rx = red(dpx)
        ry = red(dpy)
        rxx = red(dpx * dx)
        rxy = red(dpx * dy)
        ryy = red(dpy * dy)
        rcr = red(g0[None] * w)
        rcg = red(g1[None] * w)
        rcb = red(g2[None] * w)

        ca1, cb1, cc1 = rec[:, 2:3], rec[:, 3:4], rec[:, 4:5]  # [K,1]
        op1 = rec[:, 5:6]
        grads = jnp.concatenate(
            [-(ca1 * rx + cb1 * ry), -(cb1 * rx + cc1 * ry),
             -0.5 * rxx, -rxy, -0.5 * ryy,
             r0 / jnp.maximum(op1, 1e-12), rcr, rcg, rcb,
             jnp.zeros((CHUNK, REC_SIZE - 9), jnp.float32)],
            axis=1)
        grad_ref[:] = jnp.where(rowv16, grads.T, grad_ref[:])


# ----------------------------------------------------------------------
# host-side pallas_call wrappers
# ----------------------------------------------------------------------

def forward_pallas(binned, num_tiles: int, tiles_x: int, block_bits: int):
    """Run the forward kernel.  Returns out [num_tiles, 4, 8, 128]:
    rows 0-2 accumulated RGB (no background), row 3 final transmittance."""
    s = binned.packed.shape[1]
    kernel = functools.partial(_fwd_kernel, tiles_x=tiles_x,
                               block_bits=block_bits)
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
            pltpu.VMEM((8, PIX_SUB, PIX_LANE), jnp.float32),
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
                    block_bits: int):
    """Run the backward kernel.  `gio` is [num_tiles, 8, 8, 128] (grad rgb,
    acc_total rgb, T_fin, unused).  Returns per-slot grads
    [REC_SIZE, S] (transposed, packed order; rows: mx my ca cb cc op
    r g b)."""
    s = binned.packed.shape[1]
    kernel = functools.partial(_bwd_kernel, tiles_x=tiles_x,
                               block_bits=block_bits)
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
            pltpu.VMEM((8, PIX_SUB, PIX_LANE), jnp.float32),
        ],
    )
    with _interpret_if_cpu():
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((REC_SIZE, s), jnp.float32),
            grid_spec=grid_spec,
        )(binned.chunk_meta, binned.tile_start, binned.tile_end, bg,
          binned.packed, gio)
