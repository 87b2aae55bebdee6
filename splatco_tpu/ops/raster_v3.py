"""Rasterizer v3 — 16x16 subtiles + element-granular tile segments.

The round-4 profile said the v2 design pays two structural taxes:

  * 32x32 pixel tiles: every (gaussian, tile) pair evaluates 1024 pixels,
    ~4x more than the CUDA reference's 16x16 tiles — and the kernels are
    VPU-math-bound, so that factor is wall-clock,
  * chunk-aligned segments: padding every tile's segment to a CHUNK
    multiple injects num_tiles*CHUNK filler rows into the 12-operand
    global sort (~21% at 32x32; it would be ~85% at 16x16 and eat the
    win — the reason v2 stayed at 32x32).

v3 removes both:

  * pixel tiles are 16x16 (P=256) but tile ids are PARENT-MAJOR: the four
    subtiles of each 32x32 parent are consecutive ids, and the image
    output block is the parent's [4, 8, 128] native-tile block — subtile
    s owns sublanes [2s, 2s+2).  Image blocks stay (8,128)-tiled, and
    subtile revisits of a parent block are consecutive grid steps,
  * tile segments are ELEMENT-GRANULAR: the global (tile, depth) sort
    carries only real pairs (no fillers, no alignment), and each kernel
    step reads a [REC, K] window starting at an arbitrary element offset
    by fetching the two straddled 128-blocks and lane-shifting with a
    one-hot matmul on the MXU (~32 cycles; Mosaic has no dynamic lane
    slice of comparable cost),
  * the backward emits per-slot grads through TWO output arrays (the
    window part in block B and the spill part in block B+1), written
    with first-visit-zero-fill + revisit-RMW masks; their sum is the
    packed-order grad array.  No read of uninitialized memory: every
    lane of every visited block is written on first visit, and the
    element-order window walk guarantees the real writer of a lane is
    its last writer (see _bwd_kernel for the masks).

Blend semantics are IDENTICAL to v2 / the CUDA reference (same per-pixel
depth-order compositing; reference consumed at
/root/reference/gaussian_renderer/__init__.py:160-171, SURVEY §2.2 N1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splatco_tpu.ops import binning as b2
from splatco_tpu.ops.binning import REC_SIZE
from splatco_tpu.ops.rasterize_pallas import (ALPHA_MAX, ALPHA_MIN, T_EPS,
                                              _interpret_if_cpu)

TILE = 16          # pixel tile (subtile) is 16x16
P = TILE * TILE    # 256 pixels per subtile: [1, 256] rows, 2 lane tiles
# gaussians per grid step = lane width of the record window (each step
# walks all four subtiles of one parent, so the step's math runs on
# [K, 1024] vectors).  Larger K adds masked boundary waste per tile;
# measured sweet spot on v5e: 128.  Must be a power-of-two multiple of
# 128 (block lane axis + log-depth scans).
import os as _os  # noqa: E402

K = int(_os.environ.get("SPLATCO_V3_CHUNK", "128"))
assert K >= 128 and K % 128 == 0 and (K & (K - 1)) == 0
PIX_SUB = 8
PIX_LANE = 128


# ----------------------------------------------------------------------
# tile id mapping: parent-major, subtile-minor
# ----------------------------------------------------------------------

def parent_grid(image_height: int, image_width: int):
    """(parents_x, parents_y): 32x32 parent tiles covering the image."""
    return -(-image_width // 32), -(-image_height // 32)


def remap_rowmajor_to_parent(t, tiles_x, num_tiles):
    """Row-major 16px tile id -> parent-major id (invalid rows keep
    num_tiles)."""
    tx = t % tiles_x
    ty = t // tiles_x
    parent = (ty >> 1) * (tiles_x >> 1) + (tx >> 1)
    sub = (ty & 1) * 2 + (tx & 1)
    return jnp.where(t < num_tiles, parent * 4 + sub, num_tiles)


# ----------------------------------------------------------------------
# binning: classed, element-granular (no fillers, no alignment chunks)
# ----------------------------------------------------------------------

def padded_slots(class_spec, chunk: int = K) -> int:
    """Static slot total: packed class slots rounded up to a K multiple
    (ONE global pad at the tail — not per tile)."""
    _, s_pack = b2.class_layout(class_spec)
    return -(-s_pack // chunk) * chunk


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "kmax", "c_max", "class_spec"),
)
def bin_gaussians_v3(
    proj,
    colors: jax.Array,
    opacities: jax.Array,
    tiles_x: int,           # 16px tiles (2 * parents_x)
    tiles_y: int,
    kmax: int = 24,
    c_max: int | None = None,
    class_spec: tuple = ((2, 0), (24, 0)),
):
    """Class-packed binning at 16px granularity.  Returns the same
    BinnedGaussians tuple as v2 with:
      packed    [REC, S + K]  (one zero tail block for the +1 window read)
      chunk_meta: UNUSED (zeros) — v3 uses tile_of_chunk/p_of_chunk
    plus v3 scalar maps in the aux fields (see raster_v3.rasterize_v3)."""
    n = proj.mx.shape[0]
    num_tiles = tiles_x * tiles_y
    kps = tuple(kp for kp, _ in class_spec)
    assert all(kps[i] < kps[i + 1] for i in range(len(kps) - 1))
    assert kps[-1] == kmax, "last class must cover kmax"
    assert sum(b for _, b in class_spec) >= n
    offs, s_pack = b2.class_layout(class_spec)
    s_pad = -(-s_pack // K) * K

    f32 = jnp.float32
    valid = proj.radius > 0
    depth_key = jnp.where(valid, proj.depth, jnp.inf).astype(f32)
    mx, my = proj.mx, proj.my
    ca, cb, cc = proj.ca, proj.cb, proj.cc
    op = opacities.astype(f32)
    cr, cg, cb2 = colors[:, 0], colors[:, 1], colors[:, 2]
    rad = proj.radius.astype(f32)
    oidx = jnp.arange(n, dtype=jnp.int32)

    # ---- 1. per-gaussian class from the reach-valid slot count -------
    x0, y0, sx_c, counts, clipped = b2._rects(
        mx, my, rad, op, TILE, tiles_x, tiles_y, kmax)
    num_clipped = jnp.sum(clipped.astype(jnp.int32))
    grid = b2._slot_grid(mx, my, ca, cb, cc, op, x0, y0, sx_c, counts,
                         TILE, tiles_x, tiles_y, kmax, num_tiles)
    n_valid = jnp.sum(grid < num_tiles, axis=0).astype(jnp.int32)
    max_slots = jnp.max(n_valid)
    class_key = b2._class_keys(n_valid, kps)
    # class_counts aux uses the STANDARD ladder (not this spec's classes)
    # so the measuring pass (single wide class) still seeds tight budgets
    ladder = tuple(k for k in b2.KPS_DEFAULT if k < kmax) + (kmax,)
    hist = b2._class_hist(n_valid, ladder)

    # ---- 2. stable class sort carrying the full record ---------------
    (_, smx, smy, sca, scb, scc, sop, scr, scg, scb2, sdepth, srad,
     soidx) = jax.lax.sort(
        (class_key, mx, my, ca, cb, cc, op, cr, cg, cb2, depth_key, rad,
         oidx), num_keys=1, is_stable=True)
    cnt = jnp.zeros((len(kps),), jnp.int32)
    for ci in range(len(kps)):
        cnt = cnt.at[ci].set(jnp.sum(class_key == ci))
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(cnt)[:-1]])

    # ---- 3. per-class slot emission + left-pack ----------------------
    tiles_parts, slotkey_parts, rank_parts = [], [], []
    rec_parts = {name: [] for name in
                 ("mx", "my", "ca", "cb", "cc", "op", "cr", "cg", "cb2",
                  "depth")}
    num_overflow = jnp.int32(0)
    for ci, (kp_c, b_c) in enumerate(class_spec):
        if b_c == 0:
            continue
        st = starts[ci]
        st_cl = jnp.clip(st, 0, max(n - b_c, 0))

        def sl(a):
            return jax.lax.dynamic_slice_in_dim(a, st_cl, b_c, axis=0)

        row = st_cl + jnp.arange(b_c, dtype=jnp.int32)
        member = (row >= st) & (row < st + cnt[ci])
        num_overflow = num_overflow + jnp.maximum(cnt[ci] - b_c, 0)

        cmx, cmy = sl(smx), sl(smy)
        cca, ccb, ccc = sl(sca), sl(scb), sl(scc)
        cop = sl(sop)
        crad = jnp.where(member, sl(srad), 0.0)
        cx0, cy0, csx, ccounts, _ = b2._rects(
            cmx, cmy, crad, cop, TILE, tiles_x, tiles_y, kmax)
        grid_c = b2._slot_grid(cmx, cmy, cca, ccb, ccc, cop, cx0, cy0,
                               csx, ccounts, TILE, tiles_x, tiles_y, kmax,
                               num_tiles)
        # remap to parent-major ids BEFORE the left-pack so the global
        # sort orders subtiles parent-major (consecutive output blocks)
        grid_c = remap_rowmajor_to_parent(grid_c, tiles_x, num_tiles)
        # reach-INVALID slots go to one of 4 PAD subtiles (one extra
        # parent walked by the kernels): the backward emits every packed
        # slot's key exactly once, which the key-sorted positional
        # reduction depends on (grads of pad-parent rows are zeroed)
        jj4 = jax.lax.broadcasted_iota(jnp.int32, grid_c.shape, 0)
        ii4 = jax.lax.broadcasted_iota(jnp.int32, grid_c.shape, 1)
        grid_c = jnp.where(grid_c >= num_tiles,
                           num_tiles + ((jj4 + ii4) & 3), grid_c)
        (grid_c,) = jax.lax.sort((grid_c,), dimension=0, num_keys=1,
                                 is_stable=False)
        grid_c = grid_c[:kp_c]
        tiles_parts.append(grid_c.reshape(kp_c * b_c))
        base = offs[ci]
        jj = jnp.arange(kp_c, dtype=jnp.int32)[:, None]
        ii = jnp.arange(b_c, dtype=jnp.int32)[None, :]
        slotkey_parts.append((base + jj * b_c + ii).reshape(kp_c * b_c))
        for name, col in (("mx", cmx), ("my", cmy), ("ca", cca),
                          ("cb", ccb), ("cc", ccc), ("op", cop),
                          ("cr", sl(scr)), ("cg", sl(scg)),
                          ("cb2", sl(scb2)), ("depth", sl(sdepth))):
            rec_parts[name].append(
                jnp.broadcast_to(col[None, :], (kp_c, b_c)
                                 ).reshape(kp_c * b_c))
        rank_parts.append(jnp.where(member, sl(soidx), n))

    pad = s_pad - s_pack

    def cat(parts, fill):
        out = jnp.concatenate(parts)
        if pad:
            out = jnp.concatenate(
                [out, jnp.full((pad,), fill, out.dtype)])
        return out

    # ---- 4. global stable (tile, depth) payload sort ----------------
    # tail-pad rows get DISTINCT keys [s_pack, s_pad) and pad-subtile
    # ids so the backward's key completeness covers them too
    tile_flat = jnp.concatenate(tiles_parts)
    key_flat = jnp.concatenate(slotkey_parts)
    if pad:
        ptail = jnp.arange(pad, dtype=jnp.int32)
        tile_flat = jnp.concatenate(
            [tile_flat, num_tiles + (ptail & 3)])
        key_flat = jnp.concatenate([key_flat, s_pack + ptail])
    (sorted_tile, _, gmx, gmy, gca, gcb, gcc, gop, gcr, gcg, gcb2,
     sslot) = jax.lax.sort(
        (tile_flat, cat(rec_parts["depth"], jnp.inf),
         cat(rec_parts["mx"], 0.0), cat(rec_parts["my"], 0.0),
         cat(rec_parts["ca"], 0.0), cat(rec_parts["cb"], 0.0),
         cat(rec_parts["cc"], 0.0), cat(rec_parts["op"], 0.0),
         cat(rec_parts["cr"], 0.0), cat(rec_parts["cg"], 0.0),
         cat(rec_parts["cb2"], 0.0), key_flat),
        num_keys=2, is_stable=True)

    # one extra zero block so the (B+1) window read never leaves the
    # array; the packed slot key rides as record row 9 (exact in f32:
    # s_pad < 2^24) so the backward kernel can emit (key, grads) pairs
    # in walk order without any host-side spill bookkeeping
    assert s_pad < (1 << 24), "slot keys must stay f32-exact"
    packed = jnp.concatenate(
        [jnp.stack([gmx, gmy, gca, gcb, gcc, gop, gcr, gcg, gcb2,
                    sslot.astype(f32)], axis=0),
         jnp.zeros((REC_SIZE - 10, s_pad), f32)], axis=0)
    packed = jnp.concatenate([packed, jnp.zeros((REC_SIZE, K), f32)],
                             axis=1)

    # ---- 5. per-tile ranges + parent-quad step maps ------------------
    # the kernels walk PER PARENT: step (parent, j) processes the j-th
    # K-row window of all four subtile segments side by side, so the
    # blend math runs on [K, 4*256] vectors (full VPU issue width)
    nt_ext = num_tiles + 4                  # + the 4 pad subtiles
    trange = jnp.arange(nt_ext + 1, dtype=jnp.int32)
    t_bounds = jnp.searchsorted(sorted_tile, trange, side="left"
                                ).astype(jnp.int32)
    t_start = t_bounds                      # [T+5]; t_end[t]=t_start[t+1]
    t_end = jnp.concatenate(
        [t_bounds[1:], jnp.full((1,), s_pad, jnp.int32)])
    seg_len = jnp.maximum(t_end[:nt_ext] - t_start[:nt_ext], 0)
    num_parents = num_tiles // 4            # real parents (pad excluded)
    len4 = seg_len.reshape(num_parents + 1, 4)
    nstep = -(-jnp.max(len4, axis=1) // K)  # 0 for empty parents
    ccum = jnp.cumsum(nstep)
    num_steps = ccum[num_parents]           # INCLUDES the pad walk
    if c_max is None:
        c_max = s_pad // K + num_parents + 6
    cidx = jnp.arange(c_max, dtype=jnp.int32)
    parent_of_step = jnp.searchsorted(ccum, cidx, side="right"
                                      ).astype(jnp.int32)
    parent_of_step = jnp.minimum(parent_of_step, num_parents)
    j_of_step = cidx - jnp.where(
        parent_of_step > 0, ccum[jnp.maximum(parent_of_step - 1, 0)], 0)

    return dict(
        packed=packed,
        slot_key=sslot,
        parent_of_step=parent_of_step,
        j_of_step=j_of_step,
        t_start=t_start,
        t_end=t_end,
        parent_nonempty=jnp.any(len4[:num_parents] > 0, axis=1),
        num_steps=num_steps.astype(jnp.int32),
        num_clipped=num_clipped,
        num_overflow=num_overflow,
        max_slots=max_slots,
        rank_orig=jnp.concatenate(rank_parts),
        class_counts=hist,
        class_cnt_spec=cnt,
    )


# ----------------------------------------------------------------------
# kernels
# ----------------------------------------------------------------------

PQ = 4 * P  # quad row: the parent's four 16x16 subtiles side by side


def _roll_window(in1, in2, r):
    """[REC, K] record window at element offset r inside the two
    straddled K-blocks.  pltpu.roll supports dynamic shifts and is EXACT
    (pure lane movement); the one-hot-matmul alternative routes through
    the MXU's bf16 decomposition and loses ~1e-3 (tools/micro_mosaic.py);
    lax.dynamic_slice does not lower in Mosaic."""
    full = jnp.concatenate([in1[:], in2[:]], axis=1)       # [REC, 2K]
    return pltpu.roll(full, -r, 1)[:, :K]


def _quad_pixel_coords(par, parents_x):
    """Pixel centers of the parent's 4 subtiles as (1, PQ) rows (subtile-
    major, each 16x16 row-major)."""
    base_x = (par % parents_x) * 32
    base_y = (par // parents_x) * 32
    i1 = jax.lax.broadcasted_iota(jnp.int32, (1, PQ), 1)
    s = i1 // P
    w = i1 % P
    px = (base_x + (s & 1) * TILE + w % TILE).astype(jnp.float32)
    py = (base_y + (s >> 1) * TILE + w // TILE).astype(jnp.float32)
    return px, py


def _cumprod_excl_q(y):
    """Exclusive cumprod along dim0 of [K, PQ] (log-depth doubling)."""
    ones1 = jnp.ones((1, PQ), jnp.float32)
    x = jnp.concatenate([ones1, y[:-1]], axis=0)
    sh = 1
    while sh < K:
        padr = jnp.ones((sh, PQ), jnp.float32)
        x = x * jnp.concatenate([padr, x[:-sh]], axis=0)
        sh *= 2
    return x


def _cumsum_incl_q(x):
    sh = 1
    while sh < K:
        padr = jnp.zeros((sh, PQ), jnp.float32)
        x = x + jnp.concatenate([padr, x[:-sh]], axis=0)
        sh *= 2
    return x


def _blend_q(alpha, T_in, done_in):
    """Blend weights for one [K, PQ] quad chunk (v2 semantics: the CUDA
    early-termination recurrence expressed as a prefix mask on the
    running product — see rasterize_pallas._blend)."""
    y = 1.0 - alpha
    p_excl = T_in * _cumprod_excl_q(y)
    p_incl = p_excl * y
    not_done = done_in < 0.5
    contrib = (alpha > 0.0) & (p_incl >= T_EPS) & not_done
    w = jnp.where(contrib, alpha * p_excl, 0.0)
    T_out = jnp.min(jnp.where(contrib, p_incl, T_in), axis=0,
                    keepdims=True)
    terminated = (alpha > 0.0) & (p_incl < T_EPS) & not_done
    done_out = jnp.maximum(
        done_in, jnp.max(terminated.astype(jnp.float32), axis=0,
                         keepdims=True))
    return w, p_excl, T_out, done_out


def _quad_windows(refs, par, j, tstart_ref, tend_ref):
    """Extract the step's four subtile windows.

    Returns (recs [4][K, REC], alive-row counts nr4 [1, 4]).  The walk
    index is CLAMPED to the subtile's last block once j exceeds its own
    chunk count (matching the index maps), so reads stay in-bounds and
    the nrows mask (<= 0 there) kills the stale rows."""
    recs, nrows = [], []
    for s in range(4):
        t = 4 * par + s
        p = tstart_ref[t] + K * j
        win = _roll_window(refs[2 * s], refs[2 * s + 1], p % K)
        recs.append(win.T)                       # [K, REC]
        nrows.append(tend_ref[t] - p)
    return recs, nrows


def _quad_alphas(recs, nrows, px, py):
    """Alpha eval on the [K, PQ] quad row.  Per-record coefficients are
    piecewise per subtile: evaluate per subtile on [K, P] (independent
    streams — the compiler interleaves them) and concatenate."""
    alphas, dxs, dys = [], [], []
    kidx = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    for s in range(4):
        rec = recs[s]
        col = lambda i: rec[:, i:i + 1]
        pxs = px[:, s * P:(s + 1) * P]
        pys = py[:, s * P:(s + 1) * P]
        dx = col(0) - pxs
        dy = col(1) - pys
        power = (-0.5 * (col(2) * dx * dx + col(4) * dy * dy)
                 - col(3) * dx * dy)
        a = jnp.minimum(ALPHA_MAX, col(5) * jnp.exp(power))
        live = ((power <= 0.0) & (a >= ALPHA_MIN) & (kidx < nrows[s]))
        alphas.append(jnp.where(live, a, 0.0))
        dxs.append(dx)
        dys.append(dy)
    return (jnp.concatenate(alphas, axis=1), dxs, dys)


def _quad_color_rows(recs, ch):
    """[K, PQ] piecewise-constant color row (channel index 6/7/8)."""
    return jnp.concatenate(
        [jnp.broadcast_to(recs[s][:, ch:ch + 1], (K, P)) for s in
         range(4)], axis=1)


# forward scratch `state`: [5, 1, PQ] rgb rows 0-2, T row 3, done row 4

def _fwd_kernel_q(par_ref, j_ref, tstart_ref, tend_ref,  # scalar prefetch
                  *refs_out_state, parents_x):
    refs = refs_out_state[:8]
    out_ref = refs_out_state[8]
    state = refs_out_state[9]
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    par = par_ref[c]
    j = j_ref[c]
    next_par = jnp.where(c + 1 < nc, par_ref[jnp.minimum(c + 1, nc - 1)],
                         -1)
    is_first = j == 0
    is_last = next_par != par

    @pl.when(is_first)
    def _():
        state[0:3] = jnp.zeros((3, 1, PQ), jnp.float32)
        state[3] = jnp.ones((1, PQ), jnp.float32)
        state[4] = jnp.zeros((1, PQ), jnp.float32)

    any_alive = jnp.any(state[4] < 0.5)

    @pl.when(any_alive)
    def _():
        px, py = _quad_pixel_coords(par, parents_x)
        recs, nrows = _quad_windows(refs, par, j, tstart_ref, tend_ref)
        alpha, _, _ = _quad_alphas(recs, nrows, px, py)
        w, _, T_out, done_out = _blend_q(alpha, state[3], state[4])
        for ch in range(3):
            state[ch] = state[ch] + jnp.sum(
                _quad_color_rows(recs, 6 + ch) * w, axis=0, keepdims=True)
        state[3] = T_out
        state[4] = done_out

    @pl.when(is_last)
    def _():
        # [1, PQ] rows -> the parent's [4, 8, 128] block: subtile s at
        # sublanes [2s, 2s+2) (full-block write; no RMW, no revisits)
        blk = jnp.concatenate(
            [state[0], state[1], state[2], state[3]], axis=0
        ).reshape(4, PIX_SUB, PIX_LANE)
        out_ref[0] = blk


# backward scratch `state`: [8, 1, PQ]: 0 gcw prefix, 1 T, 2 done,
# 3 gtot, 4-6 grad-rgb rows

def _bwd_kernel_q(par_ref, j_ref, tstart_ref, tend_ref, bg_ref,
                  *refs_io_state, parents_x, num_parents):
    refs = refs_io_state[:8]
    gio_ref = refs_io_state[8]
    gouts = refs_io_state[9:13]
    state = refs_io_state[13]
    c = pl.program_id(0)
    par = par_ref[c]
    j = j_ref[c]
    is_first = j == 0

    @pl.when(is_first)
    def _():
        state[0] = jnp.zeros((1, PQ), jnp.float32)
        state[1] = jnp.ones((1, PQ), jnp.float32)
        state[2] = jnp.zeros((1, PQ), jnp.float32)
        # parent gio block [8, 8, 128]: channel rows hold the 4 subtiles
        # at sublanes [2s, 2s+2) -> flat [1, PQ] quad rows
        g = gio_ref[0].reshape(8, 1, PQ)
        state[4] = g[0]
        state[5] = g[1]
        state[6] = g[2]
        state[3] = (g[3] * g[0] + g[4] * g[1] + g[5] * g[2]
                    + (bg_ref[0] * g[0] + bg_ref[1] * g[1]
                       + bg_ref[2] * g[2]) * g[6])

    any_alive = jnp.any(state[2] < 0.5)
    SENTINEL = jnp.float32((1 << 24) - 1)

    @pl.when(jnp.logical_not(any_alive))
    def _():
        # saturated parent: grads are zero but the slot KEYS must still
        # be emitted (every packed slot appears exactly once among the
        # non-sentinel rows — the sorted prefix depends on it)
        recs, nrows = _quad_windows(refs, par, j, tstart_ref, tend_ref)
        kidx = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
        for s in range(4):
            keyrow = jnp.where(kidx < nrows[s], recs[s][:, 9:10],
                               SENTINEL)
            gouts[s][:] = jnp.concatenate(
                [jnp.zeros((K, 9), jnp.float32), keyrow,
                 jnp.zeros((K, REC_SIZE - 10), jnp.float32)], axis=1).T

    @pl.when(any_alive)
    def _():
        px, py = _quad_pixel_coords(par, parents_x)
        recs, nrows = _quad_windows(refs, par, j, tstart_ref, tend_ref)
        alpha, dxs, dys = _quad_alphas(recs, nrows, px, py)
        w, t_before, T_out, done_out = _blend_q(alpha, state[1],
                                                state[2])
        state[1] = T_out
        state[2] = done_out
        g0, g1c, g2c = state[4], state[5], state[6]
        gc = (_quad_color_rows(recs, 6) * g0
              + _quad_color_rows(recs, 7) * g1c
              + _quad_color_rows(recs, 8) * g2c)
        gcw = gc * w
        prefix_incl = state[0] + _cumsum_incl_q(gcw)
        state[0] = prefix_incl[K - 1:K]
        contrib = w > 0.0
        suffix_g = state[3] - prefix_incl
        one_m = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
        d_alpha = jnp.where(contrib, gc * t_before - suffix_g / one_m,
                            0.0)
        not_clamped = alpha < ALPHA_MAX
        d_power = jnp.where(not_clamped, d_alpha * alpha, 0.0)
        # full-width products BEFORE the subtile loop: Mosaic cannot
        # broadcast a lane-offset slice of a [1, PQ] scratch row to
        # [K, P] (hardware "Invalid input layout"), but broadcasting at
        # offset 0 then slicing the [K, PQ] product is whole-tile
        gw0 = g0 * w
        gw1 = g1c * w
        gw2 = g2c * w
        kidx = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
        for s in range(4):
            rec = recs[s]
            sl = slice(s * P, (s + 1) * P)
            dp = d_power[:, sl]
            dx, dy = dxs[s], dys[s]
            dpx = dp * dx
            dpy = dp * dy

            def red(x):
                return jnp.sum(x, axis=1, keepdims=True)

            r0 = red(dp)
            rx = red(dpx)
            ry = red(dpy)
            rxx = red(dpx * dx)
            rxy = red(dpx * dy)
            ryy = red(dpy * dy)
            rcr = red(gw0[:, sl])
            rcg = red(gw1[:, sl])
            rcb = red(gw2[:, sl])
            ca1, cb1, cc1 = rec[:, 2:3], rec[:, 3:4], rec[:, 4:5]
            op1 = rec[:, 5:6]
            # row 9 carries the slot key for valid rows, a sentinel
            # beyond the segment: the caller sorts (key, grads) straight
            # out of walk order — no spill/unsort bookkeeping
            keyrow = jnp.where(kidx < nrows[s], rec[:, 9:10], SENTINEL)
            # the PAD parent's rows carry reach-invalid slots: their
            # keys must flow (completeness) but their grads are zero
            gz = jnp.where(par < num_parents, 1.0, 0.0)
            grads = jnp.concatenate(
                [-(ca1 * rx + cb1 * ry) * gz, -(cb1 * rx + cc1 * ry) * gz,
                 -0.5 * rxx * gz, -rxy * gz, -0.5 * ryy * gz,
                 r0 / jnp.maximum(op1, 1e-12) * gz,
                 rcr * gz, rcg * gz, rcb * gz,
                 keyrow,
                 jnp.zeros((K, REC_SIZE - 10), jnp.float32)], axis=1)
            gouts[s][:] = grads.T


# ----------------------------------------------------------------------
# pallas_call wrappers
# ----------------------------------------------------------------------

def _in_idx(s, plus):
    """Index map of subtile s's window block (clamped to its segment's
    last block so stale steps re-read instead of running off the array);
    `plus` selects the second straddled block."""

    def idx(c, par, j, ts, te, *rest):
        t = 4 * par[c] + s
        start = ts[t]
        last = jnp.maximum(te[t] - 1, start)
        p = jnp.minimum(start + K * j[c], last)
        return (0, p // K + plus)

    return idx


def forward_pallas_v3(binned: dict, num_parents: int, parents_x: int):
    """Returns out [num_parents, 4, 8, 128] (rgb rows + T; subtile s of
    each parent at sublanes [2s, 2s+2), 16x16 row-major).  Parents with
    no content carry garbage — callers select the default via
    binned['parent_nonempty']."""
    kernel = functools.partial(_fwd_kernel_q, parents_x=parents_x)
    n_out = num_parents + 1  # + the pad parent's (discarded) block
    in_specs = []
    for s in range(4):
        in_specs.append(pl.BlockSpec((REC_SIZE, K), _in_idx(s, 0)))
        in_specs.append(pl.BlockSpec((REC_SIZE, K), _in_idx(s, 1)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(binned["num_steps"],),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 4, PIX_SUB, PIX_LANE),
                               lambda c, par, j, ts, te: (par[c], 0, 0,
                                                          0)),
        scratch_shapes=[pltpu.VMEM((5, 1, PQ), jnp.float32)],
    )
    packed = binned["packed"]
    with _interpret_if_cpu():
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n_out, 4, PIX_SUB, PIX_LANE), jnp.float32),
            grid_spec=grid_spec,
        )(binned["parent_of_step"], binned["j_of_step"],
          binned["t_start"], binned["t_end"],
          *([packed] * 8))
    return out[:num_parents]


def backward_pallas_v3(binned: dict, gio, bg, num_parents: int,
                       parents_x: int, steps_cap: int):
    """Per-walk-slot (key, grads) rows: returns [REC, 4 * steps_cap * K]
    where row 9 is the packed slot key (f32) or a sentinel for rows
    beyond their segment.  The caller sorts by key; the first s_pack
    rows of the sorted output are the packed-order grads."""
    kernel = functools.partial(_bwd_kernel_q, parents_x=parents_x,
                               num_parents=num_parents)
    in_specs = []
    for s in range(4):
        in_specs.append(pl.BlockSpec((REC_SIZE, K), _in_idx(s, 0)))
        in_specs.append(pl.BlockSpec((REC_SIZE, K), _in_idx(s, 1)))
    in_specs.append(pl.BlockSpec(
        (1, 8, PIX_SUB, PIX_LANE),
        lambda c, par, j, ts, te, bg_: (jnp.minimum(par[c],
                                                    num_parents - 1),
                                        0, 0, 0)))
    cap = steps_cap

    def out_idx(c, par, j, ts, te, bg_):
        # clamp: a frame whose step count exceeds the static cap
        # overwrites the last block (stale frame) — the caller detects
        # num_steps > steps_cap and re-jits with a bigger cap (the
        # class-budget adaptive-capacity pattern)
        return (0, jnp.minimum(c, cap - 1))

    out_specs = [pl.BlockSpec((REC_SIZE, K), out_idx) for _ in range(4)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(binned["num_steps"],),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((8, 1, PQ), jnp.float32)],
    )
    packed = binned["packed"]
    with _interpret_if_cpu():
        gouts = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((REC_SIZE, steps_cap * K),
                                            jnp.float32)] * 4,
            grid_spec=grid_spec,
        )(binned["parent_of_step"], binned["j_of_step"],
          binned["t_start"], binned["t_end"], bg,
          *([packed] * 8), gio)
    # rows of steps the grid never executed keep garbage: mask them by
    # step index before the caller's key sort
    live = (jnp.arange(steps_cap * K, dtype=jnp.int32) // K
            < binned["num_steps"])[None, :]
    sent = jnp.float32((1 << 24) - 1)
    outs = []
    for g in gouts:
        g = jnp.where(live, g, 0.0)
        g = g.at[9].set(jnp.where(live[0], g[9], sent))
        outs.append(g)
    return jnp.concatenate(outs, axis=1)
