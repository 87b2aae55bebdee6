"""Tile binning for the Pallas rasterizer — pure XLA, zero gathers/scatters.

The CUDA rasterizer bins gaussians into tiles with atomics + a global radix
sort keyed (tile | depth).  TPUs have no global atomics, and measured on TPU
the XLA row-gather/scatter primitives are ~50-200ms for 2M rows — while
`lax.sort` carrying a dozen f32 payload columns runs at ~3ms for 2M keys.
So the TPU-native formulation moves ALL record data through payload sorts and
never performs a random-access gather or scatter:

  1. emit each gaussian's tile ids into a fixed [KMAX, N] slot grid (rects
     clipped to KMAX tiles — stats count clips; the transposed orientation
     keeps N on the 128-lane axis, zero padding waste), flattening j-major
     to S = KMAX*N pair slots,
  2. ONE stable payload-sort of the S slots by (tile, depth) carries the
     full records into per-tile contiguous, front-to-back segments — the
     CUDA (tile | depth) radix key as a two-key comparison sort; invalid
     slots key to num_tiles and sort to the tail.  No separate N-row depth
     sort exists,
  3. per-tile [start, end) ranges via searchsorted (tiny),
  4. chunk maps: each tile's segment is covered by K-row ALIGNED block
     windows [start//K, cdiv(end,K)) so the kernel can stream fixed (K, 16)
     blocks with Pallas's auto-pipelined index_map — row-validity masks in
     the kernel handle the unaligned segment boundaries.  Empty tiles get one
     dummy chunk so their output block is still initialized.

The gradient reduction in the backward pass is the transpose of step 2-3:
per-slot grads are payload-sorted by `slot_key = j * N + orig_gaussian`
(carried through the forward sort) and then reduced with a FREE reshape +
sum over the leading KMAX axis — again no scatter-add.

Reference behavior being reproduced: the (tile | depth) binning of
diff-gaussian-rasterization as consumed at
/root/reference/gaussian_renderer/__init__.py:160-171 (SURVEY §2.2 N1).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from splatco_tpu.ops.projection import ProjectedCols

REC_SIZE = 16  # packed record width (lane-friendly payload block)

# A/B knob (VERDICT r04 #1c): XLA implements a stable sort by carrying an
# extra internal iota tiebreaker operand, ~1/13 of the big payload sorts'
# data movement.  SPLATCO_SORT_UNSTABLE=1 drops stability from the
# (tile, depth) payload sorts and the class sort — ordering then differs
# from the stable build ONLY on exact (tile, depth) key ties (measure-zero
# for real depth data; still deterministic, XLA sorts are fixed networks).
import os as _os  # noqa: E402

SORT_STABLE = _os.environ.get("SPLATCO_SORT_UNSTABLE", "0") != "1"
# record columns
C_MX, C_MY, C_CA, C_CB, C_CC, C_OP, C_R, C_G, C_B = range(9)


class BinnedGaussians(NamedTuple):
    packed: jax.Array       # [REC_SIZE, S] f32 records (transposed SoA),
                            #   tile-segment order
    slot_key: jax.Array     # [S] i32: canonical packed-slot index carried
                            #   through the tile sort (bwd unsort key);
                            #   legacy path: j * N + orig_gaussian
    chunk_meta: jax.Array   # [C_MAX] i32: (tile << block_bits) | block
    tile_start: jax.Array   # [num_tiles + 1] i32 segment starts
    tile_end: jax.Array     # [num_tiles + 1] i32 segment ends
    num_chunks: jax.Array   # [] i32 — dynamic grid size
    num_clipped: jax.Array  # [] i32 — gaussians whose rect was clipped
    num_overflow: jax.Array  # [] i32 — gaussians with reach-valid slots
                             #   dropped by the kmax_pack / class budget
                             #   (image is slightly stale when > 0: re-jit
                             #   with a bigger budget — donate-and-regrow)
    max_slots: jax.Array     # [] i32 — max reach-valid slots over all
                             #   gaussians (= the minimal safe kmax_pack)
    # class-packed path only (None on the legacy uniform path):
    rank_orig: jax.Array | None = None   # [sum(B_c)] i32 orig gaussian of
                                         #   each class-rank row (N=invalid)
    class_counts: jax.Array | None = None  # [n_classes] i32 measured
                                           #   per-class populations


def chunk_budget(n: int, kmax: int, chunk: int, num_tiles: int) -> int:
    """Static worst-case chunk count: every pair in its own tile segment
    costs at most ceil + 1 alignment chunk; plus one dummy per tile."""
    return (n * kmax) // chunk + 2 * (num_tiles + 2)


def meta_block_bits(n: int, kmax: int, chunk: int) -> int:
    """Bit position of the tile id inside chunk_meta (kernel-side decode)."""
    return max(((n * kmax) // chunk).bit_length(), 1)


def _rects(mx, my, rad, op, tile_size, tiles_x, tiles_y, kmax):
    """Per-gaussian clipped tile rects: (x0, y0, sx_c, counts, clipped).
    Deterministic columnwise math shared by the uniform and class-packed
    paths (recomputable after a permutation from just mx/my/rad/op)."""
    r = rad
    x0 = jnp.clip(jnp.floor((mx - r) / tile_size), 0, tiles_x
                  ).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / tile_size), 0, tiles_y
                  ).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil((mx + r) / tile_size), 0, tiles_x
                  ).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil((my + r) / tile_size), 0, tiles_y
                  ).astype(jnp.int32)
    sx = jnp.maximum(x1 - x0, 0)
    sy = jnp.maximum(y1 - y0, 0)
    clipped = (sx * sy > kmax) & (rad > 0)
    cx = jnp.clip((mx / tile_size).astype(jnp.int32), 0, tiles_x - 1)
    cy = jnp.clip((my / tile_size).astype(jnp.int32), 0, tiles_y - 1)
    sx_c = jnp.minimum(sx, kmax)
    sy_c = jnp.minimum(sy, jnp.maximum(kmax // jnp.maximum(sx_c, 1), 1))
    sx_c = jnp.minimum(sx_c, jnp.maximum(kmax // jnp.maximum(sy_c, 1), 1))
    sx_c = jnp.where(clipped, sx_c, sx)
    sy_c = jnp.where(clipped, sy_c, sy)
    x0 = jnp.where(clipped,
                   jnp.clip(cx - sx_c // 2, x0, jnp.maximum(x1 - sx_c, x0)),
                   x0)
    y0 = jnp.where(clipped,
                   jnp.clip(cy - sy_c // 2, y0, jnp.maximum(y1 - sy_c, y0)),
                   y0)
    counts = jnp.where(rad > 0, sx_c * sy_c, 0)
    return x0, y0, sx_c, counts, clipped


def _slot_grid(mx, my, ca, cb, cc, op, x0, y0, sx_c, counts,
               tile_size, tiles_x, tiles_y, kmax, num_tiles):
    """[kmax, B] tile-of-slot grid (j-major AABB enumeration) with the
    exact ellipse-reach test; invalid slots get `num_tiles`."""
    f32 = jnp.float32
    j = jnp.arange(kmax, dtype=jnp.int32)[:, None]
    w = jnp.maximum(sx_c, 1)[None, :]
    ly = j // w
    lx = j % w
    txs = x0[None, :] + lx
    tys = y0[None, :] + ly

    u0 = (txs * tile_size).astype(f32) - mx[None, :]
    u1 = u0 + (tile_size - 1)
    v0 = (tys * tile_size).astype(f32) - my[None, :]
    v1 = v0 + (tile_size - 1)
    cae, cbe, cce = ca[None, :], cb[None, :], cc[None, :]
    r_vc = (-cb / jnp.where(cc != 0.0, cc, 1.0))[None, :]
    r_uc = (-cb / jnp.where(ca != 0.0, ca, 1.0))[None, :]

    def _edge_u(u):
        vs = jnp.clip(r_vc * u, v0, v1)
        return cae * u * u + 2.0 * cbe * u * vs + cce * vs * vs

    def _edge_v(v):
        us = jnp.clip(r_uc * v, u0, u1)
        return cae * us * us + 2.0 * cbe * us * v + cce * v * v

    inside = (u0 <= 0) & (0 <= u1) & (v0 <= 0) & (0 <= v1)
    qmin = jnp.minimum(jnp.minimum(_edge_u(u0), _edge_u(u1)),
                       jnp.minimum(_edge_v(v0), _edge_v(v1)))
    qmin = jnp.where(inside, 0.0, qmin)
    reach = (qmin * (1.0 - 1e-3)
             <= 2.0 * jnp.log(255.0 * jnp.maximum(op, 1e-12))[None, :])
    slot_valid = (j < counts[None, :]) & reach
    tile_of_slot = jnp.where(slot_valid, tys * tiles_x + txs,
                             num_tiles).astype(jnp.int32)
    return tile_of_slot


KPS_DEFAULT = (1, 2, 4, 8, 16)  # class-boundary ladder (filtered < kmax)


def _class_keys(n_valid, kps):
    """Class index per gaussian: smallest class with kp >= n_valid
    (empty/culled gaussians land in class 0)."""
    class_key = jnp.zeros(n_valid.shape, jnp.int32)
    for ci in range(1, len(kps)):
        class_key = jnp.where(n_valid > kps[ci - 1], ci, class_key)
    return class_key


def _class_hist(n_valid, kps):
    """[n_classes] population per class."""
    ck = _class_keys(n_valid, kps)
    return jnp.stack([jnp.sum(ck == ci).astype(jnp.int32)
                      for ci in range(len(kps))])


def spec_from_counts(counts, kps, n: int, headroom: float = 1.15,
                     floor: int = 64) -> tuple:
    """Build a class_spec from measured per-class populations, with
    headroom and the sum(B) >= N lossless-frame guarantee."""
    import numpy as np

    counts = np.asarray(counts)
    spec = []
    for kp, cnt in zip(kps, counts):
        b = int(np.ceil(int(cnt) * headroom)) + floor
        spec.append((int(kp), min(b, n)))
    short = n - sum(b for _, b in spec)
    if short > 0:
        kp_last, b_last = spec[-1]
        spec[-1] = (kp_last, b_last + short)
    return tuple(spec)


@functools.partial(
    jax.jit,
    static_argnames=("tile_size", "tiles_x", "tiles_y", "kmax", "chunk",
                     "c_max", "kmax_pack"),
)
def bin_gaussians(
    proj: ProjectedCols,
    colors: jax.Array,      # [N,3]
    opacities: jax.Array,   # [N]
    tile_size: int,
    tiles_x: int,
    tiles_y: int,
    kmax: int = 12,
    chunk: int = 64,
    c_max: int | None = None,
    kmax_pack: int | None = None,
) -> BinnedGaussians:
    """kmax_pack < kmax shrinks the slot array S = N*kmax_pack by
    left-packing each gaussian's reach-valid slots (within-row sort by tile
    id; all tiles in a row are distinct, so the stable global tile sort is
    bit-identical to the unpacked path).  Sort cost is linear in S, so this
    is the dominant perf knob; `max_slots` reports the minimal safe value
    and `num_overflow` flags budget violations (adaptive-capacity re-jit,
    same pattern as densification regrow)."""
    n = proj.mx.shape[0]
    num_tiles = tiles_x * tiles_y
    kp = kmax if kmax_pack is None else min(kmax_pack, kmax)
    if c_max is None:
        c_max = chunk_budget(n, kp, chunk, num_tiles)
    assert (n * kp) % chunk == 0, "pad N so N*kmax_pack is a chunk multiple"
    block_bits = max(((n * kp) // chunk).bit_length(), 1)
    assert num_tiles < (1 << (31 - block_bits)), "tile/block bits overflow"

    valid = proj.radius > 0
    f32 = jnp.float32

    # ---- 1. no standalone depth sort: depth rides as the second key of
    # the slot sort (step 3), which orders each tile's segment
    # front-to-back directly — one sort pass instead of two.
    depth_key = jnp.where(valid, proj.depth, jnp.inf).astype(f32)
    mx, my = proj.mx, proj.my
    ca, cb, cc = proj.ca, proj.cb, proj.cc
    op = opacities.astype(f32)
    cr, cg, cb2 = colors[:, 0], colors[:, 1], colors[:, 2]
    rad = proj.radius.astype(f32)
    oidx = jnp.arange(n, dtype=jnp.int32)

    # ---- 2. rects clipped to kmax tiles, then the [kmax, N] j-major
    # slot grid with the exact ellipse-reach test (see _rects/_slot_grid;
    # the transposed [kmax, N] orientation puts N on the 128-lane axis —
    # zero padding waste — and makes the flatten to S = kmax*N slots a
    # free j-major reshape).  The reach test is EXACT-preserving: a
    # dropped slot has max alpha < 1/255 over the tile, which the blend
    # kernel skips per pixel anyway (CUDA `if (alpha < 1/255) continue`).
    x0, y0, sx_c, counts, clipped = _rects(
        mx, my, rad, op, tile_size, tiles_x, tiles_y, kmax)
    num_clipped = jnp.sum(clipped.astype(jnp.int32))
    tile_of_slot = _slot_grid(mx, my, ca, cb, cc, op, x0, y0, sx_c,
                              counts, tile_size, tiles_x, tiles_y, kmax,
                              num_tiles)
    j = jnp.arange(kmax, dtype=jnp.int32)[:, None]          # [kmax,1]
    n_valid = jnp.sum(tile_of_slot < num_tiles, axis=0).astype(jnp.int32)
    max_slots = jnp.max(n_valid)
    # per-class population histogram (KPS_DEFAULT + kmax buckets) so a
    # measuring pass on this path can seed the class-packed budgets
    hist = _class_hist(n_valid, tuple(k for k in KPS_DEFAULT
                                      if k < kmax) + (kmax,))

    if kp < kmax:
        # left-pack: per-gaussian ascending sort along the (tiny) slot
        # axis puts valid tiles (< num_tiles) first; no payload needed —
        # every other record column is constant per gaussian
        (tile_of_slot,) = jax.lax.sort((tile_of_slot,), dimension=0,
                                       num_keys=1, is_stable=False)
        num_overflow = jnp.sum(tile_of_slot[kp] < num_tiles
                               ).astype(jnp.int32)
        tile_of_slot = tile_of_slot[:kp]
    else:
        num_overflow = jnp.int32(0)

    s = n * kp
    tile_flat = tile_of_slot.reshape(s)  # j-major: slot = row * n + gauss

    def tile_cols(a):
        return jnp.broadcast_to(a[None, :], (kp, n)).reshape(s)

    # j-major slot key: sorting by it groups rows j-major so the backward
    # reduction is reshape(kp, n).sum(axis=0) — per-ORIGINAL-gaussian sums
    slot_key = (j[:kp] * n + oidx[None, :]).reshape(s)

    # ---- 3. payload sort by (tile, depth) ----------------------------
    # one stable two-key sort orders every tile segment front-to-back
    # (the CUDA (tile | depth) radix key); stability resolves equal-depth
    # ties in deterministic emission order.
    (sorted_tile, _, smx, smy, sca, scb, scc, sop, scr, scg, scb2,
     sslot) = jax.lax.sort(
        (tile_flat, tile_cols(depth_key), tile_cols(mx), tile_cols(my),
         tile_cols(ca), tile_cols(cb), tile_cols(cc), tile_cols(op),
         tile_cols(cr), tile_cols(cg), tile_cols(cb2), slot_key),
        num_keys=2, is_stable=SORT_STABLE)

    # TRANSPOSED record layout [REC_SIZE, S]: stacking 1D sorted columns as
    # rows is a contiguous copy.  (The AoS [S,16] layout costs ~55ms at
    # S=6M on TPU — XLA materializes the small-minor-dim interleave through
    # padded tiles.)
    packed = jnp.concatenate(
        [jnp.stack([smx, smy, sca, scb, scc, sop, scr, scg, scb2], axis=0),
         jnp.zeros((REC_SIZE - 9, s), f32)], axis=0)

    # ---- 4. per-tile ranges ------------------------------------------
    trange = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    t_start = jnp.searchsorted(sorted_tile, trange, side="left"
                               ).astype(jnp.int32)
    t_end = jnp.searchsorted(sorted_tile, trange + 1, side="left"
                             ).astype(jnp.int32)

    # ---- 5. chunk maps (aligned block windows) -----------------------
    b0 = t_start // chunk
    b1 = -(-(t_end) // chunk)  # cdiv
    nchunk = jnp.maximum(jnp.where(t_end > t_start, b1 - b0, 0), 1)
    nchunk = nchunk.at[num_tiles].set(0)  # the dummy-tile tail gets none
    ccum = jnp.cumsum(nchunk)
    num_chunks = ccum[num_tiles - 1] if num_tiles > 0 else jnp.int32(0)
    cidx = jnp.arange(c_max, dtype=jnp.int32)
    # searchsorted(ccum, cidx, 'right') via a broadcast compare: ccum is
    # tiny (num_tiles+1) and XLA's gather-based binary search costs ~25ns
    # per probe on TPU, ~30ms at this size; the dense compare is ~0.5ms
    tile_of_chunk = jnp.sum(
        (cidx[:, None] >= ccum[None, :]).astype(jnp.int32), axis=1
    ).astype(jnp.int32)
    tile_of_chunk = jnp.minimum(tile_of_chunk, num_tiles)
    chunk_in_tile = cidx - jnp.where(tile_of_chunk > 0,
                                     ccum[jnp.maximum(tile_of_chunk - 1, 0)],
                                     0)
    block_of_chunk = jnp.clip(b0[tile_of_chunk] + chunk_in_tile, 0,
                              s // chunk - 1)
    chunk_meta = (tile_of_chunk << block_bits) | block_of_chunk

    return BinnedGaussians(
        packed=packed,
        slot_key=sslot,
        chunk_meta=chunk_meta,
        tile_start=t_start,
        tile_end=t_end,
        num_chunks=num_chunks.astype(jnp.int32),
        num_clipped=num_clipped,
        num_overflow=num_overflow,
        max_slots=max_slots,
        class_counts=hist,
    )


# ----------------------------------------------------------------------
# class-packed binning — the hot-path variant
# ----------------------------------------------------------------------
#
# The uniform path above pays every sort over S = N * kmax_pack slots even
# though most gaussians touch 1-2 tiles (measured: 579k reach-valid pairs
# in 6.3M slots at the production bench scene — a 10x padding tax, and
# sort cost is linear in S).  Here gaussians are first partitioned into
# per-slot-count CLASSES (kp ascending, e.g. (1, 2, 4, kmax)); each class
# packs its members' slots into a [kp_c, B_c] grid, so the global
# (tile, depth) payload sort runs over S_packed = sum(kp_c * B_c) — sized
# by the measured distribution, not the worst case.  Everything stays
# sort-based (no megascale gathers: XLA-TPU 1D gather at millions of
# indices is pathological) and exact: the same reach-valid (tile, record)
# pairs are emitted, in a deterministic (stable-sort) order.
#
# Budgets B_c are static (jit signature) and auto-tuned by the caller
# from the `class_counts` aux, with the same stale-frame-then-regrow
# semantics as kmax_pack (`num_overflow` counts dropped gaussians; the
# backward additionally gates misassigned rows to zero).

def class_layout(class_spec):
    """Static slot layout: per-class slot offsets and the packed total."""
    offs = []
    total = 0
    for kp, b in class_spec:
        offs.append(total)
        total += kp * b
    return tuple(offs), total


def classed_slot_total(class_spec, num_tiles: int, chunk: int) -> int:
    """Static post-sort slot count of the ALIGNED classed path: packed
    slots rounded to a chunk + worst-case per-tile alignment fillers."""
    _, s_pack = class_layout(class_spec)
    s_pad = -(-s_pack // chunk) * chunk
    return s_pad + num_tiles * chunk


@functools.partial(
    jax.jit,
    static_argnames=("tile_size", "tiles_x", "tiles_y", "kmax", "chunk",
                     "c_max", "class_spec"),
)
def bin_gaussians_classed(
    proj: ProjectedCols,
    colors: jax.Array,
    opacities: jax.Array,
    tile_size: int,
    tiles_x: int,
    tiles_y: int,
    kmax: int = 12,
    chunk: int = 64,
    c_max: int | None = None,
    class_spec: tuple = ((2, 0), (12, 0)),
) -> BinnedGaussians:
    """class_spec: ((kp_0, B_0), ..., (kp_last, B_last)) with kp strictly
    ascending and kp_last == kmax.  B_c = max gaussians admitted to class
    c.  Every gaussian lands in the smallest class with kp >= its
    reach-valid slot count (culled/empty gaussians in class 0), so
    sum(B_c) >= N is required for a lossless frame."""
    n = proj.mx.shape[0]
    num_tiles = tiles_x * tiles_y
    kps = tuple(kp for kp, _ in class_spec)
    assert all(kps[i] < kps[i + 1] for i in range(len(kps) - 1))
    assert kps[-1] == kmax, "last class must cover kmax"
    assert sum(b for _, b in class_spec) >= n, (
        "class budgets must cover every gaussian (sum B_c >= N)")
    offs, s_pack = class_layout(class_spec)
    s_pad = -(-s_pack // chunk) * chunk
    # block_bits is computed once below (after the filler rows are added)
    # from s_total = classed_slot_total(...), the single source of truth
    # shared with rasterize.py.

    valid = proj.radius > 0
    f32 = jnp.float32
    depth_key = jnp.where(valid, proj.depth, jnp.inf).astype(f32)
    mx, my = proj.mx, proj.my
    ca, cb, cc = proj.ca, proj.cb, proj.cc
    op = opacities.astype(f32)
    cr, cg, cb2 = colors[:, 0], colors[:, 1], colors[:, 2]
    rad = proj.radius.astype(f32)
    oidx = jnp.arange(n, dtype=jnp.int32)

    # ---- 1. per-gaussian class from the reach-valid slot count -------
    x0, y0, sx_c, counts, clipped = _rects(
        mx, my, rad, op, tile_size, tiles_x, tiles_y, kmax)
    num_clipped = jnp.sum(clipped.astype(jnp.int32))
    tile_grid = _slot_grid(mx, my, ca, cb, cc, op, x0, y0, sx_c, counts,
                           tile_size, tiles_x, tiles_y, kmax, num_tiles)
    n_valid = jnp.sum(tile_grid < num_tiles, axis=0).astype(jnp.int32)
    max_slots = jnp.max(n_valid)
    class_key = _class_keys(n_valid, kps)

    # ---- 2. ONE stable class sort carrying the full record ----------
    # (13 operands over N — cheap next to the old 12-operand sort over
    # N*kmax_pack; stability keeps emission order deterministic)
    (_, smx, smy, sca, scb, scc, sop, scr, scg, scb2, sdepth, srad,
     soidx) = jax.lax.sort(
        (class_key, mx, my, ca, cb, cc, op, cr, cg, cb2, depth_key, rad,
         oidx), num_keys=1, is_stable=SORT_STABLE)
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
        cx0, cy0, csx, ccounts, _ = _rects(
            cmx, cmy, crad, cop, tile_size, tiles_x, tiles_y, kmax)
        grid = _slot_grid(cmx, cmy, cca, ccb, ccc, cop, cx0, cy0, csx,
                          ccounts, tile_size, tiles_x, tiles_y, kmax,
                          num_tiles)
        # left-pack the <= kp_c valid slots to the first kp_c rows
        (grid,) = jax.lax.sort((grid,), dimension=0, num_keys=1,
                               is_stable=False)
        grid = grid[:kp_c]                      # [kp_c, b_c]
        tiles_parts.append(grid.reshape(kp_c * b_c))
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
    s_total = s_pad + num_tiles * chunk
    block_bits = max((s_total // chunk).bit_length(), 1)
    assert num_tiles < (1 << (31 - block_bits)), "tile/block bits overflow"

    def cat(parts, fill):
        out = jnp.concatenate(parts)
        if pad:
            out = jnp.concatenate(
                [out, jnp.full((pad,), fill, out.dtype)])
        return out

    tile_flat = cat(tiles_parts, num_tiles)
    slot_key = cat(slotkey_parts, s_total - 1)
    dep = cat(rec_parts["depth"], jnp.inf)

    # ---- 3b. alignment fillers ---------------------------------------
    # ~40% of kernel grid steps at production scale are tile-segment
    # BOUNDARY chunks (a tile's [start, end) overlaps the aligned block
    # windows of its neighbours, so both tiles execute the shared chunk).
    # Inject per-tile filler records that pad every tile's segment to a
    # chunk multiple INSIDE the one global sort: filler (tile=t,
    # depth=+inf) sorts to the end of t's segment; opacity 0 makes it an
    # exact no-op in the blend and a zero in the backward.  Per-tile
    # counts come from a cheap single-operand pre-sort of the tile keys —
    # no gathers anywhere.
    (tile_only,) = jax.lax.sort((tile_flat,), num_keys=1, is_stable=False)
    trange = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    c0 = jnp.searchsorted(tile_only, trange[:num_tiles], side="left")
    c1 = jnp.searchsorted(tile_only, trange[:num_tiles] + 1, side="left")
    tcount = (c1 - c0).astype(jnp.int32)               # [T]
    tpad = (-tcount) % chunk                            # [T], 0 for empty
    jj = jnp.arange(chunk, dtype=jnp.int32)[None, :]
    fill_tile = jnp.where(jj < tpad[:, None],
                          trange[:num_tiles, None], num_tiles
                          ).reshape(num_tiles * chunk).astype(jnp.int32)
    fzero = jnp.zeros((num_tiles * chunk,), f32)
    finf = jnp.full((num_tiles * chunk,), jnp.inf, f32)
    fkey = jnp.full((num_tiles * chunk,), s_total - 1, jnp.int32)

    def catf(a, filler):
        return jnp.concatenate([a, filler])

    # ---- 4. global stable (tile, depth) payload sort -----------------
    (sorted_tile, _, gmx, gmy, gca, gcb, gcc, gop, gcr, gcg, gcb2,
     sslot) = jax.lax.sort(
        (catf(tile_flat, fill_tile), catf(dep, finf),
         catf(cat(rec_parts["mx"], 0.0), fzero),
         catf(cat(rec_parts["my"], 0.0), fzero),
         catf(cat(rec_parts["ca"], 0.0), fzero),
         catf(cat(rec_parts["cb"], 0.0), fzero),
         catf(cat(rec_parts["cc"], 0.0), fzero),
         catf(cat(rec_parts["op"], 0.0), fzero),
         catf(cat(rec_parts["cr"], 0.0), fzero),
         catf(cat(rec_parts["cg"], 0.0), fzero),
         catf(cat(rec_parts["cb2"], 0.0), fzero),
         catf(slot_key, fkey)),
        num_keys=2, is_stable=SORT_STABLE)

    packed = jnp.concatenate(
        [jnp.stack([gmx, gmy, gca, gcb, gcc, gop, gcr, gcg, gcb2],
                   axis=0),
         jnp.zeros((REC_SIZE - 9, s_total), f32)], axis=0)

    # ---- 5. per-tile ranges + chunk maps -----------------------------
    # every real tile's padded segment is a chunk multiple and segments
    # stack contiguously from 0, so the aligned block windows are exact:
    # no boundary overlap, nchunk = padded_count / chunk.
    if c_max is None:
        c_max = s_total // chunk + num_tiles + 2
    t_start = jnp.searchsorted(sorted_tile, trange, side="left"
                               ).astype(jnp.int32)
    t_end = jnp.searchsorted(sorted_tile, trange + 1, side="left"
                             ).astype(jnp.int32)
    b0 = t_start // chunk
    b1 = -(-(t_end) // chunk)
    nchunk = jnp.maximum(jnp.where(t_end > t_start, b1 - b0, 0), 1)
    nchunk = nchunk.at[num_tiles].set(0)
    ccum = jnp.cumsum(nchunk)
    num_chunks = ccum[num_tiles - 1] if num_tiles > 0 else jnp.int32(0)
    cidx = jnp.arange(c_max, dtype=jnp.int32)
    tile_of_chunk = jnp.sum(
        (cidx[:, None] >= ccum[None, :]).astype(jnp.int32), axis=1
    ).astype(jnp.int32)
    tile_of_chunk = jnp.minimum(tile_of_chunk, num_tiles)
    chunk_in_tile = cidx - jnp.where(tile_of_chunk > 0,
                                     ccum[jnp.maximum(tile_of_chunk - 1, 0)],
                                     0)
    block_of_chunk = jnp.clip(b0[tile_of_chunk] + chunk_in_tile, 0,
                              s_total // chunk - 1)
    chunk_meta = (tile_of_chunk << block_bits) | block_of_chunk

    return BinnedGaussians(
        packed=packed,
        slot_key=sslot,
        chunk_meta=chunk_meta,
        tile_start=t_start,
        tile_end=t_end,
        num_chunks=num_chunks.astype(jnp.int32),
        num_clipped=num_clipped,
        num_overflow=num_overflow,
        max_slots=max_slots,
        rank_orig=jnp.concatenate(rank_parts),
        class_counts=cnt,
    )


def suggest_class_spec(proj, colors, opacities, tile_size, tiles_x,
                       tiles_y, kmax: int = 12,
                       kps: tuple = (1, 2, 4, 8),
                       headroom: float = 1.15) -> tuple:
    """Measure the reach-valid slot histogram of one frame and return a
    class_spec with `headroom` slack per class (callers cache it and
    re-jit on `num_overflow`/`class_counts` pressure — the kmax_pack
    adaptive-capacity pattern)."""
    import numpy as np

    n = proj.mx.shape[0]
    num_tiles = tiles_x * tiles_y
    mx, my = proj.mx, proj.my
    op = jnp.asarray(opacities, jnp.float32)
    rad = proj.radius.astype(jnp.float32)
    x0, y0, sx_c, counts, _ = _rects(mx, my, rad, op, tile_size, tiles_x,
                                     tiles_y, kmax)
    grid = _slot_grid(mx, my, proj.ca, proj.cb, proj.cc, op, x0, y0,
                      sx_c, counts, tile_size, tiles_x, tiles_y, kmax,
                      num_tiles)
    n_valid = jnp.sum(grid < num_tiles, axis=0)
    kps = tuple(k for k in kps if k < kmax) + (kmax,)
    counts = np.asarray(_class_hist(n_valid, kps))
    return spec_from_counts(counts, kps, n, headroom)
