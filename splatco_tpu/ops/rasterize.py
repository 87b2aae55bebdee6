"""Differentiable rasterization entry point (Pallas fast path).

`rasterize(...)` renders projected gaussians to an image with a custom VJP:
  forward : sort-based tile binning (ops/binning.py) + Pallas blend kernel
            (ops/rasterize_pallas.py),
  backward: Pallas replay kernel -> per-slot grads -> ONE payload sort keyed
            by (original gaussian, slot) -> reshape+sum reduction.  No
            gathers or scatter-adds anywhere (they are ~50-200ms/2M rows on
            TPU; payload sorts are ~3ms).

Gradients flow to means2d, conics, colors, opacities and bg.  The binning
(tile assignment, depth order) is treated as non-differentiable, matching
the reference CUDA rasterizer.  Projection (means3d -> means2d, cov3d ->
conic) lives outside and is differentiated by JAX autodiff, so grads chain
to means3d/scales/quats automatically; the raw dL/dmeans2d needed by the
densification statistics (reference `training_statis`,
/root/reference/scene/gaussian_model.py:779) is available by differentiating
w.r.t. a zero "viewspace proxy" added to means2d by the caller.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from splatco_tpu.ops import binning as binning_lib
from splatco_tpu.ops import rasterize_pallas as rp
from splatco_tpu.ops.binning import bin_gaussians, meta_block_bits
from splatco_tpu.ops.projection import (ProjectedCols, ProjectedGaussians,
                                        cols_of)

TILE = rp.TILE
# default raster path when the caller doesn't pass tile16 explicitly:
# SPLATCO_RASTER=v3 -> 16x16 element-granular path, v2 -> 32x32 classed
import os as _os  # noqa: E402

TILE16_DEFAULT = _os.environ.get("SPLATCO_RASTER", "v2") == "v3"


def _tiles(image_height, image_width):
    ty = -(-image_height // TILE)
    tx = -(-image_width // TILE)
    return tx, ty


def _untile(flat, tiles_y, tiles_x, channels):
    """[T, C, 8, 128] -> [C, tiles_y*32, tiles_x*32]."""
    t = flat.reshape(tiles_y, tiles_x, channels, TILE, TILE)
    return (t.transpose(2, 0, 3, 1, 4)
            .reshape(channels, tiles_y * TILE, tiles_x * TILE))


def _tileify(img, tiles_y, tiles_x):
    """[C, H, W] (padded to tile grid) -> [T, C, 8, 128]."""
    c = img.shape[0]
    t = img.reshape(c, tiles_y, TILE, tiles_x, TILE)
    return (t.transpose(1, 3, 0, 2, 4)
            .reshape(tiles_y * tiles_x, c, rp.PIX_SUB, rp.PIX_LANE))


@functools.lru_cache(maxsize=32)
def _make_rasterizer(image_height: int, image_width: int, kmax: int,
                     kmax_pack: int | None = None,
                     class_spec: tuple | None = None):
    tiles_x, tiles_y = _tiles(image_height, image_width)
    num_tiles = tiles_x * tiles_y
    hp, wp = tiles_y * TILE, tiles_x * TILE
    kp = kmax if kmax_pack is None else min(kmax_pack, kmax)
    if class_spec is not None:
        s_total = binning_lib.classed_slot_total(class_spec, num_tiles,
                                                 rp.CHUNK)
        cls_bits = max((s_total // rp.CHUNK).bit_length(), 1)

    def fwd_impl(mx, my, ca, cb, cc, colors, opacities, depths, radii_f,
                 bg):
        proj = ProjectedCols(mx=mx, my=my, depth=depths, ca=ca, cb=cb,
                             cc=cc, radius=radii_f)
        n = mx.shape[0]
        if class_spec is not None:
            binned = binning_lib.bin_gaussians_classed(
                proj, colors, opacities, TILE, tiles_x, tiles_y,
                kmax=kmax, chunk=rp.CHUNK, class_spec=class_spec)
            bits = cls_bits
        else:
            binned = bin_gaussians(proj, colors, opacities, TILE, tiles_x,
                                   tiles_y, kmax=kmax, chunk=rp.CHUNK,
                                   kmax_pack=kmax_pack)
            bits = meta_block_bits(n, kp, rp.CHUNK)
        out = rp.forward_pallas(binned, num_tiles, tiles_x, bits,
                                exact_segments=class_spec is not None)
        rgb = _untile(out[:, 0:3], tiles_y, tiles_x, 3)
        t_fin = _untile(out[:, 3:4], tiles_y, tiles_x, 1)[0]
        image = (rgb + bg[:, None, None] * t_fin[None]
                 )[:, :image_height, :image_width]
        aux = {
            "num_clipped": binned.num_clipped,
            "num_chunks": binned.num_chunks,
            "num_overflow": binned.num_overflow,
            "max_slots": binned.max_slots,
        }
        if binned.class_counts is not None:
            aux["class_counts"] = binned.class_counts
        return image, aux, (binned, out, bg, n)

    def raster(mx, my, ca, cb, cc, colors, opacities, depths, radii_f, bg):
        image, aux, res = fwd_impl(mx, my, ca, cb, cc, colors, opacities,
                                   depths, radii_f, bg)
        return image, aux

    raster_vjp = jax.custom_vjp(raster)

    def fwd(mx, my, ca, cb, cc, colors, opacities, depths, radii_f, bg):
        image, aux, res = fwd_impl(mx, my, ca, cb, cc, colors, opacities,
                                   depths, radii_f, bg)
        return (image, aux), res

    def bwd(res, cts):
        g_img, _g_aux = cts  # aux counters are non-differentiable
        binned, out, bg, n = res
        bits = cls_bits if class_spec is not None else \
            meta_block_bits(n, kp, rp.CHUNK)
        # pad grad image to the tile grid and tile-ify
        gpad = jnp.zeros((3, hp, wp), jnp.float32)
        gpad = gpad.at[:, :image_height, :image_width].set(g_img)
        g_tiles = _tileify(gpad, tiles_y, tiles_x)      # [T,3,8,128]
        gio = jnp.concatenate(
            [g_tiles, out[:, 0:3], out[:, 3:4],
             jnp.zeros((num_tiles, 1, rp.PIX_SUB, rp.PIX_LANE), jnp.float32)],
            axis=1)                                     # [T,8,8,128]
        slot_grads = rp.backward_pallas(
            binned, gio, bg, num_tiles, tiles_x, bits,
            exact_segments=class_spec is not None)  # [REC_SIZE, S]
        s = slot_grads.shape[1]
        row_valid = (jnp.arange(s, dtype=jnp.int32)
                     < binned.tile_start[num_tiles])[None, :]
        slot_grads = jnp.where(row_valid, slot_grads, 0.0)
        # un-sort by the canonical slot key and reduce over slots — no
        # scatter; rows of the transposed grads are contiguous 1D arrays
        sorted_cols = jax.lax.sort(
            (binned.slot_key,
             slot_grads[0], slot_grads[1], slot_grads[2], slot_grads[3],
             slot_grads[4], slot_grads[5], slot_grads[6], slot_grads[7],
             slot_grads[8]),
            num_keys=1, is_stable=False)
        if class_spec is not None:
            # per-class reshape+sum -> grads per class-rank row, then ONE
            # final (orig, grads) sort over sum(B_c) rows restores the
            # original gaussian order (every gaussian sits in exactly one
            # class; invalid filler rows key to n and sort to the tail)
            offs, _ = binning_lib.class_layout(class_spec)
            per_rank = []
            for (kp_c, b_c), off in zip(class_spec, offs):
                if b_c == 0:
                    continue
                per_rank.append([
                    c[off:off + kp_c * b_c].reshape(kp_c, b_c).sum(axis=0)
                    for c in sorted_cols[1:]])
            cols_rank = [jnp.concatenate([p[i] for p in per_rank])
                         for i in range(9)]
            final = jax.lax.sort((binned.rank_orig, *cols_rank),
                                 num_keys=1, is_stable=False)
            # overflow safety: a dropped gaussian desyncs row<->orig below
            # it; gate those rows to zero (stale-frame semantics — the
            # caller regrows budgets off num_overflow)
            aligned = (final[0][:n] == jnp.arange(n, dtype=jnp.int32)
                       )[..., None]
            per_g = [jnp.where(aligned[:, 0], c[:n], 0.0)
                     for c in final[1:]]
        else:
            # j-major slot keys -> reshape [kp, n], reduce the slot axis
            per_g = [c.reshape(kp, n).sum(axis=0) for c in sorted_cols[1:]]
        d_mx, d_my, d_ca, d_cb, d_cc = per_g[0:5]
        d_op = per_g[5]
        d_colors = jnp.stack(per_g[6:9], axis=1)
        # bg grad: sum over pixels of g * T_final
        t_fin = _untile(out[:, 3:4], tiles_y, tiles_x, 1)[0]
        d_bg = jnp.sum(g_img * t_fin[None, :image_height, :image_width],
                       axis=(1, 2))
        zeros_d = jnp.zeros((n,), jnp.float32)
        return (d_mx, d_my, d_ca, d_cb, d_cc, d_colors, d_op, zeros_d,
                zeros_d, d_bg)

    raster_vjp.defvjp(fwd, bwd)
    return raster_vjp


@functools.lru_cache(maxsize=32)
def _make_rasterizer_v3(image_height: int, image_width: int, kmax: int,
                        class_spec: tuple | None = None,
                        steps_cap: int | None = None):
    """16x16-subtile element-granular rasterizer (ops/raster_v3.py).
    class_spec=None runs the measuring path: one class of width kmax
    (S = N*kmax slots — used once per budget re-probe).  steps_cap is
    the static bound on parent-quad walk steps (sizes the backward's
    (key, grads) output; None = the safe worst case — pass the measured
    aux["num_steps"] plus headroom for a tight backward sort)."""
    from splatco_tpu.ops import raster_v3 as r3

    parents_x, parents_y = r3.parent_grid(image_height, image_width)
    num_parents = parents_x * parents_y
    hp, wp = parents_y * 32, parents_x * 32
    tiles_x, tiles_y = 2 * parents_x, 2 * parents_y

    def untile16(flat, channels):
        """[Pn, C, 8, 128] subtile-packed -> [C, hp, wp]."""
        t = flat.reshape(parents_y, parents_x, channels, 2, 2, 2, 128)
        t = t.reshape(parents_y, parents_x, channels, 2, 2, 16, 16)
        return (t.transpose(2, 0, 3, 5, 1, 4, 6)
                .reshape(channels, hp, wp))

    def tileify16(img):
        """[C, hp, wp] -> [Pn, C, 8, 128] subtile-packed."""
        c = img.shape[0]
        t = img.reshape(c, parents_y, 2, 16, parents_x, 2, 16)
        t = t.transpose(1, 4, 0, 2, 5, 3, 6)   # [Py,Px,C,sy,sx,16,16]
        t = t.reshape(parents_y, parents_x, c, 2, 2, 2, 128)
        return t.reshape(num_parents, c, r3.PIX_SUB, r3.PIX_LANE)

    def fwd_impl(mx, my, ca, cb, cc, colors, opacities, depths, radii_f,
                 bg):
        proj = ProjectedCols(mx=mx, my=my, depth=depths, ca=ca, cb=cb,
                             cc=cc, radius=radii_f)
        n = mx.shape[0]
        spec = class_spec if class_spec is not None else ((kmax, n),)
        binned = r3.bin_gaussians_v3(proj, colors, opacities, tiles_x,
                                     tiles_y, kmax=kmax, class_spec=spec)
        out = r3.forward_pallas_v3(binned, num_parents, parents_x)
        # parents with no content at all never execute a kernel step:
        # select the background default for them
        deflt = jnp.concatenate(
            [jnp.zeros((num_parents, 3, r3.PIX_SUB, r3.PIX_LANE),
                       jnp.float32),
             jnp.ones((num_parents, 1, r3.PIX_SUB, r3.PIX_LANE),
                      jnp.float32)], axis=1)
        out = jnp.where(binned["parent_nonempty"][:, None, None, None],
                        out, deflt)
        rgb = untile16(out[:, 0:3], 3)
        t_fin = untile16(out[:, 3:4], 1)[0]
        image = (rgb + bg[:, None, None] * t_fin[None]
                 )[:, :image_height, :image_width]
        aux = {
            "num_clipped": binned["num_clipped"],
            "num_chunks": binned["num_steps"],
            "num_steps": binned["num_steps"],
            "num_overflow": binned["num_overflow"],
            "max_slots": binned["max_slots"],
            "class_counts": binned["class_counts"],
        }
        return image, aux, (binned, out, bg, n)

    def raster(mx, my, ca, cb, cc, colors, opacities, depths, radii_f,
               bg):
        image, aux, _res = fwd_impl(mx, my, ca, cb, cc, colors,
                                    opacities, depths, radii_f, bg)
        return image, aux

    raster_vjp = jax.custom_vjp(raster)

    def fwd(mx, my, ca, cb, cc, colors, opacities, depths, radii_f, bg):
        image, aux, res = fwd_impl(mx, my, ca, cb, cc, colors, opacities,
                                   depths, radii_f, bg)
        return (image, aux), res

    def bwd(res, cts):
        g_img, _g_aux = cts
        binned, out, bg, n = res
        spec = class_spec if class_spec is not None else ((kmax, n),)
        offs, s_pack = binning_lib.class_layout(spec)
        cap = steps_cap
        if cap is None:
            s_pad = r3.padded_slots(spec, r3.K)
            cap = s_pad // r3.K + num_parents + 2
        gpad = jnp.zeros((3, hp, wp), jnp.float32)
        gpad = gpad.at[:, :image_height, :image_width].set(g_img)
        g_tiles = tileify16(gpad)                     # [Pn,3,8,128]
        gio = jnp.concatenate(
            [g_tiles, out[:, 0:3], out[:, 3:4],
             jnp.zeros((num_parents, 1, r3.PIX_SUB, r3.PIX_LANE),
                       jnp.float32)], axis=1)         # [Pn,8,8,128]
        walk = r3.backward_pallas_v3(binned, gio, bg, num_parents,
                                     parents_x, steps_cap=cap)
        # walk rows: row 9 = slot key (sentinel beyond segments).  ONE
        # key sort puts the real rows first in slot-key order — exactly
        # the state the old spill+unsort machinery reconstructed
        sorted_cols = jax.lax.sort(
            (walk[9], walk[0], walk[1], walk[2], walk[3], walk[4],
             walk[5], walk[6], walk[7], walk[8]),
            num_keys=1, is_stable=False)[1:]
        per_rank = []
        for (kp_c, b_c), off in zip(spec, offs):
            if b_c == 0:
                continue
            per_rank.append([
                c[off:off + kp_c * b_c].reshape(kp_c, b_c).sum(axis=0)
                for c in sorted_cols])
        cols_rank = [jnp.concatenate([p[i] for p in per_rank])
                     for i in range(9)]
        final = jax.lax.sort((binned["rank_orig"], *cols_rank),
                             num_keys=1, is_stable=False)
        aligned = (final[0][:n] == jnp.arange(n, dtype=jnp.int32))
        per_g = [jnp.where(aligned, c[:n], 0.0) for c in final[1:]]
        d_mx, d_my, d_ca, d_cb, d_cc = per_g[0:5]
        d_op = per_g[5]
        d_colors = jnp.stack(per_g[6:9], axis=1)
        t_fin = untile16(out[:, 3:4], 1)[0]
        d_bg = jnp.sum(g_img * t_fin[None, :image_height, :image_width],
                       axis=(1, 2))
        zeros_d = jnp.zeros((n,), jnp.float32)
        return (d_mx, d_my, d_ca, d_cb, d_cc, d_colors, d_op, zeros_d,
                zeros_d, d_bg)

    raster_vjp.defvjp(fwd, bwd)
    return raster_vjp


def round_kmax_pack(n: int, kp: int, kmax: int, chunk: int = None) -> int:
    """Smallest kp' >= kp with (n * kp') % chunk == 0 (the bin_gaussians
    slot-array alignment requirement), capped at kmax (where the unpacked
    path applies and the constraint is guaranteed by padding)."""
    chunk = rp.CHUNK if chunk is None else chunk
    k = max(int(kp), 1)
    while k < kmax and (n * k) % chunk != 0:
        k += 1
    return min(k, kmax)


def rasterize(proj, colors, opacities, bg,
              image_height: int, image_width: int, kmax: int = 12,
              kmax_pack: int | None = None,
              class_spec: tuple | None = None,
              return_aux: bool = False,
              tile16: bool | None = None,
              steps_cap: int | None = None):
    """Render projected gaussians -> image [3,H,W] with the Pallas path.

    `proj` is ProjectedCols (the SoA hot path) or ProjectedGaussians
    (AoS; converted — oracle/test convenience).  Differentiable w.r.t. the
    projected quantities, colors, opacities and bg.  With return_aux=True
    also returns a dict of non-differentiable binning counters:
    num_overflow (gaussians whose reach-valid tiles were dropped by the
    kmax_pack budget — image is stale when > 0, re-jit with a larger
    pack), max_slots (minimal safe kmax_pack for this frame), num_clipped,
    num_chunks.

    kmax_pack (static) caps slots-per-gaussian after the exact ellipse
    reach test; both binning sorts and the backward unsort are linear in
    N*kmax_pack, so a tight value is ~3x faster than the kmax worst case.
    Use `suggest_kmax_pack` to measure the scene's requirement, with
    headroom, and re-tune when the overflow counter fires.
    """
    if isinstance(proj, ProjectedGaussians):
        proj = cols_of(proj)
    if tile16 is None:
        tile16 = TILE16_DEFAULT
    if tile16:
        # v3 path: 16x16 subtiles, element-granular segments.  kmax is
        # the LITERAL 16px tile budget (a gaussian covers ~2x the tiles
        # of the 32px grid at the same pixel radius — pass a larger
        # budget or rely on the trainer's kmax auto-escalation).
        fn = _make_rasterizer_v3(image_height, image_width, kmax,
                                 class_spec, steps_cap)
        image, aux = fn(proj.mx, proj.my, proj.ca, proj.cb, proj.cc,
                        colors, opacities, proj.depth,
                        proj.radius.astype(jnp.float32), bg)
        if return_aux:
            return image, aux
        return image
    if class_spec is not None:
        kmax_pack = None
    elif kmax_pack is not None:
        kmax_pack = round_kmax_pack(proj.mx.shape[0], kmax_pack, kmax)
        if kmax_pack >= kmax:
            kmax_pack = None
    fn = _make_rasterizer(image_height, image_width, kmax, kmax_pack,
                          class_spec)
    image, aux = fn(proj.mx, proj.my, proj.ca, proj.cb, proj.cc,
                    colors, opacities, proj.depth,
                    proj.radius.astype(jnp.float32), bg)
    if return_aux:
        return image, aux
    return image


def suggest_class_spec(proj, colors, opacities, image_height: int,
                       image_width: int, kmax: int = 12,
                       kps: tuple = None,
                       headroom: float = 1.15,
                       tile16: bool | None = None) -> tuple:
    """Measured per-frame class budgets for the class-packed binner (see
    binning.suggest_class_spec).  Callers cache the spec and re-jit when
    the overflow counter / class_counts report budget pressure.  With
    tile16 (default: the SPLATCO_RASTER env switch) the histogram is
    measured on the 16px subtile grid the v3 rasterizer bins on."""
    if isinstance(proj, ProjectedGaussians):
        proj = cols_of(proj)
    if tile16 is None:
        tile16 = TILE16_DEFAULT
    if kps is None:
        kps = binning_lib.KPS_DEFAULT
    if tile16:
        from splatco_tpu.ops import raster_v3 as r3

        px, py = r3.parent_grid(image_height, image_width)
        return binning_lib.suggest_class_spec(
            proj, colors, opacities, r3.TILE, 2 * px, 2 * py, kmax=kmax,
            kps=kps, headroom=headroom)
    tiles_x, tiles_y = _tiles(image_height, image_width)
    return binning_lib.suggest_class_spec(
        proj, colors, opacities, TILE, tiles_x, tiles_y, kmax=kmax,
        kps=kps, headroom=headroom)


def suggest_kmax_pack(proj, colors, opacities,
                      image_height: int, image_width: int,
                      kmax: int = 12, headroom: int = 1) -> int:
    """Measured minimal safe kmax_pack for this scene/view (+ headroom).

    Runs the binning stage once and reads the max reach-valid
    slots-per-gaussian; the result is rounded up to satisfy the binner's
    (n * kp) % CHUNK == 0 alignment.  Callers cache the result and re-jit
    `rasterize` with it (the adaptive-capacity pattern used for
    densification)."""
    if isinstance(proj, ProjectedGaussians):
        proj = cols_of(proj)
    tiles_x, tiles_y = _tiles(image_height, image_width)
    binned = bin_gaussians(proj, colors, opacities, TILE, tiles_x, tiles_y,
                           kmax=kmax, chunk=rp.CHUNK)
    kp = min(int(binned.max_slots) + headroom, kmax)
    return round_kmax_pack(proj.mx.shape[0], kp, kmax)
