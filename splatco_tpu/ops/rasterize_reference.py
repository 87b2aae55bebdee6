"""Dense pure-JAX alpha-blend compositor — the correctness oracle.

Reproduces the per-pixel blend semantics of the reference's CUDA rasterizer
(diff-gaussian-rasterization, consumed at
/root/reference/gaussian_renderer/__init__.py:160-171):

  * gaussians processed front-to-back in (depth, index) order,
  * G = exp(-0.5*(a*dx^2 + c*dy^2) - b*dx*dy) with d = mean2d - pixf
    (pixf = integer pixel coordinate),
  * skip when power > 0; alpha = min(0.99, opacity * G); skip when
    alpha < 1/255,
  * terminate the pixel when T * (1 - alpha) < 1e-4 BEFORE that gaussian
    contributes,
  * final color = sum(c_i * alpha_i * T_i) + bg * T_final.

Optionally applies the same tile-rect culling the binned Pallas kernel uses,
so `allclose(oracle, pallas)` is exact rather than approximate.

It is O(N * H * W) and meant for tests, small scenes and as the `jax.grad`
ground truth for the Pallas backward.  Processes gaussians in chunks via
`lax.scan` to bound memory.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from splatco_tpu.ops.projection import ProjectedGaussians, tile_rect

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def _depth_order(depths, valid):
    """Stable front-to-back order with invalid entries pushed to the back."""
    key = jnp.where(valid, depths, jnp.inf)
    return jnp.argsort(key, stable=True)


@functools.partial(
    jax.jit,
    static_argnames=("image_height", "image_width", "chunk", "tile_size"),
)
def rasterize_dense(
    proj: ProjectedGaussians,
    colors: jax.Array,      # [N,C]
    opacities: jax.Array,   # [N]
    bg: jax.Array,          # [C]
    image_height: int,
    image_width: int,
    chunk: int = 256,
    tile_size: Optional[int] = None,
):
    """Returns (image [C,H,W], final_T [H,W]).

    When `tile_size` is given, a gaussian only affects pixels whose tile lies
    in its projected tile rect (matching the binned kernel's visibility).
    """
    n = proj.means2d.shape[0]
    num_ch = colors.shape[-1]
    hw = image_height * image_width

    valid = proj.radii > 0
    order = _depth_order(proj.depths, valid)
    means2d = proj.means2d[order]
    conics = proj.conics[order]
    cols = colors[order]
    opac = opacities[order]
    valid = valid[order]

    if tile_size is not None:
        tiles_x = -(-image_width // tile_size)
        tiles_y = -(-image_height // tile_size)
        rects = tile_rect(means2d, proj.radii[order], tile_size, tiles_x,
                          tiles_y)
    else:
        rects = jnp.zeros((n, 4), jnp.int32)

    # pixel coordinate grids, flattened [HW]
    py = jnp.repeat(jnp.arange(image_height, dtype=jnp.float32), image_width)
    px = jnp.tile(jnp.arange(image_width, dtype=jnp.float32), image_height)
    if tile_size is not None:
        ptx = (px / tile_size).astype(jnp.int32)
        pty = (py / tile_size).astype(jnp.int32)
    else:
        ptx = pty = jnp.zeros_like(px, dtype=jnp.int32)

    pad = (-n) % chunk
    if pad:
        def padz(a):
            return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        means2d, conics, cols, opac, rects = map(
            padz, (means2d, conics, cols, opac, rects))
        valid = jnp.pad(valid, (0, pad), constant_values=False)
    steps = (n + pad) // chunk

    def body(carry, xs):
        T, acc, done = carry  # T,done: [HW]; acc: [C,HW]
        m2, con, col, op, vld, rct = xs
        dx = m2[:, 0:1] - px[None, :]   # [chunk,HW]
        dy = m2[:, 1:2] - py[None, :]
        power = (-0.5 * (con[:, 0:1] * dx * dx + con[:, 2:3] * dy * dy)
                 - con[:, 1:2] * dx * dy)
        alpha = jnp.minimum(ALPHA_MAX, op[:, None] * jnp.exp(power))
        live = vld[:, None] & (power <= 0) & (alpha >= ALPHA_MIN)
        if tile_size is not None:
            in_rect = ((ptx[None, :] >= rct[:, 0:1])
                       & (ptx[None, :] < rct[:, 2:3])
                       & (pty[None, :] >= rct[:, 1:2])
                       & (pty[None, :] < rct[:, 3:4]))
            live = live & in_rect
        alpha = jnp.where(live, alpha, 0.0)

        # Sequential front-to-back within the chunk via cumprod.  The
        # hypothetical T values (assuming every live gaussian contributes) are
        # correct up to and including the FIRST would-terminate event, which
        # is all we need: everything after that event is masked out anyway.
        one_m = 1.0 - alpha
        cp = jnp.cumprod(one_m, axis=0)
        T_before = T[None, :] * jnp.concatenate(
            [jnp.ones_like(cp[:1]), cp[:-1]], axis=0)
        T_after = T[None, :] * cp
        would_terminate = live & (T_after < T_EPS)
        after_first_term = jnp.concatenate(
            [jnp.zeros_like(would_terminate[:1]),
             jnp.cumsum(would_terminate[:-1].astype(jnp.int32), axis=0) > 0],
            axis=0)
        contrib = (live & (~done[None, :]) & (~would_terminate)
                   & (~after_first_term))
        w = jnp.where(contrib, alpha * T_before, 0.0)      # [chunk,HW]
        acc = acc + jnp.matmul(col.T, w, precision="highest")  # [C,HW] (MXU)
        eff_one_m = jnp.where(contrib, one_m, 1.0)
        T = T * jnp.prod(eff_one_m, axis=0)
        done = done | jnp.any(would_terminate, axis=0)
        return (T, acc, done), None

    # derive the carry init from the inputs so its "varying axes" match
    # inside shard_map (a pure-constant init breaks the scan type check)
    zf = jnp.sum(means2d) * 0.0
    T0 = jnp.ones((hw,), jnp.float32) + zf
    acc0 = jnp.zeros((num_ch, hw), jnp.float32) + zf
    done0 = jnp.zeros((hw,), bool) | (zf > 0.0)

    xs = (
        means2d.reshape(steps, chunk, 2),
        conics.reshape(steps, chunk, 3),
        cols.reshape(steps, chunk, num_ch),
        opac.reshape(steps, chunk),
        valid.reshape(steps, chunk),
        rects.reshape(steps, chunk, 4),
    )
    (T, acc, done), _ = jax.lax.scan(body, (T0, acc0, done0), xs)
    image = acc + bg[:, None] * T[None, :]
    return (image.reshape(num_ch, image_height, image_width),
            T.reshape(image_height, image_width))
