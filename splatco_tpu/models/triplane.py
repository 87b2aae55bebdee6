"""CSCM — Cross-Structure Collaboration Module (tri-plane pyramid + fusion).

Re-design of the reference's `FeaturePlanes`/`PlaneGrid`/`TriPlaneAttention`
stack (/root/reference/scene/gaussian_model.py:97-224,
/root/reference/scene/grids.py:22-257) as pure functions over param pytrees.

Structure reproduced exactly (including the duplicate-level-0 quirk):
  * the reference builds FOUR PlaneGrids — [TA@ws0, plain@ws0, plain@ws1,
    plain@ws2] with ws_i = plane_size * 0.5^(2-i) — but iterates only the
    first THREE in forward and in the optimizer (grids.py:112-118,
    gaussian_model.py:149-169,562-568), so the full-resolution grid is dead
    weight.  `quirk_duplicate_level0=True` (default) reproduces the
    effective pyramid [TA@ws0, plain@ws0, plain@ws1] without allocating the
    dead grid; False gives the paper-intended [TA@ws0, plain@ws1, plain@ws2].
  * level i feature: bilinear grid_sample of the 3 planes (align_corners,
    zero padding), + U(-.5,.5)*Q quantization noise during training
    (Q0=0.03; eval Q=0 — gaussian_model.py:187,213, grids.py:159-164),
  * level 0 additionally samples TriPlaneAttention-modulated planes,
    doubling its channel count (grids.py:166-181),
  * hierarchical compensation: geo_fea = sum over active levels of
    concat(BN+Linear(plane_feat), BN+Linear(anchor_ctx_71)) in R^64
    (gaussian_model.py:139-169),
  * TV regularizer: smooth-L1 of adjacent texel differences, mean of the 6
    axis terms, level-weighted 0.5^(2-level) (grids.py:240-250,
    gaussian_model.py:217-220).

BatchNorm is masked train-mode BN (see models/mlp.py, SURVEY Q16).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from splatco_tpu.models.mlp import (
    init_batchnorm,
    init_linear,
    linear,
    masked_batchnorm,
)

CTX_DIM_BASE = 71  # feat32 + anchor3 + offsets30 + scaling6 (n_offsets=10)


# ----------------------------------------------------------------------
# plane sampling
# ----------------------------------------------------------------------

def _sample_plane(plane: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Bilinear sample plane [R, H, W] at normalized coords u (H axis),
    v (W axis) in [-1, 1]; align_corners=True, zeros outside.  [N] -> [N,R].
    """
    r, h, w = plane.shape
    x = (u + 1.0) * 0.5 * (h - 1)
    y = (v + 1.0) * 0.5 * (w - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    flat = plane.reshape(r, h * w).T  # [H*W, R]

    def corner(cx, cy, wgt):
        inb = (cx >= 0) & (cx <= h - 1) & (cy >= 0) & (cy <= w - 1)
        idx = (jnp.clip(cx, 0, h - 1).astype(jnp.int32) * w
               + jnp.clip(cy, 0, w - 1).astype(jnp.int32))
        vals = flat[idx]  # [N, R] gather
        return vals * (wgt * inb.astype(plane.dtype))[:, None]

    return (corner(x0, y0, (1 - tx) * (1 - ty))
            + corner(x0 + 1, y0, tx * (1 - ty))
            + corner(x0, y0 + 1, (1 - tx) * ty)
            + corner(x0 + 1, y0 + 1, tx * ty))


def init_plane_grid(key, channels: int, size: int) -> Dict[str, Any]:
    """Three learnable planes; R = channels // 3 each (grids.py:122-128)."""
    r = channels // 3
    kxy, kxz, kyz = jax.random.split(key, 3)
    std = 0.1
    return {
        "xy": jax.random.normal(kxy, (r, size, size)) * std,
        "xz": jax.random.normal(kxz, (r, size, size)) * std,
        "yz": jax.random.normal(kyz, (r, size, size)) * std,
    }


def sample_plane_grid(params, xyz_norm, key=None, q: float = 0.0):
    """Query the 3 planes at xyz in the [-2,2] domain (grids.py:184-201).

    xyz_norm: [N,3] already in the contracted (-2,2) domain.
    Returns [N, 3R] = concat(xy, xz, yz) features (+ noise if q>0)."""
    ind = xyz_norm / 2.0  # (x - (-2)) / 4 * 2 - 1
    fx, fy, fz = ind[:, 0], ind[:, 1], ind[:, 2]
    feats = [
        _sample_plane(params["xy"], fx, fy),
        _sample_plane(params["xz"], fx, fz),
        _sample_plane(params["yz"], fy, fz),
    ]
    if q > 0.0 and key is not None:
        keys = jax.random.split(key, 3)
        feats = [f + jax.random.uniform(k, f.shape, f.dtype, -0.5, 0.5) * q
                 for f, k in zip(feats, keys)]
    return feats


# ----------------------------------------------------------------------
# TriPlaneAttention (CBAM-style, grids.py:22-64)
# ----------------------------------------------------------------------

def init_tpa(key, channels: int, ratio: int = 5) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = channels // ratio
    return {
        # 1x1 convs as linear maps over channels (no bias, grids.py:28-30)
        "ca_w1": jax.random.uniform(
            k1, (channels, hidden), jnp.float32,
            -1.0 / jnp.sqrt(channels), 1.0 / jnp.sqrt(channels)),
        "ca_w2": jax.random.uniform(
            k2, (hidden, channels), jnp.float32,
            -1.0 / jnp.sqrt(hidden), 1.0 / jnp.sqrt(hidden)),
        # 7x7 conv, 2->1 channels, no bias (grids.py:44)
        "sa_w": jax.random.uniform(
            k3, (7, 7, 2, 1), jnp.float32,
            -1.0 / jnp.sqrt(2 * 49), 1.0 / jnp.sqrt(2 * 49)),
    }


def apply_tpa(params, x: jax.Array) -> jax.Array:
    """x: [C, H, W] (the 3 planes concatenated on channels)."""
    c, h, w = x.shape
    # channel attention
    avg = x.mean(axis=(1, 2))
    mx = x.max(axis=(1, 2))

    def shared(v):
        return jax.nn.relu(v @ params["ca_w1"]) @ params["ca_w2"]

    ca = jax.nn.sigmoid(shared(avg) + shared(mx))
    x = x * ca[:, None, None]
    # spatial attention
    sa_in = jnp.stack([x.mean(axis=0), x.max(axis=0)], axis=-1)[None]
    sa = jax.lax.conv_general_dilated(
        sa_in, params["sa_w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x * jax.nn.sigmoid(sa[0, :, :, 0])[None]


# ----------------------------------------------------------------------
# FeaturePlanes pyramid (CSCM)
# ----------------------------------------------------------------------

def level_sizes(plane_size: int, num_levels: int = 3,
                quirk_duplicate_level0: bool = True) -> List[int]:
    sizes = [int(plane_size * 0.5 ** (num_levels - 1 - i))
             for i in range(num_levels)]
    if quirk_duplicate_level0:
        # effective reference pyramid: [ws0 (TA), ws0, ws1]
        return [sizes[0], sizes[0], sizes[1]]
    return sizes


def init_feature_planes(key, plane_size: int, num_channels: int,
                        out_dim: int = 32, num_levels: int = 3,
                        ctx_dim: int = CTX_DIM_BASE,
                        quirk_duplicate_level0: bool = True
                        ) -> Dict[str, Any]:
    sizes = level_sizes(plane_size, num_levels, quirk_duplicate_level0)
    keys = jax.random.split(key, 3 * num_levels + 1)
    r3 = (num_channels // 3) * 3  # actual sampled channel count
    grids, heads, ctx_heads = [], [], []
    for i in range(num_levels):
        grids.append(init_plane_grid(keys[3 * i], num_channels, sizes[i]))
        in_dim = r3 * 2 if i == 0 else r3  # level 0 doubled by TA
        head = {
            "bn": init_batchnorm(in_dim),
            "lin": init_linear(keys[3 * i + 1], in_dim, out_dim),
        }
        ctx = {
            "bn": init_batchnorm(ctx_dim),
            "lin": init_linear(keys[3 * i + 2], ctx_dim, out_dim),
        }
        if i > 0:
            # Deliberate improvement over the reference: zero-init the
            # fusion output layers of the not-yet-active levels so
            # `activate_level` is an exact no-op at switch-on (geo_fea
            # unchanged) and the level grows in via gradient flow.  The
            # reference activates randomly-initialized heads at iters
            # 12k/21k (/root/reference/scene/gaussian_model.py:562-568)
            # and suffers a multi-dB transient each time.
            head["lin"] = {"w": jnp.zeros_like(head["lin"]["w"]),
                           "b": jnp.zeros_like(head["lin"]["b"])}
            ctx["lin"] = {"w": jnp.zeros_like(ctx["lin"]["w"]),
                          "b": jnp.zeros_like(ctx["lin"]["b"])}
        heads.append(head)
        ctx_heads.append(ctx)
    return {
        "grids": grids,
        "heads": heads,
        "ctx_heads": ctx_heads,
        "tpa": init_tpa(keys[-1], r3),
    }


def sample_level_feats(params, xyz_norm, activate_level: int = 0):
    """View-independent plane sampling for all active levels — the gather
    hot path, factored out so an mv-view training step samples ONCE and
    shares the result across views (the backward then accumulates all
    views' plane gradients before a single scatter-add into the planes).
    No noise here: the per-view quantization noise is additive on the
    sampled features, so callers add it after (bit-identical math).

    Returns a tuple with one entry per level: (feats, ta_feats) for level
    0 (TriPlaneAttention branch) and (feats, None) above."""
    out = []
    for i in range(activate_level + 1):
        feats = sample_plane_grid(params["grids"][i], xyz_norm)
        ta_feats = None
        if i == 0:
            planes = params["grids"][0]
            stacked = jnp.concatenate(
                [planes["xy"], planes["xz"], planes["yz"]], axis=0)
            att = apply_tpa(params["tpa"], stacked)
            r = planes["xy"].shape[0]
            axy, axz, ayz = att[:r], att[r:2 * r], att[2 * r:]
            ind = xyz_norm / 2.0
            fx, fy, fz = ind[:, 0], ind[:, 1], ind[:, 2]
            ta_feats = [
                _sample_plane(axy, fx, fy),
                _sample_plane(axz, fx, fz),
                _sample_plane(ayz, fy, fz),
            ]
        out.append((feats, ta_feats))
    return tuple(out)


@functools.partial(jax.jit,
                   static_argnames=("activate_level", "q", "gauss_axis"))
def feature_planes_forward(params, xyz_norm, g_fea, mask, key=None,
                           q: float = 0.0, activate_level: int = 0,
                           gauss_axis=None, plane_feats=None):
    """geo_fea [N, 2*out_dim] = hierarchical compensation sum.

    xyz_norm: [N,3] contracted coords in (-2,2); g_fea: the local-context
    branch input — either one [N,D] array shared by all levels (the shipped
    71-d anchor context, SURVEY Q5) or a tuple of per-level [N,D] arrays
    (the paper-faithful Spatial_CTX interpolations); mask: [N] valid rows
    (for the BN statistics); plane_feats: optional precomputed
    sample_level_feats(...) output (per-view noise is still applied
    here)."""
    if not isinstance(g_fea, (tuple, list)):
        g_fea = (g_fea,) * len(params["ctx_heads"])
    if plane_feats is None:
        plane_feats = sample_level_feats(params, xyz_norm, activate_level)
    total = None
    for i in range(activate_level + 1):
        keys = (jax.random.split(key, 2) if key is not None
                else (None, None))
        key = keys[0] if key is not None else None
        feats, ta_feats = plane_feats[i]
        if q > 0.0 and keys[1] is not None:
            nk3 = jax.random.split(keys[1], 3)
            feats = [f + jax.random.uniform(k, f.shape, f.dtype,
                                            -0.5, 0.5) * q
                     for f, k in zip(feats, nk3)]
        if i == 0:
            if q > 0.0 and keys[1] is not None:
                nk = jax.random.split(jax.random.fold_in(keys[1], 7), 3)
                ta_feats = [
                    f + jax.random.uniform(k, f.shape, f.dtype, -0.5, 0.5) * q
                    for f, k in zip(ta_feats, nk)]
            # interleave per plane: [xy, xyTA, xz, xzTA, yz, yzTA]
            feat = jnp.concatenate(
                [feats[0], ta_feats[0], feats[1], ta_feats[1],
                 feats[2], ta_feats[2]], axis=-1)
        else:
            feat = jnp.concatenate(feats, axis=-1)
        head = params["heads"][i]
        rr = linear(head["lin"],
                    masked_batchnorm(head["bn"], feat, mask,
                                     axis_name=gauss_axis))
        ctx = params["ctx_heads"][i]
        rrr = linear(ctx["lin"],
                     masked_batchnorm(ctx["bn"], g_fea[i], mask,
                                      axis_name=gauss_axis))
        res = jnp.concatenate([rr, rrr], axis=-1)
        total = res if total is None else total + res
    return total


def smooth_l1_sum(a, b):
    d = a - b
    ad = jnp.abs(d)
    return jnp.sum(jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5))


def tv_loss(params, w: float, activate_level: int = 0) -> jax.Array:
    """Total-variation regularizer over active plane levels
    (grids.py:240-250 weighting via gaussian_model.py:217-220)."""
    total = 0.0
    for lvl in range(activate_level + 1):
        wl = w * (0.5 ** (2 - lvl))
        g = params["grids"][lvl]
        lv = 0.0
        for name in ("xy", "xz", "yz"):
            p = g[name]
            lv = lv + smooth_l1_sum(p[:, 1:, :], p[:, :-1, :])
            lv = lv + smooth_l1_sum(p[:, :, 1:], p[:, :, :-1])
        total = total + wl * lv / 6.0
    return total


def fake_quantize(x, n_bits: int = 12):
    """FakeQuantize (grids.py:66-85) — latent in the reference (Q6); kept
    for compression-mode parity."""
    n = 2 ** n_bits
    scale = 5.0 / (n / 2 - 1)
    zero = n / 2
    xi = jnp.clip(jnp.floor(x / scale + zero), 0, n - 1)
    return (xi - zero) * scale


def resize_plane(plane, new_hw):
    """Bilinear plane upsample (scale_volume_grid, grids.py:203-218 — dead
    code in the reference training loop but part of the API)."""
    r = plane.shape[0]
    return jax.image.resize(plane, (r,) + tuple(new_hw), method="linear")
