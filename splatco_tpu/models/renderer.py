"""Neural-gaussian decode + render — the L4 renderer front-end.

Reference: generate_neural_gaussians / render / prefilter_voxel
(/root/reference/gaussian_renderer/__init__.py:18-244).

TPU redesign: the reference boolean-gathers the visible/opacity-masked
subset before rasterizing; dynamic shapes are hostile to XLA, so here every
anchor stays in its padded [C, ...] slot and masking works by zeroing
opacity (the rasterizer skips alpha < 1/255 gaussians and the binner emits
no pairs for radius 0, so masked gaussians cost nothing downstream and the
rendered image + gradients are bitwise-equivalent to the gathered version).

The viewspace "proxy" input reproduces the reference's screenspace_points
trick (gaussian_renderer/__init__.py:132-138): pass zeros [C*K, 2], take
grad w.r.t. it to read per-gaussian screen-space gradients for the
densification statistics.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from splatco_tpu.data.cameras import Camera
from splatco_tpu.models import decoders as dec
from splatco_tpu.models.contraction import Contractor, contract
from splatco_tpu.models.context_grid import spatial_ctx
from splatco_tpu.models.triplane import (feature_planes_forward,
                                         sample_level_feats)
from splatco_tpu.ops.projection import (aos_of, project_gaussians_cols,
                                        visible_filter)
from splatco_tpu.ops.rasterize import rasterize
from splatco_tpu.ops.rasterize_reference import rasterize_dense
from splatco_tpu.utils.math import normalize


class RenderOutput(NamedTuple):
    image: jax.Array          # [3,H,W]
    neural_opacity: jax.Array  # [C*K] raw tanh output
    selection_mask: jax.Array  # [C*K] bool: opacity>0 & visible
    scaling: jax.Array         # [C*K,3] final gaussian scales
    radii: jax.Array           # [C*K] int32 (0 for masked)
    visibility_filter: jax.Array  # [C*K] bool radii>0
    num_overflow: jax.Array    # [] i32: slots dropped by the slot budget
    max_slots: jax.Array       # [] i32: minimal safe kmax_pack this frame
    class_counts: Optional[jax.Array] = None  # [n_classes] i32 per-class
                                              #   populations (pallas only)
    num_clipped: Optional[jax.Array] = None  # [] i32: gaussians whose tile
                                             #   rect was clipped to kmax
                                             #   (image approximate there)


def prefilter_voxel(anchors: Dict[str, jax.Array], active: jax.Array,
                    camera: Camera) -> jax.Array:
    """Anchor frustum culling (gaussian_renderer/__init__.py:191-244):
    EWA-project anchors with base scales cols 0-2 and anchor rotation, keep
    radii > 0."""
    scales = jnp.exp(anchors["scaling"])[:, :3]
    quats = normalize(anchors["rotation"], eps=1e-12)
    vis = visible_filter(anchors["anchor"], scales, quats, camera)
    return vis & active


def anchor_plane_coords(params, contractor: Contractor,
                        compat_raw_domain: bool = False) -> jax.Array:
    """Anchor coords in the tri-plane query domain (view-independent)."""
    anchor = params["anchors"]["anchor"]
    if compat_raw_domain:
        return anchor  # Q4 as-shipped: raw world coords vs [-2,2] domain
    return contract(contractor, anchor) * 2.0


def precompute_plane_feats(params, contractor: Contractor,
                           activate_level: int,
                           compat_raw_domain: bool = False):
    """View-independent tri-plane sampling (models/triplane.py
    sample_level_feats) — the mv-view train step computes this ONCE and
    shares it across views so the backward performs a single scatter-add
    into the planes instead of mv identical ones."""
    xyz_norm = anchor_plane_coords(params, contractor, compat_raw_domain)
    return sample_level_feats(params["planes"], xyz_norm, activate_level)


def generate_neural_gaussians(
    params: Dict[str, Any],
    active: jax.Array,
    contractor: Contractor,
    camera: Camera,
    visible_mask: jax.Array,
    *,
    activate_level: int,
    q_noise: float,
    key: Optional[jax.Array],
    add_opacity_dist: bool = False,
    add_cov_dist: bool = False,
    add_color_dist: bool = False,
    appearance_dim: int = 0,
    use_feat_bank: bool = False,
    compat_raw_domain: bool = False,
    use_spatial_ctx: bool = False,
    gauss_axis=None,
    plane_feats=None,
):
    """Decode anchors -> per-offset gaussians (padded, masked).

    Returns dict with xyz [C*K,3], color, opacity (masked), scaling, rot,
    neural_opacity, mask."""
    anchors = params["anchors"]
    anchor = anchors["anchor"]
    feat = anchors["feat"]
    offsets = anchors["offsets"]
    c, k, _ = offsets.shape
    grid_scaling = jnp.exp(anchors["scaling"])  # get_scaling

    # CSCM geo feature (gaussian_renderer/__init__.py:31)
    xyz_norm = anchor_plane_coords(params, contractor, compat_raw_domain)
    if use_spatial_ctx:
        # paper-faithful local branch (Q5): per-level context-grid scatter +
        # interpolate of the anchor features over the contracted domain
        g_fea = tuple(
            spatial_ctx(xyz_norm, feat, -2.0, 2.0, level=i,
                        mask=visible_mask)
            for i in range(activate_level + 1))
    else:
        g_fea = jnp.concatenate(
            [feat, anchor, offsets.reshape(c, -1), grid_scaling], axis=1)
    geo_fea = feature_planes_forward(
        params["planes"], xyz_norm, g_fea, visible_mask, key=key,
        q=q_noise, activate_level=activate_level, gauss_axis=gauss_axis,
        plane_feats=plane_feats)

    ob_view = anchor - camera.camera_center
    ob_dist = jnp.linalg.norm(ob_view, axis=1, keepdims=True)
    ob_view = ob_view / jnp.maximum(ob_dist, 1e-12)

    if use_feat_bank:
        bank_w = dec.feature_bank_mlp(
            params["decoders"], jnp.concatenate([ob_view, ob_dist], axis=1)
        )[:, None, :]  # [C,1,3]
        f = feat[:, :, None]
        feat = (jnp.tile(f[:, ::4, :1], (1, 4, 1)) * bank_w[:, :, :1]
                + jnp.tile(f[:, ::2, :1], (1, 2, 1)) * bank_w[:, :, 1:2]
                + f[:, ::1, :1] * bank_w[:, :, 2:]).squeeze(-1)

    cat_local = jnp.concatenate([feat, ob_view, ob_dist, geo_fea], axis=1)
    cat_local_wod = jnp.concatenate([feat, ob_view, geo_fea], axis=1)

    neural_opacity = dec.opacity_mlp(
        params["decoders"], cat_local if add_opacity_dist else cat_local_wod)
    neural_opacity = neural_opacity.reshape(-1)  # [C*K]
    vis_flat = jnp.repeat(visible_mask, k)
    mask = (neural_opacity > 0.0) & vis_flat
    opacity = jnp.where(mask, neural_opacity, 0.0)

    color_in = cat_local if add_color_dist else cat_local_wod
    if appearance_dim > 0:
        app = dec.appearance_embedding(params["decoders"], camera.uid, c)
        color_in = jnp.concatenate([color_in, app], axis=1)
    color = dec.color_mlp(params["decoders"], color_in).reshape(c * k, 3)

    scale_rot = dec.cov_mlp(
        params["decoders"], cat_local if add_cov_dist else cat_local_wod
    ).reshape(c * k, 7)

    rep = lambda a: jnp.repeat(a, k, axis=0)
    scaling_rep = rep(grid_scaling)           # [C*K,6]
    anchor_rep = rep(anchor)
    scaling = scaling_rep[:, 3:] * jax.nn.sigmoid(scale_rot[:, :3])
    rot = normalize(scale_rot[:, 3:7], eps=1e-12)
    xyz = anchor_rep + offsets.reshape(c * k, 3) * scaling_rep[:, :3]

    return {
        "xyz": xyz, "color": color, "opacity": opacity, "scaling": scaling,
        "rot": rot, "neural_opacity": neural_opacity, "mask": mask,
    }


def render(
    params: Dict[str, Any],
    active: jax.Array,
    contractor: Contractor,
    camera: Camera,
    bg: jax.Array,
    visible_mask: Optional[jax.Array] = None,
    viewspace_proxy: Optional[jax.Array] = None,
    *,
    activate_level: int = 0,
    is_training: bool = False,
    q_noise: float = 0.03,
    key: Optional[jax.Array] = None,
    kmax: int = 12,
    kmax_pack: Optional[int] = None,
    class_spec: Optional[tuple] = None,
    backend: str = "pallas",
    scale_modifier: float = 1.0,
    plane_feats=None,
    **decode_kwargs,
) -> RenderOutput:
    """Full render (gaussian_renderer/__init__.py:118-188).

    scale_modifier multiplies the decoded 3D scales before projection —
    the GaussianRasterizationSettings.scale_modifier knob the SIBR viewer
    drives (reference :149, fed from network_gui's scaling_modifier)."""
    anchors = params["anchors"]
    if visible_mask is None:
        visible_mask = active
    g = generate_neural_gaussians(
        params, active, contractor, camera, visible_mask,
        activate_level=activate_level,
        q_noise=q_noise if is_training else 0.0,
        key=key, plane_feats=plane_feats, **decode_kwargs)
    if scale_modifier != 1.0:
        g["scaling"] = g["scaling"] * scale_modifier

    proj = project_gaussians_cols(g["xyz"], g["scaling"], g["rot"], camera)
    radius = jnp.where(g["opacity"] > 0.0, proj.radius, 0.0)
    mx, my = proj.mx, proj.my
    if viewspace_proxy is not None:
        mx = mx + viewspace_proxy[:, 0]
        my = my + viewspace_proxy[:, 1]
    proj = proj._replace(mx=mx, my=my, radius=radius)

    class_counts = None
    if backend == "pallas":
        image, aux = rasterize(proj, g["color"], g["opacity"], bg,
                               camera.image_height, camera.image_width,
                               kmax=kmax, kmax_pack=kmax_pack,
                               class_spec=class_spec, return_aux=True)
        num_overflow, max_slots = aux["num_overflow"], aux["max_slots"]
        class_counts = aux.get("class_counts")
        num_clipped = aux["num_clipped"]
    else:
        image, _ = rasterize_dense(
            aos_of(proj), g["color"], g["opacity"], bg,
            camera.image_height, camera.image_width, tile_size=32)
        num_overflow = jnp.int32(0)
        max_slots = jnp.int32(kmax)
        num_clipped = jnp.int32(0)

    radii = radius.astype(jnp.int32)
    return RenderOutput(
        image=image,
        neural_opacity=g["neural_opacity"],
        selection_mask=g["mask"],
        scaling=g["scaling"],
        radii=radii,
        visibility_filter=radii > 0,
        num_overflow=num_overflow,
        max_slots=max_slots,
        class_counts=class_counts,
        num_clipped=num_clipped,
    )
