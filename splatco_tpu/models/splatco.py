"""SplatCo model assembly: anchors + CSCM tri-planes + decoders + contractor.

The functional analogue of the reference GaussianModel constructor
(/root/reference/scene/gaussian_model.py:254-348): builds the full param
pytree and the non-trainable runtime state.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from splatco_tpu.config import ModelConfig
from splatco_tpu.models.anchors import AnchorState, init_anchor_state
from splatco_tpu.models.contraction import Contractor, make_contractor
from splatco_tpu.models.decoders import init_decoders
from splatco_tpu.models.triplane import init_feature_planes


@dataclasses.dataclass
class ModelState:
    """Non-trainable runtime state carried alongside the param pytree."""
    active: jax.Array          # [C] anchor liveness
    contractor: Contractor
    voxel_size: float
    activate_level: int = 0    # CSCM pyramid level (static; re-jits on bump)
    q_noise: float = 0.03      # quantization-noise amplitude (0 at eval)


def init_model(
    key: jax.Array,
    cfg: ModelConfig,
    points: np.ndarray,
    num_cameras: int = 0,
) -> Tuple[Dict[str, Any], ModelState]:
    k_dec, k_planes = jax.random.split(key)
    anchors, voxel_size = init_anchor_state(
        points, cfg.feat_dim, cfg.n_offsets, cfg.voxel_size,
        capacity=cfg.capacity, ratio=cfg.ratio)
    if cfg.use_spatial_ctx:
        # paper-faithful local branch (Q5): per-level Spatial_CTX output is
        # concat(3D, xy, xz, yz interpolations) = 4 * feat_dim
        ctx_dim = 4 * cfg.feat_dim
    else:
        ctx_dim = cfg.feat_dim + 3 + 3 * cfg.n_offsets + 6
    params = {
        "anchors": {
            "anchor": anchors.anchor,
            "feat": anchors.feat,
            "offsets": anchors.offsets,
            "scaling": anchors.scaling,
            "rotation": anchors.rotation,
            "opacity": anchors.opacity,
        },
        "decoders": init_decoders(
            k_dec, cfg.feat_dim, cfg.n_offsets,
            appearance_dim=cfg.appearance_dim,
            use_feat_bank=cfg.use_feat_bank,
            add_opacity_dist=cfg.add_opacity_dist,
            add_cov_dist=cfg.add_cov_dist,
            add_color_dist=cfg.add_color_dist,
            num_cameras=num_cameras),
        "planes": init_feature_planes(
            k_planes, cfg.plane_size, cfg.num_channels,
            ctx_dim=ctx_dim,
            quirk_duplicate_level0=cfg.quirk_duplicate_level0),
    }
    state = ModelState(
        active=anchors.active,
        contractor=make_contractor(cfg.scene_center, cfg.scene_length,
                                   cfg.bbox_scale, enabled=cfg.contractor),
        voxel_size=voxel_size,
    )
    return params, state


def decode_kwargs(cfg: ModelConfig) -> Dict[str, Any]:
    return dict(
        add_opacity_dist=cfg.add_opacity_dist,
        add_cov_dist=cfg.add_cov_dist,
        add_color_dist=cfg.add_color_dist,
        appearance_dim=cfg.appearance_dim,
        use_feat_bank=cfg.use_feat_bank,
        compat_raw_domain=cfg.compat_raw_domain,
        use_spatial_ctx=cfg.use_spatial_ctx,
    )
