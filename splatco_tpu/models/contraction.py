"""MERF-style scene contraction.

Reference: `Conctractor` (sic), /root/reference/scene/gaussian_model.py:65-95.
Maps the scene bbox to [-1,1] linearly, then warps the outside region into
(-2,-1] / [1,2) with the 2 - 1/|x| contraction.

Quirk Q4 (SURVEY): the shipped reference never calls contracte() in a
forward path — tri-planes are queried with RAW world coordinates against a
fixed [-2,2] domain, so out-of-bbox anchors read zero features.  Our default
is the paper-correct contract-then-query; `enabled=False` reproduces the
linear-only mapping, and skipping the call reproduces the raw-domain quirk
(model flag `compat_raw_domain`).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Contractor:
    xyz_min: jax.Array  # [3]
    xyz_max: jax.Array  # [3]
    enabled: bool = dataclasses.field(metadata=dict(static=True),
                                      default=True)


def make_contractor(center, length, bbox_scale: float, enabled: bool = True
                    ) -> Contractor:
    """Reference setup_contractor (gaussian_model.py:245-249): bbox =
    center +- length*bbox_scale/2."""
    center = jnp.asarray(center, jnp.float32)
    length = jnp.asarray(length, jnp.float32)
    half = length * bbox_scale / 2.0
    return Contractor(xyz_min=center - half, xyz_max=center + half,
                      enabled=enabled)


def contract(c: Contractor, xyz):
    ind = (xyz - c.xyz_min) * 2.0 / (c.xyz_max - c.xyz_min) - 1.0
    if not c.enabled:
        return ind
    a = jnp.abs(ind)
    warped = jnp.sign(ind) * (2.0 - 1.0 / jnp.maximum(a, 1.0))
    return jnp.where(a > 1.0, warped, ind)


def decontract(c: Contractor, xyz):
    a = jnp.abs(xyz)
    inv = jnp.sign(xyz) / jnp.maximum(1.0 - (jnp.minimum(a, 2.0 - 1e-6)
                                             - 1.0), 1e-6)
    res = jnp.where(a > 1.0, inv, xyz)
    return res * (c.xyz_max - c.xyz_min) / 2.0 + (c.xyz_max + c.xyz_min) / 2.0
