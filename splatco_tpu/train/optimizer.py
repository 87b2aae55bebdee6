"""Multi-group Adam with the reference's per-group learning-rate schedules.

Reference: GaussianModel.training_setup / update_learning_rate
(/root/reference/scene/gaussian_model.py:510-638): one torch Adam
(eps=1e-15) over ~14 param groups; anchor/offset/decoder-MLP groups follow
exponential log-lerp schedules (scaled by the scene radius for the spatial
groups), plane groups get a static LR that depends on which pyramid level
is active (0.01 active / 0.001 inactive; fusion heads 1e-4 / 1e-5,
:562-568), and — reference quirk — the CTX fusion heads are NEVER added to
the optimizer, so they stay frozen (train_ctx_heads=False reproduces that;
True trains them with the head LRs).

Implemented as optax.multi_transform over a label pytree; rebuild the
optimizer (like the reference re-runs training_setup) when the active level
changes; `reset_anchor_moments`/row surgery lives in train/densify.py.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from splatco_tpu.config import OptimizationConfig
from splatco_tpu.utils.math import expon_lr

ADAM_EPS = 1e-15


def _sched(lr_init, lr_final, delay_mult, max_steps):
    def fn(step):
        return expon_lr(step, lr_init, lr_final,
                        lr_delay_steps=0, lr_delay_mult=delay_mult,
                        max_steps=max_steps)
    return fn


def _const(lr):
    return lambda step: jnp.asarray(lr, jnp.float32)


def group_schedules(opt: OptimizationConfig, spatial_lr_scale: float,
                    activate_level: int, num_levels: int = 3,
                    train_ctx_heads: bool = False) -> Dict[str, Any]:
    s = {
        "anchor": _sched(opt.position_lr_init * spatial_lr_scale,
                         opt.position_lr_final * spatial_lr_scale,
                         opt.position_lr_delay_mult,
                         opt.position_lr_max_steps),
        "offset": _sched(opt.offset_lr_init * spatial_lr_scale,
                         opt.offset_lr_final * spatial_lr_scale,
                         opt.offset_lr_delay_mult, opt.offset_lr_max_steps),
        "anchor_feat": _const(opt.feature_lr),
        "opacity": _const(opt.opacity_lr),
        "scaling": _const(opt.scaling_lr),
        "rotation": _const(opt.rotation_lr),
        "mlp_opacity": _sched(opt.mlp_opacity_lr_init,
                              opt.mlp_opacity_lr_final,
                              opt.mlp_opacity_lr_delay_mult,
                              opt.mlp_opacity_lr_max_steps),
        "mlp_cov": _sched(opt.mlp_cov_lr_init, opt.mlp_cov_lr_final,
                          opt.mlp_cov_lr_delay_mult,
                          opt.mlp_cov_lr_max_steps),
        "mlp_color": _sched(opt.mlp_color_lr_init, opt.mlp_color_lr_final,
                            opt.mlp_color_lr_delay_mult,
                            opt.mlp_color_lr_max_steps),
        "mlp_featurebank": _sched(opt.mlp_featurebank_lr_init,
                                  opt.mlp_featurebank_lr_final,
                                  opt.mlp_featurebank_lr_delay_mult,
                                  opt.mlp_featurebank_lr_max_steps),
        "embedding_appearance": _sched(opt.appearance_lr_init,
                                       opt.appearance_lr_final,
                                       opt.appearance_lr_delay_mult,
                                       opt.appearance_lr_max_steps),
        "frozen": _const(0.0),
    }
    for i in range(num_levels):
        act = i == activate_level
        s[f"planes{i}"] = _const(opt.plane_lr_active if act
                                 else opt.plane_lr_inactive)
        s[f"plane_head{i}"] = _const(opt.plane_mlp_lr_active if act
                                     else opt.plane_mlp_lr_inactive)
        s[f"ctx_head{i}"] = (s[f"plane_head{i}"] if train_ctx_heads
                             else _const(0.0))
    return s


def label_params(params: Dict[str, Any], num_levels: int = 3
                 ) -> Dict[str, Any]:
    """Build the label pytree mapping each leaf to its LR group."""
    def fill(tree, label):
        return jax.tree.map(lambda _: label, tree)

    labels: Dict[str, Any] = {
        "anchors": {
            "anchor": "anchor", "offsets": "offset",
            "feat": "anchor_feat", "opacity": "opacity",
            "scaling": "scaling", "rotation": "rotation",
        },
        "decoders": {},
        "planes": {"grids": [], "heads": [], "ctx_heads": []},
    }
    for name in params["decoders"]:
        lbl = {"opacity": "mlp_opacity", "cov": "mlp_cov",
               "color": "mlp_color", "feature_bank": "mlp_featurebank",
               "appearance": "embedding_appearance"}[name]
        labels["decoders"][name] = fill(params["decoders"][name], lbl)
    for i in range(len(params["planes"]["grids"])):
        labels["planes"]["grids"].append(
            fill(params["planes"]["grids"][i], f"planes{i}"))
        labels["planes"]["heads"].append(
            fill(params["planes"]["heads"][i], f"plane_head{i}"))
        labels["planes"]["ctx_heads"].append(
            fill(params["planes"]["ctx_heads"][i], f"ctx_head{i}"))
    # TriPlaneAttention params belong to level 0's grid group (the reference
    # registers them via k0s[0].parameters())
    labels["planes"]["tpa"] = fill(params["planes"]["tpa"], "planes0")
    return labels


def make_optimizer(opt: OptimizationConfig, params: Dict[str, Any],
                   spatial_lr_scale: float, activate_level: int,
                   train_ctx_heads: bool = False) -> optax.GradientTransformation:
    num_levels = len(params["planes"]["grids"])
    scheds = group_schedules(opt, spatial_lr_scale, activate_level,
                             num_levels, train_ctx_heads)
    labels = label_params(params, num_levels)

    def group_tx(schedule):
        return optax.chain(
            optax.scale_by_adam(eps=ADAM_EPS),
            optax.scale_by_schedule(lambda step: -schedule(step)),
        )

    return optax.multi_transform(
        {name: group_tx(fn) for name, fn in scheds.items()}, labels)
