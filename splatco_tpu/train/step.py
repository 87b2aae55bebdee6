"""SVC training step — multi-view render, one aggregated backward.

Reference: the mv-view loop of training() (/root/reference/train.py:167-243).
The reference renders mv=4 views sequentially, sums the per-view losses plus
the pairwise multi-view consistency loss, and calls ONE backward so
structural (tri-plane) and per-view pixel gradients aggregate before the
Adam step — that aggregation is exactly what a single jax.grad over the
summed loss computes.  On a device mesh the same step runs with views
sharded over the `view` axis (parallel/), where the aggregation becomes a
psum.

Per-view loss (train.py:192-196):
    (1-lambda)*L1 + lambda*(1-SSIM) + 0.01 * mean(prod(scaling, axis=1))
over the selected gaussians; consistency pairs (train.py:206-218):
    ssim(gt_i, gt_j) * | mean|  (gt_i-gt_j) - (ren_i-ren_j) | |
gated on ssim(gt_i, gt_j) > 0.6, weighted 0.05; TV loss on active plane
levels every 4 iterations (train.py:242-243).

Densification statistics follow the reference quirk of using only the LAST
view's render outputs (train.py:188 — loop shadowing, SURVEY Q11).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from splatco_tpu.config import ModelConfig, OptimizationConfig
from splatco_tpu.models.contraction import Contractor
from splatco_tpu.models.renderer import (precompute_plane_feats,
                                         prefilter_voxel, render)
from splatco_tpu.models.splatco import decode_kwargs
from splatco_tpu.models.triplane import tv_loss
from splatco_tpu.ops.losses import l1_loss, ssim


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainStats:
    """Densification statistics (reference training_statis state,
    gaussian_model.py:513-517)."""
    opacity_accum: jax.Array          # [C,1]
    anchor_demon: jax.Array           # [C,1]
    offset_gradient_accum: jax.Array  # [C*K,1]
    offset_denom: jax.Array           # [C*K,1]


def init_stats(capacity: int, n_offsets: int) -> TrainStats:
    return TrainStats(
        opacity_accum=jnp.zeros((capacity, 1)),
        anchor_demon=jnp.zeros((capacity, 1)),
        offset_gradient_accum=jnp.zeros((capacity * n_offsets, 1)),
        offset_denom=jnp.zeros((capacity * n_offsets, 1)),
    )


def make_train_step(cfg: ModelConfig, opt: OptimizationConfig, mv: int,
                    activate_level: int, tx, backend: str = "pallas",
                    kmax_pack: int | None = None,
                    class_spec: tuple | None = None,
                    q_noise: float = 0.03,
                    disable: frozenset = frozenset()):
    """Build the jitted SVC step for a fixed activate_level / mv / slot
    budget (kmax_pack, or the class-packed class_spec — see
    ops/binning.py).  The trainer re-jits with a bigger budget when the
    overflow counter fires — adaptive capacity, same pattern as densify
    regrow.

    `disable` is a PROFILING affordance (tools/profile_step_recon.py):
    statically removes named blocks ({"ssim", "consistency", "tv",
    "stats", "optimizer", "sreg"}) so the fused step's wall time can be
    attributed by differencing.  Production callers leave it empty."""
    dkw = decode_kwargs(cfg)
    lam = opt.lambda_dssim

    @jax.jit
    def step(params, opt_state, active, contractor, stats: TrainStats,
             cameras: Tuple, gts, bg, key, iteration, consistency_on,
             tv_w, stats_on, pair_gates=None):
        """pair_gates: optional [mv*(mv-1)/2] precomputed SSIM gates for
        the consistency pairs (i<j in row-major pair order).  GT images
        are constant per camera, so the Trainer computes each pair's gate
        once per run and passes it in — computing the 6 full-frame SSIMs
        inside every step costs ~25 ms at production scale.  None falls
        back to in-step computation (bit-identical semantics)."""
        c = params["anchors"]["anchor"].shape[0]
        k = cfg.n_offsets
        vis_masks = [prefilter_voxel(params["anchors"], active, cam)
                     for cam in cameras]
        keys = jax.random.split(key, mv)
        proxy0 = jnp.zeros((mv, c * k, 2))

        def loss_fn(params, proxies):
            total = 0.0
            images = []
            last = None
            num_overflow = jnp.int32(0)
            max_slots = jnp.int32(0)
            num_clipped = jnp.int32(0)
            class_counts = None
            # view-independent tri-plane sampling, shared by all mv views:
            # the backward then does ONE scatter-add into the planes
            # instead of mv identical ones (per-view noise still applies
            # downstream — see feature_planes_forward)
            plane_feats = precompute_plane_feats(
                params, contractor, activate_level,
                compat_raw_domain=dkw.get("compat_raw_domain", False))
            for i in range(mv):
                out = render(
                    params, active, contractor, cameras[i], bg,
                    visible_mask=vis_masks[i],
                    viewspace_proxy=proxies[i],
                    activate_level=activate_level, is_training=True,
                    key=keys[i], q_noise=q_noise, kmax=cfg.kmax,
                    kmax_pack=kmax_pack, class_spec=class_spec,
                    backend=backend, plane_feats=plane_feats, **dkw)
                num_overflow = num_overflow + out.num_overflow
                max_slots = jnp.maximum(max_slots, out.max_slots)
                if out.num_clipped is not None:
                    num_clipped = num_clipped + out.num_clipped
                if out.class_counts is not None:
                    class_counts = (out.class_counts if class_counts is None
                                    else jnp.maximum(class_counts,
                                                     out.class_counts))
                gt = gts[i]
                ll1 = l1_loss(out.image, gt)
                ssim_l = (1.0 - ssim(out.image, gt)
                          if "ssim" not in disable else 0.0)
                m = out.selection_mask.astype(jnp.float32)
                sreg = ((jnp.sum(jnp.prod(out.scaling, axis=1) * m)
                         / jnp.maximum(m.sum(), 1.0))
                        if "sreg" not in disable else 0.0)
                total = total + ((1.0 - lam) * ll1 + lam * ssim_l
                                 + 0.01 * sreg)
                images.append(out.image)
                last = (out, ll1)

            # pairwise multi-view consistency (SVC).  Views of unequal
            # resolution are crop-aligned to the pair's common top-left
            # window, the reference's align_images (train.py:79-96)
            con = 0.0
            pidx = 0
            for i in range(mv if "consistency" not in disable else 0):
                for j in range(i + 1, mv):
                    mh = min(gts[i].shape[-2], gts[j].shape[-2])
                    mw = min(gts[i].shape[-1], gts[j].shape[-1])
                    crop = lambda a: a[..., :mh, :mw]
                    gi, gj = crop(gts[i]), crop(gts[j])
                    gate = (ssim(gi, gj) if pair_gates is None
                            else pair_gates[pidx])
                    pidx += 1
                    diff = l1_loss(gi - gj,
                                   crop(images[i]) - crop(images[j]))
                    con = con + jnp.where(gate > 0.6,
                                          gate * jnp.abs(diff), 0.0)
            total = total + consistency_on * 0.05 * con
            if "tv" not in disable:
                total = total + tv_loss(params["planes"], 1.0,
                                        activate_level) * tv_w
            out_last, ll1_last = last
            aux = {
                "l1": ll1_last,
                "neural_opacity": out_last.neural_opacity,
                "selection_mask": out_last.selection_mask,
                "visibility_filter": out_last.visibility_filter,
                "con": con,
                "num_overflow": num_overflow,
                "max_slots": max_slots,
                "num_clipped": num_clipped,
                "class_counts": class_counts,
            }
            return total, aux

        (loss, aux), (grads, proxy_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, proxy0)

        # ---- densification statistics (last view only, Q11) ----------
        if "stats" in disable:
            updates, opt_state2 = ((None, opt_state)
                                   if "optimizer" in disable
                                   else tx.update(grads, opt_state,
                                                  params))
            if "optimizer" not in disable:
                params = jax.tree.map(lambda p, u: p + u, params, updates)
            metrics = {"loss": loss, "l1": aux["l1"], "con": aux["con"],
                       "num_overflow": aux["num_overflow"],
                       "max_slots": aux["max_slots"],
                       "num_clipped": aux["num_clipped"]}
            return params, opt_state2, stats, metrics
        vis_anchor = vis_masks[-1]
        neur_op = jnp.maximum(aux["neural_opacity"], 0.0).reshape(c, k)
        stats = TrainStats(
            opacity_accum=stats.opacity_accum + stats_on * jnp.where(
                vis_anchor[:, None], neur_op.sum(axis=1, keepdims=True), 0.0),
            anchor_demon=stats.anchor_demon + stats_on * jnp.where(
                vis_anchor[:, None], 1.0, 0.0),
            offset_gradient_accum=stats.offset_gradient_accum,
            offset_denom=stats.offset_denom,
        )
        slot_mask = aux["selection_mask"] & aux["visibility_filter"]
        # NDC-unit screen grads, the reference's stat units: the CUDA
        # backward emits dL_dmean2D pre-scaled by (0.5W, 0.5H)
        # (diff-gaussian-rasterization backward.cu ddelx_dx = 0.5*W),
        # and anchor_growing thresholds 0.0002 against THAT norm
        # (gaussian_model.py:779).  Our proxy rides pixel-space means2d,
        # so scale before the norm — without this the threshold is
        # ~0.5*W times harder to trip and growth never fires.
        gscale = jnp.asarray([0.5 * cameras[-1].image_width,
                              0.5 * cameras[-1].image_height], jnp.float32)
        gnorm = jnp.linalg.norm(proxy_grads[-1] * gscale, axis=-1,
                                keepdims=True)
        stats = dataclasses.replace(
            stats,
            offset_gradient_accum=stats.offset_gradient_accum
            + stats_on * jnp.where(slot_mask[:, None], gnorm, 0.0),
            offset_denom=stats.offset_denom
            + stats_on * jnp.where(slot_mask[:, None], 1.0, 0.0),
        )

        if "optimizer" not in disable:
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
        metrics = {"loss": loss, "l1": aux["l1"], "con": aux["con"],
                   "num_overflow": aux["num_overflow"],
                   "max_slots": aux["max_slots"],
                   "num_clipped": aux["num_clipped"]}
        if aux["class_counts"] is not None:
            metrics["class_counts"] = aux["class_counts"]
        return params, opt_state, stats, metrics

    return step
