"""Sharded SVC training step — shard_map over a (view, gauss) mesh.

Parallel decomposition (see parallel/mesh.py):
  * each `view` row of the mesh owns one collaborative view (SVC data
    parallelism; the reference's single aggregated backward becomes the
    gradient psum),
  * each `gauss` column owns an anchor shard: the neural-gaussian decode
    (MLPs + CSCM query) runs on local shards with psummed BatchNorm
    statistics, decoded gaussians are all-gathered over ICI, and every
    gauss device rasterizes a horizontal STRIP of its view's image (tile
    parallelism); strips are re-gathered for the SSIM/consistency terms.
  * gradient flow through the collectives is exact: the all_gather
    transposes to a reduce-scatter of cotangents back onto each shard.

Every device computes a local loss summand such that the psum over the
mesh equals the single-device total; local jax.grad + psum then equals the
single-device gradient.

Densification statistics (reference training_statis,
/root/reference/scene/gaussian_model.py:761-782) are computed per shard:
the screen-space "viewspace proxy" gradient of the full view image is the
psum over `gauss` of each strip's proxy gradient; each device keeps its
own anchor slice.  Following the reference's last-view quirk (SURVEY Q11)
only the view row with axis_index == n_view-1 contributes, broadcast with
a psum over `view`.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from splatco_tpu.config import ModelConfig, OptimizationConfig
from splatco_tpu.data.cameras import Camera
from splatco_tpu.models.renderer import generate_neural_gaussians
from splatco_tpu.utils.math import normalize as _unit
from splatco_tpu.models.splatco import decode_kwargs
from splatco_tpu.models.triplane import tv_loss
from splatco_tpu.ops.losses import l1_loss, masked_ssim, ssim
from splatco_tpu.ops.projection import (aos_of, covariance_cols,
                                        project_cols)
from splatco_tpu.ops.rasterize import rasterize
from splatco_tpu.ops.rasterize_reference import rasterize_dense
from splatco_tpu.train.step import TrainStats


def stack_cameras(cams) -> Camera:
    """Stack per-view cameras into one pytree with a leading view axis.
    All static fields must match (same resolution/fov)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def pad_view_batch(cams, gts, n_gauss: int, tile: int = 32):
    """Mixed-resolution SVC batch -> one padded stacked batch.

    Real captures (Mill-19 style) mix resolutions; a shard_map program
    is one trace, so every view renders on a common padded canvas whose
    height divides the gauss strips, and the losses mask to each view's
    true window (the crop-align generalization of the single-device
    path, reference align_images train.py:79-96).

    Returns (cam_stack, gts_padded [V,3,Hp,Wp], view_geom [V,4] f32 =
    (h, w, tan_fovx, tan_fovy) per view).  The static camera fields are
    normalized to the padded canvas (+view 0's fov) so heterogeneous
    cameras stack; projection and prefilter read the TRUE geometry from
    view_geom, so the pixel mapping is unchanged — splats simply may
    spill into the masked pad region."""
    import dataclasses as _dc

    hp = max(c.image_height for c in cams)
    wp = max(c.image_width for c in cams)
    quant = n_gauss * tile
    hp = -(-hp // quant) * quant
    wp = -(-wp // tile) * tile
    view_geom = jnp.asarray(
        [[c.image_height, c.image_width, c.tan_fovx, c.tan_fovy]
         for c in cams], jnp.float32)
    gts_p = jnp.stack([
        jnp.pad(g, ((0, 0), (0, hp - g.shape[-2]), (0, wp - g.shape[-1])))
        for g in gts])
    cams_p = [_dc.replace(c, image_height=hp, image_width=wp,
                          fovx=cams[0].fovx, fovy=cams[0].fovy)
              for c in cams]
    return stack_cameras(cams_p), gts_p, view_geom


def make_sharded_train_step(cfg: ModelConfig, opt: OptimizationConfig,
                            mesh: Mesh, tx, activate_level: int = 0,
                            backend: str = "dense",
                            kmax_pack: int | None = None,
                            class_spec: tuple | None = None,
                            q_noise: float = 0.03):
    n_view, n_gauss = mesh.devices.shape
    dkw = decode_kwargs(cfg)
    lam = opt.lambda_dssim
    k = cfg.n_offsets

    anchors_spec = P("gauss")
    rep = P()

    def param_spec(path, _leaf):
        keys = [getattr(p, "key", None) for p in path]
        return anchors_spec if "anchors" in keys else rep

    def opt_spec(path, _leaf):
        keys = [str(getattr(p, "key", "")) for p in path]
        # adam moments of anchor groups are anchor-shaped
        return anchors_spec if "anchors" in keys else rep

    def device_loss(params, proxy, active, contractor, cam, gt, key,
                    view_geom, flags):
        """Per-device summand of the global loss.  cam/gt are this view's
        (padded to the common canvas); view_geom [V,4] holds every view's
        true (h, w, tan_fovx, tan_fovy) — losses mask to this view's
        window and projection/prefilter use the true geometry;
        params['anchors'] is the local shard; proxy is the GLOBAL
        [C_glob*K, 2] zero screen-space proxy (replicated)."""
        consistency_on, tv_w = flags
        h, w = cam.image_height, cam.image_width
        assert h % n_gauss == 0, "pad_view_batch aligns H to the gauss axis"
        h_strip = h // n_gauss
        gidx = jax.lax.axis_index("gauss")
        vidx = jax.lax.axis_index("view")
        th, tw = view_geom[vidx, 0], view_geom[vidx, 1]
        tfx, tfy = view_geom[vidx, 2], view_geom[vidx, 3]

        def view_mask(v):
            rows = (jnp.arange(h, dtype=jnp.float32)[:, None]
                    < view_geom[v, 0])
            colsm = (jnp.arange(w, dtype=jnp.float32)[None, :]
                     < view_geom[v, 1])
            return rows & colsm

        mask = view_mask(vidx)
        npix = 3.0 * th * tw

        # NOTE on the single-chip `precompute_plane_feats` hoist: it is
        # intentionally NOT applied here.  In the sharded step each view
        # is a different device along the `view` mesh axis, so the
        # per-view plane sampling below is parallel in SPACE — every
        # device samples exactly once per step and the plane gradients
        # are already accumulated across views by the psum.  Hoisting
        # would not reduce any device's work.

        # anchor frustum prefilter with the TRUE view geometry (the cam
        # statics are normalized to the padded canvas)
        anch = params["anchors"]
        pre_cov = covariance_cols(jnp.exp(anch["scaling"])[:, :3],
                                  _unit(anch["rotation"], eps=1e-12))
        pre = jax.lax.stop_gradient(project_cols(
            anch["anchor"], pre_cov, cam.world_view_transform,
            cam.full_proj_transform, tw, th, tfx, tfy))
        vis = (pre.radius > 0) & active
        g = generate_neural_gaussians(
            params, active, contractor, cam, vis,
            activate_level=activate_level, q_noise=q_noise, key=key,
            gauss_axis="gauss", **dkw)

        gather = lambda x: jax.lax.all_gather(x, "gauss", axis=0,
                                              tiled=True)
        xyz = gather(g["xyz"])
        color = gather(g["color"])
        opacity = gather(g["opacity"])
        scaling = gather(g["scaling"])
        rot = gather(g["rot"])
        sel = gather(g["mask"])

        cov6 = covariance_cols(scaling, rot)
        # project with the TRUE view dims (the NDC->pixel mapping must not
        # see the padded canvas)
        proj = project_cols(xyz, cov6, cam.world_view_transform,
                            cam.full_proj_transform, tw, th, tfx, tfy)
        radius = jnp.where(opacity > 0.0, proj.radius, 0.0)
        # strip rasterization: shift means into this strip's frame; the
        # proxy rides on the GLOBAL screen-space means so its gradient is
        # the reference's densification signal
        sproj = proj._replace(
            mx=proj.mx + proxy[:, 0],
            my=proj.my + proxy[:, 1] - (gidx * h_strip).astype(jnp.float32),
            radius=radius)
        bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.white_background
                         else [0.0, 0.0, 0.0], jnp.float32)
        num_overflow = jnp.int32(0)
        max_slots = jnp.int32(cfg.kmax)
        if backend == "pallas":
            strip, raux = rasterize(sproj, color, opacity, bg, h_strip, w,
                                    kmax=cfg.kmax, kmax_pack=kmax_pack,
                                    class_spec=class_spec,
                                    return_aux=True)
            num_overflow = raux["num_overflow"]
            max_slots = raux["max_slots"]
        else:
            strip, _ = rasterize_dense(aos_of(sproj), color, opacity, bg,
                                       h_strip, w, tile_size=32)
        image = jax.lax.all_gather(strip, "gauss", axis=1, tiled=True)
        image = image * mask[None]

        ll1 = jnp.sum(jnp.abs(image - gt)) / npix
        ssim_l = 1.0 - masked_ssim(image, gt, mask)
        m = sel.astype(jnp.float32)
        sreg = (jnp.sum(jnp.prod(scaling, axis=1) * m)
                / jnp.maximum(m.sum(), 1.0))
        per_view = (1.0 - lam) * ll1 + lam * ssim_l + 0.01 * sreg

        # consistency across views (each device computes the full pair sum
        # from the gathered stack; divide so the psum counts it once)
        imgs = jax.lax.all_gather(image, "view", axis=0)  # [V,3,H,W]
        gts = jax.lax.all_gather(gt, "view", axis=0)
        con = 0.0
        for i in range(n_view):
            for j in range(i + 1, n_view):
                pm = view_mask(i) & view_mask(j)
                pm3 = pm[None].astype(jnp.float32)
                pnpix = jnp.maximum(3.0 * pm.sum(), 1.0)
                gate = masked_ssim(gts[i], gts[j], pm)
                diff = jnp.sum(jnp.abs((gts[i] - gts[j])
                                       - (imgs[i] - imgs[j])) * pm3
                               ) / pnpix
                con = con + jnp.where(gate > 0.6, gate * jnp.abs(diff),
                                      0.0)

        local = (per_view / n_gauss
                 + consistency_on * 0.05 * con / (n_view * n_gauss)
                 + tv_loss(params["planes"], 1.0, activate_level) * tv_w
                 / (n_view * n_gauss))
        aux = {
            "ll1": ll1,
            "vis": vis,                          # [C_local]
            "neural_opacity": g["neural_opacity"],  # [C_local*K]
            "sel_local": g["mask"],              # [C_local*K]
            "radii": radius,                     # [C_glob*K] f32 (global)
            "num_overflow": num_overflow,
            "max_slots": max_slots,
        }
        return local, aux

    def step_fn(params, opt_state, active, contractor, stats, cam_stack,
                gts, key, consistency_on, tv_w, stats_on,
                view_geom=None):
        if view_geom is None:
            # equal-resolution batch: every view's true window is the
            # full canvas
            view_geom = jnp.broadcast_to(
                jnp.asarray([cam_stack.image_height,
                             cam_stack.image_width,
                             cam_stack.tan_fovx, cam_stack.tan_fovy],
                            jnp.float32), (n_view, 4))

        def sharded_body(params, opt_state, active, contractor, stats,
                         cam, gt, key, view_geom, flags):
            cam = jax.tree.map(lambda x: x[0], cam)  # strip view block dim
            gt = gt[0]
            vidx = jax.lax.axis_index("view")
            gidx = jax.lax.axis_index("gauss")
            key = jax.random.fold_in(key, vidx)
            consistency_on, tv_w, stats_on = flags

            c_local = params["anchors"]["anchor"].shape[0]
            s_global = c_local * n_gauss * k
            proxy0 = jnp.zeros((s_global, 2), jnp.float32)

            def loss_fn(p, proxy):
                return device_loss(p, proxy, active, contractor, cam, gt,
                                   key, view_geom, (consistency_on, tv_w))

            (local, aux), (grads, proxy_grad) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, proxy0)
            loss = jax.lax.psum(local, ("view", "gauss"))
            # replicated param grads psum over both axes; anchor grads only
            # over view (the all_gather transpose already reduce-scattered
            # them over gauss)
            def reduce_grad(path, g):
                keys = [getattr(p, "key", None) for p in path]
                if "anchors" in keys:
                    return jax.lax.psum(g, "view")
                return jax.lax.psum(g, ("view", "gauss"))

            grads = jax.tree_util.tree_map_with_path(reduce_grad, grads)

            # ---- densification statistics (last view only, Q11) -------
            # full-view screen grad = psum of strip grads over gauss; each
            # device keeps its own anchor slice.  Gate to the last view
            # row, then psum over view to broadcast identical updates.
            proxy_grad = jax.lax.psum(proxy_grad, "gauss")
            local_slice = jax.lax.dynamic_slice_in_dim(
                proxy_grad, gidx * c_local * k, c_local * k, axis=0)
            radii_local = jax.lax.dynamic_slice_in_dim(
                aux["radii"], gidx * c_local * k, c_local * k, axis=0)
            is_last = (vidx == n_view - 1).astype(jnp.float32)
            gate = stats_on * is_last
            neur_op = jnp.maximum(aux["neural_opacity"], 0.0
                                  ).reshape(c_local, k)
            d_opa = gate * jnp.where(aux["vis"][:, None],
                                     neur_op.sum(axis=1, keepdims=True),
                                     0.0)
            d_dem = gate * jnp.where(aux["vis"][:, None], 1.0, 0.0)
            slot_mask = aux["sel_local"] & (radii_local > 0)
            # NDC-unit screen grads (reference stat units; see
            # train/step.py): scale pixel-space proxy grads by this
            # view's true (0.5W, 0.5H) before the norm
            vg = view_geom[vidx]
            gsc = jnp.stack([0.5 * vg[1], 0.5 * vg[0]])
            gnorm = jnp.linalg.norm(local_slice * gsc[None, :], axis=-1,
                                    keepdims=True)
            d_oga = gate * jnp.where(slot_mask[:, None], gnorm, 0.0)
            d_od = gate * jnp.where(slot_mask[:, None], 1.0, 0.0)
            new_stats = TrainStats(
                opacity_accum=stats.opacity_accum
                + jax.lax.psum(d_opa, "view"),
                anchor_demon=stats.anchor_demon
                + jax.lax.psum(d_dem, "view"),
                offset_gradient_accum=stats.offset_gradient_accum
                + jax.lax.psum(d_oga, "view"),
                offset_denom=stats.offset_denom
                + jax.lax.psum(d_od, "view"),
            )

            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = jax.tree.map(lambda p, u: p + u, params, updates)
            metrics = {
                "loss": loss,
                "l1": jax.lax.pmean(aux["ll1"], ("view", "gauss")),
                "num_overflow": jax.lax.psum(
                    aux["num_overflow"], ("view", "gauss")),
                "max_slots": jax.lax.pmax(
                    aux["max_slots"], ("view", "gauss")),
            }
            return new_params, new_opt, new_stats, metrics

        pspec = jax.tree_util.tree_map_with_path(param_spec, params)
        ospec = jax.tree_util.tree_map_with_path(opt_spec, opt_state)
        sspec = jax.tree.map(lambda _: anchors_spec, stats)
        cam_spec = jax.tree.map(lambda _: P("view"), cam_stack)
        body = shard_map(
            sharded_body, mesh=mesh,
            # check_vma=False: pallas_call out_shapes carry no vma
            # annotation, and replication of the psummed outputs is
            # guaranteed by construction (every output ends in a psum/pmean
            # over the axes its spec omits)
            check_vma=False,
            in_specs=(pspec, ospec, anchors_spec, jax.tree.map(
                lambda _: rep, contractor), sspec, cam_spec, P("view"),
                rep, rep, rep),
            out_specs=(pspec, ospec, sspec,
                       jax.tree.map(lambda _: rep, {
                           "loss": 0, "l1": 0, "num_overflow": 0,
                           "max_slots": 0})))
        return body(params, opt_state, active, contractor, stats,
                    cam_stack, gts, key, view_geom,
                    (consistency_on, tv_w, stats_on))

    return jax.jit(step_fn)
