"""Densification / pruning under jit with fixed-capacity anchors.

Reference: training_statis / anchor_growing / adjust_anchor / prune_anchor
(/root/reference/scene/gaussian_model.py:761-997) — torch code that
concatenates fresh rows onto every tensor and performs optimizer-state
surgery.  The TPU redesign keeps every array at static capacity C and
maintains the invariant "active rows are contiguous in [0, A)":

  * GROW (per depth level): candidate gaussians (grad-threshold +
    stochastic keep) are voxel-quantized; a single (hash, tag) sort against
    the existing anchors' voxel keys performs duplicate-removal AND
    occupied-cell rejection in one shot (first-of-run candidates win); a
    second sort compacts winners to the front; rows are inserted with the
    extend-then-slice trick (concat zeros, dynamic_update_slice at the
    active-count boundary A, slice back to C) — overflow silently drops the
    newest rows, the analogue of running out of GPU memory, reported via
    the returned counters,
  * PRUNE: mask flip + base-scale clamp (log-scale cols 3:5 <= 0.05, Q14),
  * COMPACT: one argsort over ~active + a single concatenated row-gather
    restores contiguity for params, Adam moments and statistics together.

Deviations from the reference (documented):
  * voxel identity uses a 2x32-bit spatial hash instead of exact
    unique(dim=0) — collisions are ~2^-50 per pair,
  * the representative feature for a new anchor follows the reference's
    elementwise scatter_max over the cell's candidates
    (/root/reference/scene/gaussian_model.py:897) computed as a segmented
    max-scan over the sorted runs (dedup_mode="max", default; no scatter
    needed — cell-mates are contiguous after the hash sort);
    dedup_mode="first" keeps the cheaper first-candidate representative,
  * the curvature mask is aligned anchor-major (the reference's
    torch.cat([mask]*k, dim=0) mis-tiles it — SURVEY, adjust_anchor :945).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from splatco_tpu.config import OptimizationConfig
from splatco_tpu.train.step import TrainStats
from splatco_tpu.utils.math import inverse_sigmoid

HASH_A = (73856093, 19349663, 83492791)
HASH_B = (2654435761, 805459861, 3674653429)


class DensifyResult(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    active: jax.Array
    stats: TrainStats
    num_active: jax.Array
    num_grown: jax.Array
    num_pruned: jax.Array
    num_dropped: jax.Array  # grown candidates dropped for lack of capacity


def _hash_coords(coords, consts):
    h = jnp.zeros(coords.shape[:-1], jnp.int32)
    for d, c in enumerate(consts):
        h = h ^ (coords[..., d] * jnp.int32(c & 0x7FFFFFFF))
    return h


def _flatten_rows(params, mu, nu, stats, active, k):
    """Concatenate all per-anchor row data into one [C, D] matrix for the
    compaction gather."""
    c = params["anchors"]["anchor"].shape[0]
    cols = []

    def add(a):
        cols.append(a.reshape(c, -1).astype(jnp.float32))

    order = ("anchor", "feat", "offsets", "scaling", "rotation", "opacity")
    for name in order:
        add(params["anchors"][name])
        add(mu[name])
        add(nu[name])
    add(stats.opacity_accum)
    add(stats.anchor_demon)
    add(stats.offset_gradient_accum.reshape(c, k))
    add(stats.offset_denom.reshape(c, k))
    add(active[:, None].astype(jnp.float32))
    return jnp.concatenate(cols, axis=1)


def _unflatten_rows(mat, params, mu, nu, stats, k):
    c = mat.shape[0]
    pos = [0]

    def take(like):
        d = int(np.prod(like.shape[1:])) if like.ndim > 1 else 1
        out = mat[:, pos[0]:pos[0] + d].reshape(like.shape)
        pos[0] += d
        return out.astype(like.dtype)

    anchors = {}
    new_mu = dict(mu)
    new_nu = dict(nu)
    order = ("anchor", "feat", "offsets", "scaling", "rotation", "opacity")
    for name in order:
        anchors[name] = take(params["anchors"][name])
        new_mu[name] = take(mu[name])
        new_nu[name] = take(nu[name])
    oa = take(stats.opacity_accum)
    ad = take(stats.anchor_demon)
    oga = take(stats.offset_gradient_accum.reshape(c, k)).reshape(c * k, 1)
    od = take(stats.offset_denom.reshape(c, k)).reshape(c * k, 1)
    active = mat[:, pos[0]] > 0.5
    new_params = dict(params)
    new_params["anchors"] = anchors
    new_stats = TrainStats(opacity_accum=oa, anchor_demon=ad,
                           offset_gradient_accum=oga, offset_denom=od)
    return new_params, new_mu, new_nu, new_stats, active


def _segment_run_max(values: jax.Array, first_of_run: jax.Array
                     ) -> jax.Array:
    """Per-run elementwise max of `values` [S, D] over contiguous runs
    delimited by `first_of_run` [S] bool, written to EVERY row of the run
    (callers read it at first-of-run rows).  Implemented as a reversed
    segmented associative max-scan — O(S log S) elementwise work, no
    scatter (the sort-based doctrine of this module)."""
    seg = jnp.cumsum(first_of_run.astype(jnp.int32))

    def comb(a, b):
        va, sa = a
        vb, sb = b
        same = (sa == sb)
        return jnp.where(same[:, None], jnp.maximum(va, vb), vb), sb

    rev_v, _ = jax.lax.associative_scan(comb, (values[::-1], seg[::-1]))
    return rev_v[::-1]


def _extend_insert(arr, block, start):
    """Insert `block` rows at dynamic row `start`, dropping overflow."""
    b = block.shape[0]
    ext = jnp.concatenate([arr, jnp.zeros((b,) + arr.shape[1:], arr.dtype)],
                          axis=0)
    idx = (start,) + (0,) * (arr.ndim - 1)
    ext = jax.lax.dynamic_update_slice(ext, block.astype(arr.dtype), idx)
    return ext[: arr.shape[0]]


def _anchor_moments(opt_state) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array], Any]:
    """Extract the Adam mu/nu subtrees for the anchor params from an
    optax.multi_transform state (one inner state per group label)."""
    inner = opt_state.inner_states
    mu, nu = {}, {}
    label_of = {"anchor": "anchor", "offsets": "offset",
                "feat": "anchor_feat", "opacity": "opacity",
                "scaling": "scaling", "rotation": "rotation"}
    for field, label in label_of.items():
        adam = inner[label].inner_state[0]
        mu[field] = adam.mu["anchors"][field]
        nu[field] = adam.nu["anchors"][field]
    return mu, nu, label_of


def _write_anchor_moments(opt_state, mu, nu):
    inner = dict(opt_state.inner_states)
    label_of = {"anchor": "anchor", "offsets": "offset",
                "feat": "anchor_feat", "opacity": "opacity",
                "scaling": "scaling", "rotation": "rotation"}
    for field, label in label_of.items():
        st = inner[label]
        adam = st.inner_state[0]
        new_mu = jax.tree.map(lambda x: x, adam.mu)
        new_nu = jax.tree.map(lambda x: x, adam.nu)
        new_mu["anchors"][field] = mu[field]
        new_nu["anchors"][field] = nu[field]
        adam = adam._replace(mu=new_mu, nu=new_nu)
        inner[label] = st._replace(inner_state=(adam,) + st.inner_state[1:])
    return opt_state._replace(inner_states=inner)


@functools.partial(
    jax.jit,
    static_argnames=("update_depth", "update_init_factor",
                     "update_hierachy_factor", "check_interval", "grow_cap",
                     "dedup_mode"),
)
def adjust_anchor(
    params: Dict[str, Any],
    opt_state: Any,
    active: jax.Array,
    stats: TrainStats,
    key: jax.Array,
    voxel_size: float,
    grad_threshold: jax.Array,
    extra_offset_mask: jax.Array,     # [C*K] curvature contribution (or 0s)
    cvpm_prune: jax.Array,            # [C] CVPM mask (or zeros)
    *,
    check_interval: int = 100,
    success_threshold: float = 0.8,
    min_opacity: float = 0.005,
    update_depth: int = 3,
    update_init_factor: int = 16,
    update_hierachy_factor: int = 4,
    grow_cap: int = 0,
    dedup_mode: str = "max",
) -> DensifyResult:
    anchors = params["anchors"]
    c = anchors["anchor"].shape[0]
    k = anchors["offsets"].shape[1]
    ck = c * k
    if grow_cap <= 0:
        grow_cap = max(c // 4, 256)
    f32 = jnp.float32

    mu, nu, _ = _anchor_moments(opt_state)

    grads = stats.offset_gradient_accum / jnp.maximum(stats.offset_denom,
                                                      1e-12)
    grads = jnp.where(stats.offset_denom > 0, grads, 0.0)
    grads_norm = jnp.abs(grads[:, 0])
    offset_mask = (stats.offset_denom[:, 0]
                   > check_interval * success_threshold * 0.5)
    offset_mask = offset_mask | extra_offset_mask
    active_slots = jnp.repeat(active, k)
    offset_mask = offset_mask & active_slots

    num_grown = jnp.int32(0)
    num_dropped = jnp.int32(0)
    a_count = jnp.sum(active.astype(jnp.int32))

    for depth in range(update_depth):
        key, sub = jax.random.split(key)
        cur_thr = grad_threshold * ((update_hierachy_factor // 2) ** depth)
        cand = (grads_norm >= cur_thr) & offset_mask
        rand_keep = (jax.random.uniform(sub, (ck,))
                     > 0.5 ** (depth + 1))
        cand = cand & rand_keep

        size_factor = update_init_factor // (update_hierachy_factor ** depth)
        cur_size = voxel_size * size_factor

        anchor = params["anchors"]["anchor"]
        offs = params["anchors"]["offsets"]
        scal = jnp.exp(params["anchors"]["scaling"])[:, :3]
        all_xyz = (anchor[:, None, :] + offs * scal[:, None, :]
                   ).reshape(ck, 3)
        cand_coords = jnp.round(all_xyz / cur_size).astype(jnp.int32)
        exist_coords = jnp.round(anchor / cur_size).astype(jnp.int32)

        sent = jnp.int32(0x7FFFFFFF)
        h1 = jnp.concatenate([
            jnp.where(active, _hash_coords(exist_coords, HASH_A), sent),
            jnp.where(cand, _hash_coords(cand_coords, HASH_A), sent)])
        h2 = jnp.concatenate([
            jnp.where(active, _hash_coords(exist_coords, HASH_B), sent),
            jnp.where(cand, _hash_coords(cand_coords, HASH_B), sent)])
        tag = jnp.concatenate([jnp.zeros((c,), jnp.int32),
                               jnp.ones((ck,), jnp.int32)])
        pay_xyz = jnp.concatenate(
            [jnp.zeros((c, 3), f32),
             cand_coords.astype(f32) * cur_size], axis=0)
        feat_rep = jnp.repeat(params["anchors"]["feat"], k, axis=0)
        pay_feat = jnp.concatenate(
            [jnp.zeros((c, params["anchors"]["feat"].shape[1]), f32),
             feat_rep], axis=0)
        # sort keys + a row index, then gather the payload matrix in ONE
        # take.  Carrying every payload column through the variadic sort
        # (the binning-style pattern) is pathological here: XLA-TPU sort
        # compile cost grows superlinearly with operand count, and at
        # 3 keys + 35 columns x 6 sorts the remote compile wedges for
        # >20 min (observed on v5e).  This is a cold-path op — one gather
        # is fine (gathers are deterministic; the sort-based doctrine is
        # about scatters).
        s_total = c + ck
        ridx = jnp.arange(s_total, dtype=jnp.int32)
        sh1, sh2, stag, sidx = jax.lax.sort((h1, h2, tag, ridx),
                                            num_keys=3, is_stable=True)
        pay = jnp.concatenate([pay_xyz, pay_feat], axis=1)
        spay = jnp.take(pay, sidx, axis=0)
        first_of_run = jnp.concatenate(
            [jnp.ones((1,), bool),
             (sh1[1:] != sh1[:-1]) | (sh2[1:] != sh2[:-1])])
        is_new = first_of_run & (stag == 1) & (sh1 != sent)
        n_new = jnp.sum(is_new.astype(jnp.int32))

        if dedup_mode == "max":
            # faithful scatter_max representative (reference
            # gaussian_model.py:897): elementwise max of the candidate
            # features sharing a cell, read at the first-of-run row.
            # Accepted runs contain only candidates (a run starting with an
            # existing anchor is rejected by is_new), so the run max equals
            # the reference's per-cell scatter_max.
            maxed = _segment_run_max(spay[:, 3:], first_of_run)
            spay = jnp.concatenate([spay[:, :3], maxed], axis=1)

        # compact winners to the front: second (rank, index) sort + gather
        rank = jnp.where(is_new, 0, 1).astype(jnp.int32)
        _, cidx = jax.lax.sort((rank, jnp.arange(s_total, dtype=jnp.int32)),
                               num_keys=1, is_stable=True)
        comp = jnp.take(spay, cidx[:grow_cap], axis=0)
        new_xyz = comp[:, :3]
        new_feat = comp[:, 3:]

        take = jnp.minimum(jnp.minimum(n_new, grow_cap), c - a_count)
        rows = jnp.arange(grow_cap)
        valid_new = rows < take

        log_s = jnp.log(jnp.asarray(cur_size, f32))
        blocks = {
            "anchor": new_xyz,
            "feat": new_feat,
            "offsets": jnp.zeros((grow_cap, k, 3), f32),
            "scaling": jnp.full((grow_cap, 6), log_s, f32),
            "rotation": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], f32),
                                 (grow_cap, 1)),
            "opacity": jnp.full((grow_cap, 1),
                                inverse_sigmoid(jnp.asarray(0.1)), f32),
        }
        zero_mask = valid_new[:, None].astype(f32)
        new_anchors = {}
        for name, blk in blocks.items():
            m = zero_mask.reshape((grow_cap,) + (1,) * (blk.ndim - 1))
            cur = params["anchors"][name]
            new_anchors[name] = _extend_insert(cur, blk * m, a_count)
            mu[name] = _extend_insert(
                mu[name], jnp.zeros((grow_cap,) + mu[name].shape[1:]),
                a_count)
            nu[name] = _extend_insert(
                nu[name], jnp.zeros((grow_cap,) + nu[name].shape[1:]),
                a_count)
        params = dict(params)
        params["anchors"] = new_anchors
        active = _extend_insert(active[:, None].astype(f32),
                                valid_new[:, None].astype(f32),
                                a_count)[:, 0] > 0.5
        # stats for new rows start at zero
        stats = TrainStats(
            opacity_accum=_extend_insert(
                stats.opacity_accum, jnp.zeros((grow_cap, 1)), a_count),
            anchor_demon=_extend_insert(
                stats.anchor_demon, jnp.zeros((grow_cap, 1)), a_count),
            offset_gradient_accum=_extend_insert(
                stats.offset_gradient_accum.reshape(c, k),
                jnp.zeros((grow_cap, k)), a_count).reshape(ck, 1),
            offset_denom=_extend_insert(
                stats.offset_denom.reshape(c, k),
                jnp.zeros((grow_cap, k)), a_count).reshape(ck, 1),
        )
        a_count = a_count + take
        num_grown = num_grown + take
        num_dropped = num_dropped + (n_new - take)

    # reset stats for grown-from slots (reference :951-962)
    om = offset_mask[:, None]
    stats = dataclasses.replace(
        stats,
        offset_denom=jnp.where(om, 0.0, stats.offset_denom),
        offset_gradient_accum=jnp.where(om, 0.0,
                                        stats.offset_gradient_accum),
    )

    # ---- prune (reference :964-997 + CVPM mask) ----------------------
    demon = stats.anchor_demon[:, 0]
    prune = ((stats.opacity_accum[:, 0] < min_opacity * demon)
             & (demon > check_interval * success_threshold))
    prune = (prune | cvpm_prune) & active
    num_pruned = jnp.sum(prune.astype(jnp.int32))
    # reset opacity stats for well-observed anchors
    well = (demon > check_interval * success_threshold)[:, None]
    stats = dataclasses.replace(
        stats,
        opacity_accum=jnp.where(well, 0.0, stats.opacity_accum),
        anchor_demon=jnp.where(well, 0.0, stats.anchor_demon),
    )
    active = active & jnp.logical_not(prune)
    # clamp kept base log-scales at 0.05 (Q14)
    sc = params["anchors"]["scaling"]
    sc = sc.at[:, 3:].set(jnp.minimum(sc[:, 3:], 0.05))
    params["anchors"] = dict(params["anchors"], scaling=sc)

    # ---- compact to restore front-contiguity -------------------------
    mat = _flatten_rows(params, mu, nu, stats, active,
                        params["anchors"]["offsets"].shape[1])
    order = jnp.argsort(jnp.where(active, 0, 1), stable=True)
    mat = mat[order]
    params, mu, nu, stats, active = _unflatten_rows(
        mat, params, mu, nu, stats, params["anchors"]["offsets"].shape[1])
    opt_state = _write_anchor_moments(opt_state, mu, nu)

    return DensifyResult(
        params=params, opt_state=opt_state, active=active, stats=stats,
        num_active=jnp.sum(active.astype(jnp.int32)),
        num_grown=num_grown, num_pruned=num_pruned,
        num_dropped=num_dropped)


@jax.jit
def graph_downsample(params: Dict[str, Any], opt_state: Any,
                     active: jax.Array, stats: TrainStats, key: jax.Array,
                     rate: jax.Array):
    """Random anchor subsampling (working version of the reference's
    graph_downsampling, which calls nonexistent attrs — SURVEY Q2): keep
    ceil(rate * num_active) random active anchors, then compact."""
    c = active.shape[0]
    k = params["anchors"]["offsets"].shape[1]
    n_act = jnp.sum(active.astype(jnp.int32))
    keep_n = jnp.floor(n_act.astype(jnp.float32) * rate).astype(jnp.int32)
    scores = jnp.where(active, jax.random.uniform(key, (c,)), 2.0)
    rank = jnp.argsort(jnp.argsort(scores))  # rank of each row by score
    keep = active & (rank < keep_n)

    mu, nu, _ = _anchor_moments(opt_state)
    mat = _flatten_rows(params, mu, nu, stats, keep, k)
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    mat = mat[order]
    params, mu, nu, stats, active = _unflatten_rows(mat, params, mu, nu,
                                                    stats, k)
    opt_state = _write_anchor_moments(opt_state, mu, nu)
    return params, opt_state, active, stats, jnp.sum(
        active.astype(jnp.int32))
