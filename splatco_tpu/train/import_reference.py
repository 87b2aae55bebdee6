"""Import a reference-trained SplatCo model (torch checkpoints) into the
JAX param pytree, so models trained with the original CUDA pipeline render
through this framework.

Reference artifact families (SURVEY §5 checkpoint/resume):
  * anchor PLY  — point_cloud/iteration_{it}/point_cloud.ply
    (save_ply, /root/reference/scene/gaussian_model.py:653-670) —
    already handled by train/checkpoint.py:load_anchor_ply;
  * decoder MLPs — point_cloud/iteration_{it}/checkpoints.pth, a dict of
    torch Sequential state dicts ('unite' mode,
    /root/reference/scene/gaussian_model.py:1046-1068);
  * tri-plane + contractor — chkpnt{it}.pth =
    (feat_planes.state_dict(), contractor.state_dict())
    (capture(), /root/reference/scene/gaussian_model.py:368-372, loaded at
    scene/__init__.py:80-94).

torch (cpu) is used ONLY to unpickle — same policy as
eval/raft.py:load_raft_weights; all compute stays JAX.

Layout conversions:
  * torch nn.Linear weight [out, in]  -> ours "w" [in, out] (transpose);
  * BatchNorm1d weight/bias -> scale/bias (running stats are IGNORED:
    the reference's fusion BN runs in train mode even at eval, SURVEY
    Q16, and masked_batchnorm reproduces exactly that);
  * PlaneGrid xy/xz/yz planes [1, R, H, W] -> [R, H, W] (same axis
    semantics: H=first coord, W=second, align_corners=True);
  * TriPlaneAttention convs: 1x1 channel convs [h, C, 1, 1] -> [C, h]
    matmuls, 7x7 spatial conv [1, 2, 7, 7] (OIHW) -> HWIO [7, 7, 2, 1];
  * k0s has num_levels+1 entries (level 0 appended twice, the
    duplicate-level-0 quirk) — k0s.{0..2} map onto grids[0..2], k0s.3 is
    dead (never reached by forward, gaussian_model.py:154-156).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _load_torch(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t, np.float32)


def _lin(sd: Dict[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    return {"w": jnp.asarray(_np(sd[prefix + "weight"]).T),
            "b": jnp.asarray(_np(sd[prefix + "bias"]))}


def _bn(sd: Dict[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    return {"scale": jnp.asarray(_np(sd[prefix + "weight"])),
            "bias": jnp.asarray(_np(sd[prefix + "bias"]))}


def import_decoders(ckpt: Dict[str, Any],
                    template: Dict[str, Any]) -> Dict[str, Any]:
    """checkpoints.pth ('unite') -> decoders pytree.  Sequential indices:
    Linear at 0 and 2 (ReLU/activations carry no params)."""
    out: Dict[str, Any] = {}
    name_map = {"opacity": "opacity_mlp", "cov": "cov_mlp",
                "color": "color_mlp", "feature_bank": "feature_bank_mlp"}
    for ours, theirs in name_map.items():
        if ours not in template:
            continue
        if theirs not in ckpt:
            raise KeyError(
                f"reference checkpoints.pth lacks '{theirs}' but the model "
                f"config requires it (keys: {sorted(ckpt)})")
        sd = ckpt[theirs]
        out[ours] = [_lin(sd, "0."), _lin(sd, "2.")]
        for layer, got, want in zip(out[ours], out[ours],
                                    template[ours]):
            assert got["w"].shape == want["w"].shape, (
                f"{ours}: reference weight {got['w'].shape} vs model "
                f"{want['w'].shape} — feat_dim/n_offsets mismatch?")
    if "appearance" in template:
        sd = ckpt["appearance"]
        out["appearance"] = {
            "table": jnp.asarray(_np(sd["embedding.weight"]))}
    return out


def import_feat_planes(fp_state: Dict[str, Any],
                       template: Dict[str, Any]) -> Dict[str, Any]:
    """feat_planes.state_dict() (GaussianLearner -> '_feat.' prefix) ->
    planes pytree {grids, heads, ctx_heads, tpa}."""
    p = "_feat."
    num_levels = len(template["grids"])
    grids, heads, ctx_heads = [], [], []
    for i in range(num_levels):
        g = {}
        for plane in ("xy", "xz", "yz"):
            arr = _np(fp_state[f"{p}k0s.{i}.{plane}_plane"])[0]  # drop N=1
            want = template["grids"][i][plane].shape
            assert arr.shape == want, (
                f"k0s.{i}.{plane}_plane {arr.shape} vs model {want} — "
                "plane_size/num_channels or duplicate-level0 quirk "
                "mismatch?")
            g[plane] = jnp.asarray(arr)
        grids.append(g)
        heads.append({"bn": _bn(fp_state, f"{p}models.{i}.0."),
                      "lin": _lin(fp_state, f"{p}models.{i}.1.")})
        ctx_heads.append({"bn": _bn(fp_state, f"{p}CTX_models.{i}.0."),
                          "lin": _lin(fp_state, f"{p}CTX_models.{i}.1.")})
    tpa = {
        "ca_w1": jnp.asarray(
            _np(fp_state[f"{p}k0s.0.TA.ca.sharedMLP.0.weight"])[:, :, 0, 0].T),
        "ca_w2": jnp.asarray(
            _np(fp_state[f"{p}k0s.0.TA.ca.sharedMLP.2.weight"])[:, :, 0, 0].T),
        "sa_w": jnp.asarray(
            _np(fp_state[f"{p}k0s.0.TA.sa.conv.weight"]
                ).transpose(2, 3, 1, 0)),
    }
    return {"grids": grids, "heads": heads, "ctx_heads": ctx_heads,
            "tpa": tpa}


def import_contractor(ct_state: Dict[str, Any]
                      ) -> Tuple[np.ndarray, np.ndarray]:
    return (_np(ct_state["xyz_min"]), _np(ct_state["xyz_max"]))


def load_reference_model(model_path: str, iteration: int,
                         params_template: Dict[str, Any],
                         capacity: int = 0,
                         ) -> Tuple[Dict[str, Any], jnp.ndarray,
                                    Optional[Tuple[np.ndarray, np.ndarray]]]:
    """Load a reference-format model directory into (params, active,
    contractor_bounds).  Mirrors the reference load path
    (scene/__init__.py:80-94): anchor PLY + checkpoints.pth +
    chkpnt{it}.pth.  contractor_bounds is None when no chkpnt file exists
    (pure-PLY export)."""
    from splatco_tpu.train.checkpoint import load_anchor_ply

    pc_dir = os.path.join(model_path, "point_cloud",
                          f"iteration_{iteration}")
    anchors, active = load_anchor_ply(
        os.path.join(pc_dir, "point_cloud.ply"), capacity=capacity)
    decoders = import_decoders(
        _load_torch(os.path.join(pc_dir, "checkpoints.pth")),
        params_template["decoders"])
    bounds = None
    planes = params_template["planes"]
    chk = os.path.join(model_path, f"chkpnt{iteration}.pth")
    if os.path.exists(chk):
        fp_state, ct_state = _load_torch(chk)
        planes = import_feat_planes(fp_state, planes)
        bounds = import_contractor(ct_state)
    params = {"anchors": {k: jnp.asarray(v) for k, v in anchors.items()},
              "decoders": decoders, "planes": planes}
    return params, jnp.asarray(active), bounds
