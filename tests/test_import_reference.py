"""Reference-checkpoint import (train/import_reference.py).

Two layers of evidence:
  1. semantics parity — the actual reference torch PlaneGrid (+TPA)
     forward (/root/reference/scene/grids.py, run on CPU via importlib +
     cuda-shim) against our sampling with imported params;
  2. round trip — a full model written in the reference artifact format
     (point_cloud.ply + checkpoints.pth + chkpnt{it}.pth) loads back into
     an identical param pytree and renders identically.
"""
import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _load_ref_grids():
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    spec = importlib.util.spec_from_file_location(
        "ref_grids", "/root/reference/scene/grids.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_planegrid_ta_parity_with_reference():
    """Imported plane + TPA params reproduce the reference PlaneGrid
    forward (TAflag level) to float tolerance — pins every axis/transpose
    convention in the importer."""
    ref = _load_ref_grids()
    torch.manual_seed(0)
    pg = ref.PlaneGrid(9, [16, 16, 16], [-2, -2, -2], [2, 2, 2],
                       config={"factor": 1}, TAflag=True)
    pg.eval()

    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, size=(64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = pg(torch.from_numpy(x), Q=0).numpy()  # [N, 18]

    sd = {f"_feat.k0s.0.{k}": v for k, v in pg.state_dict().items()}
    # complete the FeaturePlanes template with dummy level-1/2 grids/heads
    from splatco_tpu.models.triplane import (apply_tpa, init_feature_planes,
                                             _sample_plane,
                                             sample_plane_grid)
    from splatco_tpu.train.import_reference import import_feat_planes

    template = init_feature_planes(jax.random.key(0), plane_size=64,
                                   num_channels=9)
    for i in (1, 2):
        for pl in ("xy", "xz", "yz"):
            size = template["grids"][i][pl].shape[-1]
            sd[f"_feat.k0s.{i}.{pl}_plane"] = torch.randn(1, 3, size, size)
    # heads are not under test here: fill them from the template by
    # synthesizing torch-layout tensors
    for i in range(3):
        h = template["heads"][i]
        c = template["ctx_heads"][i]
        sd[f"_feat.models.{i}.0.weight"] = torch.from_numpy(
            np.asarray(h["bn"]["scale"]))
        sd[f"_feat.models.{i}.0.bias"] = torch.from_numpy(
            np.asarray(h["bn"]["bias"]))
        sd[f"_feat.models.{i}.1.weight"] = torch.from_numpy(
            np.asarray(h["lin"]["w"]).T)
        sd[f"_feat.models.{i}.1.bias"] = torch.from_numpy(
            np.asarray(h["lin"]["b"]))
        sd[f"_feat.CTX_models.{i}.0.weight"] = torch.from_numpy(
            np.asarray(c["bn"]["scale"]))
        sd[f"_feat.CTX_models.{i}.0.bias"] = torch.from_numpy(
            np.asarray(c["bn"]["bias"]))
        sd[f"_feat.CTX_models.{i}.1.weight"] = torch.from_numpy(
            np.asarray(c["lin"]["w"]).T)
        sd[f"_feat.CTX_models.{i}.1.bias"] = torch.from_numpy(
            np.asarray(c["lin"]["b"]))
    # level-0 grid must match the reference module's size (16)
    for pl in ("xy", "xz", "yz"):
        template["grids"][0][pl] = jnp.zeros((3, 16, 16))
    planes = import_feat_planes(sd, template)

    # replicate the level-0 feature assembly of feature_planes_forward
    xj = jnp.asarray(x)
    feats = sample_plane_grid(planes["grids"][0], xj)
    g0 = planes["grids"][0]
    stacked = jnp.concatenate([g0["xy"], g0["xz"], g0["yz"]], axis=0)
    att = apply_tpa(planes["tpa"], stacked)
    r = g0["xy"].shape[0]
    ind = xj / 2.0
    fx, fy, fz = ind[:, 0], ind[:, 1], ind[:, 2]
    ta = [_sample_plane(att[:r], fx, fy),
          _sample_plane(att[r:2 * r], fx, fz),
          _sample_plane(att[2 * r:], fy, fz)]
    ours = np.asarray(jnp.concatenate(
        [feats[0], ta[0], feats[1], ta[1], feats[2], ta[2]], axis=-1))
    np.testing.assert_allclose(ours, ref_out, atol=2e-5, rtol=1e-4)


def _export_reference_format(tmp, params, active, it, bounds):
    """Write params in the reference's artifact layout (the inverse of the
    importer, hand-derived independently in torch conventions)."""
    from splatco_tpu.train.checkpoint import save_anchor_ply

    pc_dir = os.path.join(tmp, "point_cloud", f"iteration_{it}")
    os.makedirs(pc_dir, exist_ok=True)
    save_anchor_ply(os.path.join(pc_dir, "point_cloud.ply"),
                    params["anchors"], active)

    def t(a):
        return torch.from_numpy(np.asarray(a, np.float32))

    def seq_sd(layers):
        return {"0.weight": t(layers[0]["w"]).T, "0.bias": t(layers[0]["b"]),
                "2.weight": t(layers[1]["w"]).T, "2.bias": t(layers[1]["b"])}

    ck = {"opacity_mlp": seq_sd(params["decoders"]["opacity"]),
          "cov_mlp": seq_sd(params["decoders"]["cov"]),
          "color_mlp": seq_sd(params["decoders"]["color"])}
    if "appearance" in params["decoders"]:
        ck["appearance"] = {
            "embedding.weight": t(params["decoders"]["appearance"]["table"])}
    torch.save(ck, os.path.join(pc_dir, "checkpoints.pth"))

    fp = {}
    for i, g in enumerate(params["planes"]["grids"]):
        for pl in ("xy", "xz", "yz"):
            fp[f"_feat.k0s.{i}.{pl}_plane"] = t(g[pl])[None]
    # the dead 4th PlaneGrid the reference always carries
    for pl in ("xy", "xz", "yz"):
        fp[f"_feat.k0s.3.{pl}_plane"] = torch.randn(1, 3, 8, 8)
    tpa = params["planes"]["tpa"]
    fp["_feat.k0s.0.TA.ca.sharedMLP.0.weight"] = \
        t(tpa["ca_w1"]).T[:, :, None, None]
    fp["_feat.k0s.0.TA.ca.sharedMLP.2.weight"] = \
        t(tpa["ca_w2"]).T[:, :, None, None]
    fp["_feat.k0s.0.TA.sa.conv.weight"] = \
        t(tpa["sa_w"]).permute(3, 2, 0, 1)
    for name, heads in (("models", params["planes"]["heads"]),
                        ("CTX_models", params["planes"]["ctx_heads"])):
        for i, h in enumerate(heads):
            fp[f"_feat.{name}.{i}.0.weight"] = t(h["bn"]["scale"])
            fp[f"_feat.{name}.{i}.0.bias"] = t(h["bn"]["bias"])
            fp[f"_feat.{name}.{i}.0.running_mean"] = torch.zeros(
                h["bn"]["scale"].shape[0])
            fp[f"_feat.{name}.{i}.0.running_var"] = torch.ones(
                h["bn"]["scale"].shape[0])
            fp[f"_feat.{name}.{i}.1.weight"] = t(h["lin"]["w"]).T
            fp[f"_feat.{name}.{i}.1.bias"] = t(h["lin"]["b"])
    ct = {"xyz_min": t(bounds[0]), "xyz_max": t(bounds[1])}
    torch.save((fp, ct), os.path.join(tmp, f"chkpnt{it}.pth"))


def test_reference_roundtrip_renders_identically(tmp_path):
    from splatco_tpu.config import ModelConfig
    from splatco_tpu.data.cameras import look_at_camera
    from splatco_tpu.models.renderer import prefilter_voxel, render
    from splatco_tpu.models.splatco import decode_kwargs, init_model
    from splatco_tpu.train.import_reference import load_reference_model

    cfg = ModelConfig(feat_dim=8, n_offsets=4, voxel_size=0.05,
                      plane_size=32, num_channels=9, appearance_dim=4,
                      contractor=True, scene_center=[0, 0, 0],
                      scene_length=[4, 4, 4])
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    params, state = init_model(jax.random.key(3), cfg, pts, num_cameras=4)

    it = 30000
    _export_reference_format(
        str(tmp_path), params, np.asarray(state.active), it,
        (np.asarray(state.contractor.xyz_min),
         np.asarray(state.contractor.xyz_max)))

    params2, active2, bounds = load_reference_model(
        str(tmp_path), it, params,
        capacity=params["anchors"]["anchor"].shape[0])

    flat1 = dict(jax.tree_util.tree_leaves_with_path(
        {"decoders": params["decoders"], "planes": params["planes"]}))
    flat2 = dict(jax.tree_util.tree_leaves_with_path(
        {"decoders": params2["decoders"], "planes": params2["planes"]}))
    assert flat1.keys() == flat2.keys()
    for k in flat1:
        np.testing.assert_allclose(np.asarray(flat1[k]),
                                   np.asarray(flat2[k]), atol=1e-6,
                                   err_msg=str(k))
    np.testing.assert_allclose(bounds[0],
                               np.asarray(state.contractor.xyz_min))

    # anchors survive the PLY round trip for the active rows
    n = int(np.asarray(state.active).sum())
    np.testing.assert_allclose(
        np.asarray(params2["anchors"]["anchor"])[:n],
        np.asarray(params["anchors"]["anchor"])[:n], atol=1e-6)

    # and the rendered image is identical
    cam = look_at_camera([0, 0, -3.0], [0, 0, 0], [0, -1, 0],
                         1.0, 0.75, 64, 48, uid=1)
    bg = jnp.zeros(3, jnp.float32)
    dkw = decode_kwargs(cfg)
    vis = prefilter_voxel(params["anchors"], state.active, cam)
    img_a = render(params, state.active, state.contractor, cam, bg,
                   visible_mask=vis, activate_level=2, is_training=False,
                   backend="dense", **dkw).image
    vis2 = prefilter_voxel(params2["anchors"], active2, cam)
    img_b = render(params2, active2, state.contractor, cam, bg,
                   visible_mask=vis2, activate_level=2, is_training=False,
                   backend="dense", **dkw).image
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                               atol=1e-5)
