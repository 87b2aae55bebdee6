"""End-to-end model smoke test: init -> prefilter -> decode -> render."""
import jax
import jax.numpy as jnp
import numpy as np

from splatco_tpu.config import ModelConfig
from splatco_tpu.data.cameras import look_at_camera
from splatco_tpu.models.renderer import prefilter_voxel, render
from splatco_tpu.models.splatco import decode_kwargs, init_model


def small_cfg():
    return ModelConfig(feat_dim=16, n_offsets=4, voxel_size=0.05,
                       plane_size=64, num_channels=9, appearance_dim=0,
                       contractor=True,
                       scene_center=[0.0, 0.0, 0.0],
                       scene_length=[2.0, 2.0, 2.0])


def build(seed=0, n_pts=500):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n_pts, 3)).astype(np.float32) * 0.5
    cfg = small_cfg()
    params, state = init_model(jax.random.key(0), cfg, pts)
    cam = look_at_camera([0, 0, -3.0], [0, 0, 0], [0, -1, 0],
                         1.0, 0.7, 64, 48)
    return cfg, params, state, cam


def test_init_shapes():
    cfg, params, state, cam = build()
    a = params["anchors"]
    c = a["anchor"].shape[0]
    assert c % 256 == 0
    assert a["offsets"].shape == (c, 4, 3)
    assert a["scaling"].shape == (c, 6)
    assert int(state.active.sum()) > 0
    # ctx head dims follow feat_dim/n_offsets: 16+3+12+6 = 37
    assert params["planes"]["ctx_heads"][0]["lin"]["w"].shape[0] == 37


def test_prefilter_and_render_dense():
    cfg, params, state, cam = build()
    vis = prefilter_voxel(params["anchors"], state.active, cam)
    assert int(vis.sum()) > 0
    bg = jnp.zeros(3)
    out = render(params, state.active, state.contractor, cam, bg,
                 visible_mask=vis, activate_level=0, is_training=True,
                 key=jax.random.key(1), backend="dense",
                 **decode_kwargs(cfg))
    img = np.asarray(out.image)
    assert img.shape == (3, 48, 64)
    assert np.all(np.isfinite(img))
    # some gaussians must have been selected
    assert int(np.asarray(out.selection_mask).sum()) > 0


def test_render_grads_flow():
    cfg, params, state, cam = build(n_pts=200)
    vis = prefilter_voxel(params["anchors"], state.active, cam)
    bg = jnp.zeros(3)
    target = jnp.ones((3, 48, 64)) * 0.5

    def loss_fn(params):
        out = render(params, state.active, state.contractor, cam, bg,
                     visible_mask=vis, activate_level=1, is_training=True,
                     key=jax.random.key(2), backend="dense",
                     **decode_kwargs(cfg))
        return jnp.abs(out.image - target).mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # gradients reach every subsystem
    for path in [("anchors", "anchor"), ("anchors", "feat"),
                 ("anchors", "offsets"), ("anchors", "scaling")]:
        g = grads[path[0]][path[1]]
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0, path
    g_planes = grads["planes"]["grids"][0]["xy"]
    assert float(jnp.abs(g_planes).sum()) > 0
    g_dec = grads["decoders"]["color"][0]["w"]
    assert float(jnp.abs(g_dec).sum()) > 0
    # level-1 heads are ZERO-initialized (transient-free activation), so
    # at switch-on the level-1 PLANE grads are exactly zero and the
    # gradient flows into the head weights instead — the level grows in
    g_p1 = grads["planes"]["grids"][1]["xy"]
    assert float(jnp.abs(g_p1).sum()) == 0.0
    g_h1 = grads["planes"]["heads"][1]["lin"]["w"]
    assert float(jnp.abs(g_h1).sum()) > 0
    # once the head weights are non-zero, plane grads flow
    params2 = jax.tree.map(lambda x: x, params)
    params2["planes"]["heads"][1]["lin"]["w"] = (
        params2["planes"]["heads"][1]["lin"]["w"] + 0.05)
    grads2 = jax.grad(lambda p: loss_fn(p))(params2)
    assert float(jnp.abs(grads2["planes"]["grids"][1]["xy"]).sum()) > 0


def test_render_spatial_ctx_path():
    """Paper-faithful Q5 path: per-level context grids feed the ctx heads."""
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(300, 3)).astype(np.float32) * 0.5
    cfg = small_cfg()
    cfg.use_spatial_ctx = True
    params, state = init_model(jax.random.key(0), cfg, pts)
    # ctx head input dim must be 4*feat_dim (3D + xy + xz + yz interps)
    assert params["planes"]["ctx_heads"][0]["lin"]["w"].shape[0] == 64
    cam = look_at_camera([0, 0, -3.0], [0, 0, 0], [0, -1, 0],
                         1.0, 0.7, 64, 48)
    vis = prefilter_voxel(params["anchors"], state.active, cam)
    out = render(params, state.active, state.contractor, cam,
                 jnp.zeros(3), visible_mask=vis, activate_level=1,
                 is_training=True, key=jax.random.key(1), backend="dense",
                 **decode_kwargs(cfg))
    img = np.asarray(out.image)
    assert img.shape == (3, 48, 64)
    assert np.all(np.isfinite(img))


def test_render_matches_golden_image():
    """Golden-image regression: the full decode->project->bin->blend
    pipeline on a fixed tiny scene must reproduce the committed render
    (tests/golden/render_golden.npz, generated by tools/gen_goldens.py).
    Catches unintended semantic drift anywhere in the render stack."""
    import os

    path = os.path.join(os.path.dirname(__file__), "golden",
                        "render_golden.npz")
    g = np.load(path)
    cfg = small_cfg()
    params, state = init_model(jax.random.key(0), cfg, g["points"])
    cam = look_at_camera([0, 0, -3.0], [0, 0, 0], [0, -1, 0],
                         1.0, 0.75, 64, 48)
    vis = prefilter_voxel(params["anchors"], state.active, cam)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    out = render(params, state.active, state.contractor, cam, bg,
                 visible_mask=vis, activate_level=0, is_training=False,
                 backend="pallas", **decode_kwargs(cfg))
    np.testing.assert_allclose(np.asarray(out.image), g["image"],
                               atol=3e-5)


def test_precomputed_plane_feats_bit_identical():
    """The mv-view hoist (sample planes once, share across views) must match
    inline sampling to float-fusion tolerance — same math on the same
    values, including the per-view quantization-noise key schedule."""
    from splatco_tpu.models.renderer import (generate_neural_gaussians,
                                             precompute_plane_feats)

    cfg, params, state, cam = build()
    dkw = decode_kwargs(cfg)
    key = jax.random.key(3)
    pf = precompute_plane_feats(params, state.contractor, 0,
                                compat_raw_domain=cfg.compat_raw_domain)
    a = generate_neural_gaussians(
        params, state.active, state.contractor, cam, state.active,
        activate_level=0, q_noise=0.03, key=key, **dkw)
    b = generate_neural_gaussians(
        params, state.active, state.contractor, cam, state.active,
        activate_level=0, q_noise=0.03, key=key, plane_feats=pf, **dkw)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_level_activation_is_noop_at_switch_on():
    """Zero-initialized fusion heads for levels >= 1: raising
    activate_level must leave geo_fea (and the rendered image) EXACTLY
    unchanged at the switch-on step — the transient-free redesign of the
    reference's activate_plane_level
    (/root/reference/scene/gaussian_model.py:562-568)."""
    from splatco_tpu.models.triplane import feature_planes_forward

    cfg, params, state, cam = build()
    rng = np.random.default_rng(1)
    n = 64
    xyz = jnp.asarray(rng.uniform(-1.5, 1.5, size=(n, 3)), jnp.float32)
    ctx_dim = params["planes"]["ctx_heads"][0]["lin"]["w"].shape[0]
    g_fea = jnp.asarray(rng.normal(size=(n, ctx_dim)), jnp.float32)
    mask = jnp.ones((n,), bool)
    outs = [feature_planes_forward(params["planes"], xyz, g_fea, mask,
                                   key=None, q=0.0, activate_level=lvl)
            for lvl in range(3)]
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[2]))
    # gradients still flow INTO the new level's head weights (it can
    # grow in), even though its output starts at zero
    def head_lin(planes):
        out = feature_planes_forward(planes, xyz, g_fea, mask, key=None,
                                     q=0.0, activate_level=1)
        return jnp.sum(out)

    g = jax.grad(head_lin)(params["planes"])
    assert float(jnp.abs(g["heads"][1]["lin"]["w"]).max()) > 0.0
    assert float(jnp.abs(g["ctx_heads"][1]["lin"]["b"]).max()) > 0.0
