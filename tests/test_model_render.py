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
    # level-1 plane grads exist too (activate_level=1)
    g_p1 = grads["planes"]["grids"][1]["xy"]
    assert float(jnp.abs(g_p1).sum()) > 0


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
