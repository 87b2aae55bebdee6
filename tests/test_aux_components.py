"""Entropy models, context grids, FLIP, popping detection, downsampling."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from splatco_tpu.models.context_grid import (grid_create, grid_encode,
                                             spatial_ctx)
from splatco_tpu.ops.entropy import (factorized_bits, gaussian_bits,
                                     init_factorized, low_bound,
                                     universe_quant)
from splatco_tpu.ops.flip import ldr_flip


def test_gaussian_bits_properties():
    x = jnp.array([0.0, 1.0, 5.0])
    bits = gaussian_bits(x, 0.0, 1.0)
    # unlikely symbols cost more bits
    assert float(bits[2]) > float(bits[1]) > float(bits[0])
    g = jax.grad(lambda s: gaussian_bits(x, 0.0, s).sum())(1.0)
    assert np.isfinite(float(g))


def test_low_bound_gradient_gating():
    g_pos = jax.grad(lambda x: low_bound(x) * 1.0)(1e-8)
    assert float(g_pos) == 0.0          # below bound, positive cotangent
    g_ok = jax.grad(lambda x: low_bound(x) * 1.0)(1.0)
    assert float(g_ok) == 1.0


def test_universe_quant_ste():
    x = jnp.linspace(-2, 2, 32)
    y = universe_quant(jax.random.key(0), x)
    assert np.abs(np.asarray(y - x)).max() < 1.01
    g = jax.grad(lambda x: universe_quant(jax.random.key(0), x).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_factorized_bits_shapes():
    params = init_factorized(jax.random.key(0), channels=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 4)),
                    jnp.float32)
    bits = factorized_bits(params, x)
    assert bits.shape == (16, 4)
    assert np.all(np.asarray(bits) >= 0)


def test_grid_create_encode_roundtrip():
    # points exactly at cell centers recover their mean feature
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.05, 0.95, size=(64, 3)).astype(np.float32)
    feats = rng.normal(size=(64, 8)).astype(np.float32)
    table = grid_create(jnp.asarray(pts), jnp.asarray(feats), 16)
    out = grid_encode(jnp.asarray(pts), table, 16)
    assert out.shape == (64, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_grid_create_matches_numpy_weighted_mean():
    """grid_creater semantics: per-cell weighted mean outputs/(weights+1e-9)
    (reference utils/grid_utils.py:58-72), nearest-cell binning."""
    rng = np.random.default_rng(3)
    n, f, reso = 257, 5, 7
    pts = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, f)).astype(np.float32)
    mask = (rng.uniform(size=n) > 0.3).astype(np.float32)

    q = np.clip((pts * reso).astype(np.int64), 0, reso - 1)
    ids = (q[:, 0] * reso + q[:, 1]) * reso + q[:, 2]
    want = np.zeros((reso**3, f), np.float64)
    wsum = np.zeros((reso**3,), np.float64)
    for i in range(n):
        want[ids[i]] += feats[i] * mask[i]
        wsum[ids[i]] += mask[i]
    want = want / (wsum[:, None] + 1e-9)

    got = np.asarray(grid_create(jnp.asarray(pts), jnp.asarray(feats), reso,
                                 mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_grid_encode_matches_numpy_trilinear():
    """grid_encoder semantics: d-linear interpolation over the dense table
    (reference utils/grid_utils.py:114-150)."""
    rng = np.random.default_rng(4)
    n, f, reso = 64, 3, 9
    pts = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    table = rng.normal(size=(reso**3, f)).astype(np.float32)

    pos = np.clip(pts, 0, 1) * (reso - 1)
    p0 = np.floor(pos).astype(np.int64)
    fr = pos - p0
    want = np.zeros((n, f), np.float64)
    for corner in range(8):
        offs = [(corner >> a) & 1 for a in range(3)]
        q = np.stack([np.clip(p0[:, a] + offs[a], 0, reso - 1)
                      for a in range(3)], axis=-1)
        idx = (q[:, 0] * reso + q[:, 1]) * reso + q[:, 2]
        w = np.ones(n)
        for a in range(3):
            w = w * (fr[:, a] if offs[a] else 1.0 - fr[:, a])
        want += table[idx] * w[:, None]

    got = np.asarray(grid_encode(jnp.asarray(pts), jnp.asarray(table), reso))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_grid_encode_grad_matches_fd():
    """grad wrt the embedding table (the gridencoder backward contract)
    checked against finite differences."""
    rng = np.random.default_rng(5)
    reso = 4
    pts = jnp.asarray(rng.uniform(0.1, 0.9, size=(16, 2)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(reso**2, 2)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(16, 2)), jnp.float32)

    def loss(t):
        return jnp.sum(grid_encode(pts, t, reso) * cot)

    g = np.asarray(jax.grad(loss)(table))
    eps = 1e-3
    for (i, j) in [(0, 0), (3, 1), (7, 0), (10, 1)]:
        tp = table.at[i, j].add(eps)
        tm = table.at[i, j].add(-eps)
        fd = (float(loss(tp)) - float(loss(tm))) / (2 * eps)
        np.testing.assert_allclose(g[i, j], fd, rtol=1e-2, atol=1e-3)


def test_spatial_ctx_shape():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(128, 3)).astype(np.float32)
    feats = rng.normal(size=(128, 6)).astype(np.float32)
    lo = jnp.asarray(pts.min(0))
    hi = jnp.asarray(pts.max(0))
    ctx = spatial_ctx(jnp.asarray(pts), jnp.asarray(feats), lo, hi,
                      level=0)
    assert ctx.shape == (128, 24)  # 4 grids x 6 features


def test_flip_properties():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(3, 48, 64)), jnp.float32)
    same = float(ldr_flip(a, a))
    assert same < 1e-3
    small = float(ldr_flip(jnp.clip(a + 0.02, 0, 1), a))
    big = float(ldr_flip(jnp.clip(a + 0.4, 0, 1), a))
    assert 0 <= small < big <= 1.0


def test_popping_harness(tmp_path):
    from PIL import Image

    from splatco_tpu.eval.popping import validate_popping

    rng = np.random.default_rng(0)
    base = rng.uniform(0.2, 0.8, size=(32, 48, 3))
    d = tmp_path / "frames"
    d.mkdir()
    for t in range(4):
        frame = np.clip(np.roll(base, t, axis=1)
                        + rng.normal(size=base.shape) * 0.01, 0, 1)
        Image.fromarray((frame * 255).astype(np.uint8)).save(
            d / f"{t:03d}.png")
    res = validate_popping(str(d), steps=(1,),
                           out_json=str(tmp_path / "pop.json"),
                           plot_dir=str(tmp_path / "plots"))
    agg = res["step_1"]["aggregate"]
    assert np.isfinite(agg["mean_mse"]) and np.isfinite(agg["mean_flip"])
    assert (tmp_path / "pop.json").exists()
    assert (tmp_path / "plots" / "test_all_step_1.png").exists()


def test_graph_downsample():
    from splatco_tpu.config import ModelConfig, OptimizationConfig
    from splatco_tpu.models.splatco import init_model
    from splatco_tpu.train.densify import graph_downsample
    from splatco_tpu.train.optimizer import make_optimizer
    from splatco_tpu.train.step import init_stats

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(200, 3)).astype(np.float32) * 0.5
    cfg = ModelConfig(feat_dim=8, n_offsets=4, voxel_size=0.05,
                      plane_size=32, num_channels=9, appearance_dim=0)
    params, state = init_model(jax.random.key(0), cfg, pts)
    tx = make_optimizer(OptimizationConfig(), params, 1.0, 0)
    opt_state = tx.init(params)
    stats = init_stats(params["anchors"]["anchor"].shape[0], cfg.n_offsets)
    n0 = int(state.active.sum())
    p2, o2, act2, st2, n_left = graph_downsample(
        params, opt_state, state.active, stats, jax.random.key(1),
        jnp.float32(0.65))
    n1 = int(n_left)
    assert n1 == int(np.floor(n0 * 0.65))
    a = np.asarray(act2)
    assert a[:n1].all() and not a[n1:].any()


def test_flip_matches_reference_golden():
    """Pin LDR-FLIP numerically against a golden generated by running the
    reference's torch implementation (utils/flip.py LDRFLIPLoss) on a
    fixed random pair (tests/golden/flip_golden.npz)."""
    import os

    import numpy as np

    from splatco_tpu.ops.flip import ldr_flip, ldr_flip_error_map

    path = os.path.join(os.path.dirname(__file__), "golden",
                        "flip_golden.npz")
    g = np.load(path)
    ours_map = np.asarray(ldr_flip_error_map(g["img_b"], g["img_a"]))
    ref_map = g["flip_map"]
    assert ours_map.shape == ref_map.shape
    np.testing.assert_allclose(ours_map, ref_map, atol=2e-3)
    ours = float(ldr_flip(g["img_b"], g["img_a"]))
    np.testing.assert_allclose(ours, float(g["flip_mean"]), atol=2e-4)


def test_lpips_matches_torch_golden():
    """Pin the JAX LPIPS against an independent torch computation of the
    reference pipeline (lpipsPyTorch z_score -> VGG16 stages -> unit
    normalize -> 1x1 lin -> spatial mean -> stage sum) over RANDOM VGG
    weights stored in the golden (pretrained weights are unreachable in
    this zero-egress environment; the numerics are weight-independent)."""
    import os

    import jax.numpy as jnp
    import numpy as np

    from splatco_tpu.ops.lpips import lpips

    path = os.path.join(os.path.dirname(__file__), "golden",
                        "lpips_golden.npz")
    g = np.load(path)
    weights = {k: jnp.asarray(g[k]) for k in g.files
               if k.startswith(("conv", "lin"))}
    ours = float(lpips(weights, jnp.asarray(g["img_a"]),
                       jnp.asarray(g["img_b"])))
    np.testing.assert_allclose(ours, float(g["lpips"]), rtol=1e-4)


def test_hdr_flip_matches_reference_golden():
    """Pin HDR-FLIP (exposure sweep + tone mapping + per-pixel max)
    against the reference torch HDRFLIPLoss
    (/root/reference/utils/flip.py:57-128) for all three tone mappers."""
    import os

    import numpy as np

    from splatco_tpu.ops.flip import hdr_flip

    path = os.path.join(os.path.dirname(__file__), "golden",
                        "hdr_flip_golden.npz")
    g = np.load(path)
    for tm in ("aces", "hable", "reinhard"):
        ours = float(hdr_flip(g["img_b"], g["img_a"], tone_mapper=tm))
        np.testing.assert_allclose(ours, float(g[f"mean_{tm}"]), atol=3e-4,
                                    err_msg=tm)
