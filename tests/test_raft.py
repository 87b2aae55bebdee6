"""RAFT optical flow (JAX port): architecture shapes, checkpoint key
layout, and integration with the popping harness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatco_tpu.eval.raft import (basic_encoder, init_raft_params,
                                   lookup_corr, build_corr_pyramid,
                                   make_flow_fn, raft_flow, upsample_flow)


@pytest.fixture(scope="module")
def params():
    return init_raft_params(jax.random.key(0))


def test_encoder_shapes(params):
    x = jnp.zeros((1, 3, 64, 96))
    f = basic_encoder(params, "fnet", x, "instance")
    assert f.shape == (1, 256, 8, 12)
    c = basic_encoder(params, "cnet", x, "batch")
    assert c.shape == (1, 256, 8, 12)


def test_corr_pyramid_and_lookup(params):
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.normal(size=(1, 256, 8, 12)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(1, 256, 8, 12)), jnp.float32)
    pyr = build_corr_pyramid(f1, f2)
    assert pyr[0].shape == (96, 1, 8, 12)
    assert pyr[1].shape == (96, 1, 4, 6)
    gy, gx = jnp.meshgrid(jnp.arange(8.0), jnp.arange(12.0), indexing="ij")
    coords = jnp.stack([gx, gy])
    feat = lookup_corr(pyr, coords)
    assert feat.shape == (1, 4 * 81, 8, 12)
    # the identity lookup at level 0 center tap reproduces raw correlation
    center = 4 * 9 + 4  # (dy=0, dx=0) in the 9x9 window
    raw = pyr[0][:, 0].reshape(96, 96)[jnp.arange(96),
                                       jnp.arange(96)].reshape(8, 12)
    np.testing.assert_allclose(np.asarray(feat[0, center]),
                               np.asarray(raw), rtol=1e-5, atol=1e-5)


def test_upsample_flow_constant():
    """A constant coarse flow with any mask upsamples to the same constant
    x8 (convex combination of equal values)."""
    flow = jnp.ones((1, 2, 4, 6)) * jnp.asarray([2.0, -1.0])[None, :, None,
                                                             None]
    mask = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 576, 4, 6)), jnp.float32)
    up = upsample_flow(flow, mask)
    assert up.shape == (1, 2, 32, 48)
    # interior only: border coarse cells convexly mix the zero padding
    # (same behavior as torch F.unfold in the reference)
    np.testing.assert_allclose(np.asarray(up[0, 0, 8:-8, 8:-8]), 16.0,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(up[0, 1, 8:-8, 8:-8]), -8.0,
                               rtol=1e-5)


def test_raft_flow_runs(params):
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, size=(1, 3, 64, 96)), jnp.float32)
    out = raft_flow(params, img, img, iters=2)
    assert out.shape == (1, 2, 64, 96)
    assert np.all(np.isfinite(np.asarray(out)))


def test_popping_with_raft_flow(params, tmp_path):
    """The popping pipeline accepts a RAFT flow_fn end-to-end."""
    from PIL import Image

    from splatco_tpu.eval.popping import validate_popping

    rng = np.random.default_rng(2)
    d = tmp_path / "renders"
    d.mkdir()
    base = rng.uniform(0, 1, size=(48, 64, 3))
    for i in range(3):
        img = np.clip(np.roll(base, i, axis=1)
                      + rng.normal(0, 0.01, base.shape), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            d / f"{i:05d}.png")
    res = validate_popping(str(d), None, steps=(1,),
                           out_json=str(tmp_path / "pop.json"),
                           flow_fn=make_flow_fn(params, iters=2))
    agg = res["step_1"]["aggregate"]
    assert np.isfinite(agg["mean_mse"])


def test_raft_flow_matches_torch_golden(tmp_path):
    """Numeric pin vs the REFERENCE torch RAFT over random weights —
    the LPIPS-golden method (VERDICT r4 #7).  The golden stores inputs +
    the torch flow; the weights are regenerated seed-deterministically
    from this environment's torch (tools/gen_goldens.py torch_raft_random)
    and fed to the JAX port through the real checkpoint loader."""
    import os
    import sys

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import gen_goldens

    from splatco_tpu.eval.raft import load_raft_weights

    gold = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                "raft_golden.npz"))
    model = gen_goldens.torch_raft_random(int(gold["seed"]))
    pth = tmp_path / "raft_rand.pth"
    torch.save(model.state_dict(), pth)
    params = load_raft_weights(str(pth))

    flow = raft_flow(params, jnp.asarray(gold["img1"])[None],
                     jnp.asarray(gold["img2"])[None],
                     iters=int(gold["iters"]))
    got = np.asarray(flow)
    want = gold["flow"]
    scale = float(np.abs(want).max())
    diff = float(np.abs(got - want).max())
    # f32 conv/avg-pool reassociation differences accumulate through the
    # recurrent updates; anything beyond ~1e-3*scale would indicate a
    # real semantic divergence (transposed conv, swapped GRU gate, ...)
    assert diff <= 2e-3 * max(scale, 1.0), (diff, scale)
