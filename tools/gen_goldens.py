#!/usr/bin/env python
"""Generate golden .npz fixtures pinning FLIP and LPIPS numerics.

- tests/golden/flip_golden.npz: runs the REFERENCE torch implementation
  (/root/reference/utils/flip.py LDRFLIPLoss) on a fixed random image pair
  and records the per-pixel error map + mean.
- tests/golden/lpips_golden.npz: an independent torch replication of the
  reference lpipsPyTorch pipeline (modules/lpips.py forward,
  modules/networks.py BaseNet.forward/z_score, modules/utils.py
  normalize_activation) over RANDOM VGG16 weights (pretrained weights are
  unreachable with zero egress; the numerics are weight-independent).

Run once; the outputs are committed.  Requires torch (cpu) and read access
to /root/reference.
"""
import os
import sys

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "golden")


def gen_flip():
    # the reference hardcodes .cuda() on constants (utils/flip.py); run it
    # on CPU by making .cuda a no-op before import
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    _zeros = torch.zeros

    def zeros_cpu(*a, **k):
        if str(k.get("device")) == "cuda":
            k["device"] = "cpu"
        return _zeros(*a, **k)

    torch.zeros = zeros_cpu
    sys.path.insert(0, "/root/reference")
    from utils.flip import LDRFLIPLoss

    rng = np.random.default_rng(42)
    h, w = 96, 128
    # smooth-ish fields so the error map exercises both the color and the
    # feature (edge/point) pipelines rather than pure noise
    def field(seed):
        r = np.random.default_rng(seed)
        base = r.uniform(size=(3, h // 8, w // 8)).astype(np.float32)
        t = torch.nn.functional.interpolate(
            torch.from_numpy(base)[None], size=(h, w), mode="bilinear",
            align_corners=False)[0].numpy()
        return np.clip(t + 0.05 * r.normal(size=(3, h, w)), 0, 1
                       ).astype(np.float32)

    img_a = field(1)  # reference
    img_b = np.clip(img_a + 0.15 * rng.normal(size=(3, h, w)), 0, 1
                    ).astype(np.float32)  # test

    loss = LDRFLIPLoss()
    with torch.no_grad():
        de = loss(torch.from_numpy(img_b)[None], torch.from_numpy(img_a)[None])
    flip_map = de.squeeze().numpy().astype(np.float32)
    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(
        os.path.join(OUT, "flip_golden.npz"), img_a=img_a, img_b=img_b,
        flip_map=flip_map, flip_mean=np.float32(flip_map.mean()))
    print("flip_golden.npz:", flip_map.shape, "mean", flip_map.mean())


def gen_lpips():
    # VGG16 .features layout (torchvision): indices of post-ReLU stage ends
    # are [4, 9, 16, 23, 30] (networks.py:95); the plan below reproduces
    # the block/pool STRUCTURE with skinny channels — the JAX lpips reads
    # channel counts from the weight arrays, and the numerics under test
    # (z-score, conv/relu/pool ordering, unit-normalize, lin, mean, sum)
    # are channel-count-independent; real-width weights would be a 55 MB
    # fixture for no extra coverage.
    plan = [(8, 2), (16, 2), (32, 3), (64, 3), (64, 3)]
    g = torch.Generator().manual_seed(7)
    convs = []
    in_ch = 3
    for out_ch, n in plan:
        for _ in range(n):
            w = torch.randn(out_ch, in_ch, 3, 3, generator=g) * (
                1.0 / np.sqrt(in_ch * 9))
            b = torch.randn(out_ch, generator=g) * 0.1
            convs.append((w, b))
            in_ch = out_ch
    lins = [torch.rand(c, generator=g) * 0.1
            for c, _ in plan]

    shift = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    scale = torch.tensor([.458, .448, .450])[None, :, None, None]

    def features(x):
        x = (x - shift) / scale  # BaseNet.z_score — note: NO [-1,1] rescale
        out = []
        li = 0
        for si, (_, n) in enumerate(plan):
            for _ in range(n):
                w, b = convs[li]
                x = torch.nn.functional.conv2d(x, w, b, padding=1)
                x = torch.relu(x)
                li += 1
            norm = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
            out.append(x / (norm + 1e-10))  # normalize_activation
            if si < len(plan) - 1:
                x = torch.nn.functional.max_pool2d(x, 2, 2)
        return out

    rng = np.random.default_rng(11)
    h, w = 64, 64
    img_a = rng.uniform(size=(3, h, w)).astype(np.float32)
    img_b = np.clip(img_a + 0.1 * rng.normal(size=(3, h, w)), 0, 1
                    ).astype(np.float32)
    with torch.no_grad():
        fa = features(torch.from_numpy(img_a)[None])
        fb = features(torch.from_numpy(img_b)[None])
        total = 0.0
        for (a, b), lin in zip(zip(fa, fb), lins):
            d = (a - b) ** 2  # lpips.py:33
            r = (d * lin[None, :, None, None]).sum(1, keepdim=True)
            total = total + r.mean((2, 3))  # 1x1 conv then spatial mean
        val = float(total.squeeze())

    payload = {"img_a": img_a, "img_b": img_b, "lpips": np.float32(val)}
    for i, (w_, b_) in enumerate(convs):
        payload[f"conv{i}_w"] = w_.numpy().astype(np.float32)
        payload[f"conv{i}_b"] = b_.numpy().astype(np.float32)
    for i, lin in enumerate(lins):
        payload[f"lin{i}"] = lin.numpy().astype(np.float32)
    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "lpips_golden.npz"), **payload)
    print("lpips_golden.npz: lpips =", val)


def gen_render():
    """Golden image for the full decode->project->bin->blend pipeline on a
    deterministic tiny scene (fixed PRNG keys, fixed points, fixed
    camera).  Regenerate ONLY when the renderer semantics intentionally
    change."""
    sys.path.insert(0, REPO)
    os.environ.setdefault("XLA_FLAGS", "")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from splatco_tpu.config import ModelConfig
    from splatco_tpu.data.cameras import look_at_camera
    from splatco_tpu.models.renderer import prefilter_voxel, render
    from splatco_tpu.models.splatco import decode_kwargs, init_model

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(400, 3)).astype(np.float32) * 0.5
    cfg = ModelConfig(feat_dim=16, n_offsets=4, voxel_size=0.05,
                      plane_size=64, num_channels=9, appearance_dim=0,
                      contractor=True, scene_center=[0.0, 0.0, 0.0],
                      scene_length=[2.0, 2.0, 2.0])
    params, state = init_model(jax.random.key(0), cfg, pts)
    cam = look_at_camera([0, 0, -3.0], [0, 0, 0], [0, -1, 0],
                         1.0, 0.75, 64, 48)
    vis = prefilter_voxel(params["anchors"], state.active, cam)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    out = render(params, state.active, state.contractor, cam, bg,
                 visible_mask=vis, activate_level=0, is_training=False,
                 backend="pallas", **decode_kwargs(cfg))
    img = np.asarray(out.image)
    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "render_golden.npz"),
                        image=img, points=pts)
    print("render_golden.npz:", img.shape, "mean", img.mean())


def gen_hdr_flip():
    """Golden for HDR-FLIP: run the reference HDRFLIPLoss on a synthetic
    HDR pair (nonnegative linear RGB spanning several stops) for each tone
    mapper."""
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    _zeros = torch.zeros

    def zeros_cpu(*a, **k):
        if str(k.get("device")) == "cuda":
            k["device"] = "cpu"
        return _zeros(*a, **k)

    torch.zeros = zeros_cpu
    sys.path.insert(0, "/root/reference")
    from utils.flip import HDRFLIPLoss

    h, w = 96, 128

    def field(seed, scale):
        r = np.random.default_rng(seed)
        base = r.uniform(size=(3, h // 8, w // 8)).astype(np.float32)
        t = torch.nn.functional.interpolate(
            torch.from_numpy(base)[None], size=(h, w), mode="bilinear",
            align_corners=False)[0].numpy()
        # exponentiate into HDR range: values from ~1e-2 to ~scale
        return (scale ** t / scale * 4.0).astype(np.float32)

    img_a = field(3, 64.0)
    rng = np.random.default_rng(43)
    img_b = np.clip(img_a * (1.0 + 0.2 * rng.normal(size=(3, h, w))),
                    0, None).astype(np.float32)

    loss = HDRFLIPLoss()
    out = {"img_a": img_a, "img_b": img_b}
    for tm in ("aces", "hable", "reinhard"):
        with torch.no_grad():
            mean = loss(torch.from_numpy(img_b)[None],
                        torch.from_numpy(img_a)[None], tone_mapper=tm)
        out[f"mean_{tm}"] = np.float32(mean.item())
        print(f"hdr_flip[{tm}]: mean {mean.item():.6f}")
    np.savez_compressed(os.path.join(OUT, "hdr_flip_golden.npz"), **out)


def torch_raft_random(seed: int = 7):
    """The REFERENCE torch RAFT (vendored at
    /root/reference/popping_detection/core/raft.py) at full size with
    seed-deterministic random weights, on CPU.  Shared by the golden
    generator and tests/test_raft.py (regenerating the weights from the
    seed keeps the committed golden tiny — flow + images only).  The
    golden therefore pins BOTH the torch RNG stream of this environment
    and the port's numerics; regenerate if torch changes."""
    import argparse

    sys.path.insert(0, "/root/reference/popping_detection/core")
    from raft import RAFT

    args = argparse.Namespace(small=False, mixed_precision=False,
                              alternate_corr=False, dropout=0)
    torch.manual_seed(seed)
    model = RAFT(args)
    model.eval()
    return model


def raft_golden_images(h=128, w=160):
    """Fixed smooth image pair in [0, 255] (image2 = shifted image1 plus
    noise so the flow field is nontrivial).  H, W must keep the 4-level
    1/8-scale corr pyramid above 1x1 (>= 128 px), else the reference's
    bilinear_sampler divides by (dim-1) = 0."""
    r = np.random.default_rng(11)
    base = r.uniform(size=(3, h // 8, w // 8)).astype(np.float32)
    up = torch.nn.functional.interpolate(
        torch.from_numpy(base)[None], size=(h, w), mode="bilinear",
        align_corners=False)[0].numpy()
    img1 = (255.0 * np.clip(up + 0.05 * r.normal(size=(3, h, w)), 0, 1)
            ).astype(np.float32)
    img2 = np.roll(img1, shift=(2, -3), axis=(1, 2))
    img2 = np.clip(img2 + 4.0 * r.normal(size=(3, h, w)), 0, 255
                   ).astype(np.float32)
    return img1, img2


def gen_raft():
    """Pin the JAX RAFT port's numerics against the reference torch code
    over random weights — the exact method used for LPIPS (VERDICT r4
    #7): same weights, same inputs, compare the upsampled flow."""
    model = torch_raft_random()
    img1, img2 = raft_golden_images()
    with torch.no_grad():
        _, flow_up = model(torch.from_numpy(img1)[None],
                           torch.from_numpy(img2)[None], iters=4,
                           test_mode=True)
    np.savez_compressed(
        os.path.join(OUT, "raft_golden.npz"), img1=img1, img2=img2,
        flow=flow_up.numpy().astype(np.float32), iters=np.int32(4),
        seed=np.int32(7))
    print("raft_golden.npz: |flow| mean",
          float(np.abs(flow_up.numpy()).mean()))


if __name__ == "__main__":
    gen_flip()
    gen_lpips()
    gen_render()
    gen_hdr_flip()
    gen_raft()
