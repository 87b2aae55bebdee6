"""RAFT optical flow in JAX — the learned-flow estimator of the popping
harness (reference: /root/reference/popping_detection/core/raft.py:34,
corr.py:22, extractor.py:128, update.py:124; architecture per Teed &
Deng, ECCV 2020, original code BSD-3 princeton-vl/RAFT).

Re-implemented functionally: parameters live in a FLAT dict keyed by the
torch state-dict names (minus the DataParallel "module." prefix), so the
official checkpoints (raft-things.pth etc.) load directly via
`load_raft_weights` — torch is used only to unpickle, all compute is JAX.

Model (the "basic" variant, hidden=context=128, 4 corr levels, radius 4):
  fnet  — BasicEncoder(output 256, instance norm): 7x7/2 stem + three
          2-residual-block stages (64, 96/2, 128/2) + 1x1 head; 1/8 res
  cnet  — same encoder with batch norm (eval: running stats), output 256
          split into tanh(hidden 128) and relu(context 128)
  corr  — all-pairs <f1, f2>/sqrt(256) pyramid (4 avg-pool levels),
          looked up in a (2r+1)^2 window around the current flow target
  update— BasicMotionEncoder + SepConvGRU + FlowHead (+ a 64*9-channel
          convex-upsampling mask, scaled by 0.25)
Iterated `iters` times from zero flow; the final 1/8-res flow is convex-
upsampled 8x.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

HDIM = 128
CDIM = 128
CORR_LEVELS = 4
CORR_RADIUS = 4


# ----------------------------------------------------------------------
# primitives (NCHW, torch-compatible)
# ----------------------------------------------------------------------

def conv2d(p: Dict, name: str, x, stride=1):
    """torch Conv2d with padding=k//2 (every RAFT conv uses that).
    Explicit padding, NOT lax 'SAME': for stride 2 'SAME' pads (0,1)
    where torch pads (1,1) — a one-pixel shift that breaks pretrained
    weights."""
    w = p[f"{name}.weight"]
    if isinstance(stride, int):
        stride = (stride, stride)
    kh, kw = w.shape[2], w.shape[3]
    pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)  # pretrained weights: f32
    b = p.get(f"{name}.bias")
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def instance_norm(x, eps=1e-5):
    """torch InstanceNorm2d(affine=False): per-sample per-channel over HW."""
    mu = jnp.mean(x, axis=(2, 3), keepdims=True)
    var = jnp.var(x, axis=(2, 3), keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps)


def batch_norm(p: Dict, name: str, x, eps=1e-5):
    """torch BatchNorm2d in eval mode (running statistics)."""
    mean = p[f"{name}.running_mean"][None, :, None, None]
    var = p[f"{name}.running_var"][None, :, None, None]
    w = p[f"{name}.weight"][None, :, None, None]
    b = p[f"{name}.bias"][None, :, None, None]
    return (x - mean) / jnp.sqrt(var + eps) * w + b


def _norm(p, prefix, name, x, norm_fn):
    if norm_fn == "instance":
        return instance_norm(x)
    if norm_fn == "batch":
        return batch_norm(p, f"{prefix}.{name}", x)
    return x


# ----------------------------------------------------------------------
# encoder
# ----------------------------------------------------------------------

def residual_block(p, prefix, x, stride, norm_fn):
    y = jax.nn.relu(_norm(p, prefix, "norm1",
                          conv2d(p, f"{prefix}.conv1", x, stride=stride),
                          norm_fn))
    y = jax.nn.relu(_norm(p, prefix, "norm2",
                          conv2d(p, f"{prefix}.conv2", y), norm_fn))
    if stride != 1:
        x = _norm(p, prefix, "norm3",
                  conv2d(p, f"{prefix}.downsample.0", x, stride=stride),
                  norm_fn)
    return jax.nn.relu(x + y)


def basic_encoder(p, prefix, x, norm_fn):
    """BasicEncoder (extractor.py:128): 1/8-resolution features."""
    x = conv2d(p, f"{prefix}.conv1", x, stride=2)
    x = _norm(p, prefix, "norm1", x, norm_fn)
    x = jax.nn.relu(x)
    for li, stride in (("layer1", 1), ("layer2", 2), ("layer3", 2)):
        x = residual_block(p, f"{prefix}.{li}.0", x, stride, norm_fn)
        x = residual_block(p, f"{prefix}.{li}.1", x, 1, norm_fn)
    return conv2d(p, f"{prefix}.conv2", x)


# ----------------------------------------------------------------------
# correlation pyramid
# ----------------------------------------------------------------------

def avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID") * 0.25


def build_corr_pyramid(fmap1, fmap2):
    """All-pairs correlation (corr.py:22): [HW, 1, h, w] per level."""
    n, d, h, w = fmap1.shape
    assert n == 1, "popping eval is per-frame-pair"
    f1 = fmap1.reshape(d, h * w)
    f2 = fmap2.reshape(d, h * w)
    corr = (f1.T @ f2) / jnp.sqrt(jnp.float32(d))   # [HW, HW]
    corr = corr.reshape(h * w, 1, h, w)
    pyr = [corr]
    for _ in range(CORR_LEVELS - 1):
        corr = avg_pool2(corr)
        pyr.append(corr)
    return pyr


def lookup_corr(pyr, coords):
    """Sample each level in a (2r+1)^2 window around coords/2^i
    (bilinear, zeros outside — torch grid_sample align_corners=True).
    coords: [2, h, w] pixel coords into level 0."""
    r = CORR_RADIUS
    _, h1, w1 = coords.shape
    hw = h1 * w1
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dgrid = jnp.stack(jnp.meshgrid(dx, dx, indexing="ij"), axis=-1)
    # Reference quirk (corr.py:48-52): delta is stacked as meshgrid(dy,dx)
    # but ADDED to (x, y) centroids — i.e. the first meshgrid axis offsets
    # x and the second offsets y.  The window is square-symmetric so the
    # tap SET is identical, but the channel ORDER of the 81 window taps
    # is the transpose of the natural (dx, dy) layout; trained update
    # weights (and the random-weight golden) are keyed to the reference
    # order, so reproduce it exactly.
    dgx = dgrid[..., 0].reshape(-1)  # [81] — reference's "dy" axis
    dgy = dgrid[..., 1].reshape(-1)

    out = []
    for i, corr in enumerate(pyr):
        _, _, h2, w2 = corr.shape
        cf = corr.reshape(hw, h2 * w2)
        cx = coords[0].reshape(hw, 1) / (2 ** i) + dgx[None, :]  # [HW,81]
        cy = coords[1].reshape(hw, 1) / (2 ** i) + dgy[None, :]
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        fx = cx - x0
        fy = cy - y0

        def tap(xi, yi, wgt):
            inb = ((xi >= 0) & (xi <= w2 - 1) & (yi >= 0) & (yi <= h2 - 1))
            xi_c = jnp.clip(xi, 0, w2 - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, h2 - 1).astype(jnp.int32)
            v = jnp.take_along_axis(cf, yi_c * w2 + xi_c, axis=1)
            return jnp.where(inb, v, 0.0) * wgt

        v = (tap(x0, y0, (1 - fx) * (1 - fy))
             + tap(x0 + 1, y0, fx * (1 - fy))
             + tap(x0, y0 + 1, (1 - fx) * fy)
             + tap(x0 + 1, y0 + 1, fx * fy))
        out.append(v)  # [HW, 81]
    feat = jnp.concatenate(out, axis=1)                     # [HW, 4*81]
    return feat.reshape(h1, w1, -1).transpose(2, 0, 1)[None]  # [1,C,h,w]


# ----------------------------------------------------------------------
# update block
# ----------------------------------------------------------------------

def motion_encoder(p, corr, flow):
    pre = "update_block.encoder"
    cor = jax.nn.relu(conv2d(p, f"{pre}.convc1", corr))
    cor = jax.nn.relu(conv2d(p, f"{pre}.convc2", cor))
    flo = jax.nn.relu(conv2d(p, f"{pre}.convf1", flow))
    flo = jax.nn.relu(conv2d(p, f"{pre}.convf2", flo))
    out = jax.nn.relu(conv2d(p, f"{pre}.conv",
                             jnp.concatenate([cor, flo], axis=1)))
    return jnp.concatenate([out, flow], axis=1)  # 128 channels


def sep_conv_gru(p, h, x):
    pre = "update_block.gru"

    def half(h, tag):
        hx = jnp.concatenate([h, x], axis=1)
        z = jax.nn.sigmoid(conv2d(p, f"{pre}.convz{tag}", hx))
        r = jax.nn.sigmoid(conv2d(p, f"{pre}.convr{tag}", hx))
        q = jnp.tanh(conv2d(p, f"{pre}.convq{tag}",
                            jnp.concatenate([r * h, x], axis=1)))
        return (1 - z) * h + z * q

    return half(half(h, 1), 2)


def update_block(p, net, inp, corr, flow):
    mot = motion_encoder(p, corr, flow)
    net = sep_conv_gru(p, net, jnp.concatenate([inp, mot], axis=1))
    fh = jax.nn.relu(conv2d(p, "update_block.flow_head.conv1", net))
    delta = conv2d(p, "update_block.flow_head.conv2", fh)
    m = jax.nn.relu(conv2d(p, "update_block.mask.0", net))
    mask = 0.25 * conv2d(p, "update_block.mask.2", m)
    return net, mask, delta


def upsample_flow(flow, mask):
    """Convex 8x upsampling (raft.py:82-94)."""
    n, _, h, w = flow.shape
    mask = mask.reshape(n, 1, 9, 8, 8, h, w)
    mask = jax.nn.softmax(mask, axis=2)
    fp = jnp.pad(8.0 * flow, ((0, 0), (0, 0), (1, 1), (1, 1)))
    # 3x3 neighborhoods in torch-unfold kernel order (row-major window)
    taps = jnp.stack([fp[:, :, dy:dy + h, dx:dx + w]
                      for dy in range(3) for dx in range(3)],
                     axis=2)                       # [N,2,9,H,W]
    up = jnp.sum(mask * taps[:, :, :, None, None], axis=2)  # [N,2,8,8,H,W]
    up = up.transpose(0, 1, 4, 2, 5, 3)            # [N,2,H,8,W,8]
    return up.reshape(n, 2, 8 * h, 8 * w)


# ----------------------------------------------------------------------
# full model
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("iters",))
def raft_flow(params: Dict, image1, image2, iters: int = 20):
    """Flow image1 -> image2.  images [1,3,H,W] in [0,255], H,W % 8 == 0.
    Returns [1,2,H,W] pixel flow."""
    image1 = 2.0 * (image1 / 255.0) - 1.0
    image2 = 2.0 * (image2 / 255.0) - 1.0

    fmap1 = basic_encoder(params, "fnet", image1, "instance")
    fmap2 = basic_encoder(params, "fnet", image2, "instance")
    pyr = build_corr_pyramid(fmap1, fmap2)

    cnet = basic_encoder(params, "cnet", image1, "batch")
    net = jnp.tanh(cnet[:, :HDIM])
    inp = jax.nn.relu(cnet[:, HDIM:])

    _, _, h, w = fmap1.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords0 = jnp.stack([gx, gy])           # [2,h,w]
    coords1 = coords0

    flow_up = jnp.zeros((1, 2, 8 * h, 8 * w))
    for _ in range(iters):
        coords1 = jax.lax.stop_gradient(coords1)
        corr = lookup_corr(pyr, coords1)
        flow = (coords1 - coords0)[None]
        net, mask, delta = update_block(params, net, inp, corr, flow)
        coords1 = coords1 + delta[0]
        flow_up = upsample_flow((coords1 - coords0)[None], mask)
    return flow_up


# ----------------------------------------------------------------------
# weights
# ----------------------------------------------------------------------

def load_raft_weights(path: str) -> Dict[str, jax.Array]:
    """Load an official RAFT checkpoint (raft-things.pth & co).  Torch is
    used only to unpickle; keys keep the torch names minus 'module.'."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    params = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.endswith("num_batches_tracked"):
            continue
        params[k] = jnp.asarray(np.asarray(v.float()))
    return params


def init_raft_params(key) -> Dict[str, jax.Array]:
    """Random init with the exact checkpoint key/shape layout (used by
    tests; real flow quality requires trained weights)."""
    shapes = {}

    def conv(name, o, i, kh, kw, bias=True):
        shapes[f"{name}.weight"] = (o, i, kh, kw)
        if bias:
            shapes[f"{name}.bias"] = (o,)

    def bn(name, c):
        for s in ("weight", "bias", "running_mean", "running_var"):
            shapes[f"{name}.{s}"] = (c,)

    for pre, norm in (("fnet", "instance"), ("cnet", "batch")):
        conv(f"{pre}.conv1", 64, 3, 7, 7)
        if norm == "batch":
            bn(f"{pre}.norm1", 64)
        dims = [(64, 64, 1), (64, 96, 2), (96, 128, 2)]
        for li, (cin, cout, stride) in enumerate(dims, start=1):
            for bi, (ci, st) in enumerate(((cin, stride), (cout, 1))):
                b = f"{pre}.layer{li}.{bi}"
                conv(f"{b}.conv1", cout, ci, 3, 3)
                conv(f"{b}.conv2", cout, cout, 3, 3)
                if norm == "batch":
                    bn(f"{b}.norm1", cout)
                    bn(f"{b}.norm2", cout)
                if st != 1:
                    conv(f"{b}.downsample.0", cout, ci, 1, 1)
                    if norm == "batch":
                        bn(f"{b}.norm3", cout)
        conv(f"{pre}.conv2", 256, 128, 1, 1)

    cor_planes = CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2
    conv("update_block.encoder.convc1", 256, cor_planes, 1, 1)
    conv("update_block.encoder.convc2", 192, 256, 3, 3)
    conv("update_block.encoder.convf1", 128, 2, 7, 7)
    conv("update_block.encoder.convf2", 64, 128, 3, 3)
    conv("update_block.encoder.conv", 126, 256, 3, 3)
    for tag, (kh, kw) in (("1", (1, 5)), ("2", (5, 1))):
        for g in ("z", "r", "q"):
            conv(f"update_block.gru.conv{g}{tag}", 128, 128 + 256, kh, kw)
    conv("update_block.flow_head.conv1", 256, 128, 3, 3)
    conv("update_block.flow_head.conv2", 2, 256, 3, 3)
    conv("update_block.mask.0", 256, 128, 3, 3)
    conv("update_block.mask.2", 64 * 9, 256, 1, 1)

    params = {}
    keys = jax.random.split(key, len(shapes))
    for (name, shp), k in zip(sorted(shapes.items()), keys):
        if name.endswith("running_var"):
            params[name] = jnp.ones(shp)
        elif name.endswith(("bias", "running_mean")):
            params[name] = jnp.zeros(shp)
        elif name.endswith("weight") and len(shp) == 1:
            params[name] = jnp.ones(shp)
        else:
            fan = int(np.prod(shp[1:]))
            params[name] = (jax.random.normal(k, shp)
                            * np.sqrt(2.0 / max(fan, 1)) * 0.5)
    return params


def make_flow_fn(params, iters: int = 20):
    """Adapt raft_flow to the popping harness's `flow(a, b) -> [H,W,2]`
    contract (images [H,W,3] float in [0,1]); pads to a multiple of 8."""
    def flow(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        h, w = a.shape[:2]
        hp = -(-h // 8) * 8
        wp = -(-w // 8) * 8

        def prep(x):
            img = np.zeros((hp, wp, 3), np.float32)
            img[:h, :w] = x
            return jnp.asarray(img.transpose(2, 0, 1)[None] * 255.0)

        out = raft_flow(params, prep(a), prep(b), iters=iters)
        return np.asarray(out[0]).transpose(1, 2, 0)[:h, :w]

    return flow
