import jax.numpy as jnp
import numpy as np
import pytest

from splatco_tpu.ops.losses import l1_loss, psnr, psnr_scalar, ssim

torch = pytest.importorskip("torch")


def _torch_ssim(a, b, window_size=11, sigma=1.5):
    """Independent torch implementation of windowed SSIM with the reference
    constants (zero-padded SAME depthwise conv, C1=0.01^2, C2=0.03^2)."""
    import torch.nn.functional as F

    coords = torch.arange(window_size, dtype=torch.float64) - window_size // 2
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    w2d = torch.outer(g, g)
    w2d = (w2d / w2d.sum()).float()
    c = a.shape[0]
    win = w2d.expand(c, 1, window_size, window_size).contiguous()
    a = a.unsqueeze(0)
    b = b.unsqueeze(0)

    def conv(x):
        return F.conv2d(x, win, padding=window_size // 2, groups=c)

    mu1, mu2 = conv(a), conv(b)
    mu1s, mu2s, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(a * a) - mu1s
    s2 = conv(b * b) - mu2s
    s12 = conv(a * b) - mu12
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1s + mu2s + c1) * (s1 + s2 + c2))
    return m.mean().item()


def test_ssim_identical_images():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(3, 24, 24)).astype(np.float32)
    val = float(ssim(jnp.asarray(img), jnp.asarray(img)))
    assert val > 0.999


def test_ssim_matches_torch_reference():
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(3, 32, 40)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.normal(size=a.shape).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = _torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
    # float32 conv reassociation between XLA and torch costs ~1e-4
    assert abs(ours - ref) < 5e-4, (ours, ref)


def test_psnr_semantics():
    rng = np.random.default_rng(2)
    a = rng.uniform(size=(3, 16, 16)).astype(np.float32)
    b = np.clip(a + 0.05, 0, 1).astype(np.float32)
    p = np.asarray(psnr(jnp.asarray(a), jnp.asarray(b)))
    assert p.shape == (3, 1)  # per-channel, reference semantics
    # identical images -> inf
    assert not np.isfinite(float(psnr_scalar(jnp.asarray(a), jnp.asarray(a))))


def test_l1():
    a = jnp.zeros((3, 4, 4))
    b = jnp.ones((3, 4, 4)) * 0.5
    assert abs(float(l1_loss(a, b)) - 0.5) < 1e-7
