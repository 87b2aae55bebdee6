"""NVIDIA LDR-/HDR-ꟻLIP perceptual error metric, pure JAX.

Reimplementation of the published FLIP algorithm (Andersson et al., HPG
2020 / EG 2021) with the same constants and pipeline as the reference's
evaluation harness (/root/reference/utils/flip.py; used by metrics.py:81 and
popping_detection).  Pipeline: sRGB -> YCxCz -> per-channel CSF spatial
filtering -> Hunt-adjusted L*a*b* -> HyAB -> error redistribution, combined
with an edge/point feature difference on the achromatic channel.

Images are [3, H, W] float in [0, 1] (LDR) or nonnegative linear RGB (HDR).
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_PPD = (0.7 * 3840 / 0.7) * math.pi / 180  # 4K @ 0.7m: ~67 px/deg

_REF_ILLUM = np.array([0.950428545, 1.0, 1.088900371], np.float32)
_INV_ILLUM = np.array([1.052156925, 1.0, 0.918357670], np.float32)
_LINRGB2XYZ = np.array([
    [10135552 / 24577794, 8788810 / 24577794, 4435075 / 24577794],
    [2613072 / 12288897, 8788810 / 12288897, 887015 / 12288897],
    [1425312 / 73733382, 8788810 / 73733382, 70074185 / 73733382],
], np.float32)


def srgb_to_linear(c):
    limit = 0.04045
    return jnp.where(c > limit,
                     ((jnp.maximum(c, limit) + 0.055) / 1.055) ** 2.4,
                     c / 12.92)


def linrgb_to_xyz(img):
    return jnp.einsum("ij,jhw->ihw", jnp.asarray(_LINRGB2XYZ), img)


def xyz_to_linrgb(img):
    inv = jnp.asarray(np.linalg.inv(_LINRGB2XYZ).astype(np.float32))
    return jnp.einsum("ij,jhw->ihw", inv, img)


def xyz_to_ycxcz(img):
    img = img * jnp.asarray(_INV_ILLUM)[:, None, None]
    y = 116.0 * img[1] - 16.0
    cx = 500.0 * (img[0] - img[1])
    cz = 200.0 * (img[1] - img[2])
    return jnp.stack([y, cx, cz])


def ycxcz_to_xyz(img):
    y = (img[0] + 16.0) / 116.0
    x = y + img[1] / 500.0
    z = y - img[2] / 200.0
    return jnp.stack([x, y, z]) * jnp.asarray(_REF_ILLUM)[:, None, None]


def xyz_to_lab(img):
    img = img * jnp.asarray(_INV_ILLUM)[:, None, None]
    delta = 6.0 / 29.0
    d3 = delta**3
    f = jnp.where(img > d3,
                  jnp.maximum(img, d3) ** (1.0 / 3.0),
                  img / (3 * delta * delta) + 4.0 / 29.0)
    l = 116.0 * f[1] - 16.0
    a = 500.0 * (f[0] - f[1])
    b = 200.0 * (f[1] - f[2])
    return jnp.stack([l, a, b])


def srgb_to_ycxcz(img):
    return xyz_to_ycxcz(linrgb_to_xyz(srgb_to_linear(img)))


def hunt_adjust(lab):
    l = lab[0]
    return jnp.stack([l, 0.01 * l * lab[1], 0.01 * l * lab[2]])


def hyab(a, b, eps):
    d = a - b
    return (jnp.sqrt(jnp.maximum(d[0] * d[0], eps))
            + jnp.sqrt(d[1] * d[1] + d[2] * d[2]))


@functools.lru_cache(maxsize=4)
def _csf_filters(ppd: float) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                      int]:
    """Per-channel CSF kernels (A, RG, BY) and the shared radius."""
    coeffs = {
        "A": (1.0, 0.0047, 0.0, 1e-5),
        "RG": (1.0, 0.0053, 0.0, 1e-5),
        "BY": (34.1, 0.04, 13.5, 0.025),
    }
    max_b = 0.04
    r = int(np.ceil(3 * np.sqrt(max_b / (2 * np.pi**2)) * ppd))
    dx = 1.0 / ppd
    x, y = np.meshgrid(range(-r, r + 1), range(-r, r + 1))
    z = (x * dx) ** 2 + (y * dx) ** 2
    out = []
    for ch in ("A", "RG", "BY"):
        a1, b1, a2, b2 = coeffs[ch]
        g = (a1 * np.sqrt(np.pi / b1) * np.exp(-np.pi**2 * z / b1)
             + a2 * np.sqrt(np.pi / b2) * np.exp(-np.pi**2 * z / b2))
        out.append((g / g.sum()).astype(np.float32))
    return out[0], out[1], out[2], r


def _conv2d_replicate(img_1hw, kernel, radius):
    """Single-channel 2D conv with replicate padding; img [H, W]."""
    pad = jnp.pad(img_1hw, ((radius, radius), (radius, radius)),
                  mode="edge")
    return jax.lax.conv_general_dilated(
        pad[None, None], jnp.asarray(kernel)[None, None],
        (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)[0, 0]  # f32 on TPU (metric)


def _spatial_filter(img, ppd: float):
    s_a, s_rg, s_by, r = _csf_filters(ppd)
    filtered = jnp.stack([
        _conv2d_replicate(img[0], s_a, r),
        _conv2d_replicate(img[1], s_rg, r),
        _conv2d_replicate(img[2], s_by, r),
    ])
    return jnp.clip(xyz_to_linrgb(ycxcz_to_xyz(filtered)), 0.0, 1.0)


@functools.lru_cache(maxsize=8)
def _feature_kernel(ppd: float, feature: str) -> Tuple[np.ndarray, int]:
    w = 0.082
    sd = 0.5 * w * ppd
    radius = int(np.ceil(3 * sd))
    x, y = np.meshgrid(range(-radius, radius + 1),
                       range(-radius, radius + 1))
    g = np.exp(-(x**2 + y**2) / (2 * sd * sd))
    if feature == "edge":
        gx = -x * g
    else:
        gx = (x**2 / (sd * sd) - 1) * g
    neg = -gx[gx < 0].sum()
    pos = gx[gx > 0].sum()
    gx = np.where(gx < 0, gx / neg, gx / pos).astype(np.float32)
    return gx, radius


def _feature_mag(img_y, ppd: float, feature: str):
    gx, radius = _feature_kernel(ppd, feature)
    fx = _conv2d_replicate(img_y, gx, radius)
    fy = _conv2d_replicate(img_y, gx.T, radius)
    return jnp.sqrt(fx * fx + fy * fy)


def _cmax(qc: float, eps: float) -> float:
    green = np.zeros((3, 1, 1), np.float32)
    green[1] = 1.0
    blue = np.zeros((3, 1, 1), np.float32)
    blue[2] = 1.0
    hg = hunt_adjust(xyz_to_lab(linrgb_to_xyz(jnp.asarray(green))))
    hb = hunt_adjust(xyz_to_lab(linrgb_to_xyz(jnp.asarray(blue))))
    return float(hyab(hg, hb, eps)[0, 0] ** qc)


def ldr_flip_error_map(test, reference, ppd: float = DEFAULT_PPD,
                       qc: float = 0.7, qf: float = 0.5, pc: float = 0.4,
                       pt: float = 0.95, eps: float = 1e-15):
    """Per-pixel LDR-FLIP error [H, W]; inputs sRGB [3,H,W] in [0,1]."""
    test = jnp.clip(test, 0.0, 1.0)
    reference = jnp.clip(reference, 0.0, 1.0)
    t_op = srgb_to_ycxcz(test)
    r_op = srgb_to_ycxcz(reference)
    return _flip_from_ycxcz(t_op, r_op, ppd, qc, qf, pc, pt, eps)


def _flip_from_ycxcz(t_op, r_op, ppd, qc, qf, pc, pt, eps):
    """FLIP core on YCxCz inputs (reference compute_ldrflip,
    /root/reference/utils/flip.py:169-228) — shared by the LDR entry
    (after sRGB decode) and the HDR per-exposure loop (after tone
    mapping)."""
    # color pipeline
    t_f = hunt_adjust(xyz_to_lab(linrgb_to_xyz(_spatial_filter(t_op, ppd))))
    r_f = hunt_adjust(xyz_to_lab(linrgb_to_xyz(_spatial_filter(r_op, ppd))))
    de_hyab = hyab(r_f, t_f, eps) ** qc
    cmax = _cmax(qc, eps)
    pccmax = pc * cmax
    de_c = jnp.where(
        de_hyab < pccmax,
        (pt / pccmax) * de_hyab,
        pt + ((de_hyab - pccmax) / (cmax - pccmax)) * (1.0 - pt))

    # feature pipeline
    r_y = (r_op[0] + 16.0) / 116.0
    t_y = (t_op[0] + 16.0) / 116.0
    de_f = jnp.maximum(
        jnp.abs(_feature_mag(r_y, ppd, "edge")
                - _feature_mag(t_y, ppd, "edge")),
        jnp.abs(_feature_mag(t_y, ppd, "point")
                - _feature_mag(r_y, ppd, "point")))
    de_f = ((1.0 / np.sqrt(2.0)) * jnp.maximum(de_f, eps)) ** qf

    return de_c ** (1.0 - de_f)


def ldr_flip(test, reference, ppd: float = DEFAULT_PPD) -> jax.Array:
    """Mean LDR-FLIP error (the reference's LDRFLIPLoss().forward mean)."""
    return ldr_flip_error_map(test, reference, ppd).mean()


# ----------------------------------------------------------------------
# HDR-FLIP (reference HDRFLIPLoss, /root/reference/utils/flip.py:57-128)
# ----------------------------------------------------------------------

def _tonemap_coeffs(tone_mapper: str):
    """Rational-polynomial coefficients (k0..k5) for hable/aces tone
    mappers (reference tone_map, /root/reference/utils/flip.py:230-296).
    Reinhard is handled separately (luminance division)."""
    if tone_mapper == "hable":
        a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
        k0 = a * f - a * e
        k1 = c * b * f - b * e
        k2 = 0.0
        k3 = a * f
        k4 = b * f
        k5 = d * f * f
        w = 11.2
        white_scale = (k3 * w * w + k4 * w + k5) / (k0 * w * w + k1 * w + k2)
        return (4 * k0 * white_scale, 2 * k1 * white_scale, k2 * white_scale,
                4 * k3, 2 * k4, k5)
    # ACES approximation with pre-exposure cancellation
    return (0.6 * 0.6 * 2.51, 0.6 * 0.03, 0.0,
            0.6 * 0.6 * 2.43, 0.6 * 0.59, 0.14)


def tone_map(img, tone_mapper: str, exposure):
    """Exposure compensation + tone mapping -> LDR linear RGB in [0,1]."""
    x = (2.0 ** exposure) * img
    if tone_mapper == "reinhard":
        y_lum = (0.2126 * x[0] + 0.7152 * x[1] + 0.0722 * x[2])
        return jnp.clip(x / (1.0 + y_lum)[None], 0.0, 1.0)
    k0, k1, k2, k3, k4, k5 = _tonemap_coeffs(tone_mapper)
    x2 = x * x
    nom = k0 * x2 + k1 * x + k2
    denom = k3 * x2 + k4 * x + k5
    denom = jnp.where(jnp.isinf(denom), 1.0, denom)
    return jnp.clip(nom / denom, 0.0, 1.0)


def _inverse_tonemap_x(tone_mapper: str, t: float) -> float:
    """Solve tone_map(x) = t for x (the exposure-range endpoints,
    reference compute_start_stop_exposures)."""
    if tone_mapper == "reinhard":
        return t * 1.0 / (1.0 - t * 1.0)
    k0, k1, k2, k3, k4, k5 = _tonemap_coeffs(tone_mapper)
    c0 = (k1 - k4 * t) / (k0 - k3 * t)
    c1 = (k2 - k5 * t) / (k0 - k3 * t)
    return float(-0.5 * c0 + np.sqrt((0.5 * c0) ** 2 - c1))


def compute_start_stop_exposures(reference, tone_mapper: str = "aces",
                                 tmax: float = 0.85, tmin: float = 0.85):
    """Start/stop exposures from the reference image's luminance range
    (/root/reference/utils/flip.py:297-378).  Host-side floats — HDR-FLIP
    is an offline metric.  Median matches torch.median (lower middle
    order statistic), not numpy's midpoint average."""
    x_max = _inverse_tonemap_x(tone_mapper, tmax)
    x_min = _inverse_tonemap_x(tone_mapper, tmin)
    ref = np.asarray(reference)
    y_ref = 0.2126 * ref[0] + 0.7152 * ref[1] + 0.0722 * ref[2]
    y_hi = float(y_ref.max())
    flat = np.sort(y_ref.reshape(-1))
    y_lo = float(flat[(flat.size - 1) // 2])
    start_exposure = math.log2(x_max / max(y_hi, 1e-30))
    stop_exposure = math.log2(x_min / max(y_lo, 1e-30))
    return start_exposure, stop_exposure


def hdr_flip_error_map(test, reference, ppd: float = DEFAULT_PPD,
                       tone_mapper: str = "aces",
                       start_exposure: float = None,
                       stop_exposure: float = None,
                       qc: float = 0.7, qf: float = 0.5, pc: float = 0.4,
                       pt: float = 0.95, eps: float = 1e-15):
    """Per-pixel HDR-FLIP error [H, W]; inputs nonnegative linear RGB
    [3,H,W].  Tone-maps at a sweep of exposures, runs the FLIP core on
    each LDR pair, takes the per-pixel maximum (reference HDRFLIPLoss
    .forward, /root/reference/utils/flip.py:71-127)."""
    test = jnp.clip(test, 0.0, 65536.0)
    reference = jnp.clip(reference, 0.0, 65536.0)
    if start_exposure is None or stop_exposure is None:
        c_start, c_stop = compute_start_stop_exposures(
            reference, tone_mapper)
        start_exposure = c_start if start_exposure is None else start_exposure
        stop_exposure = c_stop if stop_exposure is None else stop_exposure
    num_exposures = max(2, int(math.ceil(stop_exposure - start_exposure)))
    step = ((stop_exposure - start_exposure) / max(num_exposures - 1, 1))
    err = None
    for i in range(num_exposures):
        exposure = start_exposure + i * step
        r_op = xyz_to_ycxcz(linrgb_to_xyz(
            tone_map(reference, tone_mapper, exposure)))
        t_op = xyz_to_ycxcz(linrgb_to_xyz(
            tone_map(test, tone_mapper, exposure)))
        e = _flip_from_ycxcz(t_op, r_op, ppd, qc, qf, pc, pt, eps)
        err = e if err is None else jnp.maximum(err, e)
    return err


def hdr_flip(test, reference, ppd: float = DEFAULT_PPD,
             tone_mapper: str = "aces") -> jax.Array:
    """Mean HDR-FLIP error (the reference's HDRFLIPLoss().forward mean)."""
    return hdr_flip_error_map(test, reference, ppd, tone_mapper).mean()
