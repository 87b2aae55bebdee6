"""Small math helpers shared across the framework.

Behavioral parity targets (reference: /root/reference/utils/general_utils.py):
  inverse_sigmoid  — general_utils.py:14
  build_rotation   — general_utils.py:78  (quaternion wxyz -> 3x3 rotation)
  build_scaling_rotation / strip_symmetric — general_utils.py:101,75
  get_expon_lr_func — general_utils.py:29 (log-lerp schedule with delay ramp)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def normalize(v, axis=-1, eps=0.0):
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def quat_to_rotmat(q):
    """Quaternion (w, x, y, z), any norm, -> rotation matrix [..., 3, 3].

    Normalizes first, matching torch.nn.functional.normalize + the reference's
    build_rotation semantics.
    """
    q = normalize(q, axis=-1, eps=1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def build_covariance(scaling, rotation_quat):
    """3D covariance Sigma = R S^2 R^T from per-gaussian scales and quats.

    scaling: [..., 3] (already activated, i.e. positive), rotation: [..., 4].
    Mirrors build_scaling_rotation + L @ L.T (general_utils.py:101,
    gaussian_model.py:229-233).
    """
    R = quat_to_rotmat(rotation_quat)
    L = R * scaling[..., None, :]  # R @ diag(s)
    # full f32 precision: on TPU the default matmul precision is bf16, which
    # is far too coarse for covariance geometry
    return jnp.matmul(L, jnp.swapaxes(L, -1, -2), precision="highest")


def strip_symmetric(cov):
    """Pack symmetric 3x3 [...,3,3] into 6 unique coefficients [...,6]
    (order: xx, xy, xz, yy, yz, zz) — matches strip_lowerdiag layout."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]],
        axis=-1,
    )


def unstrip_symmetric(six):
    """Inverse of strip_symmetric: [...,6] -> [...,3,3]."""
    xx, xy, xz, yy, yz, zz = (six[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """Log-linearly interpolated LR schedule with optional delay ramp.

    Continuous analogue of the reference's get_expon_lr_func
    (general_utils.py:29-56): returns 0 when step<0 or both rates are 0.
    Works on python ints or traced arrays.
    """
    step = jnp.asarray(step, dtype=jnp.float32)
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(
        jnp.log(jnp.maximum(lr_init, 1e-30)) * (1 - t)
        + jnp.log(jnp.maximum(lr_final, 1e-30)) * t
    )
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    lr = delay_rate * log_lerp
    valid = (step >= 0) & ((lr_init != 0.0) | (lr_final != 0.0))
    return jnp.where(valid, lr, 0.0)


def pad_to(arr, n, axis=0, value=0):
    """Pad `arr` along `axis` to length n (numpy or jax array)."""
    cur = arr.shape[axis]
    if cur == n:
        return arr
    assert cur < n, f"cannot pad {cur} down to {n}"
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, n - cur)
    if isinstance(arr, np.ndarray):
        return np.pad(arr, widths, constant_values=value)
    return jnp.pad(arr, widths, constant_values=value)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
