import jax.numpy as jnp
import numpy as np

from splatco_tpu.utils.math import (
    build_covariance,
    expon_lr,
    inverse_sigmoid,
    quat_to_rotmat,
    strip_symmetric,
    unstrip_symmetric,
)


def test_quat_to_rotmat_orthonormal():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(32, 4)).astype(np.float32)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.eye(3, dtype=np.float32)
    for i in range(32):
        np.testing.assert_allclose(R[i] @ R[i].T, eye, atol=1e-5)
        assert np.linalg.det(R[i]) > 0.99


def test_quat_identity():
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(quat_to_rotmat(q))[0], np.eye(3),
                               atol=1e-6)


def test_build_covariance_psd_and_eigvals():
    rng = np.random.default_rng(1)
    s = np.abs(rng.normal(size=(16, 3))).astype(np.float32) + 0.1
    q = rng.normal(size=(16, 4)).astype(np.float32)
    cov = np.asarray(build_covariance(jnp.asarray(s), jnp.asarray(q)))
    for i in range(16):
        ev = np.sort(np.linalg.eigvalsh(cov[i]))
        np.testing.assert_allclose(ev, np.sort(s[i] ** 2), rtol=1e-4,
                                   atol=1e-5)


def test_strip_roundtrip():
    rng = np.random.default_rng(2)
    s = np.abs(rng.normal(size=(8, 3))).astype(np.float32) + 0.1
    q = rng.normal(size=(8, 4)).astype(np.float32)
    cov = build_covariance(jnp.asarray(s), jnp.asarray(q))
    six = strip_symmetric(cov)
    assert six.shape == (8, 6)
    np.testing.assert_allclose(np.asarray(unstrip_symmetric(six)),
                               np.asarray(cov), atol=1e-6)


def test_expon_lr_endpoints():
    lr0 = float(expon_lr(0, 1e-2, 1e-4, max_steps=1000))
    lr_end = float(expon_lr(1000, 1e-2, 1e-4, max_steps=1000))
    assert abs(lr0 - 1e-2) < 1e-8
    assert abs(lr_end - 1e-4) < 1e-8
    # geometric midpoint
    lr_mid = float(expon_lr(500, 1e-2, 1e-4, max_steps=1000))
    assert abs(lr_mid - 1e-3) < 1e-7
    # negative step disables
    assert float(expon_lr(-1, 1e-2, 1e-4, max_steps=1000)) == 0.0


def test_expon_lr_delay():
    full = float(expon_lr(10, 1e-2, 1e-4, lr_delay_steps=0, max_steps=1000))
    delayed = float(expon_lr(10, 1e-2, 1e-4, lr_delay_steps=100,
                             lr_delay_mult=0.01, max_steps=1000))
    assert delayed < full


def test_inverse_sigmoid():
    x = jnp.array([0.1, 0.5, 0.9])
    y = inverse_sigmoid(x)
    np.testing.assert_allclose(np.asarray(1 / (1 + np.exp(-y))),
                               np.asarray(x), atol=1e-6)
