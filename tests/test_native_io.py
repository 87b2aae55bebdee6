"""Native C++ COLMAP parsers vs the pure-python implementations."""
import os
import struct
import subprocess

import numpy as np
import pytest

from splatco_tpu.data import colmap, native_io

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not native_io.available():
        subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                       check=True, capture_output=True)
        native_io._lib = None
    assert native_io.available()


def _write_files(tmp_path):
    rng = np.random.default_rng(0)
    p3d = tmp_path / "points3D.bin"
    with open(p3d, "wb") as fh:
        n = 500
        fh.write(struct.pack("<Q", n))
        for i in range(n):
            fh.write(struct.pack("<Q", i))
            fh.write(struct.pack("<ddd", *rng.normal(size=3)))
            fh.write(struct.pack("<BBB", *rng.integers(0, 255, 3)))
            fh.write(struct.pack("<d", rng.uniform()))
            t = int(rng.integers(0, 5))
            fh.write(struct.pack("<Q", t))
            fh.write(b"\0" * (8 * t))
    imgs = tmp_path / "images.bin"
    with open(imgs, "wb") as fh:
        fh.write(struct.pack("<Q", 4))
        for i in range(4):
            fh.write(struct.pack("<i", i + 1))
            q = rng.normal(size=4)
            fh.write(struct.pack("<dddd", *q))
            fh.write(struct.pack("<ddd", i, 2 * i, 3 * i))
            fh.write(struct.pack("<i", 1))
            fh.write(f"frame_{i:04d}.jpg".encode() + b"\0")
            np2 = int(rng.integers(0, 6))
            fh.write(struct.pack("<Q", np2))
            for j in range(np2):
                fh.write(struct.pack("<ddq", j * 1.5, j + 0.5, j))
    return str(p3d), str(imgs)


def test_points3d_matches_python(tmp_path):
    p3d, _ = _write_files(tmp_path)
    a = native_io.read_points3d(p3d)
    b = colmap.read_points3d_binary(p3d)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64))


def test_images_match_python(tmp_path):
    _, imgs = _write_files(tmp_path)
    ia = native_io.read_images(imgs)
    ib = colmap.read_images_binary(imgs)
    assert set(ia) == set(ib)
    for k in ia:
        assert ia[k].name == ib[k].name
        assert ia[k].camera_id == ib[k].camera_id
        np.testing.assert_allclose(ia[k].qvec, ib[k].qvec)
        np.testing.assert_allclose(ia[k].tvec, ib[k].tvec)
        np.testing.assert_allclose(ia[k].xys, ib[k].xys)
        np.testing.assert_array_equal(ia[k].point3D_ids,
                                      ib[k].point3D_ids)
