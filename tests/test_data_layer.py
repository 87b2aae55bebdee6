"""COLMAP/PLY parser and camera policy unit tests."""
import os
import struct

import numpy as np

from splatco_tpu.data import colmap
from splatco_tpu.data.ply import (fetch_point_cloud, read_ply,
                                  store_point_cloud, write_ply)
from splatco_tpu.data.readers import target_resolution


def _write_synthetic_colmap(tmp_path):
    sparse = tmp_path / "sparse" / "0"
    os.makedirs(sparse)
    # cameras.bin: one PINHOLE camera
    with open(sparse / "cameras.bin", "wb") as fh:
        fh.write(struct.pack("<Q", 1))
        fh.write(struct.pack("<iiQQ", 1, 1, 640, 480))
        fh.write(struct.pack("<dddd", 500.0, 510.0, 320.0, 240.0))
    # images.bin: two images
    with open(sparse / "images.bin", "wb") as fh:
        fh.write(struct.pack("<Q", 2))
        for iid, name in [(1, "a.png"), (2, "b.png")]:
            fh.write(struct.pack("<i", iid))
            fh.write(struct.pack("<dddd", 1.0, 0.0, 0.0, 0.0))
            fh.write(struct.pack("<ddd", 0.1 * iid, 0.2, 0.3))
            fh.write(struct.pack("<i", 1))
            fh.write(name.encode() + b"\x00")
            fh.write(struct.pack("<Q", 2))  # two 2D points
            for j in range(2):
                fh.write(struct.pack("<ddq", 1.0 * j, 2.0 * j, j))
    # points3D.bin: three points
    with open(sparse / "points3D.bin", "wb") as fh:
        fh.write(struct.pack("<Q", 3))
        for pid in range(3):
            fh.write(struct.pack("<Q", pid))
            fh.write(struct.pack("<ddd", pid * 1.0, pid * 2.0, pid * 3.0))
            fh.write(struct.pack("<BBB", 10 * pid, 20, 30))
            fh.write(struct.pack("<d", 0.5))
            fh.write(struct.pack("<Q", 1))  # track of length 1
            fh.write(struct.pack("<ii", 1, 0))
    return sparse


def test_colmap_binary_parsers(tmp_path):
    sparse = _write_synthetic_colmap(tmp_path)
    cams = colmap.read_cameras_binary(str(sparse / "cameras.bin"))
    assert cams[1].model == "PINHOLE"
    assert cams[1].width == 640
    np.testing.assert_allclose(cams[1].params, [500, 510, 320, 240])

    imgs = colmap.read_images_binary(str(sparse / "images.bin"))
    assert len(imgs) == 2
    assert imgs[1].name == "a.png"
    np.testing.assert_allclose(imgs[2].tvec, [0.2, 0.2, 0.3])
    assert imgs[1].xys.shape == (2, 2)
    np.testing.assert_array_equal(imgs[1].point3D_ids, [0, 1])

    xyz, rgb, err = colmap.read_points3d_binary(str(sparse / "points3D.bin"))
    assert xyz.shape == (3, 3)
    np.testing.assert_allclose(xyz[2], [2.0, 4.0, 6.0])
    assert rgb[1].tolist() == [10, 20, 30]


def test_qvec_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = colmap.qvec2rotmat(q)
    q2 = colmap.rotmat2qvec(R)
    np.testing.assert_allclose(q2, q, atol=1e-8)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(10, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, size=(10, 3)).astype(np.uint8)
    path = str(tmp_path / "pc.ply")
    store_point_cloud(path, xyz, rgb)
    pts, cols, norms = fetch_point_cloud(path)
    np.testing.assert_allclose(pts, xyz, atol=1e-6)
    np.testing.assert_allclose(cols * 255, rgb, atol=0.5)

    # generic column roundtrip
    cols_in = {"x": xyz[:, 0], "f_val_0": rng.normal(size=10
                                                     ).astype(np.float32)}
    p2 = str(tmp_path / "generic.ply")
    write_ply(p2, cols_in)
    v = read_ply(p2)
    np.testing.assert_allclose(v["f_val_0"], cols_in["f_val_0"])


def test_resolution_policy():
    # -1 caps width at 1600
    assert target_resolution(3200, 2400, -1) == (1600, 1200)
    assert target_resolution(800, 600, -1) == (800, 600)
    assert target_resolution(800, 600, 2) == (400, 300)
    assert target_resolution(800, 600, 400) == (400, 300)
