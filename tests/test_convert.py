"""convert.py orchestration test — verifies the COLMAP preprocessing
pipeline issues the reference's command sequence
(/root/reference/convert.py) without requiring colmap/ImageMagick:
shim executables log their argv and fabricate the outputs the next
stage expects."""
import os
import stat
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import convert  # noqa: E402


def _write_shim(path, log_path, script_body=""):
    with open(path, "w") as fh:
        fh.write("#!/bin/sh\n"
                 f'echo "$(basename $0) $@" >> {log_path}\n'
                 + script_body + "\nexit 0\n")
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


def test_convert_command_sequence(tmp_path):
    src = tmp_path / "scene"
    (src / "input").mkdir(parents=True)
    (src / "images").mkdir()
    for name in ("a.jpg", "b.jpg"):
        (src / "input" / name).write_bytes(b"fake")
        (src / "images" / name).write_bytes(b"fake")
    log = tmp_path / "cmds.log"

    # colmap shim: image_undistorter must create sparse/ files that the
    # driver then moves into sparse/0
    colmap = tmp_path / "colmap"
    _write_shim(
        str(colmap), str(log),
        script_body=(
            'if [ "$1" = "image_undistorter" ]; then\n'
            f'  mkdir -p {src}/sparse\n'
            f'  touch {src}/sparse/cameras.bin {src}/sparse/images.bin '
            f'{src}/sparse/points3D.bin\n'
            "fi"))
    magick = tmp_path / "magick"
    _write_shim(str(magick), str(log))

    convert.main(["-s", str(src), "--no_gpu", "--resize",
                  "--colmap_executable", str(colmap),
                  "--magick_executable", str(magick)])

    cmds = log.read_text().strip().splitlines()
    stages = [c.split()[1] for c in cmds if c.startswith("colmap ")]
    assert stages == ["feature_extractor", "exhaustive_matcher", "mapper",
                      "image_undistorter"]
    # --no_gpu propagates
    fe = next(c for c in cmds if "feature_extractor" in c)
    assert "--SiftExtraction.use_gpu 0" in fe
    assert "--ImageReader.camera_model OPENCV" in fe
    # undistorted sparse files moved into sparse/0 (reference :76-84)
    for f in ("cameras.bin", "images.bin", "points3D.bin"):
        assert (src / "sparse" / "0" / f).exists()
    # resize stage: 2x/4x/8x image dirs populated, one mogrify per image
    for factor in (2, 4, 8):
        d = src / f"images_{factor}"
        assert sorted(os.listdir(d)) == ["a.jpg", "b.jpg"]
    mog = [c for c in cmds if c.startswith("magick mogrify")]
    assert len(mog) == 6
    assert any("-resize 50%" in c for c in mog)
    assert any("-resize 12.5%" in c for c in mog)


def test_convert_skip_matching(tmp_path):
    src = tmp_path / "scene2"
    (src / "input").mkdir(parents=True)
    (src / "images").mkdir()
    (src / "distorted" / "sparse" / "0").mkdir(parents=True)
    log = tmp_path / "cmds.log"
    colmap = tmp_path / "colmap"
    _write_shim(
        str(colmap), str(log),
        script_body=(
            'if [ "$1" = "image_undistorter" ]; then\n'
            f'  mkdir -p {src}/sparse\n'
            f'  touch {src}/sparse/cameras.bin\nfi'))
    convert.main(["-s", str(src), "--skip_matching",
                  "--colmap_executable", str(colmap)])
    cmds = log.read_text().strip().splitlines()
    stages = [c.split()[1] for c in cmds]
    assert stages == ["image_undistorter"]
