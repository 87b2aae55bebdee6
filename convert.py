#!/usr/bin/env python
"""COLMAP preprocessing driver — reference convert.py surface.

Runs: feature extraction -> exhaustive matching -> mapper -> image
undistortion (to PINHOLE), then optional 2x/4x/8x resized image sets.
Requires the `colmap` CLI (and ImageMagick's `magick`/`mogrify` for
--resize) on PATH.
"""
import argparse
import logging
import os
import shutil
import subprocess
import sys


def run(cmd: str) -> None:
    code = os.system(cmd)
    if code != 0:
        logging.error(f"command failed ({code}): {cmd}")
        sys.exit(code)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--no_gpu", action="store_true")
    p.add_argument("--skip_matching", action="store_true")
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--camera", default="OPENCV")
    p.add_argument("--colmap_executable", default="")
    p.add_argument("--resize", action="store_true")
    p.add_argument("--magick_executable", default="")
    args = p.parse_args(argv)

    colmap = (f'"{args.colmap_executable}"' if args.colmap_executable
              else "colmap")
    magick = (f'"{args.magick_executable}"' if args.magick_executable
              else "magick")
    use_gpu = 0 if args.no_gpu else 1
    src = args.source_path

    if not args.skip_matching:
        os.makedirs(f"{src}/distorted/sparse", exist_ok=True)
        run(f"{colmap} feature_extractor "
            f"--database_path {src}/distorted/database.db "
            f"--image_path {src}/input "
            f"--ImageReader.single_camera 1 "
            f"--ImageReader.camera_model {args.camera} "
            f"--SiftExtraction.use_gpu {use_gpu}")
        run(f"{colmap} exhaustive_matcher "
            f"--database_path {src}/distorted/database.db "
            f"--SiftMatching.use_gpu {use_gpu}")
        run(f"{colmap} mapper "
            f"--database_path {src}/distorted/database.db "
            f"--image_path {src}/input "
            f"--output_path {src}/distorted/sparse "
            f"--Mapper.ba_global_function_tolerance=0.000001")

    run(f"{colmap} image_undistorter "
        f"--image_path {src}/input "
        f"--input_path {src}/distorted/sparse/0 "
        f"--output_path {src} --output_type COLMAP")

    files = os.listdir(f"{src}/sparse")
    os.makedirs(f"{src}/sparse/0", exist_ok=True)
    for f in files:
        if f == "0":
            continue
        shutil.move(os.path.join(src, "sparse", f),
                    os.path.join(src, "sparse", "0", f))

    if args.resize:
        print("Copying and resizing...")
        for factor, pct in ((2, 50), (4, 25), (8, 12.5)):
            out = f"{src}/images_{factor}"
            os.makedirs(out, exist_ok=True)
            for f in os.listdir(f"{src}/images"):
                shutil.copy2(os.path.join(src, "images", f),
                             os.path.join(out, f))
                run(f"{magick} mogrify -resize {pct}% "
                    f"{os.path.join(out, f)}")
    print("Done.")


if __name__ == "__main__":
    main()
