#!/usr/bin/env python
"""Offline render CLI — reference render.py surface (FPS + per-view PNGs)."""
import argparse

from splatco_tpu.config import (ModelConfig, add_dataclass_args,
                                combined_config)
from splatco_tpu.eval.render_driver import render_sets


def main(argv=None):
    parser = argparse.ArgumentParser(description="SplatCo-TPU rendering")
    add_dataclass_args(parser, ModelConfig())
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--backend", type=str, default="pallas",
                        choices=["pallas", "dense"])
    parser.add_argument("--device", type=str, default="",
                        help="jax platform override (e.g. cpu)")
    args = parser.parse_args(argv)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    model, _pipe, _opt = combined_config(args)
    print("Rendering " + model.model_path)
    fps, n = render_sets(model, args.iteration, args.skip_train,
                         args.skip_test, backend=args.backend)
    print(f"anchors: {n}, fps: {fps}")


if __name__ == "__main__":
    main()
