#!/usr/bin/env python
"""Metrics CLI — reference metrics.py surface (PSNR/SSIM/LPIPS/FLIP)."""
import argparse

from splatco_tpu.eval.metrics_driver import evaluate


def main(argv=None):
    parser = argparse.ArgumentParser(description="SplatCo-TPU metrics")
    parser.add_argument("--model_paths", "-m", nargs="+", required=True)
    parser.add_argument("--lpips_weights", type=str, default=None,
                        help=".npz from tools/export_lpips_weights.py")
    parser.add_argument("--device", type=str, default="",
                        help="jax platform override (e.g. cpu)")
    args = parser.parse_args(argv)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    evaluate(args.model_paths, args.lpips_weights)


if __name__ == "__main__":
    main()
