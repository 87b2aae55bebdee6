#!/usr/bin/env python
"""Popping-detection CLI — reference popping_detection/detect_popping.py
surface (temporal flow-warped consistency over a render stream)."""
import argparse
import json

from splatco_tpu.eval.popping import validate_popping


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--render_dir", required=True,
                   help="directory of ordered rendered frames")
    p.add_argument("--gt_dir", default=None,
                   help="optional GT frame stream for calibration")
    p.add_argument("--steps", nargs="+", type=int, default=[1, 7])
    p.add_argument("--out", default="popping_results.json")
    args = p.parse_args(argv)
    res = validate_popping(args.render_dir, args.gt_dir,
                           steps=tuple(args.steps), out_json=args.out)
    for step, r in res.items():
        print(step, json.dumps(r["aggregate"]))


if __name__ == "__main__":
    main()
