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
    p.add_argument("--flow", default="farneback",
                   choices=["farneback", "raft"],
                   help="flow estimator: OpenCV Farneback (no weights "
                   "needed) or RAFT (reference parity; needs --weights)")
    p.add_argument("--weights", default=None,
                   help="path to an official RAFT checkpoint "
                   "(raft-things.pth)")
    p.add_argument("--iters", type=int, default=20,
                   help="RAFT refinement iterations")
    p.add_argument("--plot_dir", default=None,
                   help="write per-frame MSE/FLIP curve PNGs here "
                   "(reference plot_figs)")
    args = p.parse_args(argv)
    if args.flow == "raft":
        from splatco_tpu.eval.raft import load_raft_weights, make_flow_fn

        assert args.weights, "--flow raft requires --weights <ckpt.pth>"
        flow_fn = make_flow_fn(load_raft_weights(args.weights),
                               iters=args.iters)
    else:
        from splatco_tpu.eval.popping import flow_farneback as flow_fn
    res = validate_popping(args.render_dir, args.gt_dir,
                           steps=tuple(args.steps), out_json=args.out,
                           flow_fn=flow_fn, plot_dir=args.plot_dir)
    for step, r in res.items():
        print(step, json.dumps(r["aggregate"]))


if __name__ == "__main__":
    main()
