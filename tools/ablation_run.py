#!/usr/bin/env python
"""Ablation evidence for the three SplatCo novelties (VERDICT r03 #6).

Runs FOUR short trainings with identical seed/config on the same scene:
baseline, -CSCM levels (no_multilevel), -SVC consistency (no_consistency),
-CVPM (no_cvpm), and writes ABLATION_r{N}.json with final test metrics and
deltas vs baseline.  Matches the claims at /root/reference/README.md:2-6
(fig_ablation): each mechanism should not hurt, and the deltas quantify
what it buys at this scale.

    python tools/ablation_run.py --iterations 2000 --out ABLATION_r04.json
"""
import argparse
import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import quality_run


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=2000)
    ap.add_argument("--scene", default="/tmp/ablation_scene")
    ap.add_argument("--out", default="ABLATION_r04.json")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--device", default="")
    ap.add_argument("--views", type=int, default=28)
    ap.add_argument("--points", type=int, default=1200)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=224)
    ap.add_argument("--arc_period", type=int, default=3)
    ap.add_argument("--hard", action="store_true",
                    help="run the ablations on the HARD protocol scene "
                    "(sparse init, close-in cameras) where CVPM/densify "
                    "are active — required for a nonzero no_cvpm delta")
    ap.add_argument("--variants",
                    default="baseline,no_multilevel,no_consistency,"
                    "no_cvpm",
                    help="comma list, run in order; the JSON is written "
                    "INCREMENTALLY after each variant so a wall-clock cut "
                    "still leaves the completed pairs on disk")
    args = ap.parse_args(argv)

    all_variants = {
        "baseline": [],
        "no_multilevel": ["--no_multilevel"],
        "no_consistency": ["--no_consistency"],
        "no_cvpm": ["--no_cvpm"],
    }
    variants = [(n, all_variants[n])
                for n in args.variants.split(",") if n]

    def write_payload(results):
        if "baseline" in results:
            base = results["baseline"]["final_test"]
            for name in results:
                if name == "baseline":
                    continue
                ft = results[name]["final_test"]
                results[name]["delta_vs_baseline"] = {
                    k: round(base[k] - ft[k], 4) for k in ft
                }  # delta = baseline - ablated; sign depends on the
                # metric's direction (PSNR/SSIM: positive = mechanism
                # helps; FLIP: lower is better, negative = helps)
        payload = {
            "config": {"iterations": args.iterations,
                       "views": args.views, "points": args.points,
                       "resolution": [args.height, args.width],
                       "backend": args.backend, "seed": 0,
                       "hard_protocol": args.hard},
            "note": ("delta_vs_baseline = baseline - ablated, per "
                     "metric; positive PSNR/SSIM delta (or negative "
                     "FLIP delta) means removing the mechanism hurt, "
                     "i.e. the mechanism helps"),
            "variants": results,
        }
        with open(args.out, "w") as fh:
            json.dump(payload, fh, indent=2)
        return payload

    results = {}
    for name, flags in variants:
        out_json = f"/tmp/ablation_{name}.json"
        model = f"/tmp/ablation_out_{name}"
        argv_run = [
            "--iterations", str(args.iterations),
            "--scene", args.scene, "--model", model, "--out", out_json,
            "--backend", args.backend, "--views", str(args.views),
            "--points", str(args.points), "--width", str(args.width),
            "--height", str(args.height), "--skip_artifacts",
            "--arc_period", str(args.arc_period),
        ] + flags + (["--hard"] if args.hard else [])
        if args.device:
            argv_run += ["--device", args.device]
        print(f"=== ablation variant: {name} ===", flush=True)
        quality_run.main(argv_run)
        with open(out_json) as fh:
            run = json.load(fh)
        results[name] = {
            "final_test": run["final_test"],
            "anchors_final": run["anchors_final"],
            "wall_seconds": run["wall_seconds"],
        }
        # hard-protocol dynamics evidence: what the mechanism actually
        # DID in this variant (cvpm_pruned sums the per-event marks)
        ev = [e for e in run.get("trajectory", [])
              if isinstance(e, dict) and "densify_grown" in e]
        if ev:
            results[name]["dynamics"] = {
                "grown": sum(e["densify_grown"] for e in ev),
                "pruned": sum(e["densify_pruned"] for e in ev),
                "cvpm_marked": sum(e.get("cvpm_marked", 0) for e in ev),
            }
        payload = write_payload(results)

    print(json.dumps(payload["variants"], indent=1))


if __name__ == "__main__":
    main()
