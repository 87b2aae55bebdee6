"""Quality metrics driver — the reference metrics.py equivalent.

Computes PSNR / SSIM / LPIPS(VGG) / FLIP over renders vs GT and writes
results.json + per_view.json (metrics.py:38-109).  LPIPS requires local
weights (see ops/lpips.py); when unavailable it is reported as null.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from splatco_tpu.ops import lpips as lpips_lib
from splatco_tpu.ops.flip import ldr_flip
from splatco_tpu.ops.losses import psnr, ssim


def read_images(renders_dir: str, gt_dir: str):
    from PIL import Image

    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        r = np.asarray(Image.open(os.path.join(renders_dir, fname)),
                       np.float32) / 255.0
        g = np.asarray(Image.open(os.path.join(gt_dir, fname)),
                       np.float32) / 255.0
        renders.append(r.transpose(2, 0, 1)[:3])
        gts.append(g.transpose(2, 0, 1)[:3])
        names.append(fname)
    return renders, gts, names


def evaluate_dir(test_dir: str, lpips_weights: Optional[str] = None
                 ) -> Dict:
    """Evaluate every method (ours_N) under a scene's test/ directory."""
    full, per_view = {}, {}
    weights = lpips_lib.load_weights(lpips_weights)
    for method in sorted(os.listdir(test_dir)):
        mdir = os.path.join(test_dir, method)
        if not os.path.isdir(mdir):
            continue
        renders, gts, names = read_images(os.path.join(mdir, "renders"),
                                          os.path.join(mdir, "gt"))
        ssims, psnrs, lpipss, flips = [], [], [], []
        for r, g in zip(renders, gts):
            rj, gj = jnp.asarray(r), jnp.asarray(g)
            ssims.append(float(ssim(rj, gj)))
            psnrs.append(float(psnr(rj, gj).mean()))
            flips.append(float(ldr_flip(rj, gj)))
            if weights is not None:
                lpipss.append(float(lpips_lib.lpips(weights, rj, gj)))
        full[method] = {
            "SSIM": float(np.mean(ssims)),
            "PSNR": float(np.mean(psnrs)),
            "LPIPS": float(np.mean(lpipss)) if lpipss else None,
            "FLIP": float(np.mean(flips)),
        }
        per_view[method] = {
            "SSIM": dict(zip(names, ssims)),
            "PSNR": dict(zip(names, psnrs)),
            "LPIPS": dict(zip(names, lpipss)) if lpipss else None,
            "FLIP": dict(zip(names, flips)),
        }
        print(f"  {method}: PSNR {full[method]['PSNR']:.4f} "
              f"SSIM {full[method]['SSIM']:.4f} "
              f"FLIP {full[method]['FLIP']:.4f} "
              f"LPIPS {full[method]['LPIPS']}")
    return {"full": full, "per_view": per_view}


def evaluate(model_paths: List[str], lpips_weights: Optional[str] = None
             ) -> Dict:
    out = {}
    for scene_dir in model_paths:
        print(f"Scene: {scene_dir}")
        res = evaluate_dir(os.path.join(scene_dir, "test"), lpips_weights)
        ng_path = os.path.join(scene_dir, "num_gaussians.json")
        if os.path.exists(ng_path):
            with open(ng_path) as fh:
                res["num_gaussians"] = json.load(fh)
        with open(os.path.join(scene_dir, "results.json"), "w") as fh:
            json.dump(res["full"], fh, indent=2)
        with open(os.path.join(scene_dir, "per_view.json"), "w") as fh:
            json.dump(res["per_view"], fh, indent=2)
        out[scene_dir] = res
    return out
