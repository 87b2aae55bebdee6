"""Popping detection — temporal view-consistency evaluation.

Reference: /root/reference/popping_detection/ (detect_popping.py:113-268):
compute optical flow forward+backward between frames t and t+step, detect
occlusions via forward-backward consistency (Ruder et al., GCPR'16), warp
frame t to t+step, and score the occlusion-masked MSE and FLIP between the
warped prediction and the actual frame — separately for the renders and
the GT stream; popping shows up as render-stream error exceeding
GT-stream error.

The reference uses RAFT with downloaded weights; this environment has zero
egress, so the flow estimator is pluggable: OpenCV Farneback by default
(always available), or any callable `flow(a, b) -> [H,W,2]` (e.g. a
RAFT port with local weights).
"""
from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

import numpy as np

from splatco_tpu.ops.flip import ldr_flip_error_map

FlowFn = Callable[[np.ndarray, np.ndarray], np.ndarray]


def flow_farneback(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Dense optical flow a->b; inputs [H,W,3] float in [0,1]."""
    import cv2

    ga = cv2.cvtColor((a * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    gb = cv2.cvtColor((b * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    return cv2.calcOpticalFlowFarneback(
        ga, gb, None, pyr_scale=0.5, levels=4, winsize=21, iterations=3,
        poly_n=7, poly_sigma=1.5, flags=0)


def warp_with_flow(img: np.ndarray, flow: np.ndarray) -> np.ndarray:
    """Backward-warp img by flow: out(x) = img(x + flow(x));
    img [H,W,C], flow [H,W,2]."""
    import cv2

    h, w = flow.shape[:2]
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    map_x = (gx + flow[..., 0]).astype(np.float32)
    map_y = (gy + flow[..., 1]).astype(np.float32)
    return cv2.remap(img.astype(np.float32), map_x, map_y,
                     cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE)


def detect_occlusion(flow_fwd: np.ndarray, flow_bwd: np.ndarray
                     ) -> np.ndarray:
    """Occlusion/disocclusion mask (True = valid, not occluded) via the
    forward-backward consistency test of Ruder et al. (the reference's
    occlusion_utils.detect_occlusion)."""
    bwd_warped = warp_with_flow(flow_bwd, flow_fwd)
    fb = flow_fwd + bwd_warped
    fb_mag = (fb**2).sum(-1)
    mag = (flow_fwd**2).sum(-1) + (bwd_warped**2).sum(-1)
    occluded = fb_mag > 0.01 * mag + 0.5
    return ~occluded


def frame_popping_error(prev: np.ndarray, cur: np.ndarray,
                        flow_fn: FlowFn = flow_farneback) -> Dict:
    """Masked MSE + FLIP between flow-warped prev and cur ([H,W,3])."""
    import jax.numpy as jnp

    fwd = flow_fn(cur, prev)   # cur -> prev (backward warp field)
    bwd = flow_fn(prev, cur)
    valid = detect_occlusion(fwd, bwd)
    warped = warp_with_flow(prev, fwd)
    diff = ((warped - cur) ** 2).mean(-1)
    n_valid = max(valid.sum(), 1)
    mse = float((diff * valid).sum() / n_valid)
    flip_map = np.asarray(ldr_flip_error_map(
        jnp.asarray(warped.transpose(2, 0, 1)),
        jnp.asarray(cur.transpose(2, 0, 1))))
    flip = float((flip_map * valid).sum() / n_valid)
    return {"mse": mse, "flip": flip,
            "valid_frac": float(valid.mean())}


def plot_popping(results: Dict, out_dir: str) -> None:
    """Per-frame MSE/FLIP curves, one figure per step (reference
    plot_figs, /root/reference/popping_detection/detect_popping.py:65-88:
    render in red, gt in green)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    for key, res in results.items():
        step = key.split("_")[-1]
        frames = res["frames"]
        xs = [e["frame"] for e in frames]
        fig, axes = plt.subplots(1, 2, figsize=(16, 9))
        fig.suptitle(f"Metrics, step = {step}")
        for ax, metric in zip(axes, ("mse", "flip")):
            ax.set_title(metric.upper())
            ax.plot(xs, [e["render"][metric] for e in frames],
                    color="red", label="render", alpha=0.75)
            if frames and "gt" in frames[0]:
                ax.plot(xs, [e["gt"][metric] for e in frames],
                        color="green", label="gt", alpha=0.75)
            ax.legend()
        fig.savefig(os.path.join(out_dir, f"test_all_step_{step}.png"),
                    bbox_inches="tight")
        plt.close(fig)


def validate_popping(render_dir: str, gt_dir: Optional[str] = None,
                     steps: tuple = (1, 7),
                     flow_fn: FlowFn = flow_farneback,
                     out_json: Optional[str] = None,
                     plot_dir: Optional[str] = None) -> Dict:
    """Evaluate temporal consistency of an ordered frame directory
    (optionally against a GT stream for calibration)."""
    from PIL import Image

    def load(d):
        frames = []
        for f in sorted(os.listdir(d)):
            if f.lower().endswith((".png", ".jpg")):
                frames.append(np.asarray(Image.open(os.path.join(d, f)),
                                         np.float32)[..., :3] / 255.0)
        return frames

    renders = load(render_dir)
    gts = load(gt_dir) if gt_dir else None
    results = {}
    for step in steps:
        per_frame = []
        for t in range(len(renders) - step):
            entry = {"frame": t}
            entry["render"] = frame_popping_error(renders[t],
                                                  renders[t + step],
                                                  flow_fn)
            if gts:
                entry["gt"] = frame_popping_error(gts[t], gts[t + step],
                                                  flow_fn)
            per_frame.append(entry)
        agg = {
            "mean_mse": float(np.mean([e["render"]["mse"]
                                       for e in per_frame])),
            "mean_flip": float(np.mean([e["render"]["flip"]
                                        for e in per_frame])),
        }
        if gts:
            agg["gt_mean_mse"] = float(np.mean([e["gt"]["mse"]
                                                for e in per_frame]))
            agg["gt_mean_flip"] = float(np.mean([e["gt"]["flip"]
                                                 for e in per_frame]))
        results[f"step_{step}"] = {"aggregate": agg, "frames": per_frame}
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(results, fh, indent=2)
    if plot_dir:
        plot_popping(results, plot_dir)
    return results
