#!/usr/bin/env python
"""Finalize a quality run from its last saved checkpoint.

The canonical protocol (tools/quality_run.py) writes RESULTS only when
training completes; its exact-resume checkpoints land at every eval
iteration.  If a run is cut short (wall-clock budget, preemption), this
tool restores the newest checkpoint and emits the same RESULTS payload —
final test metrics, offline artifacts, and the training trajectory
parsed from the run log — marked with `finalized_from_checkpoint`.

    python tools/finalize_quality_run.py --scene /tmp/hard_scene_r05 \
        --model /tmp/hard_out_r05 --log /tmp/qrun.log --out RESULTS_r05.json
"""
import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_trajectory(log_path):
    """Trainer progress lines -> trajectory records (the same fields
    Trainer.metrics_log carries for the completed-run payload)."""
    traj, events = [], []
    pat_it = re.compile(
        r"\[ITER (\d+)\] loss ([\d.]+) anchors (\d+) step_ms (\d+)")
    pat_ev = re.compile(
        r"\[ITER (\d+)\] eval (test|train): L1 ([\d.]+) PSNR ([\d.]+) "
        r"SSIM ([\d.]+)")
    pat_d = re.compile(
        r"\[ITER (\d+)\] densify: \+(\d+) -(\d+) \(cvpm marked (\d+), "
        r"dropped (\d+)\) -> (\d+) anchors")
    pat_g = re.compile(r"growing anchor capacity -> (\d+)")
    for line in open(log_path, errors="replace"):
        m = pat_it.search(line)
        if m:
            traj.append({"iteration": int(m.group(1)),
                         "loss": float(m.group(2)),
                         "anchors": int(m.group(3)),
                         "step_ms": int(m.group(4))})
        m = pat_ev.search(line)
        if m:
            events.append({"iteration": int(m.group(1)),
                           "split": m.group(2),
                           "l1": float(m.group(3)),
                           "psnr": float(m.group(4)),
                           "ssim": float(m.group(5))})
        m = pat_d.search(line)
        if m:
            events.append({"iteration": int(m.group(1)),
                           "densify_grown": int(m.group(2)),
                           "densify_pruned": int(m.group(3)),
                           "cvpm_marked": int(m.group(4)),
                           "densify_dropped": int(m.group(5)),
                           "anchors_after": int(m.group(6))})
        m = pat_g.search(line)
        if m:
            events.append({"capacity_regrow": int(m.group(1))})
    return traj, events


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True)
    ap.add_argument("--model", required=True)
    ap.add_argument("--log", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--iterations", type=int, default=15000,
                    help="the run's PLANNED length (cadence scaling)")
    ap.add_argument("--views", type=int, default=28)
    ap.add_argument("--points", type=int, default=3500)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=224)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--skip_artifacts", action="store_true")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    import quality_run as qr
    from splatco_tpu.config import (ModelConfig, OptimizationConfig,
                                    PipelineConfig)
    from splatco_tpu.data.scene import Scene
    from splatco_tpu.models.renderer import prefilter_voxel, render
    from splatco_tpu.models.splatco import decode_kwargs
    from splatco_tpu.ops.flip import ldr_flip
    from splatco_tpu.ops.losses import psnr, ssim
    from splatco_tpu.train.loop import Trainer

    it_total = args.iterations
    cfg = ModelConfig(source_path=args.scene, model_path=args.model,
                      feat_dim=32, n_offsets=10, voxel_size=0.01,
                      plane_size=512, num_channels=9, appearance_dim=0,
                      contractor=True, white_background=True, eval=True)
    opt = OptimizationConfig(iterations=it_total)
    opt.graph_downsampling_iters = []
    scale = it_total / 30000.0
    opt.start_stat = max(int(500 * scale), 10)
    opt.update_from = max(int(1500 * scale), 20)
    opt.update_until = max(int(15000 * scale), 200)
    for f in ("position_lr_max_steps", "offset_lr_max_steps",
              "mlp_opacity_lr_max_steps", "mlp_cov_lr_max_steps",
              "mlp_color_lr_max_steps"):
        setattr(opt, f, it_total)
    act1 = max(int(12000 * scale), 100)
    act2 = max(int(21000 * scale), 200)
    tests = sorted({max(int(f * scale), 1) for f in
                    (3000, 7000, 12000, 17000, 22000, 30000)} | {it_total})
    pipe = PipelineConfig(mv=4)
    scene = Scene(cfg, shuffle=False)
    tr = Trainer(cfg, opt, pipe, backend=args.backend,
                 test_iterations=tuple(tests),
                 save_iterations=(it_total,),
                 checkpoint_iterations=tuple(tests),
                 activation_iterations=(act1, act2))
    tr.setup(scene, seed=0)
    restored = tr.restore()
    print(f"restored checkpoint at iteration {restored}")

    bg = tr._bg()
    dkw = decode_kwargs(cfg)
    finals = {"psnr": [], "ssim": [], "flip": []}
    for cam in scene.test_cameras():
        vis = prefilter_voxel(tr.params["anchors"], tr.mstate.active, cam)
        out = render(tr.params, tr.mstate.active, tr.mstate.contractor,
                     cam, bg, visible_mask=vis,
                     activate_level=tr.activate_level, is_training=False,
                     kmax=cfg.kmax, kmax_pack=tr.kmax_pack,
                     class_spec=tr.class_spec, backend=args.backend,
                     **dkw)
        img = jnp.clip(out.image, 0, 1)
        gt = jnp.clip(cam.image, 0, 1)
        finals["psnr"].append(float(psnr(img, gt).mean()))
        finals["ssim"].append(float(ssim(img, gt)))
        finals["flip"].append(float(ldr_flip(img, gt)))

    artifacts = None
    if not args.skip_artifacts:
        try:
            artifacts = qr.offline_artifacts(cfg, scene, tr, args)
        except Exception as e:
            artifacts = {"error": f"{type(e).__name__}: {e}"}

    traj, events = parse_trajectory(args.log)
    payload = {
        "config": {
            "iterations": it_total, "backend": args.backend,
            "mv": pipe.mv, "views": args.views, "points": args.points,
            "resolution": [args.height, args.width],
            "activation_iterations": [act1, act2],
            "densify_window": [opt.update_from, opt.update_until],
            "graph_downsampling_iters": [],
            "hard_protocol": True,
        },
        "finalized_from_checkpoint": restored,
        "offline_artifacts": artifacts,
        "final_test": {k: float(np.mean(v)) for k, v in finals.items()},
        "final_test_per_view": finals,
        "anchors_final": int(np.asarray(tr.mstate.active).sum()),
        "kmax_pack_final": tr.kmax_pack,
        "class_spec_final": (None if tr.class_spec is None
                             else [list(p) for p in tr.class_spec]),
        "trajectory": traj,
        "events": events,
    }
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=2)
    print(json.dumps({"final_test": payload["final_test"],
                      "anchors": payload["anchors_final"],
                      "restored_iteration": restored}))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
