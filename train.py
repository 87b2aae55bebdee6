#!/usr/bin/env python
"""SplatCo-TPU training CLI — mirror of the reference train.py surface.

Usage (reference quick-start parity):
    python train.py -s <scene> -m out/run --mv 4 --num_channels 15 \
        --plane_size 2800 --no_downsample --contractor --bbox_scale 0.3 \
        --voxel_size 0 --update_init_factor 16 --appearance_dim 0
"""
import argparse
import sys

from splatco_tpu.config import (ModelConfig, OptimizationConfig,
                                PipelineConfig, add_dataclass_args,
                                extract_dataclass)
from splatco_tpu.data.scene import Scene
from splatco_tpu.train.loop import Trainer, get_logger


def main(argv=None):
    parser = argparse.ArgumentParser(description="SplatCo-TPU training")
    add_dataclass_args(parser, ModelConfig())
    add_dataclass_args(parser, OptimizationConfig())
    add_dataclass_args(parser, PipelineConfig())
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true")
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[3000, 7000, 12000, 17000, 22000, 30000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7000, 30000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[7000, 30000])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--no_downsample", action="store_true")
    parser.add_argument("--no_multilevel", action="store_true")
    parser.add_argument("--no_regularization", action="store_true")
    parser.add_argument("--backend", type=str, default="pallas",
                        choices=["pallas", "dense"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--device", type=str, default="",
                        help="jax platform override (e.g. cpu) — the "
                        "container pins the TPU backend via env, which "
                        "plain env vars cannot undo")
    parser.add_argument("--gui", action="store_true",
                        help="start the network viewer server")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace of the run")
    parser.add_argument("--determinism_check", action="store_true",
                        help="double-run the jitted step periodically and "
                        "require bit-identical results")
    parser.add_argument("--determinism_every", type=int, default=100)
    parser.add_argument("--wandb", action="store_true",
                        help="mirror TB scalars to wandb (if installed)")
    args = parser.parse_args(argv)

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    if args.detect_anomaly:
        import jax

        jax.config.update("jax_debug_nans", True)

    # multi-host runtime: activates when SPLATCO_COORDINATOR /
    # SPLATCO_NUM_PROCESSES are set (parallel/distributed.py); must run
    # before any other jax API touches the backend
    from splatco_tpu.parallel.distributed import init_distributed

    init_distributed()

    model = extract_dataclass(args, ModelConfig)
    opt = extract_dataclass(args, OptimizationConfig)
    pipe = extract_dataclass(args, PipelineConfig)
    if args.no_downsample:
        opt.graph_downsampling_iters = []
    if args.iterations not in args.save_iterations:
        args.save_iterations.append(args.iterations)

    logger = get_logger(model.model_path or ".")
    logger.info(f"args: {vars(args)}")
    logger.info("Optimizing " + model.model_path)

    scene = Scene(model)
    trainer = Trainer(
        model, opt, pipe, backend=args.backend, logger=logger,
        test_iterations=tuple(args.test_iterations),
        save_iterations=tuple(args.save_iterations),
        checkpoint_iterations=tuple(args.checkpoint_iterations),
        no_multilevel=args.no_multilevel,
        no_regularization=args.no_regularization,
        determinism_check=args.determinism_check,
        determinism_every=args.determinism_every,
        use_wandb=args.wandb)
    trainer.setup(scene, seed=args.seed)
    if args.start_checkpoint:
        # "<model_path>/chkpnt<N>" (reference flag), a bare iteration
        # number, or "latest"
        sc = args.start_checkpoint
        if sc == "latest":
            it = -1
        else:
            tail = sc.rsplit("chkpnt", 1)[-1].split(".")[0]
            it = int(tail) if tail.isdigit() else -1
        trainer.restore(iteration=it)
    if args.gui:
        from splatco_tpu.viewer.network_gui import ViewerServer
        trainer.viewer = ViewerServer(trainer, args.ip, args.port)
        trainer.viewer.start()
    if args.profile:
        import jax

        with jax.profiler.trace(
                f"{model.model_path or '.'}/profile_trace"):
            trainer.train()
    else:
        trainer.train()
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
