"""Worker for the 2-process multi-host test (spawned by
test_multihost.py, one per virtual host).  Runs one sharded SVC train
step over a (2 view, 2 gauss) mesh whose view axis spans the two
processes, with per-host GT sharding, and prints the resulting metrics.

Usage: python _mh_worker.py <process_id> <port>
"""
import os
import sys


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        .replace("--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from splatco_tpu.parallel.distributed import (init_distributed,
                                                  local_view_rows,
                                                  make_multihost_mesh,
                                                  make_view_array,
                                                  place_host_sharded)

    assert init_distributed(coordinator=f"localhost:{port}",
                            num_processes=2, process_id=pid)
    assert jax.device_count() == 4 and jax.local_device_count() == 2

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_parallel import build

    from splatco_tpu.parallel.train_step import (make_sharded_train_step,
                                                 stack_cameras)
    from splatco_tpu.train.step import init_stats

    n_view, n_gauss = 2, 2
    cfg, opt, params, state, tx, opt_state, cams, gts = build(
        n_view, n_gauss)
    mesh = make_multihost_mesh(n_view, n_gauss)
    rows = local_view_rows(mesh)
    assert len(rows) == 1, rows
    # per-host camera/GT sharding: this process materializes only its rows
    cam_stack = stack_cameras(cams)
    cam_stack = jax.tree.map(
        lambda leaf: make_view_array(mesh, np.asarray(leaf)[rows]),
        cam_stack)
    gts_g = make_view_array(mesh, np.asarray(gts)[rows])
    stats = init_stats(params["anchors"]["anchor"].shape[0], cfg.n_offsets)
    params_s, active_s, stats_s = place_host_sharded(
        mesh, params, state.active, stats)

    step = make_sharded_train_step(cfg, opt, mesh, tx, backend="dense")
    p2, o2, st2, metrics = step(
        params_s, opt_state, active_s, state.contractor, stats_s,
        cam_stack, gts_g, jax.random.key(1), jnp.float32(1.0),
        jnp.float32(0.0), jnp.float32(1.0))
    # metrics are replicated: every process can read them
    print(f"MH pid={pid} loss={float(metrics['loss']):.6f} "
          f"l1={float(metrics['l1']):.6f} "
          f"demon={float(jnp.sum(st2.anchor_demon)):.3f}", flush=True)


if __name__ == "__main__":
    main()
