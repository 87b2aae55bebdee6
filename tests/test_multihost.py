"""Multi-host runtime (parallel/distributed.py): mesh factory unit tests
on the 8-device virtual mesh, plus a REAL 2-process CPU topology running
one sharded train step with per-host GT sharding and comparing against
the single-process result."""
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from splatco_tpu.parallel.distributed import (local_view_rows,
                                              make_multihost_mesh)

pytestmark = pytest.mark.slow


def test_mesh_factory_single_process():
    """Single-process fallback: the multihost mesh over the 8 virtual
    devices equals the plain mesh; every view row is local."""
    mesh = make_multihost_mesh(4, 2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("view", "gauss")
    assert local_view_rows(mesh) == [0, 1, 2, 3]
    with pytest.raises(AssertionError):
        make_multihost_mesh(4, 4)  # 16 != 8 devices


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_step_matches_single(tmp_path):
    """Spawn two coordinator-connected CPU processes (2 local devices
    each), run the sharded step over the (view=2 x gauss=2) cross-host
    mesh, and require both hosts to agree with the single-process
    4-device run bit-for-bit-ish."""
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "_mh_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=here) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    vals = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("MH pid=")]
        assert line, out[-2000:]
        parts = dict(kv.split("=") for kv in line[0].split()[1:])
        vals[int(parts["pid"])] = (float(parts["loss"]),
                                   float(parts["l1"]),
                                   float(parts["demon"]))
    assert vals[0] == vals[1], vals  # replicated metrics agree across hosts

    # single-process reference on the same (2 view, 2 gauss) topology
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    import jax.numpy as jnp

    from splatco_tpu.parallel.mesh import make_mesh
    from splatco_tpu.parallel.train_step import (make_sharded_train_step,
                                                 stack_cameras)
    from splatco_tpu.train.step import init_stats
    from test_parallel import build, place

    cfg, opt, params, state, tx, opt_state, cams, gts = build(2, 2)
    mesh = make_mesh(2, 2)
    params_s, active, stats_s = place(mesh, params, state, cfg)
    step = make_sharded_train_step(cfg, opt, mesh, tx, backend="dense")
    _, _, st2, metrics = step(
        params_s, opt_state, active, state.contractor, stats_s,
        stack_cameras(cams), gts, jax.random.key(1), jnp.float32(1.0),
        jnp.float32(0.0), jnp.float32(1.0))
    np.testing.assert_allclose(vals[0][0], float(metrics["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(vals[0][1], float(metrics["l1"]),
                               rtol=1e-5)
    np.testing.assert_allclose(vals[0][2],
                               float(jnp.sum(st2.anchor_demon)),
                               rtol=1e-6)
