"""Multi-host runtime: jax.distributed + (dcn=host, ici=chip) meshes.

The reference is strictly single-process/single-GPU (SURVEY §2.3 — no
torch.distributed anywhere); this module is the TPU build's scale-out
layer.  Topology stance:

  * the `view` mesh axis is laid out PROCESS-MAJOR, so cross-host traffic
    (DCN) carries only the view-axis collectives: the psum of replicated
    tri-plane/decoder gradients and the tiny consistency-loss gathers —
    exactly the SVC aggregation the reference performs in one in-memory
    backward (train.py:240);
  * the `gauss` axis (anchor shards, all_gather of decoded gaussians,
    strip rasterization exchange) stays INSIDE a host so its heavy
    collectives ride ICI.

Each process feeds only its own view rows (per-host camera/GT sharding):
`local_view_rows` says which global views this process owns and
`make_view_array` assembles the global P('view') array from
process-local data without any cross-host copy.

Run one process per host with:
    SPLATCO_COORDINATOR=host0:1234 SPLATCO_NUM_PROCESSES=H \
    SPLATCO_PROCESS_ID=i python train.py ...
(or rely on TPU pod auto-detection, where initialize() needs no args).
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize the multi-process runtime.  Args fall back to
    SPLATCO_COORDINATOR / SPLATCO_NUM_PROCESSES / SPLATCO_PROCESS_ID; on
    TPU pods jax.distributed auto-detects everything, so a bare call with
    the env flag set also works.  Returns True when distributed mode is
    active.  No-op (False) when neither args nor env request it."""
    coordinator = coordinator or os.environ.get("SPLATCO_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("SPLATCO_NUM_PROCESSES", "0")) \
            or None
    if process_id is None:
        pid = os.environ.get("SPLATCO_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if coordinator is None and num_processes is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def _sorted_devices() -> List:
    """Global devices in (process, local-ordinal) order, so contiguous
    rows of the mesh map to one host's chips."""
    return sorted(jax.devices(), key=lambda d: (d.process_index, d.id))


def make_multihost_mesh(n_view: int, n_gauss: int) -> Mesh:
    """(view=dcn x local, gauss=ici) mesh over all processes.

    Constraints: n_view * n_gauss == total devices; each process
    contributes whole view rows (n_view % num_processes == 0 and every
    row's n_gauss chips live on one host) — this is what keeps the gauss
    all_gather on ICI."""
    devs = _sorted_devices()
    h = jax.process_count()
    assert n_view * n_gauss == len(devs), (
        f"mesh {n_view}x{n_gauss} != {len(devs)} devices")
    assert n_view % h == 0, (
        f"view axis {n_view} must be a multiple of process count {h}")
    rows_per_host = n_view // h
    local = len(devs) // h
    assert rows_per_host * n_gauss == local, (
        f"each host must own whole view rows: {rows_per_host}x{n_gauss} "
        f"!= {local} local devices")
    arr = np.array(devs).reshape(n_view, n_gauss)
    for r in range(n_view):
        procs = {d.process_index for d in arr[r]}
        assert len(procs) == 1, (
            f"view row {r} spans processes {procs} — gauss axis must stay "
            "on one host")
    return Mesh(arr, ("view", "gauss"))


def local_view_rows(mesh: Mesh) -> List[int]:
    """Global view indices whose row of chips belongs to this process."""
    me = jax.process_index()
    return [r for r in range(mesh.devices.shape[0])
            if mesh.devices[r, 0].process_index == me]


def make_view_array(mesh: Mesh, local_rows: np.ndarray):
    """Assemble the global [n_view, ...] P('view')-sharded array from this
    process's stacked local rows ([len(local_view_rows), ...]) with no
    cross-host transfer."""
    n_view = mesh.devices.shape[0]
    global_shape = (n_view,) + tuple(local_rows.shape[1:])
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("view")), np.asarray(local_rows),
        global_shape)


def _put_global(sharding: NamedSharding, value):
    """Place a host-replicated numpy/jax value as a global array on a
    (possibly multi-process) mesh.  Every process passes the SAME full
    value; each fills only its addressable shards."""
    arr = np.asarray(value)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx])


def place_host_sharded(mesh: Mesh, params, active, stats):
    """Multi-host analogue of the tests' device_put placement.  Every
    process holds the full value host-side (anchors/stats are modest);
    make_array_from_callback fills the local shards, which works on both
    single- and multi-process meshes."""
    from splatco_tpu.parallel.mesh import param_shardings

    params_s = jax.tree.map(
        lambda v, s: _put_global(s, v), params,
        param_shardings(mesh, params))
    active_s = _put_global(NamedSharding(mesh, P("gauss")), active)
    stats_s = jax.tree.map(
        lambda v: _put_global(NamedSharding(mesh, P("gauss")), v), stats)
    return params_s, active_s, stats_s
