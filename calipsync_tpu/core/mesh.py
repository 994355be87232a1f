"""Device mesh and sharding helpers.

The reference has no distributed machinery at all (SURVEY.md section 2:
single process, one cuda:0). Here parallelism is first-class: a named
`jax.sharding.Mesh` whose ``data`` axis carries data-parallel training
(gradient psum over ICI) and data-sharded batched inference. Multi-host
slices extend the same mesh over DCN; the code only ever names logical axes.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AxisNames = Union[str, Tuple[str, ...]]


def maybe_initialize_distributed(
        coordinator_address: Optional[str] = None,
        num_processes: Optional[int] = None,
        process_id: Optional[int] = None) -> bool:
    """Env-driven multi-host runtime init (jax.distributed over DCN).

    Reads CALIPSYNC_COORDINATOR / CALIPSYNC_NUM_PROCESSES /
    CALIPSYNC_PROCESS_ID unless given explicitly; a no-op (returns False)
    when unset or single-process. On TPU pods jax.distributed also
    auto-detects, so explicit env vars are only needed off-pod (e.g. the
    2-process CPU test, tests/test_multihost.py). Must run before any
    backend use. Idempotent."""
    coordinator = coordinator_address or os.environ.get(
        "CALIPSYNC_COORDINATOR")
    nproc = num_processes if num_processes is not None else int(
        os.environ.get("CALIPSYNC_NUM_PROCESSES", "0") or 0)
    if not coordinator or nproc <= 1:
        return False
    pid = process_id if process_id is not None else int(
        os.environ.get("CALIPSYNC_PROCESS_ID", "-1"))
    # idempotency probe that must NOT touch the backend (jax.process_count
    # would initialize XLA, after which distributed init is rejected)
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return True
    try:  # CPU cross-process collectives need the gloo backend
        if jax.config.read("jax_platforms") == "cpu":
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    kwargs = {}
    # Join window for all processes to reach initialize (jax default
    # 300 s). On a contended single-core host (full test suite) worker
    # imports alone can straddle that, so the 2-process test raises it.
    timeout_s = os.environ.get("CALIPSYNC_DIST_TIMEOUT_S")
    if timeout_s:
        kwargs["initialization_timeout"] = int(timeout_s)
    jax.distributed.initialize(coordinator, num_processes=nproc,
                               process_id=pid, **kwargs)
    return True


def make_mesh(data: int = -1, axis_name: str = "data",
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a 1-D data-parallel mesh over the given (default: all) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if data == -1:
        data = len(devs)
    if data > len(devs):
        raise ValueError(f"requested {data} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:data]), (axis_name,))


def make_hybrid_mesh(data: int = -1, dcn: int = -1,
                     axis_name: str = "data",
                     dcn_axis_name: str = "host") -> Mesh:
    """2-D (host, data) mesh: the outer axis spans processes (collectives
    cross DCN), the inner axis spans each process's local devices
    (collectives ride ICI). Devices are ordered process-major so the inner
    axis never leaves a host. With one process this still builds a valid
    (1, N) mesh — the same code path runs everywhere (MeshConfig.dcn)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if dcn == -1:
        dcn = jax.process_count()
    if len(devs) % dcn:
        raise ValueError(f"{len(devs)} devices not divisible into {dcn} hosts")
    per_host = len(devs) // dcn
    if data == -1:
        data = per_host
    if data > per_host:
        raise ValueError(f"requested {data} per-host devices, have {per_host}")
    arr = np.asarray(devs).reshape(dcn, per_host)[:, :data]
    return Mesh(arr, (dcn_axis_name, axis_name))


def build_mesh(cfg) -> Mesh:
    """MeshConfig -> the mesh it describes: 1-D ``(data,)`` for dcn == 1,
    the 2-D ``(host, data)`` hybrid otherwise (initializing
    jax.distributed from the environment first when needed). This is the
    production entry point — pipelines should call this, not make_mesh,
    so the MeshConfig.dcn knob actually takes effect."""
    if cfg.dcn == 1:
        return make_mesh(cfg.data, cfg.axis_name)
    maybe_initialize_distributed()
    return make_hybrid_mesh(cfg.data, cfg.dcn, cfg.axis_name,
                            cfg.dcn_axis_name)


def batch_axes(mesh: Mesh) -> AxisNames:
    """The axis name(s) a data batch shards over: every mesh axis.
    1-D mesh -> 'data'; hybrid mesh -> ('host', 'data')."""
    names = tuple(mesh.axis_names)
    return names[0] if len(names) == 1 else names


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name=None) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh's batch axes
    (all of them by default — ('host', 'data') on a hybrid mesh)."""
    return NamedSharding(mesh, P(axis_name or batch_axes(mesh)))


def shard_batch(batch, mesh: Mesh, axis_name=None):
    """device_put a host batch pytree with its leading dim sharded."""
    s = batch_sharded(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """device_put a pytree fully replicated over the mesh."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def local_batch_size(global_batch: int, mesh: Mesh,
                     axis_name: str = "data") -> int:
    n = mesh.shape[axis_name]
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {axis_name}={n}")
    return global_batch // n
