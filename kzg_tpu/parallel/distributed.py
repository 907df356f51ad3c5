"""Multi-host bring-up: jax.distributed initialization + pod-ready meshes.

The reference's only scaling story is a single-process std::thread fan-out
over trusted-setup ranges (reference src/trusted_setup.cpp:39-73). The TPU
equivalent is a *multi-controller* program: one python process per host,
`jax.distributed.initialize` to form the cluster, and one global
`jax.sharding.Mesh` spanning every chip — after which the coefficient-axis
shardings of parallel.sharded (MSM, setup generation) and parallel.ntt
(four-step NTT) run unchanged: shard_map only sees the mesh, and XLA routes
the all_gather/all_to_all collectives over ICI within a slice and DCN
across slices.

Single-chip CI boxes and the virtual-CPU test mesh skip initialize() and
fall back to the local devices, so every caller can use
:func:`global_mesh` unconditionally.

Usage (per host, e.g. via the same launcher on every worker):

    from kzg_tpu.parallel.distributed import init_distributed, global_mesh
    init_distributed()                 # no-op on a single local process
    mesh = global_mesh()               # all chips across all hosts
    run = sharded_msm(eng, mesh)       # parallel.sharded, unchanged
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running as one process of a
    multi-host job; returns True if a cluster was formed.

    Arguments default from the standard environment (JAX reads
    COORDINATOR_ADDRESS / cloud-TPU metadata when args are None); explicit
    values override. Safe to call on a single-process run: when no
    coordinator can be inferred, it leaves JAX in local mode.
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():        # pragma: no cover
        return True
    explicit = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    on_pod = os.environ.get("TPU_WORKER_HOSTNAMES") or \
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if not explicit and not on_pod:
        return False                           # single-process: local mode
    kwargs = {}
    if explicit:
        kwargs["coordinator_address"] = explicit
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)       # pragma: no cover (pod only)
    return True


def global_mesh(axis_name: str = "data",
                max_devices: int | None = None) -> Mesh:
    """1-D mesh over every addressable chip of the (possibly multi-host)
    job. The coefficient axis shards over this one axis; within-slice
    collectives ride ICI, cross-slice segments ride DCN — both chosen by
    XLA from the device order, which jax.devices() already returns
    ICI-contiguous."""
    devs = jax.devices()
    if max_devices is not None:
        devs = devs[:max_devices]
    return Mesh(np.array(devs), (axis_name,))
