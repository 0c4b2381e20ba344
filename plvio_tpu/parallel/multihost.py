"""Multi-host bootstrap: jax.distributed across processes/hosts.

The reference is a single-process C++ system; this build's scaling story
(SURVEY §2.3, BASELINE "≥80% @ 2 hosts") runs the sharded back-end
solvers (parallel/dist_ba, dist_liba, chain_ba) over a GLOBAL device
mesh spanning hosts.  JAX's runtime makes that transparent: after
`jax.distributed.initialize`, `jax.devices()` lists every chip of every
host and the same shard_map programs run unchanged — XLA routes
collectives over ICI within a host and DCN across hosts.

Environment-driven bootstrap (set by the launcher / scheduler):
  PLVIO_COORDINATOR  host:port of process 0   (e.g. "10.0.0.1:9876")
  PLVIO_NUM_PROCS    total number of processes
  PLVIO_PROC_ID      this process's rank

`tests/test_multihost_smoke.py` exercises this with two REAL processes
on localhost (CPU backend, Gloo collectives) driving a cross-process
chain_ba solve — the runnable artifact behind the multi-host claim.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def init_from_env() -> bool:
    """Initialize jax.distributed from PLVIO_* env vars.  Returns True
    if multi-process mode was activated, False for single-process."""
    coord = os.environ.get("PLVIO_COORDINATOR")
    if not coord:
        return False
    n = int(os.environ["PLVIO_NUM_PROCS"])
    pid = int(os.environ["PLVIO_PROC_ID"])
    return init(coord, n, pid)


def init(coordinator: str, num_processes: int, process_id: int) -> bool:
    """Explicit multi-process init (idempotent)."""
    import jax
    if num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh(axis: str = "lm"):
    """1-D mesh over ALL global devices (every host's chips)."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis,))


def host_local_view(arr, mesh, spec):
    """Build a global sharded array from per-host numpy data.

    Each process passes the FULL global numpy array (cheap host memory);
    only the shards this process owns are transferred to its devices —
    the standard small-problem pattern (large problems would construct
    per-shard data host-locally via
    jax.make_array_from_single_device_arrays)."""
    import jax
    from jax.sharding import NamedSharding
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        np.asarray(arr).shape, sharding,
        lambda idx: np.asarray(arr)[idx])


def addressable_checksum(arr) -> float:
    """Finite-sum over this process's addressable shards (a global
    `.block_until_ready()`-safe health signal; printing a spanning
    array directly is not allowed)."""
    tot = 0.0
    for s in arr.addressable_shards:
        tot += float(np.abs(np.asarray(s.data)).sum())
    return tot
