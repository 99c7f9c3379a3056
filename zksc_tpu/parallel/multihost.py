"""Multi-host orchestration: jax.distributed init + global meshes + proof
sharding across hosts.

SURVEY.md §2.6 requires "multi-host orchestration via jax.distributed" as a
TPU-native distribution component with no reference counterpart (the
reference is a single-process library; its scale-out unit is the independent
per-chunk proof, js/src/zk.ts:105-135). Model here:

  - ICI (intra-slice) parallelism shards ONE proof's MSM/NTT lane axes over
    the local mesh (parallel/mesh.py, ops/msm.py, ops/ntt_sharded.py).
  - DCN (cross-host) parallelism stays embarrassingly parallel: each host
    proves its own slice of the request batch (`host_slice`), mirroring the
    reference's per-chunk independence — no proof needs cross-host
    collectives, so nothing rides the slow DCN links in the hot path.

`initialize()` is a thin, idempotent wrapper over jax.distributed for the
standard TPU pod environments; everything else is pure topology math that
unit-tests single-host."""
from __future__ import annotations

import os

import numpy as np

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Idempotently initialize jax.distributed.

    With no arguments, relies on the cluster auto-detection JAX ships for
    TPU pods (GKE/GCE metadata); explicit arguments cover manual clusters
    (mirrors torchrun-style env: ZKSC_COORDINATOR, ZKSC_NUM_PROCS,
    ZKSC_PROC_ID). Returns True if distributed mode is active."""
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "ZKSC_COORDINATOR")
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["ZKSC_NUM_PROCS"])
        if "ZKSC_NUM_PROCS" in os.environ else None)
    process_id = process_id if process_id is not None else (
        int(os.environ["ZKSC_PROC_ID"])
        if "ZKSC_PROC_ID" in os.environ else None)
    import jax
    if coordinator_address is None and num_processes is None:
        # single-host (or auto-detectable pod): only call into
        # jax.distributed when an env actually describes a cluster
        if jax.process_count() > 1:
            _initialized = True
            return True
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True


def global_mesh(axis: str = "shard"):
    """1-D mesh over every addressable device across all processes. The MSM
    point axis sharded over it uses ICI within a slice and DCN across — for
    cross-host scale prefer `host_slice` batch parallelism instead."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), (axis,))


def local_mesh(axis: str = "shard"):
    """Mesh over this process's local devices only (ICI domain)."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.local_devices()), (axis,))


def host_slice(n_items: int, process_id: int | None = None,
               num_processes: int | None = None) -> slice:
    """Contiguous slice of a request batch owned by this host.

    Splits n_items as evenly as possible (first `rem` hosts get one extra),
    the cross-host scale-out for batch proving: each host runs
    `generate_proofs(..., requests[host_slice(len(requests))])` on its own
    chips and no cross-host communication happens at all."""
    import jax
    p = process_id if process_id is not None else jax.process_index()
    n = num_processes if num_processes is not None else jax.process_count()
    base, rem = divmod(n_items, n)
    start = p * base + min(p, rem)
    stop = start + base + (1 if p < rem else 0)
    return slice(start, stop)
