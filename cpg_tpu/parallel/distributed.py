"""Multi-host (pod / DCN) scale-out for the CPG cycle.

The reference has no distributed story at all (SURVEY §2: optional in-process
nn.DataParallel only, no NCCL/MPI). The TPU-native replacement for multi-host
is NOT a communication library: every host runs the SAME program, jax
assembles the global device list at `jax.distributed.initialize`, and the
train step — already jitted over a Mesh (parallel/mesh.py) — partitions
globally. XLA lowers gradient/metric reductions hierarchically: ring
reduce-scatter/all-gather over ICI inside each slice, one small cross-slice
hop over DCN.

Usage on an N-host pod (same script on every host):

    from cpg_tpu.parallel import distributed as dist
    dist.initialize()                       # env-driven (TPU pods: automatic)
    mesh = dist.make_pod_mesh(n_model=1)    # ("dcn", "data", "model")
    ... Manager(..., mesh=mesh) ...

Data loading stays per-host: each process feeds its LOCAL shard of the global
batch (`local_batch_slice`), and `jax.make_array_from_process_local_data`
assembles the global sharded array.

Single-host fallback: everything here degrades to the local mesh, so the same
driver runs unchanged on one chip, one slice, or a pod.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import batch_sharding, make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """`jax.distributed.initialize` wrapper, idempotent and safe single-host.

    On Cloud TPU pods all arguments resolve from the metadata server /
    environment; elsewhere pass them explicitly (or set JAX_COORDINATOR_*).

    MUST run before any backend-initializing jax call (jax.devices(),
    jax.process_count(), any op): jax.distributed.initialize raises once the
    XLA backend exists. The already-initialized check therefore reads the
    distributed client handle directly instead of jax.process_count(), which
    would itself initialize the backend and turn every first call into a
    silent single-host fallback.
    """
    import os

    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return  # distributed service already initialized (idempotent re-call)
    # "Is a coordinator configured?" must be decided WITHOUT jax calls that
    # initialize the XLA backend: explicit args, the env var, or a detectable
    # cluster environment (TPU pod metadata, Slurm, MPI, k8s).
    configured = (coordinator_address is not None or num_processes is not None
                  or process_id is not None
                  or bool(os.environ.get("JAX_COORDINATOR_ADDRESS")))
    if not configured:
        try:
            from jax._src import clusters

            configured = any(c.is_env_present()
                             for c in clusters.ClusterEnv._cluster_types)
        except Exception:
            pass  # private-API drift: fall through to the call itself
    if not configured and jax._src.xla_bridge.backends_are_initialized():
        # plain single-host process that already touched the backend: there is
        # no coordinator to reach, so a no-op is correct (not a fallback)
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except ValueError as e:
        # Only the positively-identified "no coordinator configured" case may
        # fall back to single-host; anything else (including RuntimeError
        # "must be called before any JAX calls" = backend already up IN a
        # configured cluster, a caller ordering bug) must surface rather than
        # silently train single-host per-host.
        if "coordinator_address" not in str(e):
            raise


def make_pod_mesh(n_model: int = 1, n_dcn: Optional[int] = None) -> Mesh:
    """Hierarchical mesh over all connected hosts.

    `n_dcn` defaults to the process count — one DCN group per host, ICI within.
    On a single host this is exactly `make_mesh` (no dcn axis), so drivers can
    call it unconditionally.
    """
    n_dcn = jax.process_count() if n_dcn is None else n_dcn
    if n_dcn <= 1:
        return make_mesh(n_model=n_model)
    if jax.process_count() > 1:
        try:
            from jax.experimental import mesh_utils

            dm = mesh_utils.create_hybrid_device_mesh(
                (1, jax.device_count() // n_dcn // n_model, n_model),
                (n_dcn, 1, 1),
            )
            return Mesh(np.asarray(dm), ("dcn", "data", "model"))
        except Exception:
            pass  # fall through to the plain reshape
    return make_mesh(n_model=n_model, n_dcn=n_dcn)


def local_batch_slice(mesh: Mesh, global_batch: int) -> slice:
    """The [start, stop) rows of the global batch this process must load.

    The batch axis shards over (dcn, data); addressable devices of one process
    own one contiguous block under `make_pod_mesh`'s layout.
    """
    n = jax.process_count()
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def put_global_batch(mesh: Mesh, x, y):
    """Assemble globally-sharded (x, y) from per-process local shards.

    `x`/`y` are THIS process's rows (see `local_batch_slice`). Single-process:
    plain device_put with the batch sharding.
    """
    bs = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(x, bs), jax.device_put(y, bs)
    gx = jax.make_array_from_process_local_data(bs, np.asarray(x))
    gy = jax.make_array_from_process_local_data(bs, np.asarray(y))
    return gx, gy
