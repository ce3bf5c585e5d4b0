"""Multi-host (DCN) support: jax.distributed bring-up + global-batch glue.

The reference is a single desktop process (SURVEY.md §2c: no distributed
comm backend, `multiprocessing.Queue` only).  The TPU build scales across
hosts the JAX way: every host runs this same program, `jax.distributed`
wires the processes into one runtime, and the existing
``Mesh(('data','model'))`` simply spans all hosts' devices — DP crosses
hosts over DCN, TP stays intra-host on ICI.  No NCCL/MPI analogue is
written here; XLA's collectives are the backend.

The one genuinely multi-host-specific piece of glue is input feeding:
each host only holds its local shard of the batch, so host-local numpy
arrays must be assembled into global ``jax.Array``s
(``jax.make_array_from_process_local_data``).  That path is exercised
single-process in tests (where local == global) and is exactly what runs
at N hosts.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from realtime_yukarin_tpu.parallel.mesh import DATA_AXIS


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> tuple[int, int]:
    """Bring up jax.distributed when running multi-process; no-op otherwise.

    Call before the first device query.  Arguments may also come from the
    standard env vars (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``) or, on Cloud TPU, from the metadata autodetection
    built into ``jax.distributed.initialize``.

    Returns (process_index, process_count).
    """
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else (
        int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_NUM_PROCESSES" in os.environ else None)
    pid = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ else None)
    # A coordinator with nproc unset means "let jax autodetect the process
    # topology" (Cloud TPU metadata) — only an EXPLICIT num_processes=1 is
    # a no-op.  Silently skipping initialize here would let every host
    # train an independent model with no error.
    if coord is not None and (nproc is None or nproc > 1):
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=nproc, process_id=pid)
    return jax.process_index(), jax.process_count()


def host_local_to_global(mesh: Mesh, tree):
    """Assemble per-host batch shards into global batch-sharded jax.Arrays.

    Every leaf's axis 0 is the (host-local) batch; the result is the
    global array sharded over the mesh 'data' axis.  Single-process this
    reduces to a plain device_put with the same sharding, so the identical
    call site works at 1 and N hosts.
    """

    def one(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(one, tree)


def broadcast_from_host0(tree):
    """Make host 0's pytree identical on every host (e.g. fresh params, so
    all hosts start from the same init without a shared filesystem)."""
    if jax.process_count() == 1:
        return tree
    return multihost_utils.broadcast_one_to_all(tree)


def sync_hosts(name: str = "barrier") -> None:
    """Barrier across hosts (no-op single-process)."""
    if jax.process_count() > 1:
        multihost_utils.sync_global_devices(name)


def global_batch_size(per_host_batch: int) -> int:
    return per_host_batch * jax.process_count()
