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


def put_global(mesh: Mesh, tree, spec_tree):
    """device_put a host-local pytree to (possibly multi-process) global
    shardings.  Single-process this is a plain device_put; at N processes
    it goes through ``host_local_array_to_global_array`` — every process
    must pass the same value for replicated leaves (params) and its local
    slice for sharded ones.
    """
    if jax.process_count() == 1:
        shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), spec_tree,
                                 is_leaf=lambda x: isinstance(x, P))
        return jax.device_put(tree, shardings)
    return multihost_utils.host_local_array_to_global_array(
        tree, mesh, spec_tree)


def host_local_rows(arr) -> tuple[int, int, "np.ndarray"]:
    """Fetch this process's rows of a global batch-sharded array.

    Returns (row_start, row_stop, data): the contiguous global slice of
    axis 0 whose shards live on this process's devices (deduped when the
    rows are replicated over a model axis).  This is the output edge of
    multi-host serving: each host reads back only its own clients' audio.
    """
    by_start: dict[int, object] = {}
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        if start not in by_start:
            by_start[start] = s.data
    starts = sorted(by_start)
    rows = [np.asarray(by_start[s]) for s in starts]
    n_rows = sum(r.shape[0] for r in rows)
    stop = starts[-1] + rows[-1].shape[0]
    if starts[0] + n_rows != stop:
        raise ValueError(f"non-contiguous local rows: {starts}")
    return starts[0], stop, np.concatenate(rows, axis=0)


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
