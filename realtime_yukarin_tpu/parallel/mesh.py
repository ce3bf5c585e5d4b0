"""Device mesh construction and axis conventions.

The reference's only parallelism is 3 OS processes + queues on one desktop
(SURVEY.md §2c).  The TPU build scales instead via a 2-D
``Mesh(('data', 'model'))``:

  data   — batched concurrent streams / utterances (DP; BASELINE config #5:
           64+ realtime streams data-parallel over a v5e slice)
  model  — weight sharding for stages whose params exceed one chip's HBM
           (TP; XLA GSPMD inserts the ICI collectives)

Multi-host: ``jax.distributed.initialize()`` + the same mesh over
``jax.devices()`` spanning hosts; DP crosses hosts over DCN, TP stays
intra-host on ICI (axis order below puts 'model' innermost so TP maps to
physically adjacent devices).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices=None, model_parallel: int = 1) -> Mesh:
    """Mesh over ``devices`` (default: all) with trailing model axis."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by "
                         f"model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, rank: int = 1) -> NamedSharding:
    """Batch-leading sharding: axis 0 over 'data', rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (rank - 1))))


def shard_batch_pytree(mesh: Mesh, tree):
    """Sharding tree: every leaf's axis 0 over 'data'."""
    return jax.tree.map(
        lambda x: NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))),
        tree)


def model_shard_specs(mesh: Mesh, params):
    """PartitionSpec tree for params: tensors whose LAST axis divides the
    model axis get sharded there (Megatron-style column split for
    conv/dense kernels); everything else replicates.  GSPMD inserts the
    collectives, so any choice here is correctness-preserving.
    """
    msize = mesh.shape[MODEL_AXIS]

    def rule(x):
        if (msize > 1 and x.ndim >= 2 and x.shape[-1] % msize == 0
                and x.shape[-1] >= 2 * msize):
            return P(*([None] * (x.ndim - 1) + [MODEL_AXIS]))
        return P()

    return jax.tree.map(rule, params)


def model_shard_params(mesh: Mesh, params):
    """NamedSharding tree over :func:`model_shard_specs`."""
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        model_shard_specs(mesh, params),
                        is_leaf=lambda x: isinstance(x, P))
